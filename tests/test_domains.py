"""URL/domain curation (functions/domains.py): host extraction,
public-suffix longest-match registered domains, per-domain profile,
blocklist + cap filtering."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_denormalization_spark.functions import domains as D


def _host(spark, url):
    return (
        spark.createDataFrame([(url,)], "url string")
        .select(D.host_of("url").alias("h"))
        .collect()[0]["h"]
    )


def test_host_of_strips_scheme_port_userinfo_path(spark):
    assert _host(spark, "https://www.Example.COM:8443/p/1?q=2") == "www.example.com"
    assert _host(spark, "http://user:pw@site.org/x") == "site.org"
    assert _host(spark, "ftp://a.co.uk") == "a.co.uk"
    assert _host(spark, "not a url") == ""


def test_registered_domain_longest_match(spark):
    rows = [
        ("www.blog.example.co.uk", "example.co.uk"),  # 2-label suffix wins
        ("example.co.uk", "example.co.uk"),
        ("sub.example.com", "example.com"),
        ("example.com", "example.com"),
        ("co.uk", None),        # bare public suffix: nothing registered
        ("com", None),
        ("example.unknown", None),  # no matching suffix
        ("deep.a.b.site.com.au", "site.com.au"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in rows], "h string")
    got = [
        r["d"]
        for r in df.select(
            D.registered_domain(F.col("h")).alias("d")
        ).collect()
    ]
    assert got == [want for _, want in rows]


def test_domain_profile_aggregates(spark):
    docs = spark.createDataFrame(
        [
            (1, "https://a.example.com/1", "one two three", "en"),
            (2, "https://b.example.com/2", "four five", "en"),
            (3, "https://other.org/3", "x " * 40, "de"),
            (4, "https://bare-suffix-host.unknown/4", "dropped", "en"),
        ],
        "doc_id long, url string, text string, lang string",
    )
    out = {
        r["domain"]: r
        for r in D.domain_profile(docs, "url").collect()
    }
    assert set(out) == {"example.com", "other.org"}
    ex = out["example.com"]
    assert (ex["n_docs"], ex["n_tokens"], ex["n_langs"]) == (2, 5, 1)
    assert ex["short_frac"] == 1.0  # both docs < 30 tokens
    assert ex["mean_doc_tokens"] == 2.5
    assert out["other.org"]["short_frac"] == 0.0  # 40 tokens


def test_domain_filtered_corpus_blocklist_and_cap(spark):
    docs = spark.createDataFrame(
        [(i, f"https://www.keep.com/{i}", "t") for i in range(5)]
        + [(10, "https://bad.com/x", "t"), (11, "https://no-suffix.zzz/y", "t")],
        "doc_id long, url string, text string",
    )
    out = D.domain_filtered_corpus(
        docs, "url", blocklist=["bad.com"], max_per_domain=3
    ).collect()
    assert sorted(r["doc_id"] for r in out) == [0, 1, 2]  # cap keeps min ids
    assert {r["domain"] for r in out} == {"keep.com"}


def test_domain_extraction_is_expression_only(spark):
    """The whole derivation must stay inside the scan stage: no joins,
    no extra exchanges beyond the aggregation's own."""
    from kafka_denormalization_spark.plans import count_exchanges, explain_str

    docs = spark.createDataFrame(
        [(1, "https://a.example.com/1", "t", "en")],
        "doc_id long, url string, text string, lang string",
    )
    prof = D.domain_profile(docs, "url")
    plan = explain_str(prof)
    assert "Join" not in plan
    # the groupBy exchange + the one exact count-distinct(lang) adds
    # ((domain, lang) partial-agg exchange) — both aggregation-required,
    # neither caused by the domain derivation
    assert count_exchanges(prof) == 2


def test_normalize_url_variants(spark):
    cases = [
        ("https://www.Ex.COM:8443/p/1?utm_source=a&b=2#frag",
         "https://www.ex.com/p/1?b=2"),
        ("https://ex.com/p/1/", "https://ex.com/p/1"),
        ("https://ex.com/", "https://ex.com/"),
        ("https://ex.com", "https://ex.com/"),
        ("https://ex.com/x?utm_a=1&utm_b=2", "https://ex.com/x"),
        ("https://ex.com/x?a=1&fbclid=z&b=2", "https://ex.com/x?a=1&b=2"),
        ("HTTP://ex.com/x?gclid=1", "http://ex.com/x"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [
        r["n"]
        for r in df.select(D.normalize_url("url").alias("n")).collect()
    ]
    assert got == [want for _, want in cases]


def test_url_dedup_keeps_min_id_per_canonical(spark):
    docs = spark.createDataFrame(
        [
            (1, "https://ex.com/p?utm_source=a"),
            (2, "https://ex.com/p#top"),
            (3, "https://ex.com/p/"),
            (4, "https://ex.com/q"),
        ],
        "doc_id long, url string",
    )
    out = D.url_dedup(docs, "url").collect()
    assert sorted((r["doc_id"], r["url_norm"]) for r in out) == [
        (1, "https://ex.com/p"),
        (4, "https://ex.com/q"),
    ]


def test_url_dedup_prunes_text_from_scan(spark):
    """URL-level dedup must never read page content: the parquet scan's
    ReadSchema excludes ``text`` (at crawl scale text dominates bytes;
    reading it for a URL-key dedup would be the whole cost)."""
    import re

    from kafka_denormalization_spark.plans import explain_str
    from kafka_denormalization_spark.queries import QUERIES

    for name in ("url_dedup", "domain_filtered_corpus"):
        plan = explain_str(QUERIES[name](spark, "/root/testdata/sf0.001"))
        schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        assert schemas, name
        for s in schemas:
            assert "text" not in s, (name, s)


def test_continuous_url_dedup_with_restart(spark, tmp_path):
    """Streaming twin of url_dedup by composition: normalize_url up
    front, then the durable digest state of IngestDedup keyed on the
    CANONICAL url — re-crawls of a page seen in any earlier batch are
    dropped, across a restart (state is the parquet digest set)."""
    from kafka_denormalization_spark.streaming.ingest_dedup import (
        IngestDedup,
    )

    state = str(tmp_path / "state")

    def batch(rows):
        df = spark.createDataFrame(rows, "doc_id long, url string")
        return df.withColumn("url_norm", D.normalize_url("url"))

    d1 = IngestDedup(spark, state, "doc_id", "url_norm")
    out1 = d1.process_batch(batch([
        (1, "https://ex.com/p?utm_source=a"),
        (2, "https://ex.com/p#top"),          # same canonical as 1
        (3, "https://ex.com/q"),
    ]))
    assert sorted(r["doc_id"] for r in out1.collect()) == [1, 3]

    # restart: fresh instance over the same state dir
    d2 = IngestDedup(spark, state, "doc_id", "url_norm")
    out2 = d2.process_batch(batch([
        (4, "https://ex.com/p/"),             # canonical seen in batch 1
        (5, "https://EX.com/q?fbclid=z"),     # canonical seen in batch 1
        (6, "https://ex.com/r"),
    ]))
    assert sorted(r["doc_id"] for r in out2.collect()) == [6]


def test_registered_domain_join_matches_expression_path(spark):
    """The rules-as-a-table variant (broadcast join, PSL deployment
    shape) must agree with the InSet expression path on every host
    shape: multi-label suffix wins, bare suffix -> NULL, no match ->
    NULL, deep subdomains."""
    hosts = [
        "www.blog.example.co.uk", "example.co.uk", "sub.example.com",
        "example.com", "co.uk", "com", "example.unknown",
        "deep.a.b.site.com.au", "x.ac.uk", "ac.uk",
    ]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    expr_out = {
        r["host"]: r["d"]
        for r in df.select(
            "host", D.registered_domain(F.col("host")).alias("d")
        ).collect()
    }
    sfx = spark.createDataFrame(
        [(s,) for s in D.PUBLIC_SUFFIXES_MIN], "suffix string"
    )
    join_out = {
        r["host"]: r["domain"]
        for r in D.registered_domain_join(df, "host", sfx).collect()
    }
    assert join_out == expr_out


def test_two_level_cap_matches_single_window(spark):
    """The (input partition, domain) pre-cap must be result-identical
    to the plain global window cap: the m globally-smallest ids of a
    domain are each among the m smallest of their own input partition.
    Skewed frame: one mega-domain spread over many partitions + small
    domains, several partitionings."""
    from pyspark.sql import Window

    rows = [(i, f"https://mega.com/p/{i}") for i in range(500)]
    rows += [(1000 + i, f"https://tiny{i % 7}.org/x") for i in range(70)]
    for nparts in (1, 7, 32):
        df = spark.createDataFrame(
            rows, "doc_id long, url string"
        ).repartition(nparts)
        got = sorted(
            r["doc_id"]
            for r in D.domain_filtered_corpus(
                df, "url", blocklist=[], max_per_domain=5
            ).collect()
        )
        # reference: plain single-window cap
        dom = D.registered_domain(D.host_of(F.col("url")))
        base = df.withColumn("domain", dom).where(F.col("domain").isNotNull())
        w = Window.partitionBy("domain").orderBy("doc_id")
        ref = sorted(
            r["doc_id"]
            for r in base.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= 5)
            .collect()
        )
        assert got == ref, nparts
        assert len(got) == 5 + 7 * 5  # mega capped + 7 tiny domains
