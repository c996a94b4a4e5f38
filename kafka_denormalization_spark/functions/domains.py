"""URL / domain-level curation — the C4/RefinedWeb-lineage pretraining
stage the rest of the text family composes with: registered-domain
extraction under public-suffix rules, per-domain quality aggregation,
and blocklist / per-domain-cap filtering.

Reference parity: the reference engine (aramperes/kafka-denormalization)
has no value-level compute at all (SURVEY §2.3) — this module is a
north-star extension, modeled on the URL-filtering stages described for
C4 (Raffel et al. 2020 §2.2) and RefinedWeb (Penedo et al. 2023 §3.1).

Everything here is expression-only (split / slice / array_join / when)
— no UDFs, no joins inside the extraction, so Catalyst keeps the whole
derivation inside WholeStageCodegen and the only shuffles are the ones
the aggregation/filter semantics require.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A deliberately small public-suffix sample for tests/demos. Production
# passes the real Public Suffix List (https://publicsuffix.org/, ~9k
# active rules) — through ``registered_domain_join`` (rules as a
# broadcast table), NOT this expression path: the InSet literal probe
# is O(1) per row but the 9k-literal expression tree costs seconds of
# plan compile PER QUERY (measured 5.8-7.3 s vs 1.0-3.4 s for the
# broadcast join at sf0.1 — docs/SCALE_NOTES.md "PSL-scale A/B").
# Expression path for bounded curated rule sets; join path for the PSL.
PUBLIC_SUFFIXES_MIN: tuple[str, ...] = (
    "com", "org", "net", "io", "dev", "edu", "gov",
    "co.uk", "ac.uk", "gov.uk", "com.au", "net.au", "co.jp", "com.br",
)


def host_of(url: Column | str) -> Column:
    """Host part of a URL (expression-only): text between ``://`` and the
    first ``/``, lowercased, port stripped."""
    u = F.col(url) if isinstance(url, str) else url
    host = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    # strip userinfo and port, lowercase (hosts are case-insensitive)
    host = F.regexp_replace(host, r"^.*@", "")
    host = F.regexp_replace(host, r":\d+$", "")
    return F.lower(host)


def registered_domain(
    host: Column | str,
    suffixes: tuple[str, ...] = PUBLIC_SUFFIXES_MIN,
) -> Column:
    """Registered (pay-level) domain of a host under public-suffix
    rules: the label immediately before the LONGEST suffix in
    ``suffixes`` that terminates the host, joined with that suffix —
    ``www.blog.example.co.uk`` -> ``example.co.uk``. NULL when no
    suffix matches or the host IS a bare suffix (nothing registered).

    Longest-match-wins is evaluated as a when-chain from the largest
    label count down; each arm is a slice + array_join + InSet probe —
    all codegen expressions, O(max_labels) per row regardless of rule
    count.
    """
    h = F.col(host) if isinstance(host, str) else host
    by_k: dict[int, list[str]] = {}
    for s in set(suffixes):
        by_k.setdefault(s.count(".") + 1, []).append(s)
    labels = F.split(h, r"\.")
    expr = None
    for k in sorted(by_k, reverse=True):
        cand = F.array_join(F.slice(labels, -k, k), ".")
        reg = F.array_join(F.slice(labels, -(k + 1), k + 1), ".")
        cond = (F.size(labels) > k) & cand.isin(by_k[k])
        expr = (F.when if expr is None else expr.when)(cond, reg)
    return expr.otherwise(F.lit(None).cast("string"))


def domain_profile(
    docs: DataFrame,
    url_col: str,
    text_col: str = "text",
    suffixes: tuple[str, ...] = PUBLIC_SUFFIXES_MIN,
) -> DataFrame:
    """Per-registered-domain quality aggregation: the table a curation
    run ranks/blocks domains from. One partial-aggregated pass; the
    only shuffle is the groupBy(domain) exchange, keyed on ~1e7
    distinct registered domains at crawl scale (fine-grained enough to
    spread; a mega-domain's rows still combine map-side first).

    Columns (integer-exact, ratios as int/int double division rounded
    to 6 — the repo's cross-engine-deterministic ratio convention):
      n_docs, n_chars, n_tokens — volume;
      n_langs — distinct langs seen (script-mixing signal);
      mean_doc_tokens — tokens per doc;
      short_frac — fraction of docs under 30 tokens (boilerplate/stub
                   signal, Gopher-style).
    """
    from .text import token_count

    toks = token_count(F.col(text_col))
    dom = registered_domain(host_of(F.col(url_col)), suffixes)
    return (
        docs.select(
            dom.alias("domain"),
            F.col("lang"),
            F.length(text_col).cast("long").alias("_chars"),
            toks.cast("long").alias("_toks"),
        )
        .where(F.col("domain").isNotNull())
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_chars").cast("long").alias("n_chars"),
            F.sum("_toks").cast("long").alias("n_tokens"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
            F.round(
                F.sum("_toks").cast("double") / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("mean_doc_tokens"),
            F.round(
                F.sum((F.col("_toks") < 30).cast("long")).cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("short_frac"),
        )
    )


def domain_filtered_corpus(
    docs: DataFrame,
    url_col: str,
    blocklist: list[str],
    max_per_domain: int | None = None,
    suffixes: tuple[str, ...] = PUBLIC_SUFFIXES_MIN,
    id_col: str = "doc_id",
) -> DataFrame:
    """Blocklist + per-domain-cap filtering, the standard anti-dominance
    curation pair:

    - drop every doc whose registered domain is in ``blocklist`` (or
      has NO registered domain — unparseable/bare-suffix hosts are not
      attributable, C4 drops them);
    - with ``max_per_domain``, keep only the ``m`` smallest-id docs per
      domain (deterministic cap so no single domain dominates the mix).

    Scale: the blocklist is a literal InSet (the full PSL-scale variant
    would broadcast-anti-join a blocklist table — both shuffle-free on
    the probe side). The cap is TWO-LEVEL (salted-window pattern): a
    pre-cap keeps the ``m`` smallest ids per (input partition, domain)
    — its exchange spreads a mega-domain over P distinct keys instead
    of concentrating it, and its per-group sort is bounded by partition
    width — then the global row_number window finishes on at most
    m x P rows per domain. The m globally-smallest ids of a domain are
    each among the m smallest of whichever input partition holds them,
    so the pre-cap provably drops nothing the global cap would keep
    (result identical to the single-window formulation; pytest pins it
    on a skewed frame). Cost: one extra exchange over the same row
    volume; benefit: no single executor ever sorts a mega-domain's
    full width — the exact skew the cap exists for.

    Output: input columns + ``domain``.
    """
    from pyspark.sql import Window

    dom = registered_domain(host_of(F.col(url_col)), suffixes)
    out = docs.withColumn("domain", dom).where(
        F.col("domain").isNotNull() & ~F.col("domain").isin(list(blocklist))
    )
    if max_per_domain is not None:
        pre = Window.partitionBy(
            F.spark_partition_id(), F.col("domain")
        ).orderBy(F.col(id_col))
        w = Window.partitionBy("domain").orderBy(F.col(id_col))
        out = (
            out.withColumn("_prn", F.row_number().over(pre))
            .where(F.col("_prn") <= max_per_domain)
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= max_per_domain)
            .drop("_prn", "_rn")
        )
    return out


def normalize_url(url: Column | str) -> Column:
    """Canonical URL for URL-level dedup — the C4/CommonCrawl-lineage
    normalization: lowercase scheme+host, strip the fragment, strip
    tracking query parameters (utm_*, fbclid, gclid, ref), drop an
    empty leftover ``?``, strip a trailing slash from a non-root path,
    drop default ports. Re-crawls of the same page under
    ``?utm_source=...`` / ``#section`` variants collapse to one key.

    Expression-only (regexp_replace chain over the split parts) — stays
    in WholeStageCodegen; the canonical string (or its digest) is what
    shuffles, never page content.
    """
    u = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = host_of(u)
    rest = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1)
    # split path?query, scrub tracking params from the query
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    query = F.regexp_replace(query, r"(^|&)(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)=[^&]*", "$1")
    query = F.regexp_replace(query, r"&&+", "&")          # collapse holes
    query = F.regexp_replace(query, r"^&|&$", "")         # trim edges
    # non-root trailing slashes off the path (ALL of them — one pass
    # per slash would break idempotence, caught by the hypothesis
    # fixed-point property on 'https://h///'); empty path -> /
    path = F.regexp_replace(path, r"(.)/+$", "$1")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), query)),
    )


def url_dedup(
    docs: DataFrame,
    url_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """URL-level exact dedup: keep the smallest-id document per
    normalized URL — the cheapest dedup stage in a crawl pipeline
    (runs BEFORE content dedup; re-crawls and tracking-param variants
    never reach the text hashers). One partial-aggregated groupBy on
    the canonical URL; only (url_norm, id) shuffles.

    Output: input columns + ``url_norm``, one row per canonical URL.
    """
    normed = docs.withColumn("url_norm", normalize_url(F.col(url_col)))
    keep = normed.groupBy("url_norm").agg(
        F.min(F.col(id_col)).alias("_keep_id")
    )
    return (
        normed.join(keep, "url_norm")
        .filter(F.col(id_col) == F.col("_keep_id"))
        .drop("_keep_id")
    )


def registered_domain_join(
    docs: DataFrame,
    host_col: str,
    suffix_df: DataFrame,
    out_col: str = "domain",
    max_suffix_labels: int = 3,
) -> DataFrame:
    """Registered-domain extraction with the suffix rules as a TABLE —
    the full-Public-Suffix-List deployment shape (the expression path
    ``registered_domain`` bakes the rules into an InSet literal, which
    is fine to a few thousand rules but couples plan size to rule
    count; rules-as-a-table updates without replanning and broadcasts).

    Topology: per host emit the last-k-label candidates for
    k = 1..``max_suffix_labels`` (a narrow inline explode of <= 3
    rows), broadcast-join the suffix table, keep the LONGEST matching
    suffix per host (max over k), derive the registered domain from
    the winner. Hosts with no matching suffix, or that ARE a bare
    suffix, get NULL — same contract as ``registered_domain``.

    Scale: the only join is broadcast (suffix table ~9k rows); the
    explode multiplies rows by <= max_suffix_labels before the
    per-host aggregation, whose key is the input row id — map-side
    combinable, no skew (every host emits the same row count).

    ``suffix_df`` schema: one string column named ``suffix``.

    Output: ``docs`` + ``out_col``. Requires a unique ``__rid`` -free
    input; the row id used internally is a monotonic physical id valid
    within this plan only.
    """
    rid = F.monotonically_increasing_id()
    base = docs.withColumn("_rid", rid)
    labels = F.split(F.col(host_col), r"\.")
    cands = base.select(
        "_rid",
        F.size(labels).alias("_n"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.lit(max_suffix_labels)),
                lambda k: F.array_join(F.slice(labels, -k, k), "."),
            )
        ).alias("_k0", "suffix"),
    ).withColumn("_k", F.col("_k0") + 1)
    hits = (
        cands.join(F.broadcast(suffix_df), "suffix")
        # a bare-suffix host (size == k) has nothing registered
        .filter(F.col("_n") > F.col("_k"))
        .groupBy("_rid")
        .agg(F.max(F.col("_k")).alias("_bestk"))
    )
    return (
        base.join(hits, "_rid", "left")
        .withColumn(
            out_col,
            F.when(
                F.col("_bestk").isNotNull(),
                F.array_join(
                    F.slice(
                        F.split(F.col(host_col), r"\."),
                        -(F.col("_bestk") + 1).cast("int"),
                        (F.col("_bestk") + 1).cast("int"),
                    ),
                    ".",
                ),
            ),
        )
        .drop("_rid", "_bestk")
    )
