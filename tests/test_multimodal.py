"""Multimodal column plumbing (functions/multimodal.py)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from kafka_denormalization_spark.functions import multimodal as M


@pytest.fixture(scope="module")
def blobs(spark):
    rows = [
        (1, M.make_fake_image(4, 3, seed=0)),
        (2, M.make_fake_image(8, 2, seed=100)),
        (3, b"\x89PNG\r\n\x1a\nrest-of-a-png"),
    ]
    return spark.createDataFrame(rows, "id long, blob binary")


def test_blob_metadata_pure_catalyst(spark, blobs):
    out = blobs.select("id", M.blob_metadata("blob").alias("m")).collect()
    by_id = {r["id"]: r["m"] for r in out}
    assert by_id[1]["format"] == "fakb"
    assert by_id[3]["format"] == "png"
    raw = M.make_fake_image(4, 3, seed=0)
    assert by_id[1]["n_bytes"] == len(raw)
    assert by_id[1]["sha256"] == hashlib.sha256(raw).hexdigest()


def test_decode_images_fake_path(spark, blobs):
    out = M.decode_images(blobs.filter(F.col("id") < 3), "id", "blob").collect()
    by_id = {r["id"]: r for r in out}
    assert (by_id[1]["width"], by_id[1]["height"]) == (4, 3)
    assert (by_id[2]["width"], by_id[2]["height"]) == (8, 2)
    assert by_id[1]["decoder"] == "fake"
    # deterministic fake pixels: mean of (seed+i) % 256 over w*h
    px = [(0 + i) % 256 for i in range(12)]
    assert abs(by_id[1]["mean_pixel"] - sum(px) / len(px)) < 1e-12


def test_decode_unknown_format_raises_stub(spark, blobs):
    try:
        import PIL  # noqa: F401
        pytest.skip("Pillow present; stub path not reachable")
    except ImportError:
        pass
    with pytest.raises(Exception, match="NotImplementedError|Pillow"):
        M.decode_images(blobs.filter(F.col("id") == 3), "id", "blob").collect()


def test_sample_frames_one_to_many(spark, blobs):
    out = M.sample_frames(
        blobs.filter(F.col("id") == 1), every_n=1, id_col="id", blob_col="blob"
    ).collect()
    # 4x3 fake image -> 3 "frames" of 4 bytes
    assert len(out) == 3
    assert all(len(r["frame_blob"]) == 4 for r in out)
    assert [r["frame_idx"] for r in sorted(out, key=lambda r: r["frame_idx"])] == [0, 1, 2]


def test_decode_preserves_partitioning(spark, blobs):
    reparted = blobs.repartition(3)
    out = M.decode_images(reparted, "id", "blob")
    # mapInPandas is a narrow transformation: no shuffle added
    from kafka_denormalization_spark.plans import count_exchanges

    assert count_exchanges(out) <= 1  # only the explicit repartition round-robin


def test_image_dhash_known_grid(spark):
    """pool=1: the 9x8 grid IS the dHash grid, so bits are directly
    pixel(r,c) < pixel(r,c+1). A strictly increasing row sets all 8 of
    its bits; a constant row sets none."""
    import struct

    # rows 0..3 increasing (bits set), rows 4..7 constant (no bits)
    px = bytes(
        [c * 10 for c in range(9)] * 4 + [7] * 9 * 4
    )
    blob = M.FAKE_MAGIC + struct.pack("<II", 9, 8) + px
    df = spark.createDataFrame([(1, bytearray(blob))], "id long, blob binary")
    r = M.image_dhash(df, "id", "blob", pool=1).collect()[0]
    # bits 0..31 set (rows 0-3 = bands 0,1), bands 2,3 empty
    assert (r["b0"], r["b1"], r["b2"], r["b3"]) == (0xFFFF, 0xFFFF, 0, 0)


def test_phash_near_dup_pairs_brute_force_parity(spark):
    """LSH-banded candidate generation finds EXACTLY the all-pairs
    Hamming<=3 set (pigeonhole guarantee: <=3 flipped bits leave one
    16-bit band intact) — the minhash_lsh_dedup verify pattern."""
    import itertools
    import random

    import struct

    rng = random.Random(11)
    blobs = []
    base = [rng.randrange(256) for _ in range(36 * 32)]
    for i in range(30):
        px = list(base)
        # perturb i pixels: small i -> near-dups, large i -> distinct
        for k in rng.sample(range(len(px)), i * 5):
            px[k] = (px[k] + 97) % 256
        blobs.append(
            (i, bytearray(M.make_image_blob(36, 32, bytes(px))))
        )
    df = spark.createDataFrame(blobs, "id long, blob binary")
    sig = M.image_dhash(df, "id", "blob").collect()
    sigs = {r["id"]: (r["b0"], r["b1"], r["b2"], r["b3"]) for r in sig}
    expected = set()
    for a, b in itertools.combinations(sorted(sigs), 2):
        d = sum(
            bin(x ^ y).count("1") for x, y in zip(sigs[a], sigs[b])
        )
        if d <= 3:
            expected.add((a, b))
    got = {
        (r["id_a"], r["id_b"])
        for r in M.phash_near_dup_pairs(
            M.image_dhash(df, "id", "blob"), "id", hamming_max=3
        ).collect()
    }
    assert got == expected and expected  # non-trivial fixture


def test_image_phash_dedup_keeps_min_id(spark):
    """Identical images collapse to the smallest id; a distinct image
    survives untouched."""
    pxa = bytes((i * 37) % 256 for i in range(36 * 32))
    pxb = bytes((255 - (i * 11) % 256) for i in range(36 * 32))
    rows = [
        (1, bytearray(M.make_image_blob(36, 32, pxa))),
        (2, bytearray(M.make_image_blob(36, 32, pxa))),   # exact dup of 1
        (3, bytearray(M.make_image_blob(36, 32, pxb))),
    ]
    df = spark.createDataFrame(rows, "id long, blob binary")
    kept = sorted(
        r["id"] for r in M.image_phash_dedup(df, "id", "blob").collect()
    )
    assert kept == [1, 3]


def test_phash_hamming_max_guard():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="hamming_max"):
        M.phash_near_dup_pairs(None, "id", hamming_max=4)


def test_phash_hot_bucket_guard_structure(spark):
    """An offset-equivalent clique (brightness-shifted copies of one
    image share ONE dHash — the flat-field/exposure-bracket skew shape,
    762M-candidate incident in docs/SCALE_NOTES.md) plus organic
    near-dup families under max_bucket: the guard caps the quadratic
    bucket, organic (under-cap) buckets come through bit-identically,
    and the connected-component retention structure is unchanged —
    split pairs reconnect through other bands' sub-buckets."""
    import random

    from kafka_denormalization_spark.functions.graph import (
        connected_components,
    )

    rng = random.Random(7)
    base = [rng.randrange(150) for _ in range(36 * 32)]
    rows = []
    for i in range(40):  # offsets 0,4,...,96: strict inequalities kept
        px = bytes(p + (i % 25) * 4 for p in base)
        rows.append((i, bytearray(M.make_image_blob(36, 32, px))))
    pxo = bytes((255 - (i * 11) % 256) for i in range(36 * 32))
    rows += [
        (100, bytearray(M.make_image_blob(36, 32, pxo))),
        (101, bytearray(M.make_image_blob(36, 32, pxo))),  # organic dup
    ]
    df = spark.createDataFrame(rows, "id long, blob binary")
    sig = M.image_dhash(df, "id", "blob")

    def pairset(cap):
        return {
            (r["id_a"], r["id_b"])
            for r in M.phash_near_dup_pairs(sig, "id", 3, cap).collect()
        }

    def partition(pairs):
        edges = spark.createDataFrame(
            sorted(pairs), "id_a long, id_b long"
        )
        comps = {}
        for r in connected_components(
            edges, src="id_a", dst="id_b"
        ).collect():
            comps.setdefault(r["component"], set()).add(r["node"])
        return frozenset(frozenset(v) for v in comps.values())

    unguarded = pairset(None)
    guarded = pairset(8)
    assert guarded <= unguarded  # exact verify: no false positives
    assert (100, 101) in guarded  # under-cap bucket untouched
    # the 40-clique lost pairwise edges but not connectivity
    assert partition(guarded) == partition(unguarded)
    assert len(guarded) < len(unguarded)  # the guard actually cut work


def test_phash_guard_rejects_bad_cap():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_bucket"):
        M.phash_near_dup_pairs(None, "id", 3, max_bucket=1)
    with _pytest.raises(ValueError, match="max_bucket"):
        M.phash_near_dup_pairs(None, "id", 3, max_bucket="yes")


def test_phash_auto_guard_parity(spark, monkeypatch):
    """Default max_bucket='auto': benign corpora get the identical
    unguarded pair set; with the floor/ceil shrunk to fixture scale the
    auto guard on the offset-equivalent clique derives the clamped cap
    and matches the manual-cap pair set exactly."""
    import random

    import kafka_denormalization_spark.functions.similarity as S

    rng = random.Random(7)
    base = [rng.randrange(150) for _ in range(36 * 32)]
    rows = []
    for i in range(40):
        px = bytes(p + (i % 25) * 4 for p in base)
        rows.append((i, bytearray(M.make_image_blob(36, 32, px))))
    pxo = bytes((255 - (i * 11) % 256) for i in range(36 * 32))
    rows += [
        (100, bytearray(M.make_image_blob(36, 32, pxo))),
        (101, bytearray(M.make_image_blob(36, 32, pxo))),
    ]
    df = spark.createDataFrame(rows, "id long, blob binary")
    sig = M.image_dhash(df, "id", "blob")

    def pairset(cap):
        return {
            (r["id_a"], r["id_b"])
            for r in M.phash_near_dup_pairs(sig, "id", 3, cap).collect()
        }

    # fixture widths (<= 40) are far below the real 4096 floor: the
    # default auto guard must be output-identical to unguarded
    assert pairset("auto") == pairset(None)

    # shrink the policy constants so the 40-wide clique is "hot"
    monkeypatch.setattr(S, "AUTO_BUCKET_FLOOR", 4)
    monkeypatch.setattr(S, "AUTO_BUCKET_CEIL", 8)
    assert pairset("auto") == pairset(8)


def test_image_dhash_arbitrary_size(spark):
    """Real corpora decode to arbitrary WxH: a 13x11 grid (no 9k x 8k
    structure) hashes via the exact integral-image area pooling —
    verified against an independent plain-Python pooling of the same
    grid (cell (r,c) = sum over rows [r*H//8,(r+1)*H//8) x cols
    [c*W//9,(c+1)*W//9) // area), and a 36x32 image hashes identically
    to the legacy strict block-mean path (pool=4). Pooling runs on the
    DECODED grid, so the container (FAKB here, PNG below when Pillow
    exists) is irrelevant to the arithmetic under test."""
    import random

    rng = random.Random(3)
    w, h = 13, 11
    px = [rng.randrange(256) for _ in range(w * h)]
    blob = M.make_image_blob(w, h, bytes(px))
    df = spark.createDataFrame(
        [(1, bytearray(blob))], "id long, blob binary"
    )
    r = M.image_dhash(df, "id", "blob").collect()[0]

    # independent hand computation
    grid = [px[i * w : (i + 1) * w] for i in range(h)]
    rb = [(q * h) // 8 for q in range(9)]
    cb = [(q * w) // 9 for q in range(10)]
    pooled = [
        [
            sum(
                grid[y][x]
                for y in range(rb[i], rb[i + 1])
                for x in range(cb[j], cb[j + 1])
            )
            // ((rb[i + 1] - rb[i]) * (cb[j + 1] - cb[j]))
            for j in range(9)
        ]
        for i in range(8)
    ]
    bands = [0, 0, 0, 0]
    for i in range(8):
        for j in range(8):
            if pooled[i][j] < pooled[i][j + 1]:
                k = i * 8 + j
                bands[k // 16] |= 1 << (k % 16)
    assert (r["b0"], r["b1"], r["b2"], r["b3"]) == tuple(bands)

    # multiple-size grids: generic pooling == legacy strict pooling
    px2 = bytes((i * 37) % 256 for i in range(36 * 32))
    df2 = spark.createDataFrame(
        [(1, bytearray(M.make_image_blob(36, 32, px2)))],
        "id long, blob binary",
    )
    generic = M.image_dhash(df2, "id", "blob").collect()[0]
    strict = M.image_dhash(df2, "id", "blob", pool=4).collect()[0]
    assert tuple(generic) == tuple(strict)


def test_image_dhash_arbitrary_size_png_roundtrip(spark):
    """Same pooling through a real Pillow PNG decode (lossless, so the
    grid — and therefore the hash — must equal the FAKB path bit for
    bit). Skipped where Pillow is absent; the arithmetic itself is
    covered container-independently above."""
    import random

    pytest.importorskip("PIL")

    rng = random.Random(3)
    w, h = 13, 11
    px = bytes(rng.randrange(256) for _ in range(w * h))
    rows = [
        (1, bytearray(M.make_png_image(w, h, px))),
        (2, bytearray(M.make_image_blob(w, h, px))),
    ]
    df = spark.createDataFrame(rows, "id long, blob binary")
    out = {r["id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
           for r in M.image_dhash(df, "id", "blob").collect()}
    assert out[1] == out[2]


# -- audio family ------------------------------------------------------------

from kafka_denormalization_spark.functions.multimodal import (  # noqa: E402
    audio_fingerprint,
    audio_fp_dedup,
    decode_audio_stats,
    fake_audio_samples,
    make_audio_blob,
    _decode_audio,
)


def test_audio_codec_roundtrip():
    samples = fake_audio_samples(seed=5, gain=2, n=256)
    rate, got = _decode_audio(make_audio_blob(samples, sample_rate=8000))
    assert rate == 8000
    assert list(got) == samples


def test_fake_blob_vectorized_identity():
    """The NumPy fixture-blob builders (r12 optimization) are
    bit-identical to the per-row loop builders across the full
    (seed, gain) domain the declared queries draw from, including the
    q_audio_segments dropout variant."""
    from kafka_denormalization_spark.functions.multimodal import (
        AUDIO_FRAME_LEN,
        fake_audio_blob,
        fake_video_blob,
        fake_video_pixels,
        make_video_blob,
    )

    for seed in range(0, 97, 7):
        for gain in (1, 2, 3):
            assert fake_audio_blob(seed, gain) == make_audio_blob(
                fake_audio_samples(seed, gain)
            )
            s = fake_audio_samples(seed, gain)
            lo, hi = 20 * AUDIO_FRAME_LEN, 30 * AUDIO_FRAME_LEN
            s[lo:hi] = [0] * (hi - lo)
            assert fake_audio_blob(
                seed, gain, zero_frames=(20, 30)
            ) == make_audio_blob(s)
    for seed in range(0, 89, 7):
        for gain in (1, 2, 3):
            assert fake_video_blob(seed, gain) == make_video_blob(
                fake_video_pixels(seed, gain)
            )


def test_audio_real_codec_honest_gate():
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        _decode_audio(b"RIFF" + b"\x00" * 64)  # a real WAV header


def test_audio_stats_hand_computed(spark):
    samples = [3, -4, 0, 5]
    blob = make_audio_blob(samples, sample_rate=1000)
    df = spark.createDataFrame([(1, bytearray(blob))], "id long, blob binary")
    r = decode_audio_stats(df).collect()[0]
    assert r["n_samples"] == 4
    assert r["sample_rate"] == 1000
    assert r["duration_ms"] == 4  # 4 * 1000 // 1000
    assert r["peak"] == 5
    assert r["energy"] == 9 + 16 + 0 + 25


def test_audio_fingerprint_amplitude_invariant(spark):
    rows = [
        (1, bytearray(make_audio_blob(fake_audio_samples(7, gain=1)))),
        (2, bytearray(make_audio_blob(fake_audio_samples(7, gain=3)))),
        (3, bytearray(make_audio_blob(fake_audio_samples(8, gain=1)))),
    ]
    df = spark.createDataFrame(rows, "id long, blob binary")
    fp = {r["id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
          for r in audio_fingerprint(df).collect()}
    assert fp[1] == fp[2]  # re-leveled copy collapses
    assert fp[1] != fp[3]  # different recording does not


def test_audio_fingerprint_short_blob_clear_error(spark):
    """ADVICE r07 #4 regression: a blob with fewer than
    AUDIO_FRAME_LEN*AUDIO_N_FRAMES samples used to die with an opaque
    numpy reshape ValueError inside the executor; now the fingerprint
    path raises a clear, id-naming error (decode_audio_stats remains
    the any-length path)."""
    short = make_audio_blob(fake_audio_samples(3, n=100))
    df = spark.createDataFrame([(42, bytearray(short))], "id long, blob binary")
    with pytest.raises(Exception) as ei:
        audio_fingerprint(df).collect()
    assert "audio_fingerprint: blob id=42 has 100 samples" in str(ei.value)
    # the any-length stats path still accepts the same blob
    r = decode_audio_stats(df).collect()[0]
    assert r["n_samples"] == 100


def test_audio_fp_dedup_keeps_min_id_per_family(spark):
    rows = [
        (10, bytearray(make_audio_blob(fake_audio_samples(1, gain=1)))),
        (11, bytearray(make_audio_blob(fake_audio_samples(1, gain=2)))),
        (12, bytearray(make_audio_blob(fake_audio_samples(1, gain=3)))),
        (20, bytearray(make_audio_blob(fake_audio_samples(2, gain=1)))),
        (21, bytearray(make_audio_blob(fake_audio_samples(2, gain=2)))),
        (30, bytearray(make_audio_blob(fake_audio_samples(3, gain=1)))),
    ]
    df = spark.createDataFrame(rows, "id long, blob binary")
    kept = sorted(r["id"] for r in audio_fp_dedup(df).collect())
    assert kept == [10, 20, 30]


# -- cross-modal paired dedup -------------------------------------------------


def test_paired_near_dup_audit_classes(spark):
    """Planted image-text pairs exercising every dup_class: (1,2) dup in
    BOTH modalities, (3,4) same image / unrelated captions
    (image_only), (5,6) same caption / unrelated images (caption_only,
    the asymmetric boilerplate-alt-text audit), 7 a singleton that must
    not appear at all."""
    import random

    rng = random.Random(3)
    img_a = bytes(rng.randrange(256) for _ in range(36 * 32))
    img_b = bytes(rng.randrange(256) for _ in range(36 * 32))
    img_c = bytes(rng.randrange(256) for _ in range(36 * 32))
    img_d = bytes(rng.randrange(256) for _ in range(36 * 32))
    cap_x = "a photo of a red fox jumping over the lazy dog"
    cap_y = "stock image of corporate teamwork synergy meeting room"
    cap_z = " ".join(f"u{i}" for i in range(10))
    cap_w = " ".join(f"v{i}" for i in range(10))
    rows = [
        (1, bytearray(M.make_image_blob(36, 32, img_a)), cap_x),
        (2, bytearray(M.make_image_blob(36, 32, img_a)), cap_x + " outdoors"),
        (3, bytearray(M.make_image_blob(36, 32, img_b)), cap_z),
        (4, bytearray(M.make_image_blob(36, 32, img_b)), cap_w),
        (5, bytearray(M.make_image_blob(36, 32, img_c)), cap_y),
        (6, bytearray(M.make_image_blob(36, 32, img_d)), cap_y),
        (7, bytearray(M.make_image_blob(36, 32, bytes(reversed(img_a)))),
         " ".join(f"s{i}" for i in range(10))),
    ]
    df = spark.createDataFrame(rows, "id long, blob binary, caption string")
    out = {
        (r["id_a"], r["id_b"]): r
        for r in M.paired_near_dup_audit(df, "id", "blob", "caption").collect()
    }
    assert out[(1, 2)]["dup_class"] == "both"
    assert out[(1, 2)]["hamming"] <= 3
    assert out[(1, 2)]["jaccard_r"] >= 0.5
    assert out[(3, 4)]["dup_class"] == "image_only"
    assert out[(3, 4)]["hamming"] == 0
    assert out[(3, 4)]["jaccard_r"] == 0.0  # exact fill, disjoint grams
    assert out[(5, 6)]["dup_class"] == "caption_only"
    assert out[(5, 6)]["jaccard_r"] == 1.0
    assert out[(5, 6)]["hamming"] > 3  # exact fill from the signatures
    assert not any(7 in k for k in out)
    assert set(out) == {(1, 2), (3, 4), (5, 6)}


def test_paired_near_dup_audit_short_caption_jaccard_zero(spark):
    """Captions shorter than the gram width carry no grams: an
    image-dup pair of such docs lands in image_only with jaccard 0.0
    (not a crash, not a dropped pair)."""
    px = bytes((i * 7) % 256 for i in range(36 * 32))
    rows = [
        (1, bytearray(M.make_image_blob(36, 32, px)), "hi"),
        (2, bytearray(M.make_image_blob(36, 32, px)), "yo"),
    ]
    df = spark.createDataFrame(rows, "id long, blob binary, caption string")
    r = M.paired_near_dup_audit(df, "id", "blob", "caption").collect()
    assert len(r) == 1
    assert r[0]["dup_class"] == "image_only"
    assert r[0]["jaccard_r"] == 0.0 and r[0]["hamming"] == 0


# -- video family -------------------------------------------------------------

from kafka_denormalization_spark.functions.multimodal import (  # noqa: E402
    VIDEO_N_FRAMES,
    VIDEO_W,
    _decode_video,
    decode_video_stats,
    fake_video_pixels,
    make_video_blob,
    sample_video_frames,
    video_fingerprint,
    video_fp_dedup,
)


def test_video_codec_roundtrip():
    px = fake_video_pixels(seed=5, gain=2)
    w, h, fps, fr = _decode_video(make_video_blob(px))
    assert (w, h, fps) == (8, 8, 10)
    assert fr.shape == (VIDEO_N_FRAMES, VIDEO_W * 8)
    assert list(fr.flatten()) == px


def test_video_real_codec_honest_gate():
    with pytest.raises(NotImplementedError):
        # an mp4 ftyp box header — a real container must gate, not garble
        _decode_video(b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 64)


def test_video_stats_hand_computed(spark):
    # 1 frame of 64 pixels: 0..63 -> peak 63, total 2016 (64*63/2)
    blob = make_video_blob(list(range(64)), fps=5)
    df = spark.createDataFrame([(1, bytearray(blob))], "id long, blob binary")
    r = decode_video_stats(df).collect()[0]
    assert r["n_frames"] == 1
    assert (r["width"], r["height"], r["fps"]) == (8, 8, 5)
    assert r["duration_ms"] == 200  # 1 * 1000 // 5
    assert r["peak_luma"] == 63
    assert r["luma_total"] == 64 * 63 // 2


def test_video_frame_sample_one_to_many(spark):
    blob = make_video_blob(fake_video_pixels(seed=3))
    df = spark.createDataFrame([(7, bytearray(blob))], "id long, blob binary")
    rows = sample_video_frames(df, every_k=8).collect()
    # frames 0, 8, ..., 64 -> 9 sampled rows, exact integer luma sums
    assert [r["frame_idx"] for r in sorted(rows, key=lambda r: r["frame_idx"])] == list(range(0, 65, 8))
    _, _, _, fr = _decode_video(blob)
    by_f = {r["frame_idx"]: r for r in rows}
    for f in range(0, 65, 8):
        assert by_f[f]["luma_sum"] == int(fr[f].sum())
        assert by_f[f]["peak_luma"] == int(fr[f].max())


def test_video_fingerprint_gain_invariant(spark):
    rows = [
        (1, bytearray(make_video_blob(fake_video_pixels(7, gain=1)))),
        (2, bytearray(make_video_blob(fake_video_pixels(7, gain=3)))),
        (3, bytearray(make_video_blob(fake_video_pixels(8, gain=1)))),
    ]
    df = spark.createDataFrame(rows, "id long, blob binary")
    fp = {r["id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
          for r in video_fingerprint(df).collect()}
    assert fp[1] == fp[2]  # brightness re-grade collapses
    assert fp[1] != fp[3]  # different clip does not


def test_video_fingerprint_short_clip_clear_error(spark):
    short = make_video_blob(fake_video_pixels(3, n_frames=10))
    df = spark.createDataFrame([(42, bytearray(short))], "id long, blob binary")
    with pytest.raises(Exception) as ei:
        video_fingerprint(df).collect()
    assert "video_fingerprint: blob id=42 has 10 frames" in str(ei.value)
    # the any-length stats path still accepts the same blob
    r = decode_video_stats(df).collect()[0]
    assert r["n_frames"] == 10


def test_video_fp_dedup_keeps_min_id_per_family(spark):
    rows = [
        (10, bytearray(make_video_blob(fake_video_pixels(1, gain=1)))),
        (11, bytearray(make_video_blob(fake_video_pixels(1, gain=2)))),
        (12, bytearray(make_video_blob(fake_video_pixels(1, gain=3)))),
        (20, bytearray(make_video_blob(fake_video_pixels(2, gain=1)))),
        (21, bytearray(make_video_blob(fake_video_pixels(2, gain=2)))),
        (30, bytearray(make_video_blob(fake_video_pixels(3, gain=1)))),
    ]
    df = spark.createDataFrame(rows, "id long, blob binary")
    kept = sorted(r["id"] for r in video_fp_dedup(df).collect())
    assert kept == [10, 20, 30]


def test_video_scene_cuts_hand_computed(spark):
    """Hand-built energy staircase: frames with pixel value v have
    energy 64*v^2; +-30% integer cross-multiplication cuts exactly
    where planted. Pixels: 3 frames at 10, 2 at 20 (jump up -> cut at
    f=3), 1 back at 10 (drop -> cut at f=5)."""
    px = [10] * 64 * 3 + [20] * 64 * 2 + [10] * 64
    blob = make_video_blob(px)
    df = spark.createDataFrame([(1, bytearray(blob))], "id long, blob binary")
    rows = sorted(
        (r["scene_idx"], r["start_frame"], r["n_frames"], r["energy_first"])
        for r in __import__(
            "kafka_denormalization_spark.functions.multimodal",
            fromlist=["video_scene_cuts"],
        ).video_scene_cuts(df).collect()
    )
    assert rows == [
        (0, 0, 3, 64 * 100),
        (1, 3, 2, 64 * 400),
        (2, 5, 1, 64 * 100),
    ]


def test_video_scene_cuts_black_frames_stable(spark):
    """A zero-energy run stays ONE scene (0 > k*0 is false)."""
    px = [0] * 64 * 4
    df = spark.createDataFrame(
        [(2, bytearray(make_video_blob(px)))], "id long, blob binary"
    )
    from kafka_denormalization_spark.functions.multimodal import (
        video_scene_cuts,
    )

    rows = video_scene_cuts(df).collect()
    assert len(rows) == 1 and rows[0]["n_frames"] == 4


def test_video_keyframe_hash_staircase(spark):
    """Keyframes = scene starts; khash = 56 horizontal-gradient bits of
    the start frame. One planted cut (pixel value 10 -> 20 at frame 2);
    frames are flat fields, so every khash is 0 — the assertion is the
    scene/keyframe STRUCTURE plus a non-flat second doc whose gradient
    bits are hand-checked."""
    from kafka_denormalization_spark.functions.multimodal import (
        video_keyframe_hash,
    )

    flat = [10] * 64 * 2 + [20] * 64
    # doc 2: one frame, row pattern 0,1,2,...,7 repeated -> every
    # horizontal gradient rises -> all 56 bits set
    ramp = list(range(8)) * 8
    df = spark.createDataFrame(
        [(1, bytearray(make_video_blob(flat))),
         (2, bytearray(make_video_blob(ramp)))],
        "id long, blob binary",
    )
    rows = {(r["id"], r["scene_idx"]): r for r in video_keyframe_hash(df).collect()}
    assert rows[(1, 0)]["frame_idx"] == 0 and rows[(1, 0)]["khash"] == 0
    assert rows[(1, 1)]["frame_idx"] == 2 and rows[(1, 1)]["khash"] == 0
    assert rows[(2, 0)]["khash"] == (1 << 56) - 1


def test_audio_segments_planted_dropout(spark):
    """A mid-recording zeroed run splits the recording into
    active / silent / active with exact frame bounds."""
    from kafka_denormalization_spark.functions.multimodal import (
        AUDIO_FRAME_LEN,
        audio_segments,
        fake_audio_samples,
        make_audio_blob,
    )

    samples = fake_audio_samples(5)
    lo, hi = 20 * AUDIO_FRAME_LEN, 30 * AUDIO_FRAME_LEN
    samples[lo:hi] = [0] * (hi - lo)
    df = spark.createDataFrame(
        [(1, bytearray(make_audio_blob(samples)))], "id long, blob binary"
    )
    segs = sorted(
        (r["segment_idx"], r["start_frame"], r["n_frames"], r["active"])
        for r in audio_segments(df).collect()
    )
    assert segs == [(0, 0, 20, True), (1, 20, 10, False), (2, 30, 35, True)]


def test_resize_images_exact_block_means(spark):
    """Exact-multiple geometry: every output pixel is precisely its
    source block's integer mean (hand-replayed with numpy)."""
    import numpy as np

    from kafka_denormalization_spark.functions.multimodal import (
        make_image_blob,
        resize_images,
    )

    w, h, ow, oh = 12, 8, 6, 4
    px = bytes((i * 17 + 3) % 256 for i in range(w * h))
    df = spark.createDataFrame(
        [(1, bytearray(make_image_blob(w, h, px)))], "id long, blob binary"
    )
    out = resize_images(df, out_w=ow, out_h=oh).collect()[0]
    assert (out["width"], out["height"]) == (ow, oh)
    got = np.frombuffer(bytes(out["blob"])[12:], dtype="uint8").reshape(oh, ow)
    g = np.frombuffer(px, dtype="uint8").astype("int64").reshape(h, w)
    want = g.reshape(oh, 2, ow, 2).sum(axis=(1, 3)) // 4
    assert (got == want).all()


def test_resize_images_div_grid_non_multiple(spark):
    """Non-multiple geometry: DIV-grid boundaries (the dHash pooling
    generalized) — block (r, c) covers rows [r*h DIV oh, (r+1)*h DIV oh)
    x cols [c*w DIV ow, ...), value = block sum DIV area."""
    import numpy as np

    from kafka_denormalization_spark.functions.multimodal import (
        make_image_blob,
        resize_images,
    )

    w, h, ow, oh = 7, 5, 3, 2
    px = bytes((i * 29 + 11) % 256 for i in range(w * h))
    df = spark.createDataFrame(
        [(1, bytearray(make_image_blob(w, h, px)))], "id long, blob binary"
    )
    out = resize_images(df, out_w=ow, out_h=oh).collect()[0]
    got = np.frombuffer(bytes(out["blob"])[12:], dtype="uint8").reshape(oh, ow)
    g = np.frombuffer(px, dtype="uint8").astype("int64").reshape(h, w)
    want = np.zeros((oh, ow), dtype="int64")
    for r in range(oh):
        for c in range(ow):
            r0, r1 = (r * h) // oh, ((r + 1) * h) // oh
            c0, c1 = (c * w) // ow, ((c + 1) * w) // ow
            blk = g[r0:r1, c0:c1]
            want[r, c] = blk.sum() // blk.size
    assert (got == want).all()


def test_resize_images_upscale_raises(spark):
    import pytest as _pytest

    from kafka_denormalization_spark.functions.multimodal import (
        make_fake_image,
        resize_images,
    )

    df = spark.createDataFrame(
        [(1, bytearray(make_fake_image(4, 4, seed=1)))], "id long, blob binary"
    )
    with _pytest.raises(Exception, match="UPSCALE"):
        resize_images(df, out_w=8, out_h=8).collect()


def test_video_keyframe_dedup_exposes_cache_handles(spark):
    """ADVICE r11 #1: video_keyframe_dedup must propagate its internal
    persisted frames (the decoded keyframe-hash table + _sig_keep_min's
    reps/guard caches) on the returned frame so callers can release
    executor storage, and persist=False must pin nothing."""
    from kafka_denormalization_spark.checkpoint import unpersist_if_owned
    from kafka_denormalization_spark.functions.multimodal import (
        fake_video_pixels,
        make_video_blob,
        video_keyframe_dedup,
    )

    def blob(seed, gain=1):
        return bytearray(make_video_blob(fake_video_pixels(seed, gain)))

    df = spark.createDataFrame(
        [(1, blob(1)), (2, blob(1, gain=3)), (3, blob(2))],
        "id long, blob binary",
    )
    out = video_keyframe_dedup(df)
    rows = sorted((r["id"], r["scene_idx"]) for r in out.collect())
    caches = getattr(out, "_sg_internal_caches", None)
    assert caches, "no cache handles exposed on the returned frame"
    assert out._sg_internal_cache is caches[0]

    def _cached(f) -> bool:
        lvl = f.storageLevel
        return lvl.useMemory or lvl.useDisk or lvl.useOffHeap

    assert any(_cached(f) for f in caches)
    for f in caches:
        unpersist_if_owned(f)
    assert not any(_cached(f) for f in caches), (
        "unpersist_if_owned left an internal cache pinned"
    )

    # persist=False: identical survivors, no handles, nothing cached
    out2 = video_keyframe_dedup(df, persist=False)
    assert sorted((r["id"], r["scene_idx"]) for r in out2.collect()) == rows
    assert not getattr(out2, "_sg_internal_caches", [])


def test_dhash_invariant_under_exact_resize(spark):
    """The q_multimodal_to_shards equivalence argument: DIV-grid area
    pooling composes exactly when the intermediate geometry divides the
    source, so dhash(resize(img, 9, 8)) == dhash(img) bit-for-bit for
    the 36x32 fixture (exact 4x4 blocks; dHash's internal pooling over
    an already-9x8 grid is the identity). This is what lets the
    composed lane ride the memoized full-resolution audit."""
    from kafka_denormalization_spark.functions.multimodal import (
        image_dhash,
        make_image_blob,
        resize_images,
    )

    w, h = 36, 32
    rows = [
        (
            i,
            make_image_blob(
                w,
                h,
                bytes(
                    ((i * 31 + r * 7 + c * 13) % 256)
                    for r in range(h)
                    for c in range(w)
                ),
            ),
        )
        for i in range(8)
    ]
    df = spark.createDataFrame(rows, "id long, blob binary")
    def sigs(frame):
        return {
            r["id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
            for r in image_dhash(frame).collect()
        }

    direct = sigs(df)
    via_resize = sigs(resize_images(df, "id", "blob", out_w=9, out_h=8))
    assert direct == via_resize


def test_png_image_lane_matches_fakb_end_to_end(spark):
    """VERDICT r11 #5: the WHOLE image lane — resize -> dHash ->
    near-dedup retention — over a REAL PNG corpus must equal the FAKB
    corpus carrying the identical pixel grids: same surviving ids, same
    signatures, and the PNG-decoded resize emits byte-identical FAKB
    thumbnails. Extends the dHash-only PNG roundtrip above to
    resize_images and image_phash_dedup, so the real-codec seam is
    contract-tested for every batch image operator. Container-honest
    without Pillow: the PNGs are spec-conformant (stdlib zlib encoder)
    and decoded through set_real_image_decoder — the deployment swap
    path — falling back to Pillow's own decode where it exists."""
    import random

    def _encode_png_gray8(w: int, h: int, px: bytes) -> bytes:
        # A REAL grayscale-8 PNG from stdlib zlib alone (filter 0 per
        # scanline) — spec-conformant (any viewer opens it), so this
        # test runs even in containers without Pillow.
        import struct
        import zlib

        def chunk(typ: bytes, data: bytes) -> bytes:
            c = typ + data
            return (
                struct.pack(">I", len(data))
                + c
                + struct.pack(">I", zlib.crc32(c) & 0xFFFFFFFF)
            )

        ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
        raw = b"".join(b"\x00" + px[y * w : (y + 1) * w] for y in range(h))
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )

    def _decode_png_gray8(b: bytes):
        # Minimal spec-path PNG decode (stdlib only): walk the chunk
        # stream, inflate IDAT, undo per-scanline filters 0-2. Plays
        # the "real third-party decoder" role through
        # set_real_image_decoder; defined INSIDE the test so
        # cloudpickle ships it by value into the scan-stage workers —
        # the deployment seam a Pillow/libpng swap uses.
        import struct
        import zlib

        import numpy as np

        assert b[:8] == b"\x89PNG\r\n\x1a\n"
        pos, idat, w = 8, b"", None
        while pos < len(b):
            (ln,) = struct.unpack(">I", b[pos : pos + 4])
            typ = b[pos + 4 : pos + 8]
            data = b[pos + 8 : pos + 8 + ln]
            if typ == b"IHDR":
                w, h, depth, color = struct.unpack(">IIBB", data[:10])
                assert (depth, color) == (8, 0), "test decoder: gray8 only"
            elif typ == b"IDAT":
                idat += data
            pos += 12 + ln
        raw = zlib.decompress(idat)
        out = np.zeros((h, w), dtype="int64")
        stride = w + 1
        for y in range(h):
            line = raw[y * stride : (y + 1) * stride]
            f = line[0]
            vals = np.frombuffer(line[1:], dtype="uint8").astype("int64")
            if f == 0:
                row = vals
            elif f == 1:  # Sub
                row = np.cumsum(vals) % 256
            elif f == 2:  # Up
                row = (vals + out[y - 1]) % 256 if y else vals
            else:
                raise NotImplementedError(f"test decoder: filter {f}")
            out[y] = row
        return out

    rng = random.Random(12)
    w, h = 36, 32

    def grid(seed, flip=False):
        g = bytearray((seed * 31 + k * 7) % 256 for k in range(w * h))
        if flip:
            g[0] = (g[0] + 128) % 256
        return bytes(g)

    grids = {
        1: grid(1),
        2: grid(2),
        3: grid(1, flip=True),   # near-dup of 1
        4: bytes(rng.randrange(256) for _ in range(w * h)),
    }
    png = spark.createDataFrame(
        [
            (i, bytearray(_encode_png_gray8(w, h, g)))
            for i, g in grids.items()
        ],
        "id long, blob binary",
    )
    fakb = spark.createDataFrame(
        [(i, bytearray(M.make_image_blob(w, h, g))) for i, g in grids.items()],
        "id long, blob binary",
    )

    def lane(df):
        resized = M.resize_images(df, "id", "blob", 9, 8)
        thumbs = {r["id"]: bytes(r["blob"]) for r in resized.collect()}
        surv = {
            r["id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
            for r in M.image_phash_dedup(
                resized, "id", "blob", hamming_max=3
            ).collect()
        }
        return thumbs, surv

    try:
        import PIL  # noqa: F401 — Pillow decodes the PNGs natively
    except ImportError:
        M.set_real_image_decoder(_decode_png_gray8)
    try:
        png_thumbs, png_surv = lane(png)
    finally:
        M.set_real_image_decoder(None)
    fakb_thumbs, fakb_surv = lane(fakb)
    assert png_thumbs == fakb_thumbs, (
        "PNG-decoded resize diverged from the FAKB grid"
    )
    assert png_surv == fakb_surv
    assert set(png_surv) and 3 not in png_surv, (
        "fixture should drop the near-dup id 3"
    )
    # sanity on the fixture's own decoder: round-trip recovers the grid
    import numpy as np

    rt = _decode_png_gray8(_encode_png_gray8(w, h, grids[4]))
    assert rt.shape == (h, w)
    assert bytes(rt.astype("uint8").reshape(-1)) == grids[4]
