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
