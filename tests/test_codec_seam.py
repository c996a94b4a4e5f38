"""Real-codec swap seam contract (VERDICT r10 #4).

The decode kernels are honest-gated in this container (no Pillow /
soundfile / PyAV), so nothing previously pinned that a REAL-codec swap
preserves the downstream contract. These tests inject a fake "real"
decoder through the REAL_*_DECODER seam — a blob in a foreign container
format whose decoded content matches a FAK* blob byte-for-byte — and
assert every downstream operator (stats, fingerprints, dedup inputs)
produces IDENTICAL rows through both paths. A deployment swap is then a
one-function `set_real_*_decoder` call with a green test.

The injected decoders are defined INSIDE each test so cloudpickle ships
them by VALUE to the Python workers (a monkeypatched module attribute
would be invisible there — workers import the module fresh; the seam
captures the hook into the closure at plan-build time on the driver).
"""

from __future__ import annotations

import struct

import pytest

from kafka_denormalization_spark.functions import multimodal as M

# Foreign "container" the injected decoders understand: a fake real-world
# magic + the corresponding FAK* payload. The decoder must NOT rely on
# the FAK* parser's magic check — it strips its own header.
WAV_MAGIC = b"RIFF"
MP4_MAGIC = b"ftyp"
PNGX_MAGIC = b"\x89PNG"


def _rows(df, order_cols):
    return [tuple(r) for r in df.orderBy(*order_cols).collect()]


def test_audio_seam_preserves_downstream_contract(spark, monkeypatch):
    samples = M.fake_audio_samples(seed=3, gain=1)  # full fingerprint length
    faka = M.make_audio_blob(samples, sample_rate=16000)
    foreign = WAV_MAGIC + faka[4:]  # same rate/count/PCM, foreign magic

    def fake_real_audio(blob: bytes):
        import numpy as np

        assert blob[:4] == WAV_MAGIC
        rate, n = struct.unpack_from("<II", blob, 4)
        return rate, np.frombuffer(
            blob, dtype="<i2", count=n, offset=12
        ).astype("int64")

    native = spark.createDataFrame([(1, bytearray(faka))], "id long, blob binary")
    swapped = spark.createDataFrame(
        [(1, bytearray(foreign))], "id long, blob binary"
    )

    # without the hook the foreign container hits the honest gate
    with pytest.raises(Exception, match="soundfile|NotImplemented"):
        M.decode_audio_stats(swapped).collect()

    monkeypatch.setattr(M, "REAL_AUDIO_DECODER", fake_real_audio)
    for op, order in [
        (M.decode_audio_stats, ["id"]),
        (M.audio_fingerprint, ["id"]),
        (M.audio_segments, ["id", "segment_idx"]),
    ]:
        got_native = _rows(op(native), order)
        got_swapped = _rows(op(swapped), order)
        assert got_native == got_swapped, op.__name__


def test_video_seam_preserves_downstream_contract(spark, monkeypatch):
    w, h = M.VIDEO_W, M.VIDEO_H
    npx = w * h
    pixels = bytes(((i * 37) + 11) % 256 for i in range(npx * 70))
    fakv = M.make_video_blob(pixels, width=w, height=h, fps=M.VIDEO_FPS)
    foreign = MP4_MAGIC + fakv[4:]

    def fake_real_video(blob: bytes):
        import numpy as np

        assert blob[:4] == MP4_MAGIC
        vw, vh, n_frames, fps = struct.unpack_from("<IIII", blob, 4)
        px = np.frombuffer(
            blob, dtype="u1", count=n_frames * vw * vh, offset=20
        ).astype("int64")
        return vw, vh, fps, px.reshape(n_frames, vw * vh)

    native = spark.createDataFrame([(1, bytearray(fakv))], "id long, blob binary")
    swapped = spark.createDataFrame(
        [(1, bytearray(foreign))], "id long, blob binary"
    )

    with pytest.raises(Exception, match="PyAV|ffmpeg|NotImplemented"):
        M.decode_video_stats(swapped).collect()

    monkeypatch.setattr(M, "REAL_VIDEO_DECODER", fake_real_video)
    checks = [
        (lambda df: M.decode_video_stats(df), ["id"]),
        (lambda df: M.sample_video_frames(df, every_k=2), ["id", "frame_idx"]),
        (lambda df: M.video_fingerprint(df), ["id"]),
        (lambda df: M.video_scene_cuts(df), ["id"]),
        (lambda df: M.video_keyframe_hash(df), ["id"]),
    ]
    for op, order in checks:
        got_native = _rows(op(native), order)
        got_swapped = _rows(op(swapped), order)
        assert got_native == got_swapped


def test_image_seam_preserves_downstream_contract(spark, monkeypatch):
    w, h = 18, 16  # dHash-poolable (>= 9x8)
    fakb = M.make_fake_image(w, h, seed=5)
    foreign = PNGX_MAGIC + fakb[4:]

    def fake_real_image(blob: bytes):
        import numpy as np

        assert blob[:4] == PNGX_MAGIC
        iw, ih = struct.unpack("<II", blob[4:12])
        return (
            np.frombuffer(blob, dtype="u1", count=iw * ih, offset=12)
            .astype("int64")
            .reshape(ih, iw)
        )

    native = spark.createDataFrame([(1, bytearray(fakb))], "id long, blob binary")
    swapped = spark.createDataFrame(
        [(1, bytearray(foreign))], "id long, blob binary"
    )

    with pytest.raises(Exception, match="Pillow|NotImplemented"):
        M.decode_images(swapped).collect()

    monkeypatch.setattr(M, "REAL_IMAGE_DECODER", fake_real_image)
    dn = _rows(M.decode_images(native), ["id"])
    ds = _rows(M.decode_images(swapped), ["id"])
    # decoder label differs by design ('fake' vs 'injected'); the
    # numeric contract must match exactly
    assert [r[:4] for r in dn] == [r[:4] for r in ds]

    hn = _rows(M.image_dhash(native), ["id"])
    hs = _rows(M.image_dhash(swapped), ["id"])
    assert hn == hs


def test_image_seam_resize_path(spark, monkeypatch):
    """resize_images consumes the injected real decoder too: a
    foreign-container blob resizes to the same thumbnail bytes as its
    native FAKB twin."""
    w, h = 12, 8
    fakb = M.make_fake_image(w, h, seed=9)
    foreign = PNGX_MAGIC + fakb[4:]

    def fake_real_image(blob: bytes):
        import numpy as np

        assert blob[:4] == PNGX_MAGIC
        iw, ih = struct.unpack("<II", blob[4:12])
        return (
            np.frombuffer(blob, dtype="u1", count=iw * ih, offset=12)
            .astype("int64")
            .reshape(ih, iw)
        )

    native = spark.createDataFrame([(1, bytearray(fakb))], "id long, blob binary")
    swapped = spark.createDataFrame(
        [(1, bytearray(foreign))], "id long, blob binary"
    )
    with pytest.raises(Exception, match="Pillow|NotImplemented"):
        M.resize_images(swapped, out_w=6, out_h=4).collect()
    monkeypatch.setattr(M, "REAL_IMAGE_DECODER", fake_real_image)
    rn = _rows(M.resize_images(native, out_w=6, out_h=4), ["id"])
    rs = _rows(M.resize_images(swapped, out_w=6, out_h=4), ["id"])
    assert [(r[0], bytes(r[1]), r[2], r[3]) for r in rn] == [
        (r[0], bytes(r[1]), r[2], r[3]) for r in rs
    ]
