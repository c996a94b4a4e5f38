"""Multimodal (image/audio/video) column plumbing — north-star extension.

Treats media as opaque ``binary`` columns with typed metadata, the standard
lakehouse pattern. The Spark side — schemas, batch iteration, partition
sizing, Arrow transfer — is real and tested; the actual codec calls are
stubbed behind import-tries (Pillow/librosa/av are not in this container)
with a deterministic fake format ("FAKB") so the pipeline is testable
end-to-end.

Scale notes (100 TB):
- metadata extraction (size/hash/magic sniff) is pure Catalyst — runs in the
  scan stage, no Python;
- decode/resize/frame-sample run via ``mapInPandas`` (Arrow batches, one
  Python worker per core); blobs never pass through a shuffle — partition
  by file, decode in place, emit compact features;
- ``spark.sql.files.maxPartitionBytes`` should be sized so one task's blobs
  fit executor memory; keep ``spark.sql.execution.arrow.maxRecordsPerBatch``
  low (e.g. 64) for multi-MB blobs to bound Arrow batch size.
"""

from __future__ import annotations

import struct as _struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# deterministic fake media container: b"FAKB" + u32 width + u32 height + pixels
FAKE_MAGIC = b"FAKB"

_MAGIC_SNIFFS = {
    "89504e47": "png",
    "ffd8ffe0": "jpeg",
    "ffd8ffe1": "jpeg",
    "47494638": "gif",
    "52494646": "riff",  # wav/avi
    "46414b42": "fakb",  # our test container
}


def blob_metadata(blob: Column | str) -> Column:
    """Typed metadata struct for a binary column — pure Catalyst (no Python):
    (n_bytes, sha256, format) with magic-byte format sniffing."""
    b = F.col(blob) if isinstance(blob, str) else blob
    magic = F.lower(F.hex(F.substring(b, 1, 4)))
    fmt = F.lit("unknown")
    for hexmagic, name in _MAGIC_SNIFFS.items():
        fmt = F.when(magic == hexmagic, name).otherwise(fmt)
    return F.struct(
        F.length(b).cast("long").alias("n_bytes"),
        F.sha2(b, 256).alias("sha256"),
        fmt.alias("format"),
    )


def make_fake_image(width: int, height: int, seed: int) -> bytes:
    """Deterministic fake image blob for tests/fixtures."""
    payload = bytes((seed + i) % 256 for i in range(width * height))
    return FAKE_MAGIC + _struct.pack("<II", width, height) + payload


def _decode_fake(blob: bytes) -> tuple[int, int, float]:
    """Parse the FAKB container -> (width, height, mean_pixel)."""
    if blob[:4] != FAKE_MAGIC:
        raise ValueError("not a FAKB blob")
    w, h = _struct.unpack("<II", blob[4:12])
    pixels = blob[12 : 12 + w * h]
    mean = sum(pixels) / len(pixels) if pixels else 0.0
    return w, h, mean


DECODE_OUTPUT_SCHEMA = (
    "id long, width int, height int, mean_pixel double, decoder string"
)


def decode_images(df: DataFrame, id_col: str = "id", blob_col: str = "blob") -> DataFrame:
    """Decode image blobs to features via mapInPandas (Arrow-batched).

    Real codecs (Pillow) are used when importable; the FAKB container always
    decodes; anything else raises NotImplementedError — a deliberate stub,
    the Spark-side plumbing is the deliverable here.
    """
    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            from PIL import Image  # noqa: F401
            import io

            def real_decode(b: bytes):
                img = Image.open(io.BytesIO(b))
                import numpy as np

                arr = np.asarray(img, dtype="float64")
                return img.width, img.height, float(arr.mean()), "pillow"
        except ImportError:
            real_decode = None

        for pdf in batches:
            out = []
            for rid, blob in zip(pdf[id_col], pdf[blob_col]):
                b = bytes(blob)
                if b[:4] == FAKE_MAGIC:
                    w, h, m = _decode_fake(b)
                    out.append((rid, w, h, m, "fake"))
                elif real_decode is not None:
                    w, h, m, d = real_decode(b)
                    out.append((rid, w, h, m, d))
                else:
                    raise NotImplementedError(
                        "real image decoding requires Pillow (not in this "
                        "container); only FAKB test blobs are decodable"
                    )
            yield pd.DataFrame(
                out, columns=["id", "width", "height", "mean_pixel", "decoder"]
            )

    return df.select(
        F.col(id_col).alias("id"), F.col(blob_col).alias("blob")
    ).mapInPandas(decode_batches, DECODE_OUTPUT_SCHEMA)


FRAME_OUTPUT_SCHEMA = "id long, frame_idx int, frame_blob binary"


def sample_frames(
    df: DataFrame, every_n: int = 10, id_col: str = "id", blob_col: str = "blob"
) -> DataFrame:
    """Frame-sample "video" blobs (1 row in -> N frames out) via mapInPandas.

    For FAKB blobs each row of pixels is treated as one frame; real video
    (PyAV/ffmpeg) is stubbed with NotImplementedError in this container.
    """
    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rid, blob in zip(pdf[id_col], pdf[blob_col]):
                b = bytes(blob)
                if b[:4] != FAKE_MAGIC:
                    raise NotImplementedError(
                        "real video demux requires PyAV/ffmpeg (not in this "
                        "container); only FAKB test blobs are supported"
                    )
                w, h = _struct.unpack("<II", b[4:12])
                pixels = b[12:]
                for fi in range(0, h, every_n):
                    out.append((rid, fi, pixels[fi * w : (fi + 1) * w]))
            yield pd.DataFrame(out, columns=["id", "frame_idx", "frame_blob"])

    return df.select(
        F.col(id_col).alias("id"), F.col(blob_col).alias("blob")
    ).mapInPandas(sample, FRAME_OUTPUT_SCHEMA)
