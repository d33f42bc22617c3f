"""Multimodal columns: opaque ``binary`` media + typed metadata.

Images/audio/video are carried as binary columns; the Spark-side plumbing
(schemas, Arrow batch shapes, partitioning of large blobs) is real and
tested, while the codec-dependent decode steps are STUBBED behind
``NotImplementedError`` or a deterministic fake — the image/audio libraries
are not in this container; a real deployment drops PIL/ffmpeg calls into the
marked slots of the same mapInPandas kernels.

* ``sniff_media_type`` — magic-byte container detection, pure expressions.
* ``binary_meta``      — size/prefix/hash metadata, pure expressions.
* ``extract_features`` — mapInPandas feature extractor. ``mode='histogram'``
  computes a real, deterministic 16-bin byte histogram (np.frombuffer →
  bincount, no per-row Python beyond the list comprehension over blobs —
  blobs are variable-length so a ragged loop is inherent; the arithmetic is
  vectorized per blob). ``mode='decode'`` raises NotImplementedError with
  the integration instructions.
* ``frame_sample``     — deterministic byte-stride "frame" sampler standing
  in for video frame extraction; same batch shape as the real thing.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MAGIC = [
    ("89504e47", "png"),
    ("ffd8ff", "jpeg"),
    ("47494638", "gif"),
    ("52494646", "riff"),  # wav/avi/webp container
    ("664c6143", "flac"),
    ("494433", "mp3"),
    ("3c68746d6c", "html"),
    ("3c21646f63", "html"),
]


def sniff_media_type(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Adds ``media_type`` from magic bytes (hex-prefix match)."""
    prefix = F.lower(F.hex(F.substring(F.col(media_col), 1, 8)))
    expr = F.lit("unknown")
    for magic, name in reversed(_MAGIC):
        expr = F.when(prefix.startswith(magic.lower()), F.lit(name)).otherwise(expr)
    return df.withColumn("media_type", expr)


def binary_meta(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Adds size + md5 + hex prefix — the cheap metadata pass that runs
    before any decode at 100 TB (column-pruned: only the binary col read)."""
    return df.select(
        *df.columns,
        F.octet_length(media_col).alias("media_bytes"),
        F.md5(F.col(media_col)).alias("media_md5"),
        F.lower(F.hex(F.substring(F.col(media_col), 1, 4))).alias("magic_hex"),
    )


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)


def extract_features(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    mode: str = "histogram",
    bins: int = 16,
) -> DataFrame:
    """mapInPandas feature extraction over binary blobs.

    mode='histogram': L1-normalized byte histogram (deterministic, real).
    mode='decode':    the slot where PIL/torchvision/ffmpeg decode would go —
                      raises NotImplementedError in this container.
    """
    if mode not in ("histogram", "decode"):
        raise ValueError(f"unknown mode {mode!r}")

    src = df.select(F.col(id_col).alias("doc_id"), F.col(media_col).alias("media"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if mode == "decode":
            raise NotImplementedError(
                "media decode requires PIL/ffmpeg — not present in this "
                "container; drop the decoder here (input: bytes, output: "
                "float feature vector) and the surrounding Spark plumbing "
                "is unchanged"
            )
        for b in batches:
            feats = []
            for blob in b["media"]:
                arr = np.frombuffer(bytes(blob), dtype=np.uint8)
                hist = np.bincount(arr >> int(np.log2(256 // bins)), minlength=bins)
                total = max(int(hist.sum()), 1)
                feats.append((hist / total).astype(np.float32))
            yield pd.DataFrame(
                {"doc_id": b["doc_id"].astype("int64"), "feature": feats}
            )

    return src.mapInPandas(run, schema=_FEATURE_SCHEMA)


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_id", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ]
)


def frame_sample(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    n_frames: int = 4,
    frame_bytes: int = 64,
) -> DataFrame:
    """Deterministic evenly-spaced byte-window sampler — the batch shape and
    fan-out (1 row → n_frames rows) of real video frame sampling; swap the
    byte slicing for an ffmpeg keyframe extractor in production."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(media_col).alias("media"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, fids, frames = [], [], []
            for doc, blob in zip(b["doc_id"], b["media"]):
                raw = bytes(blob)
                if not raw:
                    continue
                stride = max(len(raw) // n_frames, 1)
                for i in range(min(n_frames, len(raw))):
                    start = i * stride
                    ids.append(doc)
                    fids.append(i)
                    frames.append(raw[start : start + frame_bytes])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_id": pd.Series(fids, dtype="int32"),
                    "frame": frames,
                }
            )

    return src.mapInPandas(run, schema=_FRAME_SCHEMA)
