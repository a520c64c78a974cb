"""Multimodal (image/audio/video) column operators — Spark plumbing.

Training-data pipelines at 100 TB carry media as opaque ``binary`` columns
with typed metadata. This module makes the SPARK side real — schemas,
partitioning, Arrow batch shapes, mapInPandas signatures, byte budgets —
while the codec step is a clearly-marked seam: the container has no
image/audio libraries, so decode is either a deterministic fake (tests)
or raises NotImplementedError (production marker). Swapping in a real
codec (PIL/libav) changes ONE function per modality and nothing upstream.

Operators:
* :func:`sniff_media_type`     — magic-byte detection, pure column exprs
* :func:`media_metadata`       — size/fingerprint/type struct per blob
* :func:`decode_image_features`— mapInPandas -> fixed-dim feature vectors
* :func:`resize_images`        — mapInPandas binary->binary transform
* :func:`sample_video_frames`  — mapInPandas 1->N frame explosion
All mapInPandas stages cap Arrow batch bytes via ``maxRecordsPerBatch``
guidance and never collect blobs to the driver.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

# magic prefixes -> media type (public file signatures)
_MAGIC = [
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"GIF8", "image/gif"),
    (b"RIFF", "audio/wav-or-avi"),
    (b"ID3", "audio/mp3"),
    (b"\x1a\x45\xdf\xa3", "video/webm"),
    (b"\x00\x00\x00", "video/mp4-ish"),
]


def sniff_media_type(col: str = "blob"):
    """Magic-byte sniffing as a pure column expression (JVM-side)."""
    expr = F.lit("application/octet-stream")
    for magic, mtype in reversed(_MAGIC):
        hexs = magic.hex()
        expr = F.when(
            F.lower(F.hex(F.substring(F.col(col), 1, len(magic)))) == hexs,
            F.lit(mtype),
        ).otherwise(expr)
    return expr


def media_metadata(df: DataFrame, col: str = "blob") -> DataFrame:
    """Typed metadata columns: byte size, md5 fingerprint, sniffed type."""
    return (
        df.withColumn("media_bytes", F.length(F.col(col)).cast("bigint"))
        .withColumn("media_md5", F.md5(F.col(col)))
        .withColumn("media_type", sniff_media_type(col))
    )


# ---------------------------------------------------------------------------
# codec seam — swap these for real codecs; everything else is unchanged
# ---------------------------------------------------------------------------

def _decode_image_stub(blob: bytes, dim: int) -> np.ndarray:
    """Deterministic fake 'decode + embed': feature i = (md5-digest byte
    (i mod 16) + i) mod 256. Deliberately SQL-reproducible so the gate can
    oracle-check the mapInPandas plumbing (oracles.q_image_features);
    replace with a real decoder (PIL + model) in a codec-enabled image."""
    if blob is None:
        return np.zeros(dim, dtype=np.float32)
    d = np.frombuffer(hashlib.md5(blob).digest(), np.uint8)
    idx = np.arange(dim)
    return ((d[idx % 16].astype(np.int64) + idx) % 256).astype(np.float32)


def _resize_image_stub(blob: bytes, width: int, height: int) -> bytes:
    """Deterministic fake resize: tag + fingerprint (real impl: PIL)."""
    if blob is None:
        return b""
    return b"RESIZED:%dx%d:" % (width, height) + hashlib.md5(blob).digest()


def _sample_frames_stub(blob: bytes, n_frames: int) -> list[bytes]:
    """Deterministic fake frame sampler (real impl: libav/ffmpeg)."""
    if blob is None:
        return []
    h = hashlib.md5(blob).digest()
    return [b"FRAME:%d:" % i + h for i in range(n_frames)]


STRICT_STUBS = False  # default for the strict= parameter below


def _guard(strict: bool):
    # NB: strict is captured into the mapInPandas closure at plan-build time
    # (executors re-import this module, so a module global would reset)
    if strict:
        raise NotImplementedError(
            "media codecs not available in this environment; install a codec "
            "image and replace the *_stub functions (operators/multimodal.py)"
        )


# ---------------------------------------------------------------------------
# mapInPandas stages
# ---------------------------------------------------------------------------

def decode_image_features(
    df: DataFrame, id_col: str = "media_id", blob_col: str = "blob",
    dim: int = 64, strict: bool | None = None,
) -> DataFrame:
    """binary -> fixed-dim float feature vector; output schema
    (id, features array<float>). One Arrow batch in, one out; blobs never
    leave the executor."""
    from ..packaging import ensure_shipped

    ensure_shipped(df.sparkSession)
    strict_val = STRICT_STUBS if strict is None else strict
    id_type = df.schema[id_col].dataType
    schema = T.StructType(
        [
            T.StructField(id_col, id_type),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )

    def _decode(batches):
        _guard(strict_val)
        for pdf in batches:
            feats = [
                _decode_image_stub(b if b is None else bytes(b), dim)
                for b in pdf[blob_col]
            ]
            yield pd.DataFrame(
                {id_col: pdf[id_col], "features": [f.tolist() for f in feats]}
            )

    return df.select(id_col, blob_col).mapInPandas(_decode, schema=schema)


def resize_images(
    df: DataFrame, width: int, height: int,
    id_col: str = "media_id", blob_col: str = "blob",
    strict: bool | None = None,
) -> DataFrame:
    """binary -> binary resize; preserves partitioning, no shuffle."""
    from ..packaging import ensure_shipped

    ensure_shipped(df.sparkSession)
    strict_val = STRICT_STUBS if strict is None else strict
    id_type = df.schema[id_col].dataType
    schema = T.StructType(
        [
            T.StructField(id_col, id_type),
            T.StructField("resized", T.BinaryType()),
        ]
    )

    def _resize(batches):
        _guard(strict_val)
        for pdf in batches:
            out = [
                _resize_image_stub(b if b is None else bytes(b), width, height)
                for b in pdf[blob_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "resized": out})

    return df.select(id_col, blob_col).mapInPandas(_resize, schema=schema)


def sample_video_frames(
    df: DataFrame, n_frames: int = 4,
    id_col: str = "media_id", blob_col: str = "blob",
    strict: bool | None = None,
) -> DataFrame:
    """1 video -> N frame rows (id, frame_index, frame). The explosion
    happens inside the Arrow batch — row blowup never inflates the shuffle
    of the original blobs."""
    from ..packaging import ensure_shipped

    ensure_shipped(df.sparkSession)
    strict_val = STRICT_STUBS if strict is None else strict
    id_type = df.schema[id_col].dataType
    schema = T.StructType(
        [
            T.StructField(id_col, id_type),
            T.StructField("frame_index", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def _sample(batches):
        _guard(strict_val)
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, b in zip(pdf[id_col], pdf[blob_col]):
                fr = _sample_frames_stub(b if b is None else bytes(b), n_frames)
                for i, f in enumerate(fr):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(f)
            yield pd.DataFrame({id_col: ids, "frame_index": idxs, "frame": frames})

    return df.select(id_col, blob_col).mapInPandas(_sample, schema=schema)
