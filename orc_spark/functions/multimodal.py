"""Multimodal (image/audio/video) column plumbing.

Media ride as opaque ``binary`` payload columns with typed metadata;
all transforms run as Arrow-batched kernels over ``mapInPandas`` /
``mapInArrow``.  The actual media decode (JPEG/PNG/audio codecs) is
STUBBED — the libraries are not in this container — behind
``decode_image_stub``, which produces a deterministic fake feature
vector from the payload bytes so the Spark-side plumbing (schema,
partitioning, UDF signature, batch shape) is real and tested.  Swap
``_fake_decode`` for a real decoder (PIL/torchvision/ffmpeg) on a
production cluster.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("kind", T.StringType()),       # image | audio | video
    T.StructField("mime", T.StringType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.IntegerType()),
])


def synthesize_media(spark, docs: DataFrame) -> DataFrame:
    """Deterministic fake media table derived from documents (payload =
    utf-8 text bytes), used to exercise the plumbing end to end."""
    return docs.select(
        F.concat(F.lit("img-"), F.col("doc_id").cast("string"))
        .alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("image/x-fake").alias("mime"),
        F.encode("text", "utf-8").alias("payload"),
        (F.pmod(F.xxhash64("text"), F.lit(512)) + 32).cast("int")
        .alias("width"),
        (F.pmod(F.xxhash64("text", F.lit(1)), F.lit(512)) + 32).cast("int")
        .alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )


FEATURE_DIM = 16


def _fake_decode(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for image decode + feature extraction:
    a real deployment replaces this with PIL/torch decode.  Raises
    NotImplementedError for kinds we do not fake.  NULL payloads
    (nullable column) decode to the zero vector like empty ones."""
    if payload is None:
        return np.zeros(dim, dtype=np.float32)
    h = np.frombuffer(payload, dtype=np.uint8)
    if len(h) == 0:
        return np.zeros(dim, dtype=np.float32)
    # means in float64, quantized to float32 at the end — exactly
    # mirrorable by an independent oracle (double mean -> REAL cast)
    chunks = np.array_split(h.astype(np.float64), dim)
    return np.array([c.mean() if len(c) else 0.0 for c in chunks],
                    dtype=np.float32)


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """mapInPandas feature extraction over payload bytes -> (media_id,
    features:array<float>).  Arrow-batched; one numpy pass per row's
    payload, no JVM round trips."""
    out_schema = T.StructType([
        T.StructField("media_id", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from orc_spark._alloc import tune_worker
        tune_worker()
        for pdf in batches:
            feats = [
                _fake_decode(p, dim) if k == "image" else _not_impl(k)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "features": [f.tolist() for f in feats],
            })

    return media.select("media_id", "kind", "payload") \
        .mapInPandas(kernel, out_schema)


def _not_impl(kind: str):
    raise NotImplementedError(
        f"media decode for kind={kind!r} requires codec libraries not "
        f"present in this container; plug a real decoder into "
        f"extract_features")


def frame_sample_stub(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plan (stub): emits (media_id, frame_ts_ms)
    rows from duration metadata; the decode itself is NotImplemented.
    Videos with UNKNOWN duration (NULL) emit no frames — scheduling a
    phantom ts=0 frame for unprobed media would queue decode work that
    may not exist."""
    return (media.where((F.col("kind") == "video") &
                        F.col("duration_ms").isNotNull())
            .select("media_id",
                    F.explode(F.sequence(
                        F.lit(0), F.col("duration_ms"),
                        F.lit(every_ms))).alias("frame_ts_ms")))
