"""Similarity search over embedding columns (array<float>).

* ``cosine_topk``: brute-force exact top-k for one query vector —
  JVM-side ``zip_with``/``aggregate`` dot product, no Python; the
  correctness baseline.
* ``lsh_ann_topk``: the scale path — random-hyperplane (sign) LSH
  signatures bucket the table; the query only scans its own buckets
  (multi-probe over B bands), so a 100 TB table is never fully scanned.
* ``knn_join``: k nearest neighbors for EVERY probe row via the same
  bucketing (shuffle keys are bucket signatures, never all-pairs).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(_dot(a, a))


def with_cosine(df: DataFrame, query: list[float],
                emb_col: str = "embedding") -> DataFrame:
    q = F.array(*[F.lit(float(x)) for x in query])
    emb = F.transform(F.col(emb_col), lambda x: x.cast("double"))
    cos = _dot(emb, q) / (_norm(emb) * F.lit(float(np.linalg.norm(query))))
    return df.withColumn("cosine", F.round(cos, 6))


def cosine_topk(df: DataFrame, query: list[float], k: int = 10,
                emb_col: str = "embedding",
                id_col: str = "vec_id") -> DataFrame:
    """Exact brute-force top-k by cosine similarity to ``query``."""
    return (with_cosine(df, query, emb_col)
            .select(id_col, "cosine")
            .orderBy(F.desc("cosine"), F.asc(id_col))
            .limit(k))


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n_planes, dim))


def add_lsh_signature(df: DataFrame, dim: int, n_planes: int = 16,
                      seed: int = 42, emb_col: str = "embedding") -> DataFrame:
    """Random-hyperplane signature: bit i = sign(dot(emb, plane_i)),
    computed as ONE Arrow-vectorized matmul per batch (a 16-plane JVM
    expression tree is codegen-heavy and slower)."""
    from pyspark.sql.functions import pandas_udf

    planes_t = _hyperplanes(dim, n_planes, seed).T  # (dim, n_planes)
    weights = (1 << np.arange(n_planes, dtype=np.uint64))

    @pandas_udf("long")
    def sig_udf(emb: pd.Series) -> pd.Series:
        mat = np.array([np.asarray(e, dtype=np.float64) for e in emb])
        if len(mat) == 0:
            return pd.Series([], dtype="int64")
        bits = (mat @ planes_t) > 0
        sigs = (bits.astype(np.uint64) * weights).sum(axis=1)
        return pd.Series(sigs.view(np.int64))

    return df.withColumn("lsh_sig", sig_udf(F.col(emb_col)))


def lsh_ann_topk(df: DataFrame, query: list[float], k: int = 10,
                 n_planes: int = 16, bands: int = 4, seed: int = 42,
                 emb_col: str = "embedding",
                 id_col: str = "vec_id") -> DataFrame:
    """Approximate top-k: scan only rows sharing at least one LSH band
    with the query signature (multi-probe), exact cosine within."""
    dim = len(query)
    planes = _hyperplanes(dim, n_planes, seed)
    qsig = 0
    for i in range(n_planes):
        if float(np.dot(query, planes[i])) > 0:
            qsig |= 1 << i
    bits_per_band = n_planes // bands
    mask = (1 << bits_per_band) - 1
    sigs = add_lsh_signature(df, dim, n_planes, seed, emb_col)
    cond = None
    for b in range(bands):
        qband = (qsig >> (b * bits_per_band)) & mask
        c = (F.shiftright("lsh_sig", b * bits_per_band)
             .bitwiseAND(F.lit(mask)) == qband)
        cond = c if cond is None else (cond | c)
    bucketed = sigs.where(cond)
    return (with_cosine(bucketed, query, emb_col)
            .select(id_col, "cosine")
            .orderBy(F.desc("cosine"), F.asc(id_col))
            .limit(k))


def knn_join(df: DataFrame, probes: DataFrame, k: int = 5,
             n_planes: int = 8, seed: int = 42,
             emb_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """For each probe row, its k nearest table rows by cosine, matching
    only within shared full LSH signatures plus 1-bit probes."""
    from pyspark.sql.window import Window
    dim_row = df.select(F.size(emb_col).alias("d")).first()
    dim = dim_row["d"]
    base = add_lsh_signature(df, dim, n_planes, seed, emb_col) \
        .select(F.col(id_col).alias("nn_id"),
                F.col(emb_col).alias("nn_emb"), "lsh_sig")
    pr = add_lsh_signature(probes, dim, n_planes, seed, emb_col) \
        .select(F.col(id_col).alias("probe_id"),
                F.col(emb_col).alias("probe_emb"),
                F.col("lsh_sig").alias("probe_sig"))
    # multi-probe: exact signature plus all 1-bit flips
    probe_sigs = pr.select(
        "probe_id", "probe_emb",
        F.explode(F.array(
            F.col("probe_sig"),
            *[F.col("probe_sig").bitwiseXOR(F.lit(1 << i))
              for i in range(n_planes)])).alias("lsh_sig"))
    joined = probe_sigs.join(base, "lsh_sig") \
        .where(F.col("probe_id") != F.col("nn_id"))
    a = F.transform(F.col("probe_emb"), lambda x: x.cast("double"))
    b = F.transform(F.col("nn_emb"), lambda x: x.cast("double"))
    cos = _dot(a, b) / (_norm(a) * _norm(b))
    scored = joined.select("probe_id", "nn_id",
                           F.round(cos, 6).alias("cosine")).distinct()
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("cosine"), F.asc("nn_id"))
    return scored.withColumn("rank", F.row_number().over(w)) \
        .where(F.col("rank") <= k)
