"""Deterministic token-table source (BASELINE.json input_hint schema).

Derives ``(doc_id:string, tokens:array<int32>, n_tok:int32,
source:string)`` from the driver-provided ``documents`` parquet table
using only JVM-side built-ins (no Python in the derivation): whitespace
word split + xxhash64 word hashing into a fixed vocab.  Deterministic
for a given input — both the engine tests and the benchmarks build
their inputs through this function (FIXTURES.md §1/§4: tables derived
from driver testdata; no external data).

Also provides a pure-synthetic generator covering the codec decision
space (runs, ramps, zipf, outliers) for stress tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

VOCAB_SIZE = 50257


def token_table(spark: SparkSession, sf_dir: str,
                replicate: int = 1) -> DataFrame:
    """documents.parquet -> token table, derived fully JVM-side."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = docs.select(
        F.format_string("doc-%012d", F.col("doc_id")).alias("doc_id"),
        # empty/whitespace-only/NULL text -> ZERO tokens: split('')
        # yields [''] in Spark, which would fabricate a phantom token
        # (hash of the empty string) that sequence packing would then
        # emit into training rows
        F.expr(
            f"CASE WHEN text IS NULL OR trim(text) = '' "
            f"THEN CAST(array() AS array<int>) "
            f"ELSE transform(split(trim(text), '\\\\s+'), "
            f"w -> cast(pmod(xxhash64(w), {VOCAB_SIZE}) as int)) END"
        ).alias("tokens"),
        F.col("source"),
    )
    if replicate > 1:
        reps = spark.range(replicate).select(
            F.col("id").alias("rep"))
        base = base.crossJoin(F.broadcast(reps)).select(
            F.concat_ws("-", "doc_id", "rep").alias("doc_id"),
            "tokens", "source")
    return base.select(
        "doc_id", "tokens",
        F.size("tokens").cast("int").alias("n_tok"), "source")


def synthetic_token_pdf(n_docs: int = 10_000, seed: int = 42) -> pd.DataFrame:
    """Seeded generator spanning the codec decision space
    (FIXTURES.md §1): uniform / repeat-runs / ramps / zipf /
    outlier-spiked slices + lognormal n_tok skew tail."""
    rng = np.random.default_rng(seed)
    docs = []
    kinds = rng.integers(0, 6, n_docs)
    lens = np.maximum(
        1, rng.lognormal(4.0, 1.0, n_docs).astype(np.int64))
    # 0.1% extreme tail: 100-1000x median length
    tail = rng.choice(n_docs, max(1, n_docs // 1000), replace=False)
    lens[tail] *= rng.integers(100, 1000, len(tail))
    lens = np.minimum(lens, 1_000_000)
    sources = np.array(["cc", "wiki", "books", "code", "forums", "news",
                        "papers", "web"])
    for i in range(n_docs):
        l = int(lens[i])
        k = int(kinds[i])
        if k == 0:
            t = rng.integers(0, VOCAB_SIZE, l)
        elif k == 1:  # short repeat runs
            t = np.repeat(rng.integers(0, VOCAB_SIZE, max(1, l // 5)),
                          rng.integers(3, 11, max(1, l // 5)))[:l]
        elif k == 2:  # long runs
            t = np.repeat(rng.integers(0, VOCAB_SIZE, max(1, l // 200) + 1),
                          200)[:l]
        elif k == 3:  # ramps
            t = (np.arange(l) * int(rng.integers(1, 5))) % VOCAB_SIZE
        elif k == 4:  # zipf vocab
            t = np.minimum(rng.zipf(1.2, l), VOCAB_SIZE - 1)
        else:  # outlier-spiked small ids
            t = rng.integers(2000, 2100, l)
            spikes = rng.choice(l, max(1, l // 50), replace=False)
            t[spikes] = rng.integers(1_000_000 % VOCAB_SIZE, VOCAB_SIZE,
                                     len(spikes))
        docs.append((f"doc-{i:012d}", t.astype(np.int32),
                     len(t), str(sources[i % len(sources)])))
    return pd.DataFrame(docs, columns=["doc_id", "tokens", "n_tok", "source"])


def synthetic_token_table(spark: SparkSession, n_docs: int = 10_000,
                          seed: int = 42) -> DataFrame:
    pdf = synthetic_token_pdf(n_docs, seed)
    pdf["tokens"] = pdf["tokens"].map(lambda a: a.tolist())
    return spark.createDataFrame(pdf)
