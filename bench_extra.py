"""Round-6 isolation benchmarks (guide §1.4) — NOT the driver bench.

Decomposes the headline queries into phases with the noop sink so each
optimization targets the phase that actually costs time:

  encode_write:  scan-only -> scan+boundary (passthrough mapInArrow)
                 -> scan+kernel (noop) -> scan+kernel+parquet write
  decode_full:   scan-only over the encoded table -> decode (noop)
  text/dedup/similarity: noop-sink timings per operator

Usage: python bench_extra.py [phase ...]
  phases: encode decode text dedup similarity   (default: all)

Env: SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS / SPARK_GRAFT_REPLICATE as
bench.py.  Prints one labelled line per phase (not the driver's JSON
contract — bench.py stays the only source of official numbers).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench  # reuse the frozen harness's session + input prep

SF_DIR = bench.SF_DIR
CPUS = bench.CPUS
REPLICATE = bench.REPLICATE
N_RUNS = int(os.environ.get("SPARK_GRAFT_RUNS", "3"))


def tmed(fn, runs=N_RUNS):
    ts = []
    for _ in range(runs):
        t0 = time.time()
        fn()
        ts.append(round(time.time() - t0, 3))
    return sorted(ts)[len(ts) // 2], ts


def main():
    phases = sys.argv[1:] or ["encode", "decode", "text", "dedup",
                              "similarity"]
    from pyspark.sql import functions as F, types as T
    spark = bench.make_spark(CPUS)
    sc = spark.sparkContext
    out: dict[str, object] = {}
    try:
        from orc_spark.operators import encode as enc_ops
        if "encode" in phases or "decode" in phases:
            inp = bench._materialize_input(spark, SF_DIR, REPLICATE)
            bench.warm_workers(spark, inp)
            tok = spark.read.parquet(inp)
        else:
            bench.warm_workers(spark, None)

        if "encode" in phases:
            sc.setJobDescription("iso: scan-only noop")
            out["scan_noop"], out["scan_noop_runs"] = tmed(
                lambda: bench._noop(tok))

            def passthrough(batches):
                for b in batches:
                    yield b

            sc.setJobDescription("iso: scan+boundary passthrough")
            pt = tok.mapInArrow(passthrough, tok.schema)
            out["boundary_noop"], out["boundary_noop_runs"] = tmed(
                lambda: bench._noop(pt))

            sc.setJobDescription("iso: scan+encode kernel noop")
            enc = enc_ops.encode(tok, stripe_rows=1 << 16)
            out["encode_noop"], out["encode_noop_runs"] = tmed(
                lambda: bench._noop(enc))

            sc.setJobDescription("iso: scan+encode+write parquet")
            tmp = tempfile.mkdtemp(prefix="iso_enc_")

            def wr():
                enc_ops.encode(tok, stripe_rows=1 << 16).write \
                    .mode("overwrite").parquet(os.path.join(tmp, "s"))
            out["encode_write"], out["encode_write_runs"] = tmed(wr)

        if "decode" in phases:
            tmp = tempfile.mkdtemp(prefix="iso_dec_")
            enc_path = os.path.join(tmp, "s")
            enc_ops.encode(tok, stripe_rows=1 << 16).write \
                .mode("overwrite").parquet(enc_path)
            enc_df = spark.read.parquet(enc_path)
            sc.setJobDescription("iso: encoded-table scan noop")
            out["enc_scan_noop"], _ = tmed(lambda: bench._noop(enc_df))
            sc.setJobDescription("iso: decode_full noop")
            out["decode_full"], out["decode_full_runs"] = tmed(
                lambda: bench._noop(enc_ops.decode(enc_df)))
            sc.setJobDescription("iso: decode_projected noop")
            out["decode_projected"], out["decode_projected_runs"] = tmed(
                lambda: bench._noop(enc_ops.decode(enc_df,
                                                   columns=["n_tok"])))

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        if "text" in phases:
            from orc_spark.functions import text
            sc.setJobDescription("iso: quality_scores noop")
            out["quality_scores"], out["quality_scores_runs"] = tmed(
                lambda: bench._noop(text.quality_scores(docs)))
            sc.setJobDescription("iso: lang_id noop")
            out["lang_id"], out["lang_id_runs"] = tmed(
                lambda: bench._noop(text.lang_id(docs)))

        if "dedup" in phases:
            from orc_spark.functions import dedup
            sc.setJobDescription("iso: minhash_lsh_pairs noop")
            out["dedup_minhash"], out["dedup_minhash_runs"] = tmed(
                lambda: bench._noop(
                    dedup.minhash_lsh_pairs(docs, min_jaccard=0.4)))

        if "similarity" in phases:
            from orc_spark.functions import similarity
            emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
            q = list(emb.limit(1).select("embedding")
                     .first()["embedding"])
            sc.setJobDescription("iso: cosine_topk")
            out["sim_cosine"], out["sim_cosine_runs"] = tmed(
                lambda: similarity.cosine_topk(emb, q, k=10).collect())
            sc.setJobDescription("iso: lsh_ann_topk")
            out["sim_ann"], out["sim_ann_runs"] = tmed(
                lambda: similarity.lsh_ann_topk(emb, q, k=10).collect())
    finally:
        spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
