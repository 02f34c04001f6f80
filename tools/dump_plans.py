"""Dump .explain("formatted") for the headline/bench query plans.

Usage: python tools/dump_plans.py OUTDIR SUFFIX
Writes OUTDIR/<query>_<SUFFIX>.txt for each headline query.  Run from a
repo checkout (round-start worktree for "before", HEAD for "after").
Analysis-only — nothing executes except tiny first() lookups.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUTDIR, SUFFIX = sys.argv[1], sys.argv[2]
os.makedirs(OUTDIR, exist_ok=True)


def dump(name, df):
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    path = os.path.join(OUTDIR, f"{name}_{SUFFIX}.txt")
    with open(path, "w") as f:
        f.write(buf.getvalue())
    print("wrote", path)


def main():
    import bench
    from pyspark.sql import functions as F
    spark = bench.make_spark(8)
    try:
        from orc_spark.functions import dedup, similarity, text
        from orc_spark.operators import encode as enc_ops
        inp = bench._materialize_input(spark, SF_DIR, 4)
        tok = spark.read.parquet(inp)
        enc = enc_ops.encode(tok, stripe_rows=1 << 16)
        dump("encode_write", enc)
        import tempfile
        tmp = tempfile.mkdtemp(prefix="dump_plans_")
        enc.write.mode("overwrite").parquet(os.path.join(tmp, "s"))
        enc_df = spark.read.parquet(os.path.join(tmp, "s"))
        dump("decode_full", enc_ops.decode(enc_df))
        dump("decode_projected", enc_ops.decode(enc_df, columns=["n_tok"]))
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        dump("quality_scores", text.quality_scores(docs))
        dump("lang_id", text.lang_id(docs))
        dump("dedup_minhash",
             dedup.minhash_lsh_pairs(docs, min_jaccard=0.4))
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        q = list(emb.limit(1).select("embedding").first()["embedding"])
        dump("cosine_topk", similarity.cosine_topk(emb, q, k=10))
        dump("lsh_ann_topk", similarity.lsh_ann_topk(emb, q, k=10))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
