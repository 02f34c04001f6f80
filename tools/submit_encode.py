"""spark-submit entry point for the resumable dataset encode job.

Cluster usage (north-rule deployment shape):

    zip -r orc_spark.zip orc_spark
    spark-submit --py-files orc_spark.zip tools/submit_encode.py \
        --input  s3://bucket/tokens/         \
        --output s3://bucket/encoded/        \
        --n-parts 4096 --codec zlib [--fsst] [--batch-parts 256]

Local sandbox:

    python tools/submit_encode.py --input /tmp/tok --output /tmp/enc \
        --n-parts 64 --master 'local[32]'

The job is idempotent and resumable: rows get content-addressed
partition ids, completed partitions are recorded in <output>/audit and
skipped on re-run (operators/checkpoint.py).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--n-parts", type=int, default=256)
    p.add_argument("--codec", default="zlib", choices=["zlib", "none", "zstd"])
    p.add_argument("--fsst", action="store_true")
    p.add_argument("--batch-parts", type=int, default=None,
                   help="process at most N pending partitions this run")
    p.add_argument("--master", default=None,
                   help="override master (default: from spark-submit)")
    p.add_argument("--stripe-rows", type=int, default=1 << 20)
    p.add_argument("--stripe-tokens", type=int, default=32 << 20)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession
    builder = SparkSession.builder.appName("orc_spark-encode")
    if args.master:
        builder = builder.master(args.master)
    spark = builder.config("spark.sql.adaptive.enabled", "true").getOrCreate()

    from orc_spark.operators import checkpoint

    df = spark.read.parquet(args.input)
    summary = checkpoint.encode_dataset(
        spark, df, args.output, n_parts=args.n_parts, codec=args.codec,
        use_fsst=args.fsst, stripe_rows=args.stripe_rows,
        stripe_tokens=args.stripe_tokens, batch_parts=args.batch_parts)
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
