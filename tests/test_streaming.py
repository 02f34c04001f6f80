"""Structured Streaming: file-stream encode with availableNow trigger,
streaming checkpoint restart, and watermarked windowed metrics."""

import pytest

from pyspark.sql import functions as F

from orc_spark.operators import encode as enc_ops
from orc_spark.sources import tokens as token_src
from orc_spark.streaming import encode_stream

SF_DIR = "/root/testdata/sf0.001"


def test_stream_encode_available_now(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    tok = token_src.token_table(spark, SF_DIR)
    tok.repartition(3).write.parquet(inp)

    q = encode_stream.encode_stream(spark, inp, out,
                                    max_files_per_trigger=2)
    q.awaitTermination(120)
    enc = spark.read.parquet(f"{out}/stripes")
    assert enc.agg(F.sum("n_rows")).collect()[0][0] == 500
    dec = enc_ops.decode(enc.drop("batch_id"))
    assert dec.count() == 500
    audit = spark.read.parquet(f"{out}/stream_audit")
    assert audit.agg(F.sum("n_rows")).collect()[0][0] == 500

    # restart with the same checkpoint: no new files -> no duplicates
    q2 = encode_stream.encode_stream(spark, inp, out)
    q2.awaitTermination(60)
    enc2 = spark.read.parquet(f"{out}/stripes")
    assert enc2.agg(F.sum("n_rows")).collect()[0][0] == 500


def test_token_rate_metrics_batch_semantics(spark):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    m = encode_stream.token_rate_metrics(events, window="10 minutes")
    rows = m.collect()
    assert sum(r["n_events"] for r in rows) == events.count()
    assert all(r["window_end"] > r["window_start"] for r in rows)
