"""Custom STATEFUL streaming operator: exact-duplicate tracking across
micro-batches with ``applyInPandasWithState``.

Batch dedup (functions/dedup.exact_duplicates) sees the whole corpus at
once; a streaming ingest pipeline sees it file-by-file.  This operator
keeps per-fingerprint GroupState (dup_count, keep_doc_id) that merges
every micro-batch's arrivals, so after the stream drains the latest
emitted row per fingerprint equals the batch answer EXACTLY — which is
what the driver oracle checks (same SQL as dedup_exact).

Shape at 100 TB: state is partitioned by fingerprint (hash shuffle per
micro-batch on the md5 key — the same single-shuffle shape as batch
exact dedup), state size is O(#distinct docs) spread over executors via
the state store, and the checkpoint gives exactly-once across restarts.
State bound (r4: IMPLEMENTED, not just documented): ``ttl_ms`` sets a
dedup horizon via GroupStateTimeout.ProcessingTimeTimeout — idle
fingerprints are evicted (and lazily reset on late re-arrival), so
state is O(distinct docs per horizon) instead of all-time; at 10^12
all-time distinct documents the unbounded store would be tens of TB.
The alternative composition (periodically compact the update log into
the batch dedup table) still works unchanged.

Checkpoint compatibility: r4 widened the state schemas with a
``last_ms`` field, so a checkpoint written by the PRE-r4 operator
cannot be resumed by this one (Spark's state-store schema validation
fails the restart loudly).  Migrate by draining the old stream, then
starting fresh with a new checkpoint directory — the updates log is
append-only, so no history is lost.
"""

from __future__ import annotations

import os

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

OUT_SCHEMA = T.StructType([
    T.StructField("fp", T.StringType()),
    T.StructField("dup_count", T.LongType()),
    T.StructField("keep_doc_id", T.LongType()),
])
STATE_SCHEMA = T.StructType([
    T.StructField("dup_count", T.LongType()),
    T.StructField("keep_doc_id", T.LongType()),
    T.StructField("last_ms", T.LongType()),
])


def _make_update(ttl_ms: int | None):
    """Per-fingerprint state update, optionally bounded by a dedup
    HORIZON (r4): with ``ttl_ms`` set, a fingerprint idle longer than
    the horizon is (a) physically removed by ProcessingTimeTimeout —
    Spark calls us with ``hasTimedOut`` and no data — and (b) lazily
    RESET when it re-arrives after the horizon even if the timeout
    has not fired yet, so an expired fingerprint re-admits as a brand
    new document either way.  This is what bounds the state store at
    10^12-distinct-docs scale: state size becomes O(distinct docs per
    horizon), the standard production trade (duplicates farther apart
    than the horizon are kept — dedup recall, not correctness, is
    what the horizon prices)."""
    def _update(key, pdfs, state):
        if state.hasTimedOut:
            # idle past the horizon: evict, emit a tombstone so the
            # update log records the eviction (dup_count=0, no keeper)
            fp = key[0]
            state.remove()
            yield pd.DataFrame({
                "fp": [fp],
                "dup_count": pd.array([0], dtype="Int64"),
                "keep_doc_id": pd.array([None], dtype="Int64")})
            return
        now = state.getCurrentProcessingTimeMs() \
            if ttl_ms is not None else 0
        if state.exists:
            cnt, keep, last = state.get
            if ttl_ms is not None and now - last > ttl_ms:
                cnt, keep = 0, None  # horizon passed: treat as new
        else:
            cnt, keep = 0, None
        for pdf in pdfs:
            cnt += len(pdf)
            m = int(pdf["doc_id"].min())
            keep = m if keep is None else min(keep, m)
        state.update((cnt, keep, now))
        if ttl_ms is not None:
            try:
                state.setTimeoutDuration(ttl_ms)
            except Exception:
                # NoTimeout conf (availableNow mode): horizon is
                # enforced by the lazy reset above only
                pass
        yield pd.DataFrame({"fp": [key[0]], "dup_count": [cnt],
                            "keep_doc_id": [keep]})
    return _update


def with_fingerprint(docs: DataFrame) -> DataFrame:
    return docs.withColumn(
        "fp", F.md5(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")))


def dedup_stream(spark: SparkSession, input_path: str, out_dir: str,
                 schema: T.StructType,
                 max_files_per_trigger: int = 2,
                 ttl_ms: int | None = None,
                 processing_trigger: str | None = None):
    """Start (and return) a streaming query that maintains per-
    fingerprint duplicate state over arriving parquet files and appends
    every state update (tagged with batch_id) to ``out_dir``/updates;
    ``latest_state`` reduces that log to the final answer.

    ``ttl_ms`` sets a dedup HORIZON (see _make_update): fingerprints
    idle past it re-admit as new.  Default None keeps exact all-time
    semantics (the driver oracle's contract).  Two enforcement modes:

    * default availableNow trigger — the horizon applies LAZILY (a
      re-arrival after the horizon resets its state).  Engine-fired
      eviction is off because Spark never terminates an availableNow
      query whose stateful operator registers processing-time
      timeouts (measured here: hundreds of empty micro-batches).
    * ``processing_trigger="1 second"`` — a continuously-running
      query with GroupStateTimeout.ProcessingTimeTimeout: idle state
      is PHYSICALLY evicted by the engine (bounding the store), with
      a (fp, dup_count=0, keep_doc_id=NULL) tombstone appended to the
      update log; stop the query with .stop().  This is the
      production shape for unbounded streams."""
    from pyspark.sql.streaming.state import GroupStateTimeout
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", max_files_per_trigger)
              .parquet(input_path))
    evict = ttl_ms is not None and processing_trigger is not None
    timeout = GroupStateTimeout.ProcessingTimeTimeout if evict else \
        GroupStateTimeout.NoTimeout
    updates = with_fingerprint(stream) \
        .groupBy("fp") \
        .applyInPandasWithState(
            _make_update(ttl_ms), OUT_SCHEMA, STATE_SCHEMA, "update",
            timeout)
    upd_path = os.path.join(out_dir, "updates")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(batch_id)) \
            .write.mode("append").parquet(upd_path)

    writer = (updates.writeStream
              .outputMode("update")
              .foreachBatch(sink)
              .option("checkpointLocation",
                      os.path.join(out_dir, "ckpt")))
    writer = writer.trigger(processingTime=processing_trigger) \
        if processing_trigger else writer.trigger(availableNow=True)
    return writer.start()


PAIRS_SCHEMA = T.StructType([
    T.StructField("doc_a", T.LongType()),
    T.StructField("doc_b", T.LongType()),
])
NEAR_STATE_SCHEMA = T.StructType([
    T.StructField("members", T.ArrayType(T.LongType())),
    T.StructField("last_ms", T.LongType()),
])


def near_dedup_stream(spark: SparkSession, input_path: str, out_dir: str,
                      schema: T.StructType,
                      n_perms: int = 32, bands: int = 8,
                      shingle_n: int = 3, max_bucket: int = 4096,
                      max_files_per_trigger: int = 2,
                      ttl_ms: int | None = None,
                      processing_trigger: str | None = None):
    """Streaming NEAR-duplicate candidates: the minhash-LSH band keys
    are computed map-side on the stream (functions/dedup.
    banded_signatures — no shuffle beyond the state-store hash), and
    per-(band, sig) GroupState holds the bucket's member doc_ids.
    Each micro-batch emits candidate pairs between new arrivals and
    existing members, so after the stream drains the DISTINCT pair set
    equals the batch LSH candidate set — exact-Jaccard verification
    happens batch-side (verified_near_pairs), giving the same final
    answer as functions/dedup.minhash_lsh_pairs on a corpus without
    exact duplicates (the batch path pre-collapses those; a stream
    would front it with dedup_stream).

    Bounded state: a bucket stops admitting members at ``max_bucket``
    (the batch cap drops the whole hot bucket; online we cannot retract
    already-emitted pairs, so the streaming cap truncates instead —
    both bound state and per-batch fan-out).  ``ttl_ms`` additionally
    bounds IDLE buckets with the same dedup-horizon semantics (and the
    same two enforcement modes) as dedup_stream: an expired bucket
    forgets its members, so only near-dups within the horizon pair
    up; engine eviction needs ``processing_trigger``."""
    from pyspark.sql.streaming.state import GroupStateTimeout
    from ..functions import dedup as dedup_fns

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", max_files_per_trigger)
              .parquet(input_path))
    banded = dedup_fns.banded_signatures(stream, n_perms, bands, shingle_n)

    def update(key, pdfs, state):
        if state.hasTimedOut:
            state.remove()
            return
        now = state.getCurrentProcessingTimeMs() \
            if ttl_ms is not None else 0
        if state.exists:
            members, last = state.get
            members = list(members)
            if ttl_ms is not None and now - last > ttl_ms:
                members = []  # horizon passed: bucket forgets
        else:
            members = []
        known = set(members)
        out_a: list[int] = []
        out_b: list[int] = []
        for pdf in pdfs:
            for d in pdf["doc_id"].tolist():
                d = int(d)
                if d in known or len(members) >= max_bucket:
                    continue
                for m in members:
                    out_a.append(min(m, d))
                    out_b.append(max(m, d))
                members.append(d)
                known.add(d)
        state.update((members, now))
        if ttl_ms is not None:
            try:
                state.setTimeoutDuration(ttl_ms)
            except Exception:
                pass  # NoTimeout conf: lazy horizon only
        yield pd.DataFrame({"doc_a": pd.Series(out_a, dtype="int64"),
                            "doc_b": pd.Series(out_b, dtype="int64")})

    evict = ttl_ms is not None and processing_trigger is not None
    timeout = GroupStateTimeout.ProcessingTimeTimeout if evict else \
        GroupStateTimeout.NoTimeout
    updates = banded.groupBy("band", "sig").applyInPandasWithState(
        update, PAIRS_SCHEMA, NEAR_STATE_SCHEMA, "update", timeout)
    pairs_path = os.path.join(out_dir, "pairs")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(pairs_path)

    writer = (updates.writeStream
              .outputMode("update")
              .foreachBatch(sink)
              .option("checkpointLocation",
                      os.path.join(out_dir, "ckpt")))
    writer = writer.trigger(processingTime=processing_trigger) \
        if processing_trigger else writer.trigger(availableNow=True)
    return writer.start()


def verified_near_pairs(spark: SparkSession, out_dir: str,
                        corpus: DataFrame, min_jaccard: float = 0.5,
                        shingle_n: int = 3) -> DataFrame:
    """Exact-Jaccard verification of the drained streaming candidates
    (batch-side): the SAME verify_pairs_exact implementation the batch
    path uses — one semantics, impossible to diverge."""
    from ..functions import dedup as dedup_fns
    cands = spark.read.parquet(os.path.join(out_dir, "pairs")).distinct()
    sh = corpus.select(
        "doc_id", dedup_fns._shingle_hashes(shingle_n).alias("sh"))
    return dedup_fns.verify_pairs_exact(cands, sh, min_jaccard).select(
        "doc_a", "doc_b", "jaccard")


def latest_state(spark: SparkSession, out_dir: str) -> DataFrame:
    """The final per-fingerprint state = the last update emitted for
    each fp (update output mode re-emits a row whenever state
    changes)."""
    from pyspark.sql.window import Window
    upd = spark.read.parquet(os.path.join(out_dir, "updates"))
    w = Window.partitionBy("fp").orderBy(F.desc("batch_id"))
    return (upd.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("fp", "dup_count", "keep_doc_id"))
