"""Scale-adaptive scan spreading for compute-dense map-only operators.

A Parquet scan cannot split a single row group, so a small-file table
(one row group, as the bench/driver documents tables are) pins every
downstream map-only kernel to one or two tasks no matter how many
cores the session has — the operator is then single-task-bound while
31 cores idle (guide §2.2/§6: input splits bound parallelism).

``spread_scan`` round-robin-repartitions the input up to the session's
default parallelism ONLY when the scan's split count is below it: one
cheap exchange of the (small) payload buys full-width execution of the
expensive kernel that follows.  At real scale the input has many
splits and the guard is a no-op, so this is not a local-mode constant:
the target derives from the session, and the condition from the data
(guide §2: scale-adaptive partitioning, never a tuned constant).

Row values are untouched and row order is not part of any operator's
contract (results are set-semantic; oracles sort before comparing).
Keyless repartition stays retry-deterministic via Spark's default
sort-before-repartition (SPARK-23207).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# only spread when every target task would receive at least this many
# PLAN-ESTIMATED bytes (compressed file bytes scaled by the projected
# column fraction) — below it the exchange's fixed cost exceeds the
# kernel win.  A/B-measured boundaries: 8 KB/task (5k docs) lost
# ~0.15s per op, 85 KB/task (50k docs) won 2-3x; 32 KB/task sits a
# 4x margin from each.  The threshold scales with the session's
# parallelism, not with any fixed local core count.
MIN_BYTES_PER_TASK = 32 << 10


def _plan_size_bytes(df: DataFrame) -> int | None:
    """Optimizer size estimate of the frame (file bytes for scans)."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats()
                   .sizeInBytes())
    except Exception:
        return None


def spread_scan(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to the session's default parallelism when its
    current plan yields fewer partitions AND it is big enough that each
    widened task gets a meaningful slice (no-op on streaming frames,
    already-wide inputs, and inputs too small to amortize an
    exchange)."""
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        nparts = df.rdd.getNumPartitions()
    except Exception:
        return df
    if nparts >= target:
        return df
    size = _plan_size_bytes(df)
    if size is None or size < target * MIN_BYTES_PER_TASK:
        return df
    return df.repartition(target)
