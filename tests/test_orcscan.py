"""Distributed .orc scan (sources/orcscan.py)."""

import glob

import numpy as np
import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from orc_spark.sources import orcscan, orcwriter
from orc_spark.sources.orcfile import ORCFile

EX = "/root/reference/examples"

RNG = np.random.default_rng(42)


@pytest.fixture(scope="module")
def token_table():
    n = 4000
    lens = RNG.integers(1, 60, n)
    toks = [RNG.integers(0, 50257, l).tolist() for l in lens]
    return pa.table({
        "doc_id": [f"doc-{i:012d}" for i in range(n)],
        "tokens": pa.array(toks, pa.list_(pa.int32())),
        "n_tok": pa.array([len(x) for x in toks], pa.int32()),
        "source": pa.array([["cc", "wiki", "books"][i % 3]
                            for i in range(n)]),
    })


def _write_sorted_orc(path, n=4000, stripe_rows=1000):
    """Single .orc, 4 stripes, `v` sorted ascending (disjoint stripe
    [min,max] ranges -> stats pruning has something to prune)."""
    batch = pa.RecordBatch.from_arrays(
        [pa.array(np.arange(n, dtype=np.int64)),
         pa.array([f"s{i // 1000}" for i in range(n)])],
        names=["v", "tag"])
    w = orcwriter.ORCFileWriter(str(path), codec="zlib",
                                stripe_rows=stripe_rows)
    w.write_batch(batch)
    w.close()
    return str(path)


def test_plan_tasks_prunes_stripes(tmp_path):
    p = _write_sorted_orc(tmp_path / "a.orc")
    tasks, total = orcscan.plan_tasks([p])
    assert total == 4 and len(tasks) == 4
    # v >= 3000 lives entirely in the last stripe
    tasks, total = orcscan.plan_tasks([p], predicate=("v", ">=", 3000))
    assert total == 4 and len(tasks) == 1 and tasks[0][1] == 3
    # conjunction: 1500 <= v < 2600 spans stripes 1 and 2
    tasks, _ = orcscan.plan_tasks(
        [p], predicate=[("v", ">=", 1500), ("v", "<", 2600)])
    assert sorted(si for _, si in tasks) == [1, 2]
    # string stats prune too
    tasks, _ = orcscan.plan_tasks([p], predicate=("tag", "==", "s0"))
    assert [si for _, si in tasks] == [0]


def test_plan_tasks_bad_inputs(tmp_path):
    p = _write_sorted_orc(tmp_path / "a.orc")
    with pytest.raises(ValueError):
        orcscan.plan_tasks([p], predicate=("nope", ">=", 1))
    with pytest.raises(ValueError):
        orcscan.plan_tasks([p], predicate=("v", "~", 1))


def test_orc_scan_roundtrip_token_table(spark, token_table, tmp_path):
    """Sink a token DataFrame to .orc, scan it back via our kernels,
    and compare aggregates with the original (no JVM ORC reader)."""
    out = str(tmp_path / "sink")
    df = spark.createDataFrame(token_table).repartition(3)
    orcwriter.dataframe_to_orc_dir(df, out)
    back = orcscan.orc_scan(spark, out)
    assert back.count() == token_table.num_rows
    got = back.agg(
        F.sum("n_tok").alias("s"),
        F.sum(F.size("tokens")).alias("st"),
        F.countDistinct("doc_id").alias("d")).first()
    assert got["s"] == sum(token_table.column("n_tok").to_pylist())
    assert got["st"] == got["s"]
    assert got["d"] == token_table.num_rows


def test_orc_scan_predicate_exact_and_pruned(spark, tmp_path):
    p = _write_sorted_orc(tmp_path / "a.orc")
    full = orcscan.orc_scan(spark, p)
    assert full.count() == 4000
    pred = orcscan.orc_scan(spark, p, predicate=("v", ">=", 3100))
    rows = pred.orderBy("v").collect()
    # exact despite stripe granularity: residual filter trims 3000-3099
    assert len(rows) == 900 and rows[0]["v"] == 3100
    # projection: only requested columns come back
    proj = orcscan.orc_scan(spark, p, columns=["tag"],
                            predicate=None)
    assert proj.columns == ["tag"] and proj.count() == 4000


def test_orc_scan_distributed_planning(spark, tmp_path, monkeypatch):
    """Above DRIVER_PLAN_MAX_FILES the (file, stripe) task list is
    built ON EXECUTORS (footer-only mmap per task) — results must be
    identical to driver-side planning."""
    for i in range(4):
        batch = pa.RecordBatch.from_arrays(
            [pa.array(np.arange(i * 100, (i + 1) * 100,
                                dtype=np.int64))], names=["v"])
        w = orcwriter.ORCFileWriter(str(tmp_path / f"p{i}.orc"),
                                    codec="zlib", stripe_rows=50)
        w.write_batch(batch)
        w.close()
    driver_rows = orcscan.orc_scan(
        spark, str(tmp_path), predicate=("v", ">=", 170)) \
        .orderBy("v").collect()
    monkeypatch.setattr(orcscan, "DRIVER_PLAN_MAX_FILES", 2)
    dist_rows = orcscan.orc_scan(
        spark, str(tmp_path), predicate=("v", ">=", 170)) \
        .orderBy("v").collect()
    assert [r["v"] for r in driver_rows] == list(range(170, 400))
    assert dist_rows == driver_rows
    # bad predicate still fails fast (validated before planning)
    with pytest.raises(ValueError):
        orcscan.orc_scan(spark, str(tmp_path), predicate=("v", "~", 1))


def test_orc_scan_union_file(spark):
    """Spark's JVM ORC reader cannot read uniontype at all; our scan
    surfaces it as the sparse (tag, _u0, _u1) struct."""
    path = f"{EX}/TestOrcFile.testUnionAndTimestamp.orc"
    df = orcscan.orc_scan(spark, path)
    n = df.count()
    assert n == ORCFile(path).n_rows
    tags = df.select(F.col("union.tag").alias("t")) \
        .where(F.col("t").isNotNull()).distinct().collect()
    assert {r["t"] for r in tags} <= {0, 1}
    # spot-check: tag-0 rows carry _u0 (int) and null _u1, and value
    # multiplexing matches the row reader
    row = df.where("union.tag = 0 AND union._u0 IS NOT NULL").first()
    assert row["union"]["_u1"] is None


def test_orc_scan_nested_golden_matches_row_reader(spark):
    """test1.orc: struct/list/map/binary columns round through the
    scan identically to the direct row reader."""
    path = f"{EX}/TestOrcFile.test1.orc"
    got = orcscan.orc_scan(spark, path).orderBy("int1").collect()
    raw = sorted(ORCFile(path).read_all(), key=lambda r: r["int1"])
    assert len(got) == len(raw) == 2
    for g, r in zip(got, raw):
        assert g["boolean1"] == r["boolean1"]
        assert bytes(g["bytes1"]) == bytes(r["bytes1"])
        assert [x["int1"] for x in g["list"]] == \
            [x["int1"] for x in r["list"]]
        assert g["middle"]["list"][0]["string1"] == \
            r["middle"]["list"][0]["string1"]
