"""Row-level UPDATE and MERGE (upsert) on snapshot-managed tables
(sources/orctable.py r5 session 5) — the remaining Iceberg COW DML.

UPDATE semantics: rows where the predicate is TRUE take the new
values (NULL-predicate rows do NOT update); files that statistics
prove unmatched are never opened; all-match files rewrite
whole-column with no row mask.  MERGE semantics: replace-by-key —
matched target rows are superseded by source rows, unmatched source
rows insert, all in ONE atomic snapshot."""

import os

import pytest

from orc_spark.sources import orctable
from orc_spark.sources.orcfile import ORCFile


def _df(spark, lo, hi, parts=2):
    return spark.range(lo, hi, 1, parts) \
        .selectExpr("CAST(id AS INT) AS v",
                    "CAST(id AS STRING) AS tag")


def _sorted_table(spark, tmp_path, name="t", n=3000, files=3):
    t = str(tmp_path / name)
    orctable.create_table(t, "struct<v:int,tag:string>")
    per = n // files
    for i in range(files):
        orctable.write_table(_df(spark, i * per, (i + 1) * per,
                                 parts=1), t)
    return t, per


# ------------------------------------------------------------------
# UPDATE
# ------------------------------------------------------------------


def test_update_literal_and_time_travel(spark, tmp_path):
    t, per = _sorted_table(spark, tmp_path, n=300, files=3)
    pre = orctable.load_snapshot(t)
    snap = orctable.update_table(
        spark, t, set={"tag": "hot"},
        predicate=("v", "between", (50, 149)))
    assert snap["operation"] == "update"
    assert snap["summary"]["updated_rows"] == 100
    rows = {r["v"]: r["tag"]
            for r in orctable.read_table(spark, t).collect()}
    assert len(rows) == 300  # UPDATE never changes row count
    for v, tag in rows.items():
        assert tag == ("hot" if 50 <= v <= 149 else str(v))
    # time travel: the pre-update snapshot reads the old values
    old = {r["v"]: r["tag"] for r in orctable.read_table(
        spark, t, snapshot=pre["version"]).collect()}
    assert all(old[v] == str(v) for v in old)


def test_update_untouched_files_never_open(spark, tmp_path,
                                           monkeypatch):
    """Manifest stats prune unmatched files driver-side; stats-only
    classification keeps boundary-free candidates without a rewrite.
    A v-range update touching only file 0 opens exactly that file."""
    t, per = _sorted_table(spark, tmp_path, n=3000, files=3)
    opened = []
    real_init = ORCFile.__init__

    def spy(self, path):
        opened.append(os.path.basename(path))
        real_init(self, path)

    monkeypatch.setattr(ORCFile, "__init__", spy)
    n_data = len(os.listdir(os.path.join(t, "data")))
    snap = orctable.update_table(spark, t, set={"tag": "x"},
                                 predicate=("v", "<", per))
    assert snap["summary"]["updated_rows"] == per
    assert snap["summary"]["rewritten_files"] == 1
    # the two unmatched files were never opened (classification is
    # manifest-stats-only for them); the rewritten file opens for
    # classify + rewrite + stats re-read, all on one path
    assert {os.path.basename(p) for p in opened} == {
        n for n in opened if n.startswith(("part-", "update-"))}
    assert sum(1 for n in opened if n.startswith("part-")) <= 2
    # exactly one new data file appeared
    assert len(os.listdir(os.path.join(t, "data"))) == n_data + 1


def test_update_null_predicate_rows_do_not_update(spark, tmp_path):
    t = str(tmp_path / "tnull")
    orctable.create_table(t, "struct<v:int,tag:string>")
    df = spark.range(0, 100, 1, 1).selectExpr(
        "CAST(id AS INT) AS v",
        "IF(id % 3 = 0, NULL, CAST(id AS STRING)) AS tag")
    orctable.write_table(df, t)
    orctable.update_table(spark, t, set={"v": -1},
                          predicate=("tag", ">=", "5"))
    rows = orctable.read_table(spark, t).collect()
    for r in rows:
        if r["tag"] is None or r["tag"] < "5":
            assert r["v"] >= 0  # NULL / false predicate: unchanged
        else:
            assert r["v"] == -1


def test_update_unpredicated_updates_every_row(spark, tmp_path):
    t, per = _sorted_table(spark, tmp_path, n=200, files=2)
    snap = orctable.update_table(spark, t, set={"tag": None})
    assert snap["summary"]["updated_rows"] == 200
    assert all(r["tag"] is None for r in
               orctable.read_table(spark, t).collect())


def test_update_callable_vectorized(spark, tmp_path):
    """Computed update: a pa.RecordBatch -> pa.Array callable runs
    on executors, masked to the matching rows only."""
    import pyarrow.compute as pc
    t, per = _sorted_table(spark, tmp_path, n=300, files=3)
    snap = orctable.update_table(
        spark, t, set={"v": lambda b: pc.multiply(b.column("v"), 10)},
        predicate=("v", ">=", 200))
    assert snap["summary"]["updated_rows"] == 100
    got = sorted(r["v"] for r in orctable.read_table(spark, t)
                 .collect())
    assert got == list(range(200)) + [10 * v for v in
                                      range(200, 300)]


def test_update_validation(spark, tmp_path):
    t, _ = _sorted_table(spark, tmp_path, n=30, files=1)
    with pytest.raises(ValueError, match="non-empty set"):
        orctable.update_table(spark, t, set={})
    with pytest.raises(ValueError, match="not in table schema"):
        orctable.update_table(spark, t, set={"nope": 1})
    # literal of the wrong family fails loudly, never truncates
    with pytest.raises(Exception):
        orctable.update_table(spark, t, set={"v": "not-an-int"})
    # no-match predicate is a no-op (no new snapshot)
    v = orctable.current_version(t)
    snap = orctable.update_table(spark, t, set={"tag": "x"},
                                 predicate=("v", ">=", 10_000))
    assert snap["version"] == v


def test_update_rejects_partition_source_column(spark, tmp_path):
    t = str(tmp_path / "tpart")
    orctable.create_table(t, "struct<v:int,tag:string>",
                          partition_by=["bucket(4, tag)"])
    orctable.write_table(_df(spark, 0, 100, parts=1), t)
    with pytest.raises(ValueError, match="partition spec"):
        orctable.update_table(spark, t, set={"tag": "x"})
    # non-partition columns update fine and tuples are preserved
    snap = orctable.update_table(spark, t, set={"v": 7},
                                 predicate=("tag", "==", "33"))
    assert snap["summary"]["updated_rows"] == 1
    es = orctable.manifest_entries(t, snap)
    assert all(e.get("partition") for e in es)
    got = {r["tag"]: r["v"] for r in
           orctable.read_table(spark, t).collect()}
    assert got["33"] == 7 and got["34"] == 34


def test_update_stats_refresh_enables_pruning(spark, tmp_path):
    """The rewritten file's manifest stats reflect the NEW values —
    a later read predicated on the old range prunes it."""
    t, per = _sorted_table(spark, tmp_path, n=200, files=2)
    orctable.update_table(spark, t, set={"v": 0},
                          predicate=("v", ">=", 100))
    snap = orctable.load_snapshot(t)
    es = sorted(orctable.manifest_entries(t, snap),
                key=lambda e: e["stats"]["v"]["max"])
    # the rewritten file's v-stats collapsed to [0, 0]
    assert es[0]["stats"]["v"]["min"] == 0
    assert es[0]["stats"]["v"]["max"] == 0
    assert orctable.table_count(spark, t, ("v", ">=", 100)) == 0
