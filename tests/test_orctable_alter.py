"""ALTER TABLE on snapshot-managed tables (sources/orctable.py r5):
add_column / drop_column / rename_column are METADATA-ONLY commits —
no data file is rewritten — and reads resolve renamed columns through
the table's name history (stable field ids, the role Iceberg's field
ids play).  Historical names stay reserved so an old data file's
physical column never becomes ambiguous; per-file rewrite operations
(DELETE/UPDATE/MERGE, hybrid COUNT) refuse legacy layouts until
rewrite_migrate normalizes them."""

import os

import pytest
from pyspark.sql import functions as F

from orc_spark.sources import orctable


def _df(spark, lo, hi, parts=1, tok="n_tok"):
    return spark.range(lo, hi, 1, parts).selectExpr(
        "id AS doc_id", f"CAST(id * 10 AS INT) AS {tok}",
        "CAST(id AS STRING) AS tag")


def _mk(spark, tmp_path, name="t"):
    t = str(tmp_path / name)
    orctable.create_table(
        t, "struct<doc_id:bigint,n_tok:int,tag:string>")
    orctable.write_table(_df(spark, 0, 50), t)
    return t


# -- metadata layer ---------------------------------------------------


def test_alter_metadata_only_and_reserved_names(spark, tmp_path):
    t = _mk(spark, tmp_path)
    files_before = {e["path"]
                    for e in orctable.manifest_entries(
                        t, orctable.load_snapshot(t))}
    s = orctable.rename_column(t, "n_tok", "token_count")
    assert s["operation"] == "rename-column"
    assert "token_count:int" in s["schema"]
    col = next(c for c in s["columns"] if c["name"] == "token_count")
    assert col["prev"] == ["n_tok"] and col["id"] == 2
    s = orctable.add_column(t, "lang", "string")
    assert [c["id"] for c in s["columns"]] == [1, 2, 3, 4]
    s = orctable.drop_column(t, "tag")
    assert "tag" in s["retired"]
    # metadata-only: the file set never changed
    files_after = {e["path"]
                   for e in orctable.manifest_entries(
                       t, orctable.load_snapshot(t))}
    assert files_after == files_before
    # historical names are reserved, in every direction
    with pytest.raises(ValueError, match="reserved"):
        orctable.add_column(t, "n_tok", "int")
    with pytest.raises(ValueError, match="reserved"):
        orctable.add_column(t, "tag", "string")
    with pytest.raises(ValueError, match="already"):
        orctable.rename_column(t, "lang", "doc_id")
    with pytest.raises(ValueError, match="not in table schema"):
        orctable.rename_column(t, "n_tok", "x")
    with pytest.raises(ValueError, match="invalid column name"):
        orctable.add_column(t, "bad name", "int")


def test_rename_partition_source_rejected(spark, tmp_path):
    t = str(tmp_path / "p")
    orctable.create_table(
        t, "struct<doc_id:bigint,n_tok:int,tag:string>",
        partition_by=["bucket(4, doc_id)"])
    with pytest.raises(ValueError, match="partition transform"):
        orctable.rename_column(t, "doc_id", "id2")
    with pytest.raises(ValueError, match="partition transform"):
        orctable.drop_column(t, "doc_id")


def test_overwrite_resets_name_history(spark, tmp_path):
    t = _mk(spark, tmp_path)
    orctable.rename_column(t, "n_tok", "token_count")
    orctable.write_table(
        _df(spark, 0, 10, tok="token_count"), t, mode="overwrite")
    # no pre-overwrite file survives, so the old name is free again
    s = orctable.add_column(t, "n_tok", "int")
    assert "n_tok:int" in s["schema"]


# -- read path across schema epochs -----------------------------------


def test_rename_reads_both_epochs_exactly(spark, tmp_path):
    t = _mk(spark, tmp_path)                     # physical n_tok
    orctable.rename_column(t, "n_tok", "token_count")
    orctable.write_table(
        _df(spark, 50, 100, tok="token_count"), t)  # physical new
    out = orctable.read_table(spark, t)
    assert out.columns == ["doc_id", "token_count", "tag"]
    rows = {r["doc_id"]: r["token_count"] for r in out.collect()}
    assert len(rows) == 100 and rows[7] == 70 and rows[99] == 990
    # predicate on the LOGICAL name hits both epochs
    sel = orctable.read_table(
        spark, t, predicate=("token_count", ">=", 480))
    assert sorted(r["doc_id"] for r in sel.collect()) == \
        list(range(48, 100))
    # projection through the mapping
    proj = orctable.read_table(
        spark, t, columns=["token_count", "doc_id"])
    assert proj.columns == ["token_count", "doc_id"]
    assert proj.count() == 100
    # time travel to the pre-rename snapshot restores the old name
    v1 = orctable.read_table(spark, t, snapshot=1)
    assert v1.columns == ["doc_id", "n_tok", "tag"]
    assert v1.count() == 50


def test_rename_manifest_pruning_translates(spark, tmp_path):
    """Manifest min/max pruning still bites on the OLD physical name:
    a range predicate on the renamed column must plan only the files
    whose translated stats overlap."""
    t = str(tmp_path / "s")
    orctable.create_table(t, "struct<doc_id:bigint,n_tok:int,tag:string>")
    for i in range(4):                 # 4 files, disjoint n_tok ranges
        orctable.write_table(_df(spark, i * 25, (i + 1) * 25), t)
    orctable.rename_column(t, "n_tok", "token_count")
    seen = []
    import orc_spark.sources.orcscan as orcscan
    real = orcscan.orc_scan

    def spy(spark_, files, **kw):
        seen.append(list(files))
        return real(spark_, files, **kw)

    import unittest.mock as mock
    with mock.patch.object(orcscan, "orc_scan", side_effect=spy):
        out = orctable.read_table(
            spark, t, predicate=("token_count", ">=", 800))
        got = sorted(r["doc_id"] for r in out.collect())
    assert got == list(range(80, 100))
    planned = [f for grp in seen for f in grp]
    assert len(planned) == 1           # 3 of 4 files pruned driver-side


def test_add_and_drop_column_reads(spark, tmp_path):
    t = _mk(spark, tmp_path)
    orctable.add_column(t, "lang", "string")
    out = orctable.read_table(spark, t)
    assert out.where(F.col("lang").isNull()).count() == 50  # backfill NULL
    df2 = spark.range(50, 60, 1, 1).selectExpr(
        "id AS doc_id", "CAST(id * 10 AS INT) AS n_tok",
        "CAST(id AS STRING) AS tag", "'en' AS lang")
    orctable.write_table(df2, t)
    assert orctable.read_table(spark, t) \
        .where("lang = 'en'").count() == 10
    orctable.drop_column(t, "lang")
    cur = orctable.read_table(spark, t)
    assert cur.columns == ["doc_id", "n_tok", "tag"]
    # the bytes are still there for time travel
    pre = orctable.read_table(
        spark, t, snapshot=orctable.current_version(t) - 1)
    assert "lang" in pre.columns and \
        pre.where("lang = 'en'").count() == 10
    with pytest.raises(ValueError, match="predicate column"):
        orctable.read_table(spark, t, predicate=("lang", "==", "en")) \
            .count()


# -- DML guard + migrate ----------------------------------------------


def test_dml_refuses_legacy_then_migrate_normalizes(spark, tmp_path):
    t = _mk(spark, tmp_path)
    orctable.rename_column(t, "n_tok", "token_count")
    orctable.write_table(_df(spark, 50, 60, tok="token_count"), t)
    for fn, kw in (
            (orctable.delete_from, {"predicate": ("doc_id", "==", 3)}),
            (orctable.update_table, {"set": {"tag": "x"}}),
    ):
        with pytest.raises(ValueError, match="rewrite_migrate"):
            fn(spark, t, **kw)
    with pytest.raises(ValueError, match="rewrite_migrate"):
        orctable.table_count(spark, t, ("doc_id", ">=", 0))
    snap = orctable.rewrite_migrate(spark, t)
    assert snap["operation"] == "replace"
    assert snap["summary"]["migrated_files"] >= 1
    # every live file now carries the current physical names
    cols, _ = orctable._columns_meta(snap)
    assert orctable._legacy_entries(
        orctable.manifest_entries(t, snap), cols) == []
    # second migrate is a no-op
    assert orctable.rewrite_migrate(spark, t)["version"] == \
        snap["version"]
    orctable.delete_from(spark, t, ("doc_id", "==", 3))
    out = orctable.read_table(spark, t)
    assert out.count() == 59
    assert orctable.table_count(
        spark, t, ("token_count", ">=", 0)) == 59
    # the migrate replace preserved every row (time travel check)
    pre = orctable.read_table(spark, t, snapshot=snap["version"] - 1)
    assert pre.count() == 60


def test_migrate_zero_recode_preserves_bytes_exactly(spark, tmp_path):
    """rewrite_migrate must byte-copy stripes and rewrite only the
    footer's field names: nanosecond timestamps, codec, stride and
    statistics survive bit-exactly (a DataFrame re-encode would
    truncate ns to Spark's microseconds)."""
    import pyarrow as pa

    from orc_spark.sources.orcfile import ORCFile
    from orc_spark.sources.orcwriter import ORCFileWriter
    t = str(tmp_path / "ns")
    orctable.create_table(t, "struct<doc_id:bigint,ts:timestamp>")
    # seed a file through the ns write path so the stored nanos are
    # NOT representable in Spark's microsecond timestamps
    p0 = os.path.join(t, "data", "seed-00000.orc")
    w = ORCFileWriter(p0, codec="zstd")
    w.write_batch(pa.RecordBatch.from_arrays(
        [pa.array(range(20), pa.int64()),
         pa.array([1600000000_000000000 + 1000 * i + 7
                   for i in range(20)], pa.timestamp("ns"))],
        names=["doc_id", "ts"]))
    w.close()
    entries = [{"path": "data/seed-00000.orc", "n_rows": 20,
                "bytes": os.path.getsize(p0),
                "type": "struct<doc_id:bigint,ts:timestamp>",
                "codec": "zstd", "stats": {}}]
    man = orctable._write_manifest(t, entries)
    orctable._commit_retrying(t, orctable.load_snapshot(t), "append",
                              man, entries,
                              "struct<doc_id:bigint,ts:timestamp>")
    orctable.rename_column(t, "ts", "event_ts")
    snap = orctable.rewrite_migrate(spark, t)
    assert snap["summary"]["migrated_files"] == 1
    [e1] = orctable.manifest_entries(t, snap)
    assert e1["codec"] == "zstd" and "event_ts" in e1["type"]
    # stripe region is a verbatim byte copy (same length prefix)
    f_old, f_new = ORCFile(p0), ORCFile(os.path.join(t, e1["path"]))
    s_old, s_new = f_old.stripes[0], f_new.stripes[0]
    ln = sum(s_old.get(k, [0])[0] for k in (2, 3, 4))
    assert bytes(f_old.data[s_old.get(1, [0])[0]:
                            s_old.get(1, [0])[0] + ln]) == \
        bytes(f_new.data[s_new.get(1, [0])[0]:
                         s_new.get(1, [0])[0] + ln])
    # ns-exact through the mapped read
    out = orctable.read_table(spark, t, timestamp_nanos=True)
    assert "event_ts" in out.columns
    vals = sorted(r["event_ts"] for r in out.collect())
    assert vals[0] == 1600000000_000000007 \
        and vals[-1] == 1600000000_000019007


def test_dml_on_added_column_skips_pre_add_files(spark, tmp_path):
    """A predicate on a column ADDED later must treat pre-add files
    as all-NULL (no comparison matches) instead of crashing the
    per-file classifier."""
    t = _mk(spark, tmp_path)                 # 50 rows, no 'lang'
    orctable.add_column(t, "lang", "string")
    df2 = spark.range(50, 60, 1, 1).selectExpr(
        "id AS doc_id", "CAST(id * 10 AS INT) AS n_tok",
        "CAST(id AS STRING) AS tag", "'en' AS lang")
    orctable.write_table(df2, t)
    assert orctable.table_count(spark, t, ("lang", "==", "en")) == 10
    orctable.delete_from(spark, t, ("lang", "==", "en"))
    out = orctable.read_table(spark, t)
    assert out.count() == 50
    assert out.where("lang IS NOT NULL").count() == 0
    orctable.update_table(spark, t, set={"tag": "x"},
                          predicate=("lang", "==", "fr"))  # no-op
    assert orctable.read_table(spark, t) \
        .where("tag = 'x'").count() == 0


def test_update_backfills_column_added_after_write(spark, tmp_path):
    """UPDATE SET on a column ADDed after data files were written —
    the backfill case (r6 fix, ADVICE r5 #1): pre-add files null-fill
    the SET column under its declared type before applying the
    assignment instead of crashing in the executor."""
    t = _mk(spark, tmp_path)                 # 50 rows, no 'lang'
    orctable.add_column(t, "lang", "string")
    # unpredicated backfill touches every pre-add file
    orctable.update_table(spark, t, set={"lang": "und"})
    out = orctable.read_table(spark, t)
    assert out.count() == 50
    assert out.where("lang = 'und'").count() == 50
    # predicated backfill (predicate on an ORIGINAL column) rewrites
    # only matching rows; non-matching rows keep the null fill
    orctable.add_column(t, "score", "int")
    orctable.update_table(spark, t, set={"score": 7},
                          predicate=("n_tok", ">=", 250))
    out = orctable.read_table(spark, t)
    assert out.where("score = 7").count() == 25
    assert out.where("score IS NULL").count() == 25
    # callable assignment over a batch that lacks the column works too
    orctable.update_table(
        spark, t, set={"score": lambda b: __import__("pyarrow")
                       .compute.add(b.column("n_tok"), 1)})
    got = orctable.read_table(spark, t) \
        .selectExpr("sum(cast(score as bigint)) s").collect()[0]["s"]
    assert got == sum(i * 10 + 1 for i in range(50))


def test_field_ids_never_reused_after_drop(spark, tmp_path):
    t = _mk(spark, tmp_path)                 # ids 1..3
    orctable.drop_column(t, "tag")           # id 3 retired
    s = orctable.add_column(t, "lang", "string")
    ids = {c["name"]: c["id"] for c in s["columns"]}
    assert ids["lang"] == 4                  # id 3 is never reused
    assert s["last_column_id"] == 4


def test_dml_rejects_dropped_column_predicates(spark, tmp_path):
    """A dropped column's statistics (and bytes) still live inside
    data files — per-file DML must refuse predicates on it instead of
    silently classifying against ghost stats."""
    t = _mk(spark, tmp_path)
    orctable.drop_column(t, "tag")
    with pytest.raises(ValueError, match="not in table schema"):
        orctable.delete_from(spark, t, ("tag", "==", "3"))
    with pytest.raises(ValueError, match="not in table schema"):
        orctable.update_table(spark, t, set={"n_tok": 1},
                              predicate=("tag", "==", "3"))
    with pytest.raises(ValueError, match="not in table schema"):
        orctable.table_count(spark, t, ("tag", "==", "3"))
    # the surviving columns still work
    orctable.delete_from(spark, t, ("doc_id", "==", 3))
    assert orctable.table_count(spark, t) == 49


def test_merge_shuffle_plan_is_rename_safe(spark, tmp_path, monkeypatch):
    """Above the key threshold MERGE reads via read_table (mapping-
    aware) and rewrites everything — no migrate needed."""
    t = _mk(spark, tmp_path)
    orctable.rename_column(t, "n_tok", "token_count")
    monkeypatch.setattr(orctable, "_MERGE_MAX_KEYS", 0)
    src = spark.range(0, 5, 1, 1).selectExpr(
        "id AS doc_id", "CAST(999 AS INT) AS token_count",
        "'m' AS tag")
    orctable.merge_table(spark, t, src, on="doc_id")
    out = orctable.read_table(spark, t)
    assert out.where("token_count = 999").count() == 5
    assert out.count() == 50
    # the rewrite normalized the layout: COW DML works again
    orctable.delete_from(spark, t, ("doc_id", "==", 7))
    assert orctable.read_table(spark, t).count() == 49


def test_changelog_across_alter_and_rename_epochs(spark, tmp_path):
    t = _mk(spark, tmp_path)                       # v1 append
    orctable.rename_column(t, "n_tok", "token_count")   # v2
    orctable.write_table(
        _df(spark, 50, 70, tok="token_count"), t)  # v3 append
    ch = orctable.read_table_changes(spark, t, 1)
    assert ch.columns == ["doc_id", "token_count", "tag"]
    assert sorted(r["doc_id"] for r in ch.collect()) == \
        list(range(50, 70))
    # a changelog STARTING before the rename maps the old epoch too
    ch0 = orctable.read_table_changes(spark, t, 0)
    assert ch0.count() == 70


def test_datasource_table_mode_guards_legacy(spark, tmp_path):
    t = _mk(spark, tmp_path)
    orctable.rename_column(t, "n_tok", "token_count")
    from orc_spark.sources import datasource
    datasource.register(spark)
    with pytest.raises(Exception, match="rewrite_migrate"):
        spark.read.format("orc_spark").option("table", t) \
            .load().count()
    orctable.rewrite_migrate(spark, t)
    df = spark.read.format("orc_spark").option("table", t).load()
    assert df.count() == 50 and "token_count" in df.columns
