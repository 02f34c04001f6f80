"""Hidden partitioning on snapshot-managed tables (orctable r5):
identity + md5-bucket transforms, one partition tuple per data file,
manifest-level partition pruning, spec persistence through the whole
snapshot lifecycle (append/overwrite/compact/delete/rollback)."""

import json
import os

import pytest

from orc_spark.sources import orcscan, orctable
from orc_spark.sources.orcfile import ORCFile
from orc_spark.sources.orctable import _bucket_of, _parse_spec


def _df(spark, n=300, parts=4):
    return spark.range(0, n, 1, parts).selectExpr(
        "CAST(id AS INT) AS v",
        "concat('d', CAST(id AS STRING)) AS doc_id",
        "CASE WHEN id % 3 = 0 THEN 'web' WHEN id % 3 = 1 "
        "THEN 'book' ELSE 'code' END AS source")


SCHEMA = "struct<v:int,doc_id:string,source:string>"


def _ptable(spark, tmp_path, name="pt", n=300,
            partition_by=("source", "bucket(4, doc_id)")):
    t = str(tmp_path / name)
    orctable.create_table(t, SCHEMA, partition_by=list(partition_by))
    orctable.write_table(_df(spark, n), t)
    return t


def test_parse_spec_forms():
    assert _parse_spec(["source", "identity(tag)",
                        "bucket(8, doc_id)"]) == [
        {"str": "identity(source)", "transform": "identity",
         "col": "source"},
        {"str": "identity(tag)", "transform": "identity",
         "col": "tag"},
        {"str": "bucket(8,doc_id)", "transform": "bucket",
         "col": "doc_id", "n": 8}]
    with pytest.raises(ValueError, match="cannot parse"):
        _parse_spec(["truncate(4, x)"])
    from orc_spark import orctypes
    with pytest.raises(ValueError, match="not a top-level field"):
        orctable._validate_spec(_parse_spec(["nope"]),
                                orctypes.parse_orc_type(SCHEMA))


def test_one_tuple_per_file_and_roundtrip(spark, tmp_path):
    t = _ptable(spark, tmp_path)
    snap = orctable.load_snapshot(t)
    assert snap["spec"] == ["identity(source)", "bucket(4,doc_id)"]
    entries = orctable.manifest_entries(t, snap)
    seen = set()
    for e in entries:
        part = e["partition"]
        assert set(part) == {"identity(source)", "bucket(4,doc_id)"}
        assert part["identity(source)"] in ("web", "book", "code")
        assert part["bucket(4,doc_id)"] in range(4)
        seen.add((part["identity(source)"],
                  part["bucket(4,doc_id)"]))
        # the file's OWN contents match its declared tuple
        f = os.path.join(t, e["path"])
        rows = orcscan.orc_scan(spark, f).collect()
        for r in rows:
            assert r["source"] == part["identity(source)"]
            assert _bucket_of(r["doc_id"], 4) == \
                part["bucket(4,doc_id)"]
    # all 3 sources x several buckets materialized
    assert len({s for s, _ in seen}) == 3
    got = sorted(r["v"] for r in orctable.read_table(spark, t)
                 .collect())
    assert got == list(range(300))


def test_bucket_hash_matches_spark_expr(spark):
    """The clustering expression (Spark md5/conv) and _bucket_of
    (Python hashlib) MUST agree — drift would only scatter a tuple
    across more files (correctness holds), but parity is what makes
    the clustering effective, so pin it."""
    vals = ["d1", "d42", "", "héllo", "0", "12345678901234567890"]
    rows = spark.createDataFrame([(v,) for v in vals], "x string") \
        .selectExpr(
            "x", "CAST(conv(substring(md5(CAST(x AS STRING)), 1, "
            "15), 16, 10) AS LONG) % 7 AS b").collect()
    for r in rows:
        assert _bucket_of(r["x"], 7) == r["b"], r["x"]
    # int keys render identically under str() and CAST AS STRING
    irows = spark.createDataFrame([(i,) for i in (0, 7, -3, 10**12)],
                                  "x long").selectExpr(
        "x", "CAST(conv(substring(md5(CAST(x AS STRING)), 1, 15), "
        "16, 10) AS LONG) % 7 AS b").collect()
    for r in irows:
        assert _bucket_of(r["x"], 7) == r["b"], r["x"]


def test_identity_partition_pruning(spark, tmp_path, monkeypatch):
    t = _ptable(spark, tmp_path)
    snap = orctable.load_snapshot(t)
    entries = orctable.manifest_entries(t, snap)
    web_files = {e["path"] for e in entries
                 if e["partition"]["identity(source)"] == "web"}
    seen = []
    real = orcscan.orc_scan

    def spy(spark_, files, **kw):
        seen.append(list(files))
        return real(spark_, files, **kw)

    monkeypatch.setattr(orcscan, "orc_scan", spy)
    df = orctable.read_table(spark, t,
                             predicate=("source", "==", "web"))
    assert df.count() == 100
    assert len(seen) == 1
    assert {os.path.relpath(p, t) for p in seen[0]} == web_files


def test_bucket_partition_pruning(spark, tmp_path, monkeypatch):
    """Equality on the bucketed key reaches only ONE bucket's files —
    min/max stats could never do this for a high-cardinality id."""
    t = _ptable(spark, tmp_path)
    target = "d123"
    b = _bucket_of(target, 4)
    snap = orctable.load_snapshot(t)
    bucket_files = {e["path"] for e in
                    orctable.manifest_entries(t, snap)
                    if e["partition"]["bucket(4,doc_id)"] == b}
    seen = []
    real = orcscan.orc_scan

    def spy(spark_, files, **kw):
        seen.append(list(files))
        return real(spark_, files, **kw)

    monkeypatch.setattr(orcscan, "orc_scan", spy)
    df = orctable.read_table(spark, t,
                             predicate=("doc_id", "==", target))
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["v"] == 123
    assert {os.path.relpath(p, t) for p in seen[0]} <= bucket_files
    # IN-lists prune to the union of member buckets
    seen.clear()
    df = orctable.read_table(
        spark, t, predicate=("doc_id", "in", ("d1", "d2")))
    assert df.count() == 2
    allowed = {e["path"] for e in orctable.manifest_entries(t, snap)
               if e["partition"]["bucket(4,doc_id)"] in
               {_bucket_of("d1", 4), _bucket_of("d2", 4)}}
    assert {os.path.relpath(p, t) for p in seen[0]} <= allowed


def test_partition_aligned_delete_is_metadata_only(spark, tmp_path,
                                                   monkeypatch):
    """DELETE WHERE source = 'web' on a source-partitioned table
    drops whole files from the manifest — zero decode, zero rewrite
    (the identity tuple prunes keep-files driver-side and the
    dropped files classify all-match from footer stats)."""
    t = _ptable(spark, tmp_path)
    n_data = len(os.listdir(os.path.join(t, "data")))
    snap = orctable.delete_from(spark, t, ("source", "==", "web"))
    assert snap["summary"]["deleted_rows"] == 100
    assert snap["summary"]["rewritten_files"] == 0
    assert snap["summary"]["dropped_files"] > 0
    assert len(os.listdir(os.path.join(t, "data"))) == n_data
    left = orctable.read_table(spark, t)
    assert left.count() == 200
    assert left.where("source = 'web'").count() == 0
    # partition tuples survive on the remaining entries
    for e in orctable.manifest_entries(t,
                                       orctable.load_snapshot(t)):
        assert e["partition"]["identity(source)"] in ("book", "code")


def test_compact_preserves_partition_tuples(spark, tmp_path):
    t = _ptable(spark, tmp_path)
    pre = orctable.manifest_entries(t, orctable.load_snapshot(t))
    pre_tuples = {json.dumps(e["partition"], sort_keys=True)
                  for e in pre}
    snap = orctable.compact_table(spark, t, target_bytes=1 << 40)
    post = orctable.manifest_entries(t, snap)
    # one file per partition tuple after full compaction
    post_tuples = [json.dumps(e["partition"], sort_keys=True)
                   for e in post]
    assert sorted(set(post_tuples)) == sorted(post_tuples)
    assert set(post_tuples) == pre_tuples
    assert sum(e["n_rows"] for e in post) == 300
    # and the per-file contents still honor the tuple
    for e in post:
        part = e["partition"]
        rows = orcscan.orc_scan(
            spark, os.path.join(t, e["path"])).collect()
        assert all(r["source"] == part["identity(source)"]
                   for r in rows)
    assert orctable.read_table(spark, t).count() == 300


def test_null_partition_value(spark, tmp_path):
    t = str(tmp_path / "pnull")
    orctable.create_table(t, SCHEMA, partition_by=["source"])
    df = spark.range(0, 60, 1, 2).selectExpr(
        "CAST(id AS INT) AS v",
        "concat('d', CAST(id AS STRING)) AS doc_id",
        "IF(id % 2 = 0, 'web', NULL) AS source")
    orctable.write_table(df, t)
    entries = orctable.manifest_entries(t, orctable.load_snapshot(t))
    vals = {e["partition"]["identity(source)"] for e in entries}
    assert vals == {"web", None}
    # comparisons never match NULL: the null-partition files prune
    assert orctable.read_table(
        spark, t, predicate=("source", "==", "web")).count() == 30
    assert orctable.table_count(
        spark, t, ("source", "==", "web")) == 30
    assert orctable.read_table(spark, t).count() == 60


def test_spec_persists_through_lifecycle(spark, tmp_path):
    t = _ptable(spark, tmp_path, n=90)
    want = ["identity(source)", "bucket(4,doc_id)"]
    orctable.write_table(_df(spark, 90), t)  # append
    assert orctable.load_snapshot(t)["spec"] == want
    orctable.compact_table(spark, t, target_bytes=1 << 40)
    assert orctable.load_snapshot(t)["spec"] == want
    orctable.delete_from(spark, t, ("v", "<", 10))
    assert orctable.load_snapshot(t)["spec"] == want
    orctable.rollback_table(t, 1)
    assert orctable.load_snapshot(t)["spec"] == want
    orctable.write_table(_df(spark, 10), t, mode="overwrite")
    assert orctable.load_snapshot(t)["spec"] == want


def test_write_requires_partition_columns(spark, tmp_path):
    t = str(tmp_path / "pmiss")
    orctable.create_table(t, SCHEMA, partition_by=["source"])
    bad = spark.range(3).selectExpr("CAST(id AS INT) AS v",
                                    "CAST(id AS STRING) AS doc_id")
    with pytest.raises(ValueError, match="partition column"):
        orctable.write_table(bad, t)


def test_create_rejects_bad_partition_columns():
    import tempfile
    with pytest.raises(ValueError, match="not a top-level field"):
        orctable.create_table(tempfile.mkdtemp() + "/x", SCHEMA,
                              partition_by=["missing"])
    with pytest.raises(ValueError, match="partitionable kinds"):
        orctable.create_table(
            tempfile.mkdtemp() + "/y",
            "struct<v:int,ts:timestamp>", partition_by=["ts"])


def test_table_count_bucket_pruning_opens_one_bucket(spark, tmp_path,
                                                     monkeypatch):
    t = _ptable(spark, tmp_path)
    b = _bucket_of("d7", 4)
    snap = orctable.load_snapshot(t)
    bucket_files = {e["path"] for e in
                    orctable.manifest_entries(t, snap)
                    if e["partition"]["bucket(4,doc_id)"] == b}
    opened = []
    real_init = ORCFile.__init__

    def spy(self, path):
        opened.append(os.path.relpath(path, t))
        real_init(self, path)

    monkeypatch.setattr(ORCFile, "__init__", spy)
    assert orctable.table_count(spark, t,
                                ("doc_id", "==", "d7")) == 1
    assert set(opened) <= bucket_files
