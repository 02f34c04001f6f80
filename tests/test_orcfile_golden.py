"""End-to-end golden-file parity: decode the reference's real Apache
ORC example files with OUR codec kernels and compare every row against
examples/expected/*.jsn.gz (the reference's own e2e corpus,
orc_test.go:14-131). Covers EVERY example file that has an expected
output — 24 files; the reference's own test passes 7 and skips or
cannot read the rest. Exercises RLE v1 (v0.11 files) and v2,
dictionary and direct strings, nested struct/list/map/union, decimal,
timestamps (writer-timezone DST + pre-1970), date, boolean, byte,
float/double, binary, PRESENT streams, and zlib/snappy/lz4/lzo
chunk decompression (pure-Python decoders).
"""

import json
import os

import pytest

from orc_spark.sources import orcfile

EXAMPLES = "/root/reference/examples"

# files with golden outputs and zlib/none compression (snappy/lzo/lz4
# encoders are absent from the reference writer and this container)
CASES = [
    "decimal",
    "TestOrcFile.test1",
    "orc_split_elim",
    "orc-file-11-format",
    "TestOrcFile.emptyFile",
    "TestOrcFile.columnProjection",
    "TestOrcFile.testPredicatePushdown",
    "TestOrcFile.testStringAndBinaryStatistics",
    "TestOrcFile.testStripeLevelStats",
    "TestOrcFile.testTimestamp",
    "TestOrcFile.metaData",
    "TestOrcFile.testSeek",
    "over1k_bloom",
    "TestOrcFile.testMemoryManagementV11",
    "TestOrcFile.testMemoryManagementV12",
    # the reference's own golden test SKIPS these
    # (orc_test.go:40-47: union, 1900/2038 dates, snappy writer absent)
    # or cannot read them at all (lz4/lzo); our reader handles them all
    "TestOrcFile.testUnionAndTimestamp",
    "TestOrcFile.testDate1900",
    "TestOrcFile.testDate2038",
    "TestOrcFile.testSnappy",
    "nulls-at-end-snappy",
    "TestOrcFile.testWithoutIndex",
    "TestVectorOrcFile.testLz4",
    "TestVectorOrcFile.testLzo",
]


@pytest.mark.parametrize("name", CASES)
def test_golden_orc_file(name):
    path = os.path.join(EXAMPLES, f"{name}.orc")
    expected_path = os.path.join(EXAMPLES, "expected", f"{name}.jsn.gz")
    if not (os.path.exists(path) and os.path.exists(expected_path)):
        pytest.skip(f"{name} not in snapshot")
    import gzip
    from decimal import Decimal
    f = orcfile.ORCFile(path)
    rows = list(f.read_all())
    # expected floats parse as Decimal so decimal columns compare at
    # FULL precision (r4 — the float parse masked precision loss in
    # the reader); genuine doubles still compare with tolerance in _eq
    with gzip.open(expected_path, "rt") as fh:
        expected = [json.loads(line, parse_float=Decimal)
                    for line in fh if line.strip()]
    assert len(rows) == len(expected), "row count"
    for i, (row, exp) in enumerate(zip(rows, expected)):
        got = json.loads(json.dumps(row, default=str))
        if isinstance(exp, dict):
            for col, val in exp.items():
                assert _eq(got.get(col), val), \
                    f"row {i} col {col}: {got.get(col)!r} != {val!r}"
        else:
            assert _eq(got, exp), f"row {i}"


def _eq(a, b):
    # some expected files render doubles through float32 (testSeek);
    # compare floats with relative tolerance, decimals (surfaced as
    # strings via json default=str, expected as Decimal) EXACTLY, and
    # recurse into union dicts
    from decimal import Decimal, InvalidOperation
    if isinstance(b, Decimal):
        if isinstance(a, str):
            try:
                return Decimal(a) == b
            except InvalidOperation:
                return False
        if isinstance(a, float):
            bf = float(b)
            return a == bf or abs(a - bf) <= 1e-6 * max(abs(a), abs(bf))
        return a == b
    if isinstance(a, float) and isinstance(b, (int, float)):
        return a == b or abs(a - b) <= 1e-6 * max(abs(a), abs(b))
    if isinstance(a, dict) and isinstance(b, dict):
        return set(a) == set(b) and all(_eq(a[k], b[k]) for k in a)
    return a == b


def test_demo12_full_decode():
    # demo-12-zlib.orc: 1.92M rows, the README compression reference
    # point; no expected file in the snapshot, so check the documented
    # invariants (cursor_test.go:132-166): row count + last _col0
    f = orcfile.ORCFile(os.path.join(EXAMPLES, "demo-12-zlib.orc"))
    rows = list(f.read_all())
    assert len(rows) == 1920800
    assert rows[-1]["_col0"] == 1920800


def test_column_projection_select():
    # Reader.Select equivalent: only requested fields decoded
    f = orcfile.ORCFile(os.path.join(EXAMPLES, "orc_split_elim.orc"))
    f.select("userid", "string1")
    rows = list(f.read_all())
    assert len(rows) == 25000
    assert set(rows[0].keys()) == {"userid", "string1"}
    assert rows[0]["userid"] == 2 and rows[0]["string1"] == "foo"


def test_golden_statistics_parse_and_cross_check():
    """Statistics parity with the Java writer: file/stripe/row-index
    ColumnStatistics parsed from a reference-corpus file agree with
    the actually-decoded data (proves our stats semantics match the
    writers other engines use)."""
    f = orcfile.ORCFile(os.path.join(EXAMPLES, "demo-11-zlib.orc"))
    assert f.row_index_stride == 10000
    assert len(f.stripe_statistics) == len(f.stripes) == 385
    # col 1 (_col0) is 1..1,920,800 sequential
    fs = f.file_statistics[1]
    assert fs["n"] == 1920800
    assert fs["min"] == 1 and fs["max"] == 1920800
    # stripe 0: decode and compare against its stripe statistics
    rows = f.read_stripe(0)
    vals = [r["_col0"] for r in rows]
    ss = f.stripe_statistics[0][1]
    assert ss["n"] == len(vals)
    assert ss["min"] == min(vals) and ss["max"] == max(vals)
    assert ss["sum"] == sum(vals)
    # row-index entry 0 of stripe 0 covers the first stride
    ri = f.row_index(0, 1)
    assert ri[0]["stats"]["min"] == vals[0]
    assert ri[0]["stats"]["n"] == min(10000, len(vals))


def test_golden_statistics_strings():
    """String min/max/sum(length) stats from the Java writer parse
    correctly and agree with decoded values (test1.orc)."""
    f = orcfile.ORCFile(os.path.join(EXAMPLES, "TestOrcFile.test1.orc"))
    rows = list(f.read_all())
    # locate the string column 'string1' in the type tree
    root = f.types[0]
    col = root.children[root.field_names.index("string1")]
    st = f.file_statistics[col]
    got = [r["string1"] for r in rows]
    assert st["n"] == len([g for g in got if g is not None])
    assert st["min"] == min(got) and st["max"] == max(got)
