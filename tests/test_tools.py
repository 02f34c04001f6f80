"""CLI tools (reference tools/ parity)."""

import io
import subprocess
import sys

import pytest

from orc_spark.tools import orc2csv

EX = "/root/reference/examples"


def test_orc2csv_selected_columns():
    buf = io.StringIO()
    rc = orc2csv.main(
        ["-f", f"{EX}/TestOrcFile.test1.orc", "-c", "boolean1,int1,string1"],
        out=buf)
    assert rc == 0
    assert buf.getvalue().splitlines() == ["False,65536,hi",
                                           "True,65536,bye"]


def test_orc2csv_all_columns_and_containers():
    buf = io.StringIO()
    orc2csv.main(["-f", f"{EX}/TestOrcFile.test1.orc"], out=buf)
    lines = buf.getvalue().splitlines()
    assert len(lines) == 2
    # containers flatten to JSON
    assert '""{""list"": [{""int1"": 1' in lines[0] \
        or '{""list"":' in lines[0]


def test_orc2csv_missing_column_errors():
    with pytest.raises(SystemExit) as e:
        orc2csv.main(["-f", f"{EX}/decimal.orc", "-c", "nope"],
                     out=io.StringIO())
    assert "no such column" in str(e.value)


def test_orc2csv_whole_golden_corpus_row_counts():
    """Every golden example with an expected output streams through
    orc2csv with the expected row count (smoke over all types,
    compressions, and RLE versions the corpus covers)."""
    import csv
    import glob
    import os
    from orc_spark.sources.orcfile import load_expected
    expected_files = sorted(glob.glob(f"{EX}/expected/*.jsn.gz"))
    assert len(expected_files) >= 20
    for exp in expected_files:
        name = os.path.basename(exp)[:-7]
        orc = f"{EX}/{name}.orc"
        if not os.path.exists(orc):
            continue
        buf = io.StringIO()
        orc2csv.main(["-f", orc], out=buf)
        buf.seek(0)
        n_rows = sum(1 for _ in csv.reader(buf))
        assert n_rows == len(load_expected(exp)), name


def test_orcmeta_golden_and_own_file(tmp_path):
    import json
    import numpy as np
    import pyarrow as pa
    from orc_spark.tools import orcmeta
    from orc_spark.sources import orcwriter

    m = orcmeta.gather(f"{EX}/TestOrcFile.test1.orc")
    assert m["schema"].startswith("struct<boolean1:boolean,")
    assert m["n_rows"] == 2 and m["compression"] == "zlib"
    assert m["encodings"]["string1"] == "DIRECT_V2"
    assert m["column_statistics"]["byte1"]["max"] == 100

    p = str(tmp_path / "own.orc")
    w = orcwriter.ORCFileWriter(p, codec="zlib", stripe_rows=512,
                                row_index_stride=256,
                                bloom_columns=["k"])
    w.write_batch(pa.RecordBatch.from_arrays(
        [pa.array(np.arange(1000, dtype=np.int64)),
         pa.array([f"k{i}" for i in range(1000)])],
        names=["v", "k"]))
    w.close()
    m = orcmeta.gather(p)
    assert m["n_stripes"] == 2 and m["bloom_columns"] == ["k"]
    assert m["row_index_stride"] == 256
    assert m["column_statistics"]["v"] == {
        "n": 1000, "has_null": False, "min": 0, "max": 999,
        "sum": 499500}
    # JSON mode emits one parseable object
    buf = io.StringIO()
    assert orcmeta.main(["-f", p, "-j"], out=buf) == 0
    assert json.loads(buf.getvalue())["n_rows"] == 1000


def test_orcmeta_whole_golden_corpus():
    """gather() parses every golden example's metadata (all
    compressions, RLE versions, and type shapes) with consistent
    row accounting."""
    import glob
    from orc_spark.tools import orcmeta
    files = sorted(glob.glob(f"{EX}/*.orc"))
    assert len(files) >= 24
    for p in files:
        m = orcmeta.gather(p)
        assert m["n_rows"] == sum(s["rows"] for s in m["stripes"]), p
        # every footer schema round-trips through the type grammar
        # (testTimestamp.orc has a bare non-struct root)
        from orc_spark import orctypes
        assert orctypes.parse_orc_type(
            m["schema"]).orc_string() == m["schema"], p
        assert m["compression"] in ("none", "zlib", "snappy",
                                    "lzo", "lz4", "zstd"), p


def test_orc2csv_module_entrypoint():
    res = subprocess.run(
        [sys.executable, "-m", "orc_spark.tools.orc2csv",
         "-f", f"{EX}/decimal.orc"],
        capture_output=True, text=True, cwd="/root/repo")
    assert res.returncode == 0
    lines = res.stdout.splitlines()
    assert len(lines) == 6000
    assert lines[0] == "-1000.5"


def test_orc2csv_dotted_column():
    """r5: -c accepts dotted nested paths like orc_scan's columns=
    (reference GetField semantics); unknown paths fail loudly."""
    import io
    from orc_spark.tools import orc2csv
    buf = io.StringIO()
    orc2csv.main(["-f", f"{EX}/TestOrcFile.test1.orc",
                  "-c", "int1,middle.list"], out=buf)
    lines = buf.getvalue().strip().splitlines()
    assert len(lines) == 2
    assert lines[0].startswith("65536,")
    assert '""bye""' in lines[0]  # nested list-of-struct surfaced
    import pytest
    with pytest.raises(SystemExit, match="no field"):
        orc2csv.main(["-f", f"{EX}/TestOrcFile.test1.orc",
                      "-c", "middle.nope"], out=io.StringIO())
