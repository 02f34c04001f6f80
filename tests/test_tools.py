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


def test_orc2csv_module_entrypoint():
    res = subprocess.run(
        [sys.executable, "-m", "orc_spark.tools.orc2csv",
         "-f", f"{EX}/decimal.orc"],
        capture_output=True, text=True, cwd="/root/repo")
    assert res.returncode == 0
    lines = res.stdout.splitlines()
    assert len(lines) == 6000
    assert lines[0] == "-1000.5"
