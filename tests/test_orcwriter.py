"""ORC file writer: our kernels assemble real .orc files that
independent implementations (pyarrow C++ ORC, Spark JVM ORC) read back
content-identical."""

import numpy as np
import pyarrow as pa
import pytest

from orc_spark import stripe
from orc_spark.sources import orcfile, orcwriter

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


@pytest.mark.parametrize("codec", ["none", "zlib"])
def test_write_read_own_reader(token_table, tmp_path, codec):
    path = str(tmp_path / f"t_{codec}.orc")
    st = orcwriter.write_orc(token_table, path, codec=codec,
                             stripe_rows=1500)
    assert st["rows"] == token_table.num_rows
    assert st["stripes"] == 3
    f = orcfile.ORCFile(path)
    rows = list(f.read_all())
    assert len(rows) == token_table.num_rows
    toks = token_table.column("tokens").to_pylist()
    for i in (0, 1234, 3999):
        assert rows[i]["tokens"] == toks[i]
        assert rows[i]["doc_id"] == f"doc-{i:012d}"


def test_pyarrow_cpp_reader_reads_our_file(token_table, tmp_path):
    from pyarrow import orc as pa_orc
    path = str(tmp_path / "t.orc")
    orcwriter.write_orc(token_table, path, codec="zlib")
    got = pa_orc.read_table(path)
    assert got.num_rows == token_table.num_rows
    for col in token_table.column_names:
        assert got.column(col).to_pylist() == \
            token_table.column(col).to_pylist(), col


def test_spark_jvm_reader_reads_our_file(spark, token_table, tmp_path):
    from pyspark.sql import functions as F
    path = str(tmp_path / "t.orc")
    orcwriter.write_orc(token_table, path, codec="zlib")
    df = spark.read.orc(path)
    assert df.count() == token_table.num_rows
    got = df.agg(F.sum("n_tok"), F.countDistinct("source"),
                 F.sum(F.size("tokens"))).collect()[0]
    want_ntok = sum(token_table.column("n_tok").to_pylist())
    assert got[0] == want_ntok
    assert got[1] == 3
    assert got[2] == want_ntok


def test_nulls_and_scalars(tmp_path):
    specs = stripe.parse_schema([
        ("a", "bigint"), ("b", "string"), ("c", "double"),
        ("d", "boolean"), ("ts", "timestamp"),
    ])
    t = pa.table({
        "a": pa.array([1, None, 3, 2 ** 40], pa.int64()),
        "b": pa.array(["x", "y", None, "x"], pa.string()),
        "c": pa.array([1.5, None, 3.25, -1e300]),
        "d": pa.array([True, False, None, True]),
        "ts": pa.array([1_500_000_000_000_000, None, 0,
                        1_420_070_400_000_000], pa.timestamp("us")),
    })
    path = str(tmp_path / "n.orc")
    orcwriter.write_orc(t, path, specs=specs)
    from pyarrow import orc as pa_orc
    got = pa_orc.read_table(path)
    for col in t.column_names:
        assert got.column(col).to_pylist() == t.column(col).to_pylist(), col


def test_distributed_orc_sink(spark, token_table, tmp_path):
    """Each Spark partition writes a real .orc file via our kernels;
    Spark's JVM reader reads the directory back."""
    from pyspark.sql import functions as F
    from orc_spark.operators import encode as enc_ops
    out = str(tmp_path / "orcsink")
    df = spark.createDataFrame(token_table).repartition(3)
    orcwriter.dataframe_to_orc_dir(df, out)
    back = spark.read.orc(out)
    assert back.count() == token_table.num_rows
    got = back.agg(F.sum("n_tok")).collect()[0][0]
    assert got == sum(token_table.column("n_tok").to_pylist())
