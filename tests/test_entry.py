"""Driver-contract smoke tests: entry() runs and every queries() entry
produces rows at sf0.001; oracle keys are a subset of query keys."""

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_rows"] == 500
    assert r["n_match"] == 500
    assert r["n_token_match"] == 500
    assert r["enc_bytes"] > 0
    assert r["bytes_per_token"] < 4.0


def test_oracle_keys_subset():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 15


def test_all_queries_run(spark):
    for name, fn in entrymod.queries().items():
        df = fn(spark, SF_DIR)
        assert df.count() >= 0, name
