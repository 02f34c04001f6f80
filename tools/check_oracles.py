"""Driver-mimic: run every __spark_entry__ query against its DuckDB
oracle at sf0.01 and compare row counts + order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        try:
            import numpy as np
            if np.issubdtype(df[c].dtype, np.floating):
                df[c] = df[c].round(6)
            if np.issubdtype(df[c].dtype, np.integer):
                df[c] = df[c].astype("int64")
        except Exception:
            pass
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    from pyspark.sql import SparkSession
    import __spark_entry__ as entrymod

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            spark_df = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"[FAIL-run ] {name}: {str(e)[:200]}")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(spark_df)} rows")
            continue
        try:
            oracle_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            failures.append((name, f"ORACLE ERROR: {e}"))
            print(f"[FAIL-sql ] {name}: {str(e)[:200]}")
            continue
        a, b = normalize(spark_df), normalize(oracle_df)
        if list(a.columns) != list(b.columns):
            failures.append((name, f"schema {list(a.columns)} vs "
                             f"{list(b.columns)}"))
            print(f"[FAIL-sch ] {name}: {list(a.columns)} vs {list(b.columns)}")
            continue
        if len(a) != len(b):
            failures.append((name, f"rows {len(a)} vs {len(b)}"))
            print(f"[FAIL-rows] {name}: {len(a)} vs {len(b)}")
            continue
        if not a.equals(b):
            neq = (a != b) & ~(a.isna() & b.isna())
            bad_cols = [c for c in a.columns if neq[c].any()]
            failures.append((name, f"values differ in {bad_cols}"))
            print(f"[FAIL-val ] {name}: differs in {bad_cols}")
            for c in bad_cols[:2]:
                i = neq[c].idxmax()
                print(f"    {c}[{i}]: spark={a[c][i]!r} oracle={b[c][i]!r}")
            continue
        print(f"[OK       ] {name}: {len(a)} rows match")
    print(f"\n{len(failures)} failures")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
