"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet tables,
compare row-count, schema (column names), and order-insensitive values.

Usage: PYTHONPATH=/root/repo python scripts/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].astype(np.float64)
        elif str(df[c].dtype).startswith(("int", "Int", "uint")):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    from full_lattice_search_spark.plans.queries import ORACLES, QUERIES

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("check-oracles")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = normalize(fn(spark, sf_dir).toPandas())
            exp = normalize(con.sql(ORACLES[name]).df())
        except Exception as e:
            print(f"FAIL {name}: EXCEPTION {type(e).__name__}: {str(e)[:300]}")
            failures.append(name)
            continue
        dt = time.time() - t0
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            failures.append(name)
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            failures.append(name)
            continue
        mismatch = None
        for c in got.columns:
            g, e = got[c].to_numpy(), exp[c].to_numpy()
            if np.issubdtype(got[c].dtype, np.floating):
                # exact bit equality: the driver hashes values, so rounded
                # floats must be IDENTICAL doubles on both engines
                bad = ~((g == e) | (np.isnan(g) & np.isnan(e)))
            else:
                bad = g != e
            if bad.any():
                i = int(np.argmax(bad))
                mismatch = (c, i, g[i], e[i])
                break
        if mismatch:
            c, i, gv, ev = mismatch
            print(f"FAIL {name}: col {c} row {i}: spark={gv!r} oracle={ev!r}")
            failures.append(name)
        else:
            print(f"PASS {name}: {len(got)} rows [{dt:.1f}s]")

    spark.stop()
    print(f"\n{len(QUERIES) - len(failures)}/{len(QUERIES)} pass")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
