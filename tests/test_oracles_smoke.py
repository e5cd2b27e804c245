"""Driver-contract smoke: a representative subset of queries() vs
oracle_sql() at sf0.001 (the full sweep is scripts/check_oracles.py)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

SUBSET = [
    "tokenize_posinc",
    "match_ordered_2",
    "extract_best_path",
    "dedup_exact",
    "minhash_lsh_pairs",
    "ann_bruteforce",
    "media_features",
    "pricing_summary",
]


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = np.round(df[c].astype(np.float64), 9)
        else:
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, con, name):
    import __spark_entry__ as entrymod

    got = normalize(entrymod.queries()[name](spark, SF).toPandas())
    exp = normalize(con.sql(entrymod.oracle_sql()[name]).df())
    assert list(got.columns) == list(exp.columns)
    assert len(got) == len(exp), f"{len(got)} vs {len(exp)} rows"
    for c in got.columns:
        g, e = got[c].to_numpy(), exp[c].to_numpy()
        if np.issubdtype(got[c].dtype, np.floating):
            assert np.allclose(g, e, rtol=0, atol=1e-8), c
        else:
            assert (g == e).all(), c


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert set(df.columns) == {"doc_id", "spans", "n_spans", "n_text_chars"}


def test_every_query_has_oracle():
    import __spark_entry__ as entrymod

    q, o = entrymod.queries(), entrymod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 20
