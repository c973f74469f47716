"""Mirror of the driver's correctness harness: run every queries() entry at
sf0.01 and compare against oracle_sql() via DuckDB (row count + columns +
values, order-insensitive). Predicts CORRECTNESS_r{N}.json."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _compare(name: str, spark_df, oracle_df):
    got = _normalize(spark_df)
    want = _normalize(oracle_df)
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    for c in got.columns:
        a, b = got[c], want[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            bad = [
                (x, y)
                for x, y in zip(a, b)
                if not (
                    (pd.isna(x) and pd.isna(y))
                    or (not pd.isna(x) and not pd.isna(y) and math.isclose(x, y, rel_tol=0, abs_tol=1e-12))
                )
            ]
            assert not bad, f"{name}.{c}: {len(bad)} float mismatches, e.g. {bad[:3]}"
        else:
            same = a.astype(str).eq(b.astype(str))
            assert same.all(), (
                f"{name}.{c}: {int((~same).sum())} mismatches, e.g. "
                f"{list(zip(a[~same][:3], b[~same][:3]))}"
            )


_ORACLED = sorted(E.oracle_sql().keys())
_ROWS_ONLY = sorted(set(E.queries().keys()) - set(_ORACLED))


@pytest.mark.parametrize("name", _ORACLED)
def test_query_matches_oracle(spark, ddb, name):
    q = E.queries()[name]
    spark_pdf = q(spark, SF_DIR).toPandas()
    oracle_pdf = ddb.sql(E.oracle_sql()[name]).df()
    _compare(name, spark_pdf, oracle_pdf)


def test_every_query_has_an_oracle():
    # oracle coverage must not silently regress: every queries() key needs
    # a matching oracle_sql() entry (the driver's rows-only fallback is a
    # weaker check we no longer rely on anywhere), and no orphan oracles.
    assert _ROWS_ONLY == [], f"queries without an oracle: {_ROWS_ONLY}"
    orphans = sorted(set(_ORACLED) - set(E.queries().keys()))
    assert orphans == [], f"oracles without a query: {orphans}"


def test_bench_covers_every_query():
    # the bench list must not drift from the driver contract: every
    # queries() entry is benched (so BENCH_r{N} prices all operators),
    # and bench never names a query that no longer exists.
    import bench

    missing = sorted(set(E.queries()) - set(bench.BENCH_QUERIES))
    stale = sorted(set(bench.BENCH_QUERIES) - set(E.queries()))
    assert missing == [], f"queries not benched: {missing}"
    assert stale == [], f"bench names unknown queries: {stale}"


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"lang", "n_docs", "sum_chars", "n_po_docs"}
