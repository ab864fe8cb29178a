"""Replicates the driver's correctness gate: run each ``queries()`` entry
on Spark and its ``oracle_sql()`` in DuckDB over the same parquet tables,
compare schema / row count / order-insensitive values. Uses sf0.001 for
speed (the driver runs sf0.01)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def run_oracle(sql: str) -> list[tuple]:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if hasattr(v, "__int__") and not isinstance(v, (int, bool)):
        return int(v)
    return v


def normalize(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


NAMES = sorted(entrymod.queries().keys())


def test_all_queries_have_oracles():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    missing = [k for k in q if k not in o]
    assert not missing, f"rows-only (no oracle): {missing}"


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    sdf = q(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    if sql is None:
        assert len(srows) >= 0  # rows-only check
        return
    ocols, orows = run_oracle(sql)
    assert sorted(scols) == sorted(ocols), f"{name}: schema mismatch"
    assert len(srows) == len(orows), (
        f"{name}: rowcount spark={len(srows)} oracle={len(orows)}"
    )
    ns, no = normalize(scols, srows), normalize(ocols, orows)
    mism = [i for i, (a, b) in enumerate(zip(ns, no)) if a != b]
    assert not mism, (
        f"{name}: {len(mism)} mismatched rows; first: "
        f"spark={ns[mism[0]]} oracle={no[mism[0]]}"
    )


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns
