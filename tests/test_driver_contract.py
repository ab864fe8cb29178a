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


def _lint_scalar(name, schema):
    """Driver-gate compatibility: the driver canonicalizes results with a
    pandas lexsort, which cannot hash list/map/struct cells (CORRECTNESS_r04
    graph_link_anchors / fti_conflation_part). Every registry entry must
    therefore emit scalar columns only."""
    bad = [
        f.name
        for f in schema.fields
        if f.dataType.typeName() in ("array", "map", "struct")
    ]
    assert not bad, (
        f"{name}: non-scalar output column(s) {bad} — the driver's pandas "
        "canonicalizer rejects these; flatten with F.array_join(...)"
    )


def test_lint_rejects_list_columns():
    """The local gate's lint must reject a list-column frame (VERDICT r4
    item 2's unit-test requirement), on both the Spark-schema path and the
    oracle-rows path."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "oracle_check",
        os.path.join(os.path.dirname(__file__), "..", "scripts", "oracle_check.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from pyspark.sql.types import (
        ArrayType, LongType, StringType, StructField, StructType,
    )

    schema = StructType(
        [
            StructField("doc", LongType()),
            StructField("anchors", ArrayType(StringType())),
        ]
    )
    with pytest.raises(TypeError, match="non-scalar"):
        mod.lint_scalar_output(spark_schema=schema, side="spark")
    with pytest.raises(TypeError, match="non-scalar"):
        mod.lint_scalar_output(
            rows=[(1, ["a", "b"])], cols=["doc", "anchors"], side="oracle"
        )
    # scalar frames pass both paths
    scalar = StructType([StructField("doc", LongType())])
    mod.lint_scalar_output(spark_schema=scalar, side="spark")
    mod.lint_scalar_output(rows=[(1, "a b")], cols=["doc", "anchors"], side="oracle")


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    sdf = q(spark, SF_DIR)
    _lint_scalar(name, sdf.schema)
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


def test_trectext_parse_size_guard(spark, monkeypatch):
    """q_trectext_parse collects the corpus driver-locally by design; a
    larger-than-cap sf must fail fast with guidance, not OOM the driver
    mid-collect (VERDICT r4 item 10)."""
    from galago_git_spark.plans import driver_queries as dq

    monkeypatch.setattr(dq, "TRECTEXT_MAX_DRIVER_ROWS", 10)
    with pytest.raises(RuntimeError, match="smaller sf"):
        dq.q_trectext_parse(spark, SF_DIR)
