"""Local stand-in for the driver's CORRECTNESS gate.

Runs every ``__spark_entry__.queries()`` entry on Spark at sf0.01 and its
``oracle_sql()`` counterpart in DuckDB over the same parquet tables, then
compares row count, schema (column names sorted), and a value hash with
floats rounded to 6 decimals — the documented driver comparison. Prints
one JSON object per entry and a summary line.

Usage: python scripts/oracle_check.py [entry ...]   (default: all)
"""

from __future__ import annotations

import decimal
import hashlib
import json
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


_NON_SCALAR_SPARK = {"array", "map", "struct"}


def lint_scalar_output(spark_schema=None, rows=None, cols=None, side=""):
    """Reject non-scalar (array/map/struct/list) output columns.

    The driver's canonicalizer lexsorts the result with pandas, and list
    values are unhashable there (``TypeError: unhashable type: 'list'`` —
    see CORRECTNESS_r04 graph_link_anchors). Failing here keeps the local
    gate predictive of the driver gate: entries must emit scalar columns
    only (flatten arrays with array_join / array_to_string).
    """
    bad = []
    if spark_schema is not None:
        bad = [
            f.name
            for f in spark_schema.fields
            if f.dataType.typeName() in _NON_SCALAR_SPARK
        ]
    elif rows:
        for i, c in enumerate(cols):
            for row in rows[:50]:
                if isinstance(row[i], (list, dict, set, tuple)):
                    bad.append(c)
                    break
    if bad:
        raise TypeError(
            f"non-scalar {side} output column(s) {bad}: the driver's pandas "
            "lexsort canonicalizer cannot hash list/map/struct values — "
            "flatten with array_join(...) / array_to_string(...)"
        )


def value_hash(rows, cols):
    """Canonical value hash, mirroring the driver: columns sorted by name,
    floats rounded to 6 decimals, rows lexsorted with pandas (so a list
    column fails here exactly the way it fails in the driver)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = {}
    for pos, i in enumerate(order):
        col = []
        for row in rows:
            v = row[i]
            if isinstance(v, decimal.Decimal):
                v = float(v)
            if isinstance(v, float):
                v = round(v, 6)
                if v == 0:
                    v = 0.0
            col.append(v)
        data[f"c{pos}"] = col
    pdf = pd.DataFrame(data)
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    canon = ["|".join(repr(v) for v in row) for row in pdf.itertuples(index=False)]
    return hashlib.md5("\n".join(canon).encode()).hexdigest()


def main() -> int:
    import __spark_entry__ as entrymod
    from galago_git_spark.session import get_spark

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = set(sys.argv[1:])
    spark = get_spark("oracle-check")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec = {"entry": name}
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            lint_scalar_output(spark_schema=sdf.schema, side="spark")
            srows = [tuple(r) for r in sdf.collect()]
            rec["spark_rows"] = len(srows)
            if name not in oracles:
                rec["oracle"] = "absent (rows-only check)"
                rec["ok"] = True
            else:
                cur = con.execute(oracles[name])
                ocols = [d[0] for d in cur.description]
                orows = [tuple(r) for r in cur.fetchall()]
                lint_scalar_output(rows=orows, cols=ocols, side="oracle")
                rec["oracle_rows"] = len(orows)
                rec["rows_match"] = len(srows) == len(orows)
                rec["schema_match"] = sorted(scols) == sorted(ocols)
                rec["hash_match"] = value_hash(srows, scols) == value_hash(
                    orows, ocols
                )
                rec["ok"] = (
                    rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
                )
        except Exception as exc:  # noqa: BLE001 - report and continue
            rec["ok"] = False
            rec["err"] = f"{type(exc).__name__}: {exc}"[:300]
        n_pass += 1 if rec["ok"] else 0
        n_fail += 0 if rec["ok"] else 1
        print(json.dumps(rec), flush=True)

    print(json.dumps({"pass": n_pass, "fail": n_fail, "total": n_pass + n_fail}))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
