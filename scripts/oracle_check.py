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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def value_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, decimal.Decimal):
                v = float(v)
            if isinstance(v, float):
                v = round(v, 6)
                if v == 0:
                    v = 0.0
            vals.append(repr(v))
        canon.append("|".join(vals))
    canon.sort()
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
            srows = [tuple(r) for r in sdf.collect()]
            rec["spark_rows"] = len(srows)
            if name not in oracles:
                rec["oracle"] = "absent (rows-only check)"
                rec["ok"] = True
            else:
                cur = con.execute(oracles[name])
                ocols = [d[0] for d in cur.description]
                orows = [tuple(r) for r in cur.fetchall()]
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
