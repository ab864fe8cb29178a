"""Deterministic cross-engine hashing.

All dedup/LSH operators need hash functions that are *identical* in the
Spark engine and the DuckDB oracle. md5 is the common denominator:
``h(s) = int(md5(s)[:15], 16)`` is a 60-bit positive integer computable
bit-identically in both (Spark: conv(substring(md5, 1, 15), 16, 10);
DuckDB: cast('0x' || substring(md5, 1, 15) as ubigint)).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_long(col: Column) -> Column:
    """60-bit deterministic hash of a string column (positive long)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_long_sql(expr: str) -> str:
    """DuckDB SQL for the same hash."""
    return f"cast(concat('0x', substring(md5({expr}), 1, 15)) as ubigint)::bigint"
