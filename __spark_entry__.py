"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (BM25 top-10 over the sf0.001
``documents`` table). ``queries()`` / ``oracle_sql()`` expose every
implemented operator with a DuckDB-checkable oracle — see
``galago_git_spark/plans/driver_queries.py`` for the implementations and
the cross-engine determinism conventions (rounded-score ranking, md5-based
hashing, canonical tokenization shared with the oracle SQL).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from galago_git_spark.plans import driver_queries as dq


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: BM25 #combine top-10."""
    return dq.queries()["fti_bm25_topk"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dq.queries()


def oracle_sql() -> dict[str, str]:
    return dq.oracle_sql()
