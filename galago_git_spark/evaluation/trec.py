"""TREC run / qrels I/O (the reference's formats:
``eval/.../QuerySetResults.java`` run files ``qid Q0 name rank score tag``,
``QuerySetJudgments.java`` qrels ``qid 0 name rel``). Reads distribute via
``spark.read.text`` + column splits — no driver-side parsing."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_run(spark: SparkSession, path: str) -> DataFrame:
    # normalize whitespace THEN trim (Spark trim strips spaces only, not
    # tabs): leading whitespace would shift every field one right
    parts = F.split(F.trim(F.regexp_replace(F.col("value"), r"\s+", " ")), " ")
    return (
        spark.read.text(path)
        .filter(F.length(F.trim("value")) > 0)
        .select(
            parts.getItem(0).alias("qid"),
            parts.getItem(2).alias("name"),
            parts.getItem(3).cast("int").alias("rank"),
            parts.getItem(4).cast("double").alias("score"),
        )
    )


def read_qrels(spark: SparkSession, path: str) -> DataFrame:
    parts = F.split(F.trim(F.regexp_replace(F.col("value"), r"\s+", " ")), " ")
    return (
        spark.read.text(path)
        .filter(F.length(F.trim("value")) > 0)
        .select(
            parts.getItem(0).alias("qid"),
            parts.getItem(2).alias("name"),
            parts.getItem(3).cast("int").alias("rel"),
        )
    )


def format_run(results: DataFrame, tag: str = "galago_git_spark") -> DataFrame:
    """(qid, name, rank, score) -> single-column TREC lines
    (ScoredDocument.java:79-82)."""
    return results.select(
        F.concat_ws(
            " ",
            F.col("qid"),
            F.lit("Q0"),
            F.col("name"),
            F.col("rank"),
            F.format_string("%.6f", F.col("score")),
            F.lit(tag),
        ).alias("value")
    )
