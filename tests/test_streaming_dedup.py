"""Stateful streaming dedup test: duplicates across micro-batches are
dropped by keyed state; first occurrence (smallest id) survives."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from galago_git_spark.streaming.dedup import streaming_dedup


def test_streaming_dedup_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    # batch 1: ids 0-5 with texts A,B,C,A,B,D ; batch 2: ids 6-9 C,E,A,E
    b1 = [(0, "A"), (1, "B"), (2, "C"), (3, "A"), (4, "B"), (5, "D")]
    b2 = [(6, "C"), (7, "E"), (8, "A"), (9, "E")]
    spark.createDataFrame(b1, "doc_id long, text string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    spark.createDataFrame(b2, "doc_id long, text string").coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out_dir = str(tmp_path / "out")
    q = (
        streaming_dedup(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {
        r["text"]: r["id"]
        for r in spark.read.parquet(out_dir).collect()
    }
    # one row per distinct text; the smallest id within its first batch wins
    assert set(got) == {"A", "B", "C", "D", "E"}
    assert got["A"] == 0 and got["B"] == 1 and got["C"] == 2 and got["D"] == 5
    assert got["E"] == 7
    # resume from checkpoint with a NEW batch: old dupes still suppressed
    spark.createDataFrame(
        [(10, "A"), (11, "F")], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src)
    q2 = (
        streaming_dedup(
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(300)
    rows = spark.read.parquet(out_dir).collect()
    texts = sorted(r["text"] for r in rows)
    assert texts == ["A", "B", "C", "D", "E", "F"]
