"""Streaming exact deduplication — a custom stateful Structured Streaming
operator via ``applyInPandasWithState``.

Training-data pipelines dedupe continuously as shards arrive; the batch
exact-dedup (operators/dedup.py) becomes a keyed stateful stream: rows
group by content hash, per-key state records whether the hash was already
emitted, and only the first occurrence (smallest id in the batch, then
arrival order) survives. State is per-key and partitioned by the shuffle —
at cluster scale the state store shards with the executors, the same way
GeometricIndex shards its memory index.

Usage::

    out = streaming_dedup(stream_df, id_col="doc_id", text_col="text")
    q = (out.writeStream.outputMode("append")... )

The content hash is sha256 (same row-identity function as the index's
names part).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = T.StructType([T.StructField("seen", T.BooleanType())])


def _dedup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    seen = state.exists and state.get[0]
    if seen:
        state.update((True,))
        return
    first: pd.DataFrame | None = None
    for pdf in pdfs:
        if pdf.empty:
            continue
        cand = pdf.sort_values("id").head(1)
        if first is None or cand["id"].iloc[0] < first["id"].iloc[0]:
            first = cand
    state.update((True,))
    if first is not None:
        yield first[["id", "text", "content_sha256"]]


def streaming_dedup(
    stream_df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """stream_df -> first-occurrence-only stream of
    (id, text, content_sha256)."""
    hashed = stream_df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(text_col).alias("text"),
        F.sha2(F.coalesce(F.col(text_col), F.lit("")), 256).alias(
            "content_sha256"
        ),
    )
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("content_sha256", T.StringType()),
        ]
    )
    return hashed.groupBy("content_sha256").applyInPandasWithState(
        _dedup_fn,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
