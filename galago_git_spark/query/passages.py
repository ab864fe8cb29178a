"""Passage retrieval — the Spark rebuild of RankedPassageModel
(``core/.../retrieval/processing/RankedPassageModel.java:57-97``):
fixed-size sliding windows (``passageSize``/``passageShift``) over each
candidate document, each scored as a pseudo-document; results ranked by
(score desc, doc asc, begin asc) (``ScoredPassage.java:34-49``).

Plan shape (one declarative job, no per-passage iteration):

    candidate docs (term-pruned postings)  ->  explode passage ids k from
    the lengths table (k*shift < len)  ->  per-(term, doc, k) passage tf
    from the positions column  ->  BM25 over (passage tf, passage length)
    with collection-level idf/avgdl  ->  global top-k window.

Passage begins are 0-based token offsets like the reference
(``context.begin += passageShift``); positions are 1-based, so passage k
covers positions (k*shift, k*shift + size].
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from galago_git_spark.index.build import Index
from galago_git_spark.query.scoring import BM25_B, BM25_K, bm25_idf


def passage_bm25_topk(
    index: Index,
    terms: list[str],
    k: int = 10,
    size: int = 50,
    shift: int = 25,
    weights: list[float] | None = None,
    b: float = BM25_B,
    k1: float = BM25_K,
) -> DataFrame:
    """(doc, begin, end, score, rank) — BM25 #combine over passages."""
    if weights is None:
        weights = [1.0] * len(terms)
    total = sum(weights) or 1.0
    weights = [w / total for w in weights]
    cs = index.collection_stats
    stats = index.term_stats(list(set(terms)))

    matched = index.postings.filter(F.col("term").isin(terms))
    cand = matched.select("doc").distinct()
    # all passages of candidate docs: k while k*shift < len
    passages = (
        cand.join(index.lengths, "doc")
        .select(
            "doc",
            "length",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(
                        F.ceil(F.col("length") / F.lit(shift)).cast("int") - 1,
                        F.lit(0),
                    ),
                )
            ).alias("k"),
        )
        .withColumn("begin", F.col("k") * shift)
        .withColumn("end", F.least(F.col("begin") + size, F.col("length")))
        .withColumn("plen", (F.col("end") - F.col("begin")).cast("double"))
    )

    # per-(term, doc, k) passage tf: position p belongs to passage k iff
    # k*shift < p <= k*shift + size  ->  k in [ceil((p-size)/shift), (p-1)/shift]
    pos = matched.select("doc", "term", F.explode("positions").alias("p"))
    kmin = F.greatest(
        F.ceil((F.col("p") - size) / F.lit(shift)).cast("int"), F.lit(0)
    )
    kmax = F.floor((F.col("p") - 1) / F.lit(shift)).cast("int")
    ptf = (
        pos.select(
            "doc", "term", F.explode(F.sequence(kmin, kmax)).alias("k")
        )
        .groupBy("doc", "k", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )

    contrib = None
    tf, plen = F.col("tf").cast("double"), F.col("plen")
    for t, w in zip(terms, weights):
        ts = stats.get(t)
        if ts is None:
            continue
        idf = bm25_idf(cs.document_count, ts.df)
        expr = (
            F.lit(w * idf)
            * (tf * (k1 + 1))
            / (tf + k1 * (1 - b + b * plen / F.lit(cs.avg_doc_length)))
        )
        case = F.when(F.col("term") == t, expr)
        contrib = case if contrib is None else contrib.when(F.col("term") == t, expr)
    if contrib is None:
        return index.spark.createDataFrame(
            [], "doc long, begin int, end int, score double, rank int"
        )

    scored = (
        passages.join(ptf, ["doc", "k"], "left")
        .withColumn("c", F.when(F.col("term").isNull(), 0.0).otherwise(contrib))
        .groupBy("doc", "k", "begin", "end")
        .agg(F.sum("c").alias("score"))
    )
    if k is None:  # full scored frame (oracle / re-ranking callers)
        return scored.select(
            "doc", F.col("begin").cast("int"), F.col("end").cast("int"), "score"
        )
    w_rank = Window.orderBy(
        F.col("score").desc(), F.col("doc").asc(), F.col("begin").asc()
    )
    return (
        scored.orderBy(F.col("score").desc(), F.col("doc").asc(), F.col("begin").asc())
        .limit(k)
        .withColumn("rank", F.row_number().over(w_rank))
        .select("doc", F.col("begin").cast("int"), F.col("end").cast("int"), "score", "rank")
    )
