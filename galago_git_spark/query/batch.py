"""Batch (query-log) retrieval as ONE declarative DataFrame plan.

``galago batch-search`` runs queries one at a time (a thread per query at
best, ``ThreadedBatchSearch.java:104-105``). On a cluster the idiomatic
shape for scoring a large query log is a single plan over the whole
batch — queries become data:

    queries(qid, term, w)  --broadcast-->  join postings on term
      -> join lengths on doc -> per-(qid, doc) weighted BM25 sum
      -> per-qid top-k window

One Spark job for N queries: scan-side term pruning happens via the
broadcast-join build side (every posting row is matched against the tiny
query-term table), partial aggregation is map-side, and the final window
top-k shuffles only matched (qid, doc) pairs. Throughput scales with
executors — no per-query driver round-trips, which is what bounds the
DAAT path's qps in local mode.

Scores are identical to ``executor.execute``'s BM25 ``#combine`` per qid
(same formulas/tie-breaks; tested)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from galago_git_spark.index.build import Index
from galago_git_spark.query.scoring import BM25_B, BM25_K


def queries_to_terms(spark, queries: list[dict]) -> DataFrame:
    """[{number, text}] with flat #combine BM25 texts -> (qid, term, w)."""
    from galago_git_spark.query.parser import parse
    from galago_git_spark.query.wand import wand_eligible

    rows = []
    for q in queries:
        eligible = wand_eligible(parse(q["text"]), default_scorer="bm25")
        if eligible is None:
            raise ValueError(f"not a flat BM25 query: {q['text']!r}")
        terms, weights = eligible
        total = sum(weights) or 1.0
        for t, w in zip(terms, weights):
            rows.append((str(q["number"]), t, w / total))
    return spark.createDataFrame(rows, "qid string, term string, w double")


def batch_bm25_topk(
    index: Index,
    query_terms: DataFrame,
    k: int = 10,
    b: float = BM25_B,
    k1: float = BM25_K,
    max_pushdown_terms: int = 100_000,
) -> DataFrame:
    """query_terms: (qid, term, w), weights pre-normalized per qid.
    Returns (qid, doc, score, rank) — rank-identical per qid to the
    per-query executor path.

    The batch's distinct terms (a query log is driver-sized) are pushed
    into the postings and termstats scans as an In filter — the broadcast
    join alone pushes no scan predicate, and the postings part is
    term-range-sorted, so the In prunes row groups instead of scanning
    the whole part. Batches above ``max_pushdown_terms`` distinct terms
    fall back to the unfiltered join.

    ``query_terms`` is materialized ONCE (a blocking collect — the query
    log is driver-sized by contract) and the joins run against the
    collected rows, so the pushed In set and the joined term set always
    agree even when the input frame's lineage is non-deterministic
    (``.sample()``/unordered ``.limit()``)."""
    cs = index.collection_stats
    avgdl = cs.avg_doc_length

    qt_slim = query_terms.select("qid", "term", "w")
    qrows = qt_slim.collect()
    batch_terms = sorted({r["term"] for r in qrows})
    # rebuild under the INPUT's schema so qid/w types pass through
    qt_local = index.spark.createDataFrame(
        [(r["qid"], r["term"], r["w"]) for r in qrows], qt_slim.schema
    )
    postings = index.postings
    termstats = index.termstats
    if len(batch_terms) <= max_pushdown_terms:
        postings = postings.filter(F.col("term").isin(batch_terms))
        termstats = termstats.filter(F.col("term").isin(batch_terms)).select(
            "term", "df"
        )
    else:
        # too many terms for a scan-side In — prune stats via semi-join
        termstats = termstats.join(
            qt_local.select("term").distinct(), "term", "left_semi"
        ).select("term", "df")

    qt = F.broadcast(qt_local)
    # idf per (query) term from the termstats part; the pruned stats
    # table is tiny -> broadcast
    ts = F.broadcast(termstats)
    tf, length = F.col("tf").cast("double"), F.col("length").cast("double")
    idf = F.log(F.lit(float(cs.document_count)) / (F.col("df") + 0.5))
    tfn = (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * length / F.lit(avgdl)))

    matched = (
        postings.select("term", "doc", "tf")
        .join(qt, "term")
        .join(ts, "term")
        .join(index.lengths, "doc")
        .withColumn("contrib", F.col("w") * idf * tfn)
    )
    scored = matched.groupBy("qid", "doc").agg(F.sum("contrib").alias("score"))
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("doc").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "doc", "score", "rank")
    )
