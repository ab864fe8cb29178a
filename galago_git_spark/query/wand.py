"""Block-max WAND top-k over the packed posting layer.

The distributed rebuild of Galago's pruned processing models
(``core/.../retrieval/processing/MaxScoreDocumentModel.java:49-151``,
``WeakAndDocumentModel.java:41-120``), strengthened from term-level to
block-level upper bounds per the north rule:

- **Doc-partitioned fan-out**: posting blocks and doc lengths are
  co-grouped on the doc-range ``bucket`` (the shard geometry fixed at
  build time, ``index/packed.py``). Every bucket runs an independent
  top-k kernel over its own doc range — the classic document-partitioned
  retrieval tier; the driver merges ``#buckets x k`` candidate rows
  (tiny) with the global tie-break.
- **Block-max pruning inside the kernel**: doc space is cut at block
  boundaries into segments; each segment's upper bound is the sum of the
  overlapping blocks' ``w * idf * max_tfn``. Segments are processed in
  descending upper-bound order (impact order) and the kernel stops as
  soon as the k-th best exact score beats every remaining segment bound —
  blocks of skipped segments are never vbyte-decoded. This is the same
  skip the reference gets from ``syncTo`` + score bounds, at block
  granularity.
- Scoring is exact BM25 (``BM25ScoringIterator.java:59,120-124``) with
  per-doc lengths; tie-break score desc then doc asc
  (``ScoredDocument.java:41-52``) at both kernel and merge level, so the
  result is rank-identical to the exhaustive relational path (tested).

Everything per-bucket is numpy over Arrow batches — the only Python-level
loop is over *segments* (#segments <= 2 x #blocks <= #postings/256).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from galago_git_spark.index.build import open_index
from galago_git_spark.index.codec import decode_doc_block, vbyte_decode
from galago_git_spark.index.packed import packed_params, read_blocks
from galago_git_spark.query.nodes import Node
from galago_git_spark.query.scoring import BM25_B, BM25_K, bm25_idf

_OUT_SCHEMA = "doc long, score double"


def wand_eligible(node, default_scorer: str = "bm25") -> tuple[list[str], list[float]] | None:
    """DeltaCheckTraversal analog (``DeltaCheckTraversal.java:34-55``): a
    query runs on the WAND path iff (after rewrite) it is a flat #combine
    of BM25 scorers over bare terms. Returns (terms, raw weights) or None."""
    from galago_git_spark.query.nodes import is_term_leaf
    from galago_git_spark.query.traversals import transform

    eff_scorer = node.get_str("scorer", default_scorer)
    if "scorer" not in node.parameters:
        node = Node(node.operator, {**node.parameters, "scorer": default_scorer},
                    node.children)
    node = transform(node)
    if node.operator != "combine":
        return None
    terms: list[str] = []
    for c in node.children:
        if is_term_leaf(c):
            # bare leaf survived the implicit cast: only BM25-by-default
            # semantics make it WAND-safe
            if eff_scorer != "bm25":
                return None
            terms.append(str(c.default_param))
        elif (
            c.operator == "bm25"
            and len(c.children) == 1
            and is_term_leaf(c.children[0])
            and c.get_float("b", BM25_B) == BM25_B
            and c.get_float("k", BM25_K) == BM25_K
        ):
            terms.append(str(c.children[0].default_param))
        else:
            return None
    return terms, node.indexed_weights()


def _bucket_kernel(term_info: dict[str, tuple[float, float]], k: int,
                   b: float, kk: float, avgdl: float, default_tfn: bool):
    """Build the per-bucket kernel closure.

    term_info: term -> (weight, idf). Upper bound per block:
    weight * idf * max_tfn when the build-time (b, k) match the query's
    (default_tfn=True), else the looser weight * idf * tfn(max_tf, max_tf).
    """

    def kernel(blocks: pd.DataFrame, lengths: pd.DataFrame) -> pd.DataFrame:
        if blocks.empty or lengths.empty:
            return pd.DataFrame({"doc": [], "score": []}).astype(
                {"doc": "int64", "score": "float64"}
            )
        len_docs = lengths["doc"].to_numpy(dtype=np.int64)
        len_vals = lengths["length"].to_numpy(dtype=np.float64)
        order = np.argsort(len_docs)
        len_docs, len_vals = len_docs[order], len_vals[order]

        # per-block weighted upper bounds; a negative-idf term's postings
        # only ever *lower* a doc's score, so its bound clamps at 0
        first = blocks["first_doc"].to_numpy(dtype=np.int64)
        last = blocks["last_doc"].to_numpy(dtype=np.int64)
        w_idf = np.array(
            [term_info[t][0] * term_info[t][1] for t in blocks["term"]],
            dtype=np.float64,
        )
        if default_tfn:
            tfn_ub = blocks["max_tfn"].to_numpy(dtype=np.float64)
        else:
            t = blocks["max_tf"].to_numpy(dtype=np.int64).astype(np.float64)
            tfn_ub = (t * (kk + 1)) / (t + kk * (1 - b + b * t / avgdl))
        ubs = np.maximum(w_idf * tfn_ub, 0.0)

        # segment doc space at block boundaries
        edges = np.unique(np.concatenate([first, last + 1]))
        n_seg = len(edges) - 1
        lo_idx = np.searchsorted(edges, first, side="right") - 1
        hi_idx = np.searchsorted(edges, last, side="right") - 1
        # segment ub via difference array
        seg_ub = np.zeros(n_seg + 1, dtype=np.float64)
        np.add.at(seg_ub, lo_idx, ubs)
        np.add.at(seg_ub, hi_idx + 1, -ubs)
        seg_ub = np.cumsum(seg_ub)[:n_seg]

        # blocks active per segment: interval list -> sorted by lo
        seg_order = np.argsort(-seg_ub, kind="stable")
        block_order = np.argsort(lo_idx, kind="stable")

        decoded: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        top_docs = np.empty(0, dtype=np.int64)
        top_scores = np.empty(0, dtype=np.float64)
        threshold = -math.inf

        for s in seg_order:
            if len(top_docs) >= k and seg_ub[s] < threshold:
                break  # impact order: every remaining segment bounds lower
            seg_lo, seg_hi = int(edges[s]), int(edges[s + 1]) - 1
            active = block_order[
                (lo_idx[block_order] <= s) & (hi_idx[block_order] >= s)
            ]
            all_docs = []
            all_contrib = []
            for bi in active:
                bi = int(bi)
                if bi not in decoded:
                    decoded[bi] = (
                        decode_doc_block(blocks["docs"].iloc[bi]).astype(np.int64),
                        vbyte_decode(blocks["tfs"].iloc[bi]).astype(np.float64),
                    )
                d, t = decoded[bi]
                a = np.searchsorted(d, seg_lo, side="left")
                z = np.searchsorted(d, seg_hi, side="right")
                if a == z:
                    continue
                dd, tt = d[a:z], t[a:z]
                ln = len_vals[np.searchsorted(len_docs, dd)]
                contrib = w_idf[bi] * (tt * (kk + 1)) / (
                    tt + kk * (1 - b + b * ln / avgdl)
                )
                all_docs.append(dd)
                all_contrib.append(contrib)
            if not all_docs:
                continue
            docs_cat = np.concatenate(all_docs)
            contrib_cat = np.concatenate(all_contrib)
            uniq, inv = np.unique(docs_cat, return_inverse=True)
            scores = np.bincount(inv, weights=contrib_cat)
            # merge into running top-k (score desc, doc asc)
            top_docs = np.concatenate([top_docs, uniq])
            top_scores = np.concatenate([top_scores, scores])
            sel = np.lexsort((top_docs, -top_scores))[:k]
            top_docs, top_scores = top_docs[sel], top_scores[sel]
            if len(top_docs) >= k:
                threshold = top_scores[-1]

        return pd.DataFrame({"doc": top_docs, "score": top_scores})

    return kernel


class PackedReader:
    """Reusable query-session handle over a packed index — the analog of
    keeping a DiskIndex + LocalRetrieval open across queries
    (``LocalRetrieval.java:61-88``). Caches the tiny stats row, the block
    scan, and the bucketed lengths (persisted) so each query pays only its
    own pruned scans. Thread-safe: used by the ThreadedBatchSearch-style
    ``cli batch-search --threads``."""

    def __init__(self, spark: SparkSession, index_dir: str, cache: bool = True):
        self.spark = spark
        self.index_dir = index_dir
        self.params = packed_params(index_dir)
        self.index = open_index(spark, index_dir)
        self.blocks = read_blocks(spark, index_dir)
        self.lengths_bucketed = self.index.lengths.withColumn(
            "bucket",
            F.shiftright(F.col("doc"), int(self.params["bucket_bits"])).cast("long"),
        )
        if cache:
            self.lengths_bucketed = self.lengths_bucketed.persist()
        self._cache = cache
        self._ts_map: dict | None = None

    def term_stats(self, terms: list[str]) -> dict:
        """Driver-cached stats lookup. The whole termstats table is pulled
        once when the vocabulary is small (local corpora); above the cap it
        falls back to a per-query pruned scan (the cluster-scale path —
        vocab at 10^12 docs does not fit a driver map)."""
        if not self._cache:
            return self.index.term_stats(terms)
        if self._ts_map is None:
            if self.index.termstats.count() <= 2_000_000:
                from galago_git_spark.query.scoring import TermStats

                self._ts_map = {
                    r["term"]: TermStats(r["term"], r["df"], r["cf"], r["max_tf"])
                    for r in self.index.termstats.collect()
                }
            else:
                self._ts_map = {}  # sentinel: use pruned lookups
        if self._ts_map:
            return {t: self._ts_map[t] for t in terms if t in self._ts_map}
        return self.index.term_stats(terms)


def wand_topk(
    spark: SparkSession,
    index_dir: str,
    terms: list[str],
    k: int = 10,
    weights: list[float] | None = None,
    b: float = BM25_B,
    k1: float = BM25_K,
    normalize: bool = True,
    reader: PackedReader | None = None,
) -> DataFrame:
    """BM25 ``#combine`` top-k via block-max WAND over the packed layer.

    Rank-identical to ``executor.execute`` on the same query (the
    exhaustive path); returns ``(doc, score, rank)``.
    """
    if reader is None:
        reader = PackedReader(spark, index_dir, cache=False)
    params = reader.params
    idx = reader.index
    cs = idx.collection_stats
    avgdl = cs.avg_doc_length

    if weights is None:
        weights = [1.0] * len(terms)
    if normalize:
        total = sum(weights)
        if total > 0:
            weights = [w / total for w in weights]
    stats = reader.term_stats(list(set(terms)))
    term_info = {
        t: (w, bm25_idf(cs.document_count, stats[t].df))
        for t, w in zip(terms, weights)
        if t in stats
    }
    if not term_info:
        return spark.createDataFrame([], "doc long, score double, rank int")

    default_tfn = (
        abs(b - params["bm25_b"]) < 1e-12
        and abs(k1 - params["bm25_k"]) < 1e-12
        and abs(avgdl - params["avgdl"]) < 1e-9
    )

    blocks = reader.blocks.filter(F.col("term").isin(list(term_info)))
    # prune the lengths side to buckets that actually hold candidate blocks
    buckets = blocks.select("bucket").distinct()
    lengths = reader.lengths_bucketed.join(F.broadcast(buckets), "bucket", "left_semi")

    kernel = _bucket_kernel(term_info, k, b, k1, avgdl, default_tfn)
    candidates = (
        blocks.groupBy("bucket")
        .cogroup(lengths.groupBy("bucket"))
        .applyInPandas(kernel, schema=_OUT_SCHEMA)
    )
    w = Window.orderBy(F.col("score").desc(), F.col("doc").asc())
    return (
        candidates.orderBy(F.col("score").desc(), F.col("doc").asc())
        .limit(k)
        .withColumn("rank", F.row_number().over(w))
    )
