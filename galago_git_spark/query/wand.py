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
                   b: float, kk: float, avgdl: float, default_tfn: bool,
                   lengths_bc=None):
    """Build the per-bucket kernel closure.

    term_info: term -> (weight, idf). Upper bound per block:
    weight * idf * max_tfn when the build-time (b, k) match the query's
    (default_tfn=True), else the looser weight * idf * tfn(max_tf, max_tf).

    ``lengths_bc`` (broadcast of doc-sorted (len_docs, len_vals) arrays)
    switches to the one-sided grouped-map form — see _batch_bucket_kernel.
    """
    _empty = pd.DataFrame({"doc": [], "score": []}).astype(
        {"doc": "int64", "score": "float64"}
    )

    def kernel(blocks: pd.DataFrame, lengths: pd.DataFrame) -> pd.DataFrame:
        if blocks.empty or lengths.empty:
            return _empty
        len_docs = lengths["doc"].to_numpy(dtype=np.int64)
        len_vals = lengths["length"].to_numpy(dtype=np.float64)
        order = np.argsort(len_docs)
        return _run(blocks, len_docs[order], len_vals[order])

    def kernel_bc(blocks: pd.DataFrame) -> pd.DataFrame:
        if blocks.empty:
            return _empty
        len_docs, len_vals = lengths_bc.value
        return _run(blocks, len_docs, len_vals)

    def _run(blocks: pd.DataFrame, len_docs: np.ndarray,
             len_vals: np.ndarray) -> pd.DataFrame:
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
                    # tfn computed once at decode (same association as the
                    # batch kernel: w_idf * (A/B), so the two paths stay
                    # bit-identical, and the per-block bound max_tfn —
                    # itself a max over per-doc A/B — bounds contrib/w_idf
                    # exactly rather than to within a ulp)
                    d = decode_doc_block(
                        blocks["docs"].iloc[bi]
                    ).astype(np.int64)
                    tt = vbyte_decode(
                        blocks["tfs"].iloc[bi]
                    ).astype(np.float64)
                    ln = len_vals[np.searchsorted(len_docs, d)]
                    decoded[bi] = (
                        d,
                        (tt * (kk + 1))
                        / (tt + kk * (1 - b + b * ln / avgdl)),
                    )
                d, tfn = decoded[bi]
                a = np.searchsorted(d, seg_lo, side="left")
                z = np.searchsorted(d, seg_hi, side="right")
                if a == z:
                    continue
                all_docs.append(d[a:z])
                all_contrib.append(w_idf[bi] * tfn[a:z])
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

    return kernel_bc if lengths_bc is not None else kernel


def _part_bytes(spark: SparkSession, path: str) -> int:
    """On-disk size of an index part, via the Hadoop FileSystem so
    hdfs:/s3a: index dirs answer the same way local ones do."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    if not fs.exists(p):
        return 0
    return fs.getContentSummary(p).getLength()


class PackedReader:
    """Reusable query-session handle over a packed index — the analog of
    keeping a DiskIndex + LocalRetrieval open across queries
    (``LocalRetrieval.java:61-88``). Caches the tiny stats row, the block
    scan, and the bucketed lengths (persisted) so each query pays only its
    own pruned scans. Thread-safe: used by the ThreadedBatchSearch-style
    ``cli batch-search --threads``."""

    # above this vocab size the full termstats map is NOT pulled to the
    # driver (a 2M-term map is already ~hundreds of MB of driver heap);
    # per-query pruned scans are used instead
    DEFAULT_MAX_DRIVER_VOCAB = 500_000

    def __init__(self, spark: SparkSession, index_dir: str, cache: bool = True,
                 max_driver_vocab: int | None = None,
                 text_part: str | None = None):
        """``text_part`` picks the packed tier: ``"postings"`` (raw,
        the default), ``"postings.<stemmer>"`` (its ``blocks.<stemmer>``
        layer — built by ``build_index(packed=True, stemmer=...)``), or
        None = the index's DiskIndex-style default part WHEN its block
        layer exists, else raw. A stemmed reader's ``stemmer_name`` tells
        callers to ``stem_as_required`` query terms before the kernels."""
        import os

        self.spark = spark
        self.index_dir = index_dir
        self.index = open_index(spark, index_dir)
        if text_part is None:
            text_part = self.index.default_text_part
            if text_part != "postings":
                name = text_part.split(".", 1)[1]
                if not os.path.exists(
                    os.path.join(index_dir, f"blocks.{name}", "_SUCCESS")
                ):
                    text_part = "postings"  # stemmed tier not packed
        self.text_part = text_part
        self.stemmer_name: str | None = None
        blocks_key = "blocks"
        if text_part != "postings":
            self.stemmer_name = text_part.split(".", 1)[1]
            blocks_key = f"blocks.{self.stemmer_name}"
            self.index = self.index.stemmed_view(self.stemmer_name)
        self.params = packed_params(index_dir, blocks_key)
        self.max_driver_vocab = (
            self.DEFAULT_MAX_DRIVER_VOCAB
            if max_driver_vocab is None
            else max_driver_vocab
        )
        self.blocks = read_blocks(spark, index_dir, blocks_key)
        self.lengths_bucketed = self.index.lengths.withColumn(
            "bucket",
            F.shiftright(F.col("doc"), int(self.params["bucket_bits"])).cast("long"),
        )
        if cache:
            self.lengths_bucketed = self.lengths_bucketed.persist()
        self._cache = cache
        self._ts_map: dict | None = None
        self._part_blocks: dict[str, DataFrame] = {}
        self._part_cfs: dict[str, dict | None] = {}
        self._blocks_cogrp: DataFrame | None = None
        self._lengths_cogrp: DataFrame | None = None
        self._lengths_bc = None  # broadcast (len_docs, len_vals), sorted

    # columns the BM25 WAND kernels read — `pos` (the dominant payload)
    # and `n` are projected out before anything is cached or shuffled
    _WAND_COLS = ("term", "bucket", "first_doc", "last_doc", "max_tf",
                  "max_tfn", "docs", "tfs")

    # resident-cache ceiling: the on-disk size of the blocks part above
    # which enable_cogroup_cache refuses (executor memory is not a posting
    # store at 100 TB — the cold pruned-scan path stays the default there)
    DEFAULT_BLOCK_CACHE_MAX_BYTES = 8 << 30

    def enable_cogroup_cache(self, n_partitions: int | None = None,
                             max_bytes: int | None = None) -> bool:
        """Pin the WAND projection of the blocks part and the bucketed
        lengths in executor storage, hash-partitioned by ``bucket`` with
        the SAME partition count — the long-running query-SERVICE shape
        (``LocalRetrieval`` keeps its DiskIndex resident; a distributed
        search service keeps shards resident on workers). Every
        subsequent :func:`wand_topk` / :func:`wand_batch_topk` cogroup
        then plans directly over the two ``InMemoryTableScan``s with NO
        per-query shuffle of either side (a term filter preserves hash
        partitioning), so per-batch cost is kernel compute only.

        Guarded: refuses (returns False, cache stays off) when the
        on-disk blocks part exceeds ``max_bytes`` (default 8 GiB, env
        ``GALAGO_SPARK_BLOCK_CACHE_MAX_BYTES``) — at corpus scales where
        postings dwarf cluster memory the pruned-scan + shuffle path is
        the right plan and this cache must not be pinned."""
        import os

        if self._blocks_cogrp is not None:
            return True
        if max_bytes is None:
            max_bytes = int(os.environ.get(
                "GALAGO_SPARK_BLOCK_CACHE_MAX_BYTES",
                self.DEFAULT_BLOCK_CACHE_MAX_BYTES,
            ))
        blocks_key = ("blocks" if self.stemmer_name is None
                      else f"blocks.{self.stemmer_name}")
        size = _part_bytes(self.spark, os.path.join(self.index_dir, blocks_key))
        if size > max_bytes:
            return False
        if n_partitions is None:
            n_partitions = max(
                8, self.spark.sparkContext.defaultParallelism * 4
            )
        self._blocks_cogrp = (
            self.blocks.select(*self._WAND_COLS)
            .repartition(n_partitions, "bucket")
            .persist()
        )
        self._blocks_cogrp.count()
        # lengths side: when the doc count fits, broadcast the globally
        # doc-sorted (doc, length) arrays instead of co-caching a second
        # frame — the kernels then run one-sided (grouped-map), so NO
        # lengths bytes cross Arrow per run and the broadcast unpickles
        # once per reused Python worker. Beyond the cap (lengths grow
        # with the COLLECTION), fall back to the co-partitioned cached
        # lengths frame — still exchange-free, shipped per run.
        max_docs = int(os.environ.get(
            "GALAGO_SPARK_LENGTHS_BC_MAX_DOCS", 20_000_000
        ))
        if self.index.collection_stats.document_count <= max_docs:
            pdf = self.index.lengths.select("doc", "length").toPandas()
            len_docs = pdf["doc"].to_numpy(dtype=np.int64)
            len_vals = pdf["length"].to_numpy(dtype=np.float64)
            order = np.argsort(len_docs)
            self._lengths_bc = self.spark.sparkContext.broadcast(
                (len_docs[order], len_vals[order])
            )
        else:
            self._lengths_cogrp = (
                self.lengths_bucketed.repartition(n_partitions, "bucket")
                .persist()
            )
            self._lengths_cogrp.count()
        return True

    def wand_frames(self) -> tuple[DataFrame, DataFrame]:
        """(blocks, lengths) for the WAND cogroups: the resident
        co-partitioned pair when :meth:`enable_cogroup_cache` is on,
        else the pruned-scan frames (parquet pushdown does the work)."""
        if self._blocks_cogrp is not None:
            # in broadcast-lengths mode _lengths_cogrp is None and the
            # callers take the one-sided grouped-map path instead; the
            # cold frame is returned so the tuple shape stays stable
            lengths = (self._lengths_cogrp if self._lengths_cogrp is not None
                       else self.lengths_bucketed)
            return self._blocks_cogrp, lengths
        return self.blocks.select(*self._WAND_COLS), self.lengths_bucketed

    def term_stats(self, terms: list[str]) -> dict:
        """Driver-cached stats lookup. The whole termstats table is pulled
        once when the vocabulary is small (local corpora); above the cap it
        falls back to a per-query pruned scan (the cluster-scale path —
        vocab at 10^12 docs does not fit a driver map)."""
        if not self._cache:
            return self.index.term_stats(terms)
        if self._ts_map is None:
            if self.index.termstats.count() <= self.max_driver_vocab:
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

    def part_blocks(self, part: str) -> DataFrame:
        """Cached handle on a window part's block layer (avoids repeated
        parquet footer reads across a query session)."""
        if part not in self._part_blocks:
            self._part_blocks[part] = read_blocks(
                self.spark, self.index_dir, f"{part}/blocks"
            )
        return self._part_blocks[part]

    def part_cfs(self, part: str, keys: list[str]) -> dict[str, int]:
        """Window-key cf lookups from a part's termstats, driver-cached
        like :meth:`term_stats`: the whole map when the part vocabulary is
        small, else per-query pruned scans (the cluster-scale path)."""
        import os

        if not keys:
            return {}
        ts_path = os.path.join(self.index_dir, part, "termstats")
        if not self._cache:
            rows = (
                self.spark.read.parquet(ts_path)
                .filter(F.col("term").isin(list(keys)))
                .select("term", "cf").collect()
            )
            return {r["term"]: r["cf"] for r in rows}
        if part not in self._part_cfs:
            ts = self.spark.read.parquet(ts_path)
            if ts.count() <= self.max_driver_vocab:
                self._part_cfs[part] = {
                    r["term"]: r["cf"]
                    for r in ts.select("term", "cf").collect()
                }
            else:
                self._part_cfs[part] = None  # sentinel: pruned lookups
        cached = self._part_cfs[part]
        if cached is not None:
            return {t: cached[t] for t in keys if t in cached}
        rows = (
            self.spark.read.parquet(ts_path)
            .filter(F.col("term").isin(list(keys)))
            .select("term", "cf").collect()
        )
        return {r["term"]: r["cf"] for r in rows}


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

    # project position payloads (and the unused n) OUT of the scan: BM25
    # never reads them, and parquet column pruning then skips those bytes
    # entirely — at 100 TB the `pos` column dwarfs docs+tfs. With the
    # reader's cogroup cache on, both frames come back resident and
    # co-partitioned by bucket, so this plan has NO exchange at all.
    blocks_src, lengths_src = reader.wand_frames()
    blocks = blocks_src.filter(F.col("term").isin(list(term_info)))
    if reader._lengths_bc is not None:
        # resident service mode with broadcast lengths: one-sided
        # grouped-map over the cached co-partitioned blocks — zero
        # exchange, zero lengths bytes through Arrow per query
        kernel = _bucket_kernel(term_info, k, b, k1, avgdl, default_tfn,
                                lengths_bc=reader._lengths_bc)
        candidates = blocks.groupBy("bucket").applyInPandas(
            kernel, schema=_OUT_SCHEMA
        )
    else:
        if reader._blocks_cogrp is not None:
            # resident mode, lengths too big to broadcast: the per-query
            # broadcast subquery that prunes the lengths side costs a
            # whole extra job; empty-blocks buckets early-out in the
            # kernel, so results are identical
            lengths = lengths_src
        else:
            # cold mode: prune the lengths side (one row per DOCUMENT) to
            # buckets that actually hold candidate blocks — at collection
            # scale this is the difference between a slice and a full read
            buckets = blocks.select("bucket").distinct()
            lengths = lengths_src.join(
                F.broadcast(buckets), "bucket", "left_semi"
            )
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


# ---------------------------------------------------------------------------
# single-job batch WAND: the whole query batch compiled into ONE cogroup.
# Per-query job submission (cli batch-search --threads, the
# ThreadedBatchSearch analog) leaves a serial driver-scheduling fraction
# that caps scaling at low core counts (BASELINE.md round-4: 0.68 raw at
# the honest 1->4 pair). Here the batch is one plan: blocks pruned to the
# UNION of all query terms, one shuffle to buckets, and a per-bucket
# kernel that runs every query's block-max WAND over the shared decoded
# blocks (a hot term's block is decoded once for all queries touching
# it). Wall-clock parallelism = buckets x cores, independent of the
# number of queries — the cluster-scale batch shape.
# ---------------------------------------------------------------------------

_BATCH_OUT_SCHEMA = "qid string, doc long, score double"


def _batch_bucket_kernel(
    query_infos: dict[str, dict[str, tuple[float, float]]],
    k: int, b: float, kk: float, avgdl: float, default_tfn: bool,
    lengths_bc=None,
):
    """Multi-query per-bucket kernel. ``query_infos``: qid -> (term ->
    (weight, idf)). Identical per-query logic to ``_bucket_kernel``
    (rank-identity asserted in tests/test_packed_wand.py); block decode
    is shared across queries via one cache keyed by block row.

    ``lengths_bc`` (a Spark broadcast of globally doc-sorted
    ``(len_docs, len_vals)`` numpy arrays) switches the kernel to the
    one-sided grouped-map form: no lengths frame crosses Arrow per run —
    the broadcast value unpickles once per reused Python worker."""
    empty = pd.DataFrame({"qid": [], "doc": [], "score": []}).astype(
        {"qid": "object", "doc": "int64", "score": "float64"}
    )

    def kernel(blocks: pd.DataFrame, lengths: pd.DataFrame) -> pd.DataFrame:
        if blocks.empty or lengths.empty:
            return empty
        len_docs = lengths["doc"].to_numpy(dtype=np.int64)
        len_vals = lengths["length"].to_numpy(dtype=np.float64)
        order = np.argsort(len_docs)
        return _run(blocks, len_docs[order], len_vals[order])

    def kernel_bc(blocks: pd.DataFrame) -> pd.DataFrame:
        if blocks.empty:
            return empty
        len_docs, len_vals = lengths_bc.value
        return _run(blocks, len_docs, len_vals)

    def _run(blocks: pd.DataFrame, len_docs: np.ndarray,
             len_vals: np.ndarray) -> pd.DataFrame:
        terms_col = blocks["term"].to_numpy()
        first_all = blocks["first_doc"].to_numpy(dtype=np.int64)
        last_all = blocks["last_doc"].to_numpy(dtype=np.int64)
        docs_col = blocks["docs"].to_numpy()
        tfs_col = blocks["tfs"].to_numpy()
        if default_tfn:
            tfn_ub_all = blocks["max_tfn"].to_numpy(dtype=np.float64)
        else:
            t = blocks["max_tf"].to_numpy(dtype=np.int64).astype(np.float64)
            tfn_ub_all = (t * (kk + 1)) / (t + kk * (1 - b + b * t / avgdl))

        # per-bucket term -> block-row indices, built ONCE: replaces a
        # per-query python membership scan over every block row
        by_term: dict[str, np.ndarray] = {}
        order_t = np.argsort(terms_col, kind="stable")
        sorted_t = terms_col[order_t]
        bounds = np.nonzero(
            np.concatenate(([True], sorted_t[1:] != sorted_t[:-1]))
        )[0]
        for bi0, bi1 in zip(bounds, np.append(bounds[1:], len(sorted_t))):
            by_term[sorted_t[bi0]] = order_t[bi0:bi1]

        decoded: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        out_qids: list = []
        out_docs: list = []
        out_scores: list = []
        for qid, term_info in query_infos.items():
            hit = [by_term[t] for t in term_info if t in by_term]
            if not hit:
                continue
            idxs = np.sort(np.concatenate(hit))
            first, last = first_all[idxs], last_all[idxs]
            w_idf = np.array(
                [term_info[t][0] * term_info[t][1] for t in terms_col[idxs]],
                dtype=np.float64,
            )
            ubs = np.maximum(w_idf * tfn_ub_all[idxs], 0.0)

            edges = np.unique(np.concatenate([first, last + 1]))
            n_seg = len(edges) - 1
            lo_idx = np.searchsorted(edges, first, side="right") - 1
            hi_idx = np.searchsorted(edges, last, side="right") - 1
            seg_ub = np.zeros(n_seg + 1, dtype=np.float64)
            np.add.at(seg_ub, lo_idx, ubs)
            np.add.at(seg_ub, hi_idx + 1, -ubs)
            seg_ub = np.cumsum(seg_ub)[:n_seg]

            seg_order = np.argsort(-seg_ub, kind="stable")
            block_order = np.argsort(lo_idx, kind="stable")

            top_docs = np.empty(0, dtype=np.int64)
            top_scores = np.empty(0, dtype=np.float64)
            threshold = -math.inf
            for s in seg_order:
                if len(top_docs) >= k and seg_ub[s] < threshold:
                    break
                seg_lo, seg_hi = int(edges[s]), int(edges[s + 1]) - 1
                active = block_order[
                    (lo_idx[block_order] <= s) & (hi_idx[block_order] >= s)
                ]
                all_docs = []
                all_contrib = []
                for qi in active:
                    bi = int(idxs[qi])
                    if bi not in decoded:
                        # tf-normalization is query-INDEPENDENT: compute
                        # it once at decode (docs, lengths lookup, the
                        # division) and every query touching this block
                        # pays only a slice + one multiply — the hot-term
                        # blocks are shared by most of a 192-query batch
                        d = decode_doc_block(docs_col[bi]).astype(np.int64)
                        tt = vbyte_decode(tfs_col[bi]).astype(np.float64)
                        ln = len_vals[np.searchsorted(len_docs, d)]
                        decoded[bi] = (
                            d,
                            (tt * (kk + 1))
                            / (tt + kk * (1 - b + b * ln / avgdl)),
                        )
                    d, tfn = decoded[bi]
                    a = np.searchsorted(d, seg_lo, side="left")
                    z = np.searchsorted(d, seg_hi, side="right")
                    if a == z:
                        continue
                    all_docs.append(d[a:z])
                    all_contrib.append(w_idf[qi] * tfn[a:z])
                if not all_docs:
                    continue
                docs_cat = np.concatenate(all_docs)
                contrib_cat = np.concatenate(all_contrib)
                uniq, inv = np.unique(docs_cat, return_inverse=True)
                scores = np.bincount(inv, weights=contrib_cat)
                top_docs = np.concatenate([top_docs, uniq])
                top_scores = np.concatenate([top_scores, scores])
                sel2 = np.lexsort((top_docs, -top_scores))[:k]
                top_docs, top_scores = top_docs[sel2], top_scores[sel2]
                if len(top_docs) >= k:
                    threshold = top_scores[-1]
            if len(top_docs):
                out_qids.append(qid)
                out_docs.append(top_docs)
                out_scores.append(top_scores)
        if not out_docs:
            return empty
        # ONE frame per bucket call, not one per query — frame
        # construction was ~25% of kernel time at 192-query batches
        qid_col = np.repeat(
            np.array(out_qids, dtype=object),
            [len(d) for d in out_docs],
        )
        return pd.DataFrame(
            {
                "qid": qid_col,
                "doc": np.concatenate(out_docs),
                "score": np.concatenate(out_scores),
            }
        )

    return kernel_bc if lengths_bc is not None else kernel


def wand_batch_topk(
    spark: SparkSession,
    index_dir: str,
    queries: dict[str, tuple[list[str], list[float] | None]],
    k: int = 10,
    b: float = BM25_B,
    k1: float = BM25_K,
    normalize: bool = True,
    reader: PackedReader | None = None,
) -> DataFrame:
    """Whole-batch BM25 WAND in ONE Spark job. ``queries``: qid ->
    (terms, weights-or-None). Returns (qid, doc, score, rank), each
    query's top-k rank-identical to :func:`wand_topk` on that query
    (asserted in tests/test_packed_wand.py)."""
    if reader is None:
        reader = PackedReader(spark, index_dir, cache=False)
    params = reader.params
    cs = reader.index.collection_stats
    avgdl = cs.avg_doc_length

    union_terms = sorted({t for terms, _w in queries.values() for t in terms})
    stats = reader.term_stats(union_terms)
    query_infos: dict[str, dict[str, tuple[float, float]]] = {}
    for qid, (terms, weights) in queries.items():
        if weights is None:
            weights = [1.0] * len(terms)
        if normalize:
            total = sum(weights)
            if total > 0:
                weights = [w / total for w in weights]
        info = {
            t: (w, bm25_idf(cs.document_count, stats[t].df))
            for t, w in zip(terms, weights)
            if t in stats
        }
        if info:
            query_infos[qid] = info
    if not query_infos:
        return spark.createDataFrame(
            [], "qid string, doc long, score double, rank int"
        )

    default_tfn = (
        abs(b - params["bm25_b"]) < 1e-12
        and abs(k1 - params["bm25_k"]) < 1e-12
        and abs(avgdl - params["avgdl"]) < 1e-9
    )
    live_terms = sorted({t for info in query_infos.values() for t in info})
    blocks_src, lengths_src = reader.wand_frames()
    blocks = blocks_src.filter(F.col("term").isin(live_terms))
    if reader._lengths_bc is not None:
        # resident service mode with broadcast lengths: one-sided
        # grouped-map over the cached co-partitioned blocks — zero
        # exchange, zero lengths bytes through Arrow per batch
        kernel = _batch_bucket_kernel(query_infos, k, b, k1, avgdl,
                                      default_tfn,
                                      lengths_bc=reader._lengths_bc)
        candidates = blocks.groupBy("bucket").applyInPandas(
            kernel, schema=_BATCH_OUT_SCHEMA
        )
    else:
        if reader._blocks_cogrp is not None:
            # resident mode, lengths too big to broadcast: a batch's term
            # union touches nearly every bucket, so the per-run broadcast
            # subquery that prunes the lengths side costs a whole extra
            # job to save almost nothing — ship the cached lengths whole
            lengths = lengths_src
        else:
            # cold pruned-scan mode: lengths = one row per DOCUMENT, so at
            # collection scale the semi-join to candidate buckets is the
            # difference between reading a slice and reading the collection
            buckets = blocks.select("bucket").distinct()
            lengths = lengths_src.join(
                F.broadcast(buckets), "bucket", "left_semi"
            )
        kernel = _batch_bucket_kernel(query_infos, k, b, k1, avgdl,
                                      default_tfn)
        candidates = (
            blocks.groupBy("bucket")
            .cogroup(lengths.groupBy("bucket"))
            .applyInPandas(kernel, schema=_BATCH_OUT_SCHEMA)
        )
    w = Window.partitionBy("qid").orderBy(
        F.col("score").desc(), F.col("doc").asc()
    )
    return (
        candidates.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# flat Dirichlet WAND over arbitrary posting leaves — the part-backed #sdm
# tier: window parts (index/window.py) packed into their own block layers
# (index/packed.pack_window_parts) turn od/uw children into plain posting
# streams whose block max_tf is an EXACT window-count bound — sound AND
# selective, unlike the positional kernel's loose sum/maxtf bounds
# ---------------------------------------------------------------------------


def _flat_dirichlet_kernel(leaf_info: dict[str, tuple[float, float]],
                           mu: float, k: int):
    """Per-bucket exact-Dirichlet kernel over independent posting leaves.

    ``leaf_info``: leaf key (the ``term`` column of the unioned blocks) ->
    (weight, background cf/CL). Segment upper bound: sum_l w_l *
    ln(seg_maxtf_l + mu*bg_l) - W*ln(min_len + mu) — every factor exact
    per block, so pruning fires as hard as the data allows."""
    leaves = list(leaf_info)
    l_index = {t: i for i, t in enumerate(leaves)}
    n_leaves = len(leaves)
    ws = np.array([leaf_info[t][0] for t in leaves], dtype=np.float64)
    bgs = np.array([leaf_info[t][1] for t in leaves], dtype=np.float64)
    W = float(ws.sum())

    def kernel(blocks: pd.DataFrame, lengths: pd.DataFrame) -> pd.DataFrame:
        if blocks.empty or lengths.empty:
            return pd.DataFrame({"doc": [], "score": []}).astype(
                {"doc": "int64", "score": "float64"}
            )
        len_docs = lengths["doc"].to_numpy(dtype=np.int64)
        len_vals = lengths["length"].to_numpy(dtype=np.float64)
        order = np.argsort(len_docs)
        len_docs, len_vals = len_docs[order], len_vals[order]
        min_len = float(len_vals.min())

        first = blocks["first_doc"].to_numpy(dtype=np.int64)
        last = blocks["last_doc"].to_numpy(dtype=np.int64)
        bleaf = np.array([l_index[t] for t in blocks["term"]], dtype=np.int64)
        bmax = blocks["max_tf"].to_numpy(dtype=np.int64)

        edges = np.unique(np.concatenate([first, last + 1]))
        n_seg = len(edges) - 1
        lo_idx = np.searchsorted(edges, first, side="right") - 1
        hi_idx = np.searchsorted(edges, last, side="right") - 1

        seg_maxtf = np.zeros((n_leaves, n_seg), dtype=np.float64)
        for bi in range(len(first)):
            li = bleaf[bi]
            lo, hi = lo_idx[bi], hi_idx[bi]
            seg_maxtf[li, lo:hi + 1] = np.maximum(
                seg_maxtf[li, lo:hi + 1], bmax[bi]
            )
        seg_ub = np.full(n_seg, -W * math.log(min_len + mu), dtype=np.float64)
        for li in range(n_leaves):
            seg_ub += ws[li] * np.log(seg_maxtf[li] + mu * bgs[li])

        seg_order = np.argsort(-seg_ub, kind="stable")
        block_order = np.argsort(lo_idx, kind="stable")

        decoded: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        top_docs = np.empty(0, dtype=np.int64)
        top_scores = np.empty(0, dtype=np.float64)
        threshold = -math.inf

        for s in seg_order:
            if len(top_docs) >= k and seg_ub[s] < threshold:
                break
            seg_lo, seg_hi = int(edges[s]), int(edges[s + 1]) - 1
            active = block_order[
                (lo_idx[block_order] <= s) & (hi_idx[block_order] >= s)
            ]
            leaf_docs: list = [None] * n_leaves
            leaf_tfs: list = [None] * n_leaves
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
                li = int(bleaf[bi])
                if leaf_docs[li] is None:
                    leaf_docs[li] = d[a:z]
                    leaf_tfs[li] = t[a:z]
                else:
                    leaf_docs[li] = np.concatenate([leaf_docs[li], d[a:z]])
                    leaf_tfs[li] = np.concatenate([leaf_tfs[li], t[a:z]])
            present = [i for i in range(n_leaves) if leaf_docs[i] is not None]
            if not present:
                continue
            cand = np.unique(np.concatenate([leaf_docs[i] for i in present]))
            ln = len_vals[np.searchsorted(len_docs, cand)]
            scores = -W * np.log(ln + mu)
            for li in range(n_leaves):
                tf = np.zeros(len(cand), dtype=np.float64)
                if leaf_docs[li] is not None:
                    tf[np.searchsorted(cand, leaf_docs[li])] = leaf_tfs[li]
                scores += ws[li] * np.log(tf + mu * bgs[li])
            top_docs = np.concatenate([top_docs, cand])
            top_scores = np.concatenate([top_scores, scores])
            sel = np.lexsort((top_docs, -top_scores))[:k]
            top_docs, top_scores = top_docs[sel], top_scores[sel]
            if len(top_docs) >= k:
                threshold = top_scores[-1]

        return pd.DataFrame({"doc": top_docs, "score": top_scores})

    return kernel


# cost-probe threshold for #sdm tier routing: below this many candidate
# postings (sum of the query terms' document frequencies) the exhaustive
# window-part rewrite — pure JVM DataFrame plan, no Python round-trip —
# beats the cogroup kernel's fixed overhead (an Arrow batch transfer +
# pandas kernel per bucket); above it the kernel's exact block-max
# pruning wins because the exhaustive plan must score EVERY candidate.
# Calibration (round 5, 600k-doc synthetic code corpus, local[16],
# BASELINE.md §sdm-routing): NO crossover observed up to df_sum ~961k —
# kernel 1.18 s vs exhaustive 1.07 s at the head-term pair — so the
# default routes every single-box-scale query to the exhaustive rewrite
# and reserves the kernel for cluster-scale parts, where full candidate
# scoring (not the fixed kernel cost) dominates. Override with
# $SPARK_GRAFT_SDM_WAND_MIN_POSTINGS for other hardware.
SDM_WAND_MIN_POSTINGS = 2_000_000


def sdm_kernel_pays_off(reader: "PackedReader", terms: list[str],
                        min_postings: int | None = None) -> bool:
    """Cost probe for #sdm routing (--wand picks per-query cheapest):
    True when the part-backed WAND kernel should beat the exhaustive
    window-part rewrite. The probe reads only driver-cached term stats
    — no Spark job."""
    import os as _os

    if min_postings is None:
        min_postings = int(_os.environ.get(
            "SPARK_GRAFT_SDM_WAND_MIN_POSTINGS", str(SDM_WAND_MIN_POSTINGS)
        ))
    stats = reader.term_stats(list(set(terms)))
    total = sum(s.df for s in stats.values())
    return total >= min_postings


def wand_sdm_parts_topk(
    spark: SparkSession,
    index_dir: str,
    terms: list[str],
    k: int = 10,
    mu: float = 1500.0,
    uniw: float = 0.8,
    odw: float = 0.15,
    uww: float = 0.05,
    od_width: int = 1,
    uw_width: int = 8,
    reader: PackedReader | None = None,
    overfetch: int = 50,
) -> DataFrame:
    """#sdm top-k with window children served from PACKED WINDOW PARTS:
    each od:1 / uw:w pair is a posting leaf in its part's block layer
    (``index/packed.pack_window_parts``), so the whole query is a flat
    Dirichlet WAND over 3n-2 posting streams — no position decode, and
    every block bound is an exact max window count. Result-identical to
    ``execute("#sdm(...)")`` and to ``wand_sdm_topk`` (tested; same
    rounded-score ranking convention). Raises ValueError when the window
    block layers are absent or the widths don't match a built part —
    callers fall back to the positional kernel."""
    if reader is None:
        reader = PackedReader(spark, index_dir, cache=False,
                              text_part="postings")
    if reader.stemmer_name is not None:
        raise ValueError(
            "part-backed #sdm serves the RAW vocabulary (window parts "
            "key raw tokens); use the positional kernel on a stemmed tier"
        )
    idx = reader.index
    cs = idx.collection_stats
    if od_width != 1:
        raise ValueError("part-backed #sdm needs od_width == 1 "
                         "(the contiguous shingle part)")
    if any(a == b for a, b in zip(terms, terms[1:])):
        # the uw pair part only keys DISTINCT term pairs (same rule as
        # _window_part_rewrite); #sdm(t t) stays on the positional kernel
        raise ValueError(
            "part-backed #sdm needs distinct adjacent terms "
            "(unordered pair parts key distinct pairs)"
        )
    od_part = "window.od1.2"
    uw_part = f"window.uw.n2.w{uw_width}"
    import os

    for p in (od_part, uw_part):
        if not os.path.exists(os.path.join(index_dir, p, "blocks", "_SUCCESS")):
            raise ValueError(
                f"part-backed #sdm needs a packed window part at {p}/blocks "
                "(build_window_postings/build_unordered_window_postings + "
                "pack_window_parts)"
            )
        pp = packed_params(index_dir, f"{p}/blocks")
        if int(pp["bucket_bits"]) != int(reader.params["bucket_bits"]):
            raise ValueError(
                f"{p}/blocks bucket_bits {pp['bucket_bits']} != main "
                f"{reader.params['bucket_bits']} — repack with matching "
                "geometry"
            )

    plan = _sdm_scorer_plan(terms, uniw, odw, uww)
    uni_keys: dict[int, str] = {}
    od_keys: dict[tuple[int, int], str] = {}
    uw_keys: dict[tuple[int, int], str] = {}
    for w, kind, i, j in plan:
        if kind == "uni":
            uni_keys[i] = terms[i]
        elif kind == "od":
            od_keys[(i, j)] = f"{terms[i]}~{terms[j]}"
        else:
            a, b2 = sorted((terms[i], terms[j]))
            uw_keys[(i, j)] = f"{a}~{b2}"

    # leaf stats: unigram cf from termstats; window cf from the parts'
    # own termstats (driver-cached like term_stats, pruned scans above
    # the vocab cap)
    stats = reader.term_stats(list(set(terms)))
    od_cfs = reader.part_cfs(od_part, list(set(od_keys.values())))
    uw_cfs = reader.part_cfs(uw_part, list(set(uw_keys.values())))

    # merge duplicate leaves' weights (a repeated query term is several
    # plan entries over the same posting stream — weights sum exactly)
    leaf_info: dict[str, tuple[float, float]] = {}

    def add_leaf(key: str, w: float, cf: int) -> None:
        bg = (cf if cf > 0 else 0.5) / cs.collection_length
        if key in leaf_info:
            leaf_info[key] = (leaf_info[key][0] + w, bg)
        else:
            leaf_info[key] = (w, bg)

    for w, kind, i, j in plan:
        if kind == "uni":
            ts = stats.get(terms[i])
            add_leaf("u:" + uni_keys[i], w, ts.cf if ts else 0)
        elif kind == "od":
            key = od_keys[(i, j)]
            add_leaf("o:" + key, w, od_cfs.get(key, 0))
        else:
            key = uw_keys[(i, j)]
            add_leaf("w:" + key, w, uw_cfs.get(key, 0))

    cols = ["term", "bucket", "first_doc", "last_doc", "max_tf", "docs", "tfs"]

    def scan(part: str | None, prefix: str, keys: list[str]) -> DataFrame:
        raw = reader.blocks if part is None else reader.part_blocks(part)
        return (
            raw.filter(F.col("term").isin(list(set(keys))))
            .select(*cols)
            .withColumn("term", F.concat(F.lit(prefix), F.col("term")))
        )

    blocks = (
        scan(None, "u:", list(uni_keys.values()))
        .unionByName(scan(od_part, "o:", list(od_keys.values())))
        .unionByName(scan(uw_part, "w:", list(uw_keys.values())))
    )
    buckets = blocks.select("bucket").distinct()
    lengths = reader.lengths_bucketed.join(
        F.broadcast(buckets), "bucket", "left_semi"
    )
    kernel = _flat_dirichlet_kernel(leaf_info, mu, k + overfetch)
    candidates = (
        blocks.groupBy("bucket")
        .cogroup(lengths.groupBy("bucket"))
        .applyInPandas(kernel, schema=_OUT_SCHEMA)
    )
    w_rank = Window.orderBy(F.col("score").desc(), F.col("doc").asc())
    return (
        candidates.withColumn("score", F.round(F.col("score"), 6))
        .orderBy(F.col("score").desc(), F.col("doc").asc())
        .limit(k)
        .withColumn("rank", F.row_number().over(w_rank))
    )


# ---------------------------------------------------------------------------
# block-max WAND over #sdm trees — positions in the packed layer
# (PositionIndexWriter.java:326-386 payloads; window tfs computed inside
# the bucket kernel from decoded positions, DeltaScoreDocumentModel-style
# pruning with Dirichlet bounds)
# ---------------------------------------------------------------------------


def _sdm_scorer_plan(terms: list[str], uniw: float, odw: float, uww: float):
    """Flattened (weight, kind, i, j) scorer list matching
    traversals.sdm_traversal + flatten_combine exactly: unigrams get
    uniw/n, od/uw pairs get odw/(n-1), uww/(n-1)."""
    n = len(terms)
    total = uniw + odw + uww
    uniw, odw, uww = uniw / total, odw / total, uww / total
    plan = [(uniw / n, "uni", i, -1) for i in range(n)]
    if n > 1:
        for i in range(n - 1):
            plan.append((odw / (n - 1), "od", i, i + 1))
        for i in range(n - 1):
            plan.append((uww / (n - 1), "uw", i, i + 1))
    return plan


def _sdm_bucket_kernel(terms: list[str], plan, bgs: list[float], mu: float,
                       k: int, od_width: int, uw_width: int):
    """Per-bucket exact-Dirichlet #sdm kernel with block-max segment
    pruning. ``plan[s] = (w, kind, i, j)``; ``bgs[s]`` the scorer's
    background mu*cf/CL term. Window tfs come from decoded position
    payloads via the searchsorted count kernels."""
    from galago_git_spark.functions.windows import (
        ordered2_counts,
        unordered2_counts,
    )
    from galago_git_spark.index.codec import decode_positions_block

    n_terms = len(terms)
    t_index = {t: i for i, t in enumerate(terms)}
    W = sum(w for w, *_ in plan)

    def kernel(blocks: pd.DataFrame, lengths: pd.DataFrame) -> pd.DataFrame:
        if blocks.empty or lengths.empty:
            return pd.DataFrame({"doc": [], "score": []}).astype(
                {"doc": "int64", "score": "float64"}
            )
        len_docs = lengths["doc"].to_numpy(dtype=np.int64)
        len_vals = lengths["length"].to_numpy(dtype=np.float64)
        order = np.argsort(len_docs)
        len_docs, len_vals = len_docs[order], len_vals[order]
        min_len = float(len_vals.min())

        first = blocks["first_doc"].to_numpy(dtype=np.int64)
        last = blocks["last_doc"].to_numpy(dtype=np.int64)
        bterm = np.array([t_index[t] for t in blocks["term"]], dtype=np.int64)
        bmax = blocks["max_tf"].to_numpy(dtype=np.int64)

        edges = np.unique(np.concatenate([first, last + 1]))
        n_seg = len(edges) - 1
        lo_idx = np.searchsorted(edges, first, side="right") - 1
        hi_idx = np.searchsorted(edges, last, side="right") - 1

        # per-term per-segment max_tf (0 where the term has no block)
        seg_maxtf = np.zeros((n_terms, n_seg), dtype=np.float64)
        for bi in range(len(first)):
            t = bterm[bi]
            lo, hi = lo_idx[bi], hi_idx[bi]
            seg_maxtf[t, lo:hi + 1] = np.maximum(
                seg_maxtf[t, lo:hi + 1], bmax[bi]
            )

        # segment upper bounds: sum_s w*ln(ub_tf + mu*bg) - W*ln(min_len+mu).
        # Window-tf bounds must dominate the exact count kernels
        # (functions/windows.py): #uw's merge emits one window per consumed
        # extent, so count <= tf_i + tf_j (UnorderedWindowIterator.java:28-82
        # — e.g. A=[1,3], B=[2], width 8 gives 2 windows > min=1); #od emits
        # at most one window per FIRST-child occurrence, and a later-child
        # occurrence can serve many firsts when width > 1
        # (OrderedWindowIterator.java:25-85), so count <= tf_i. Only at
        # width == 1 (contiguous bigram) does each match consume a distinct
        # occurrence of both children, making min(tf_i, tf_j) sound.
        seg_ub = np.full(n_seg, -W * math.log(min_len + mu), dtype=np.float64)
        for (w, kind, i, j), bg in zip(plan, bgs):
            if kind == "uni":
                ub_tf = seg_maxtf[i]
            elif kind == "od" and od_width == 1:
                ub_tf = np.minimum(seg_maxtf[i], seg_maxtf[j])
            else:
                both = np.minimum(seg_maxtf[i], seg_maxtf[j]) > 0
                if kind == "od":
                    ub_tf = np.where(both, seg_maxtf[i], 0.0)
                else:
                    ub_tf = np.where(
                        both, seg_maxtf[i] + seg_maxtf[j], 0.0
                    )
            seg_ub += w * np.log(ub_tf + mu * bg)

        seg_order = np.argsort(-seg_ub, kind="stable")
        block_order = np.argsort(lo_idx, kind="stable")

        decoded: dict[int, tuple] = {}

        def get_block(bi: int):
            if bi not in decoded:
                d = decode_doc_block(blocks["docs"].iloc[bi]).astype(np.int64)
                t = vbyte_decode(blocks["tfs"].iloc[bi]).astype(np.int64)
                p = decode_positions_block(
                    blocks["pos"].iloc[bi], t
                ).astype(np.int64)
                starts = np.zeros(len(t) + 1, dtype=np.int64)
                np.cumsum(t, out=starts[1:])
                decoded[bi] = (d, t, p, starts)
            return decoded[bi]

        top_docs = np.empty(0, dtype=np.int64)
        top_scores = np.empty(0, dtype=np.float64)
        threshold = -math.inf

        for s in seg_order:
            if len(top_docs) >= k and seg_ub[s] < threshold:
                break
            seg_lo, seg_hi = int(edges[s]), int(edges[s + 1]) - 1
            active = block_order[
                (lo_idx[block_order] <= s) & (hi_idx[block_order] >= s)
            ]
            # per-term docs/tfs/position-rows inside the segment
            term_docs: list = [None] * n_terms
            term_tfs: list = [None] * n_terms
            term_rows: list = [None] * n_terms
            for bi in active:
                bi = int(bi)
                d, t, p, starts = get_block(bi)
                a = np.searchsorted(d, seg_lo, side="left")
                z = np.searchsorted(d, seg_hi, side="right")
                if a == z:
                    continue
                ti = int(bterm[bi])
                rows = np.split(p[starts[a]:starts[z]],
                                (starts[a + 1:z] - starts[a]))
                # blocks of one term never overlap in doc range, so at most
                # one block per (term, segment) contributes here per term —
                # but guard by concatenating if it ever happens
                if term_docs[ti] is None:
                    term_docs[ti] = d[a:z]
                    term_tfs[ti] = t[a:z]
                    term_rows[ti] = rows
                else:
                    term_docs[ti] = np.concatenate([term_docs[ti], d[a:z]])
                    term_tfs[ti] = np.concatenate([term_tfs[ti], t[a:z]])
                    term_rows[ti] = term_rows[ti] + rows
            present = [i for i in range(n_terms) if term_docs[i] is not None]
            if not present:
                continue
            cand = np.unique(np.concatenate([term_docs[i] for i in present]))
            ln = len_vals[np.searchsorted(len_docs, cand)]
            scores = -W * np.log(ln + mu)
            # per-scorer exact contributions
            tf_cache: dict[int, np.ndarray] = {}

            def uni_tf(i: int) -> np.ndarray:
                if i not in tf_cache:
                    out = np.zeros(len(cand), dtype=np.float64)
                    if term_docs[i] is not None:
                        pos = np.searchsorted(cand, term_docs[i])
                        out[pos] = term_tfs[i]
                    tf_cache[i] = out
                return tf_cache[i]

            win_cache: dict[tuple, np.ndarray] = {}

            def win_tf(kind: str, i: int, j: int) -> np.ndarray:
                key = (kind, i, j)
                if key in win_cache:
                    return win_cache[key]
                out = np.zeros(len(cand), dtype=np.float64)
                if term_docs[i] is not None and term_docs[j] is not None:
                    common, ia, jb = np.intersect1d(
                        term_docs[i], term_docs[j], return_indices=True
                    )
                    if len(common):
                        rows_i = [term_rows[i][x] for x in ia]
                        rows_j = [term_rows[j][x] for x in jb]
                        if kind == "od":
                            counts = ordered2_counts(rows_i, rows_j, od_width)
                        else:
                            counts = unordered2_counts(rows_i, rows_j, uw_width)
                        out[np.searchsorted(cand, common)] = counts
                win_cache[key] = out
                return out

            for (w, kind, i, j), bg in zip(plan, bgs):
                tf = uni_tf(i) if kind == "uni" else win_tf(kind, i, j)
                scores += w * np.log(tf + mu * bg)

            top_docs = np.concatenate([top_docs, cand])
            top_scores = np.concatenate([top_scores, scores])
            sel = np.lexsort((top_docs, -top_scores))[:k]
            top_docs, top_scores = top_docs[sel], top_scores[sel]
            if len(top_docs) >= k:
                threshold = top_scores[-1]

        return pd.DataFrame({"doc": top_docs, "score": top_scores})

    return kernel


def wand_sdm_topk(
    spark: SparkSession,
    index_dir: str,
    terms: list[str],
    k: int = 10,
    mu: float = 1500.0,
    uniw: float = 0.8,
    odw: float = 0.15,
    uww: float = 0.05,
    od_width: int = 1,
    uw_width: int = 8,
    reader: PackedReader | None = None,
    overfetch: int = 50,
) -> DataFrame:
    """#sdm top-k on the packed tier: window tfs from position payloads,
    Dirichlet scoring identical to the exhaustive executor expansion
    (traversals.sdm_traversal), block-max segment pruning. Rank-identical
    to ``execute("#sdm(...)")`` (tested); ranking is computed on rounded
    scores from ``k + overfetch`` raw candidates so rounding ties resolve
    exactly like the relational/oracle path."""
    from galago_git_spark.query.executor import node_stats, prefetch_node_stats
    from galago_git_spark.query.nodes import Node, term_node

    if reader is None:
        reader = PackedReader(spark, index_dir, cache=False)
    if not reader.params.get("positions"):
        raise ValueError(
            "wand_sdm_topk needs a packed layer with positions "
            "(rebuild with build_packed over a positions build)"
        )
    idx = reader.index
    cs = idx.collection_stats

    plan = _sdm_scorer_plan(terms, uniw, odw, uww)
    # statistics: unigram cf from termstats; window cf from the batched
    # node-stats pass (one job for all windows, memoized on the Index)
    stats = reader.term_stats(list(set(terms)))
    window_nodes = {}
    for w, kind, i, j in plan:
        if kind == "od":
            window_nodes[(kind, i, j)] = Node(
                "ordered", {"default": od_width},
                [term_node(terms[i]), term_node(terms[j])],
            )
        elif kind == "uw":
            window_nodes[(kind, i, j)] = Node(
                "unordered", {"default": uw_width},
                [term_node(terms[i]), term_node(terms[j])],
            )
    prefetch_node_stats(
        [Node("dirichlet", {}, [n]) for n in window_nodes.values()], idx
    )
    bgs = []
    for w, kind, i, j in plan:
        if kind == "uni":
            ts = stats.get(terms[i])
            cf = ts.cf if ts is not None and ts.cf > 0 else 0
        else:
            ns = node_stats(window_nodes[(kind, i, j)], idx)
            cf = ns.cf
        bgs.append((cf if cf > 0 else 0.5) / cs.collection_length)

    k_fetch = k + overfetch
    blocks = reader.blocks.filter(F.col("term").isin(list(set(terms))))
    buckets = blocks.select("bucket").distinct()
    lengths = reader.lengths_bucketed.join(
        F.broadcast(buckets), "bucket", "left_semi"
    )
    kernel = _sdm_bucket_kernel(terms, plan, bgs, mu, k_fetch, od_width, uw_width)
    candidates = (
        blocks.groupBy("bucket")
        .cogroup(lengths.groupBy("bucket"))
        .applyInPandas(kernel, schema=_OUT_SCHEMA)
    )
    w_rank = Window.orderBy(F.col("score").desc(), F.col("doc").asc())
    return (
        candidates.withColumn("score", F.round(F.col("score"), 6))
        .orderBy(F.col("score").desc(), F.col("doc").asc())
        .limit(k)
        .withColumn("rank", F.row_number().over(w_rank))
    )
