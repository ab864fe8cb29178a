"""Packed posting layer — d-gap + vbyte blocks with block-max metadata.

The Spark-native analog of Galago's PositionIndexWriter output
(``core/.../index/disk/PositionIndexWriter.java:24-47`` format comment,
``:326-358`` d-gap/vbyte encode, ``:360-386`` skip structure): per term,
the docid-sorted posting list is cut into fixed-size blocks; each block
row carries

    (term, bucket, first_doc, last_doc, n, max_tf, max_tfn,
     docs binary, tfs binary)

where ``docs`` is the d-gap+vbyte doc list, ``tfs`` the vbyte tf list,
``max_tf`` the block's maximum count (NodeStatistics.maximumCount at block
granularity) and ``max_tfn`` the block's maximum *length-normalized* BM25
tf component ``tf*(k+1)/(tf + k*(1-b+b*len/avgdl))`` under the build-time
defaults — multiplied by idf at query time this is the block-max WAND
upper bound (strictly tighter than Galago's term-level maximumScore,
``BM25ScoringIterator.java:61-105``).

Scale design (10^12 docs):

- **No single-writer bottleneck and no whole-posting-list tasks**: blocks
  are assembled per ``(term, bucket)`` group where ``bucket = doc >>
  bucket_bits`` — the salted-repartition of the north rule. A head term
  appearing in billions of docs is split across ~doc-range buckets, each
  an independent, bounded task. Blocks never span buckets, so bucket
  boundaries are also block boundaries (each bucket is a self-contained
  doc-partitioned shard — the same layout a distributed retrieval tier
  would serve).
- The blocks table is written range-partitioned and sorted by
  ``(term, bucket, first_doc)``: parquet row-group min/max stats prune a
  query's term lookups (the B-tree seek), and file-level pruning skips
  whole shards (the coarse skip list).
- The tfn join (postings x lengths) is a plain shuffle join on ``doc``;
  Catalyst/AQE handle skew — no custom machinery needed.
"""

from __future__ import annotations

import json
import os
import time
import warnings

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from galago_git_spark.index.codec import (
    encode_doc_block,
    encode_positions_block,
    vbyte_encode,
)
from galago_git_spark.query.scoring import BM25_B, BM25_K

BLOCKS_SCHEMA = (
    "term string, bucket long, first_doc long, last_doc long, n int, "
    "max_tf int, max_tfn double, docs binary, tfs binary, pos binary"
)

DEFAULT_BLOCK_SIZE = 512  # Galago skipDistance=500 (BuildIndex.java:297-305)
DEFAULT_BUCKET_BITS = 12  # doc-range shard width = 4096 docs (local scale);
# at cluster scale raise to ~20 (1M docs/shard) via the build param.


_BLOCK_COLS = [
    "term", "bucket", "first_doc", "last_doc", "n",
    "max_tf", "max_tfn", "docs", "tfs", "pos",
]


def _encode_chunk(term_arr, bucket_arr, docs, tfs, tfns, block_size: int,
                  rows: list, positions=None) -> None:
    """Encode a (term,bucket)-sorted chunk: group boundaries by change
    points, blocks by fixed stride — pure numpy slicing, no per-group
    pandas objects (the per-group-DataFrame overhead of applyInPandas
    dominated pack time at ~1ms x #groups). ``positions`` (object array of
    per-posting position arrays, or None) adds the d-gap+vbyte position
    payload (PositionIndexWriter.java:326-358)."""
    n = len(docs)
    if n == 0:
        return
    change = np.flatnonzero(
        (term_arr[1:] != term_arr[:-1]) | (bucket_arr[1:] != bucket_arr[:-1])
    )
    starts = np.concatenate(([0], change + 1))
    ends = np.concatenate((change + 1, [n]))
    for gs, ge in zip(starts, ends):
        term = term_arr[gs]
        bucket = int(bucket_arr[gs])
        for bs in range(gs, ge, block_size):
            be = min(bs + block_size, ge)
            d = docs[bs:be]
            t = tfs[bs:be]
            if positions is None:
                pos_buf = None
            else:
                flat = (
                    np.concatenate(
                        [np.asarray(p, dtype=np.uint64) for p in positions[bs:be]]
                    )
                    if be > bs
                    else np.empty(0, dtype=np.uint64)
                )
                pos_buf = encode_positions_block(flat, t.astype(np.int64))
            rows.append(
                (
                    term, bucket, int(d[0]), int(d[-1]), be - bs,
                    int(t.max()), float(tfns[bs:be].max()),
                    encode_doc_block(d), vbyte_encode(t), pos_buf,
                )
            )


def _pack_stream(block_size: int):
    """mapInPandas kernel over a partition sorted by (term, bucket, doc):
    encodes every complete (term, bucket) group per Arrow batch, carrying
    the trailing open group into the next batch."""

    def encode(head: pd.DataFrame, rows: list) -> None:
        _encode_chunk(
            head["term"].to_numpy(),
            head["bucket"].to_numpy(),
            head["doc"].to_numpy(dtype=np.uint64),
            head["tf"].to_numpy(dtype=np.uint64),
            head["tfn"].to_numpy(dtype=np.float64),
            block_size,
            rows,
            positions=(
                head["positions"].to_numpy()
                if "positions" in head.columns
                else None
            ),
        )

    def fn(batches):
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if pdf.empty:
                continue
            t = pdf["term"].to_numpy()
            b = pdf["bucket"].to_numpy()
            # the trailing group may continue in the next batch: hold it back
            not_last = np.flatnonzero((t != t[-1]) | (b != b[-1]))
            if len(not_last) == 0:
                carry = pdf
                continue
            cut = int(not_last[-1]) + 1
            carry = pdf.iloc[cut:].reset_index(drop=True)
            head = pdf.iloc[:cut]
            rows: list = []
            encode(head, rows)
            if rows:
                yield pd.DataFrame(rows, columns=_BLOCK_COLS)
        if carry is not None and not carry.empty:
            rows = []
            encode(carry, rows)
            if rows:
                yield pd.DataFrame(rows, columns=_BLOCK_COLS)

    return fn


def build_packed(
    spark: SparkSession,
    index_dir: str,
    block_size: int = DEFAULT_BLOCK_SIZE,
    bucket_bits: int = DEFAULT_BUCKET_BITS,
    num_partitions: int | None = None,
    resume: bool = False,
    lengths: DataFrame | None = None,
    avgdl: float | None = None,
    postings: DataFrame | None = None,
    out: str = "blocks",
    presorted: bool = False,
    n_docs: int | None = None,
    broadcast_max_docs: int = 100_000_000,
) -> dict:
    """Build a block layer from a relational postings table.

    Default: the main ``postings`` part into ``blocks``. ``postings`` +
    ``out`` pack any other (term, doc, tf[, positions]) part into its own
    block layer — e.g. a window n-gram part into
    ``window.od1.2/blocks`` (see :func:`pack_window_parts`), which is what
    makes window leaves first-class WAND posting streams.

    Returns the block-layer params (also recorded in manifest.json under
    the ``out`` key so the query side picks up the same bucket geometry).
    With ``resume=True`` a manifest-committed blocks part with a _SUCCESS
    marker is reused.

    ``lengths``/``avgdl`` may be supplied by the caller (build_index's
    fused wave passes a postings-derived lengths frame) so the pack job
    does not have to wait for the lengths/stats parts — blocks then build
    CONCURRENTLY with them.

    ``presorted=True`` is the ZERO-SHUFFLE pack for postings that came
    from one of our part writers (build.py / index/window.py always lay
    parts out ``repartitionByRange(term, doc).sortWithinPartitions``):
    ``bucket = doc >> bucket_bits`` is monotone in doc within a term, so
    every scan task already streams (term, bucket, doc)-sorted runs with
    globally disjoint doc ranges per term. The plan becomes scan →
    broadcast-join(lengths) → within-partition sort → encode: no range
    shuffle, no sampling pass (repartitionByRange re-executes its child
    to sample bounds), no exchange at all; the within-partition sort is
    a TimSort over nearly-sorted runs (it only repairs the case where
    Spark bin-packs non-adjacent file chunks into one task out of range
    order — a (term,bucket) group concatenated out of doc order would
    otherwise break the d-gap encode). A group split across tasks just
    yields an extra, smaller block — the WAND kernel treats blocks as
    independent (first_doc,last_doc) intervals and orders them itself.

    The presorted path broadcasts the (doc, length) table to every task.
    Spark hard-caps broadcasts at 8 GB, so the zero-shuffle pack only
    holds while that table fits: beyond ``broadcast_max_docs`` rows
    (default 100M ≈ 1.6 GB of two longs, well under the cap) the build
    automatically falls back to ``presorted=False`` — one range shuffle,
    sort-merge lengths join, correct at any doc count. ``n_docs`` lets
    callers that already know the count (build_index's fused wave) skip
    the stats read / lengths count used to evaluate the guard.
    """
    manifest_key = out
    manifest_path_early = os.path.join(index_dir, "manifest.json")
    if resume and os.path.exists(manifest_path_early):
        with open(manifest_path_early) as f:
            m = json.load(f)
        if manifest_key in m.get("parts", {}) and os.path.exists(
            os.path.join(index_dir, out, "_SUCCESS")
        ):
            return m["parts"][manifest_key]["params"]
    t0 = time.time()
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if postings is None:
        postings = spark.read.parquet(os.path.join(index_dir, "postings"))
    has_positions = "positions" in postings.columns
    cols = ["term", "doc", "tf"] + (["positions"] if has_positions else [])
    postings = postings.select(*cols)
    if lengths is None:
        lengths = spark.read.parquet(os.path.join(index_dir, "lengths"))
    if avgdl is None or (presorted and n_docs is None):
        try:
            stats = spark.read.parquet(
                os.path.join(index_dir, "stats")
            ).collect()[0]
            if avgdl is None:
                avgdl = stats["collection_length"] / stats["document_count"]
            if n_docs is None:
                n_docs = int(stats["document_count"])
        except Exception:
            if n_docs is None:
                n_docs = lengths.count()
            if avgdl is None:
                raise
    if presorted and n_docs is not None and n_docs > broadcast_max_docs:
        # the zero-shuffle path's lengths broadcast would exceed what the
        # executors (and Spark's 8 GB broadcast cap) can hold — take the
        # range-shuffle path, which is correct at any doc count
        warnings.warn(
            f"build_packed: {n_docs} docs exceeds broadcast_max_docs="
            f"{broadcast_max_docs}; falling back to the shuffle pack "
            "(presorted=False)",
            stacklevel=2,
        )
        presorted = False

    k, b = BM25_K, BM25_B
    tfn = (F.col("tf") * (k + 1)) / (
        F.col("tf") + k * (1 - b + b * F.col("length") / F.lit(avgdl))
    )
    enriched = (
        postings.join(F.broadcast(lengths) if presorted else lengths, "doc")
        .withColumn("bucket", F.shiftright(F.col("doc"), bucket_bits).cast("long"))
        .withColumn("tfn", tfn)
        .select("term", "bucket", "doc", "tf", "tfn",
                *(["positions"] if has_positions else []))
    )
    if presorted:
        # zero-shuffle: scan order IS (term, bucket, doc) order per file
        # chunk (see docstring); the exchange-free sort repairs chunk
        # concatenation order inside a task and costs one merge pass
        stream = enriched.sortWithinPartitions("term", "bucket", "doc")
    else:
        # ONE range shuffle keyed (term, bucket, doc): the encode stream
        # sees each (term, bucket) group contiguously (a group split at a
        # range boundary just yields an extra, smaller block — doc ranges
        # stay disjoint), and the encoded blocks come out globally
        # range-ordered, so they write directly — no second shuffle of
        # the block rows.
        stream = enriched.repartitionByRange(
            num_partitions, "term", "bucket", "doc"
        ).sortWithinPartitions("term", "bucket", "doc")
    blocks = stream.mapInPandas(_pack_stream(block_size), schema=BLOCKS_SCHEMA)
    blocks_path = os.path.join(index_dir, out)
    blocks.write.mode("overwrite").parquet(blocks_path)
    _compact_small_part(spark, blocks_path)

    params = {
        "block_size": block_size,
        "bucket_bits": bucket_bits,
        "bm25_b": b,
        "bm25_k": k,
        "avgdl": avgdl,
        "positions": has_positions,
    }
    from galago_git_spark.index.build import MANIFEST_LOCK, part_lineage

    entry = {
        "path": blocks_path,
        "seconds": round(time.time() - t0, 3),
        "params": params,
        "lineage": part_lineage(blocks_path),
    }
    manifest_path = os.path.join(index_dir, "manifest.json")
    with MANIFEST_LOCK:
        manifest = {"params": {}, "parts": {}}
        if os.path.exists(manifest_path):
            with open(manifest_path) as f:
                manifest = json.load(f)
        manifest["parts"][manifest_key] = entry
        with open(manifest_path, "w") as f:
            json.dump(manifest, f, indent=2)
    return params


def packed_params(index_dir: str, part: str = "blocks") -> dict:
    with open(os.path.join(index_dir, "manifest.json")) as f:
        manifest = json.load(f)
    return manifest["parts"][part]["params"]


_COMPACT_BYTES = 64 << 20   # parts below this get rewritten...
_COMPACT_TARGET = 16 << 20  # ...into ~this many bytes per file


def _compact_small_part(spark: SparkSession, path: str) -> None:
    """Collapse a small many-file parquet part into few files.

    The pack job writes one file per task (32 on local[32]); for a small
    part that leaves KB-sized files, and Spark's split planner (one
    partition per file once ``totalBytes/defaultParallelism <
    openCostInBytes``) then schedules one TASK per file on every query —
    a pruned 25-block scan was costing 96 task launches across the three
    #sdm parts. Rewriting small parts into ~16 MB files makes the scan
    task count follow the data. Above 64 MB this is a no-op: big parts
    already split by size (128 MB), and at 100 TB the layer never
    qualifies. Per-file (term, bucket, doc) order is preserved by
    ``coalesce`` (it concatenates whole input files within a partition),
    and the WAND kernel orders blocks itself anyway."""
    total = 0
    files = 0
    for root, _dirs, names in os.walk(path):
        for n in names:
            if n.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, n))
                files += 1
    n_out = max(1, -(-total // _COMPACT_TARGET))
    if total >= _COMPACT_BYTES or files <= n_out:
        return
    import shutil

    tmp = path + ".compact"
    (
        spark.read.parquet(path)
        .coalesce(int(n_out))
        .write.mode("overwrite")
        .parquet(tmp)
    )
    shutil.rmtree(path)
    os.replace(tmp, path)


def read_blocks(spark: SparkSession, index_dir: str, part: str = "blocks") -> DataFrame:
    return spark.read.parquet(os.path.join(index_dir, part))


def pack_window_parts(
    spark: SparkSession,
    index_dir: str,
    num_partitions: int | None = None,
    resume: bool = False,
) -> list[str]:
    """Pack every on-disk window part (``window.od1.N``,
    ``window.uw.nN.wW`` — index/window.py) into its own block layer
    ``<part>/blocks``, REUSING the main layer's bucket geometry so window
    blocks cogroup with unigram blocks and doc lengths inside one WAND
    kernel (query/wand.wand_sdm_parts_topk). Positions are not packed —
    window parts are count streams; their block ``max_tf`` is an exact
    per-segment window-count bound, which is what restores sound AND
    selective #sdm pruning. Returns the packed part names."""
    main = packed_params(index_dir)
    packed = []
    for name in sorted(os.listdir(index_dir)):
        if not (name.startswith("window.od1.") or name.startswith("window.uw.")):
            continue
        post_dir = os.path.join(index_dir, name, "postings")
        if not os.path.exists(post_dir):
            continue
        build_packed(
            spark,
            index_dir,
            block_size=int(main["block_size"]),
            bucket_bits=int(main["bucket_bits"]),
            num_partitions=num_partitions,
            resume=resume,
            postings=spark.read.parquet(post_dir),
            out=f"{name}/blocks",
            # window parts share the part writers' sorted layout
            # (index/window.py:204-205) — zero-shuffle pack applies
            presorted=True,
        )
        packed.append(name)
    return packed
