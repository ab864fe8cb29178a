"""Incremental indexing — the Spark rebuild of Galago's GeometricIndex
(``core/.../index/geometric/GeometricIndex.java:1-21``: an in-memory index
flushed to disk shards, merged under a geometric policy with ``radix`` =
max shards per size class) and of the MemoryIndex ingest path.

Here each flush is a full index shard built by the batch pipeline
(``index/build.py``) under ``root/shards/shard_<n>/``; doc-id spaces are
kept disjoint by a per-shard base offset recorded in ``root/geometric.json``
(the analog of GeometricIndex's document-id offsets). Queries run over a
union view of the shards; ``compact()`` merges all shards into one with
the global deterministic renumbering (``index/merge.py``), after which the
index is byte-equivalent to a batch build of the full corpus.

Structured Streaming integration: :meth:`IncrementalIndexer.stream_writer`
returns a ``foreachBatch`` handler, so

    (spark.readStream.schema(CORPUS_SCHEMA).parquet(in_dir)
        .writeStream.trigger(availableNow=True)
        .foreachBatch(indexer.stream_writer()).start())

indexes a document stream micro-batch by micro-batch — watermarks/state
are unnecessary because indexing is append-only per batch (the reference
is likewise append-only: no in-place updates, GeometricIndex.java).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from galago_git_spark.index.build import Index, build_index
from galago_git_spark.index.merge import merge_indexes
from galago_git_spark.query.scoring import CollectionStats


class IncrementalIndexer:
    def __init__(self, spark: SparkSession, root: str, radix: int = 3):
        if radix < 2:
            raise ValueError("radix must be >= 2 (geometric size classes)")
        self.spark = spark
        self.root = root
        self.radix = radix
        os.makedirs(os.path.join(root, "shards"), exist_ok=True)
        self._manifest_path = os.path.join(root, "geometric.json")
        if os.path.exists(self._manifest_path):
            with open(self._manifest_path) as f:
                self.manifest = json.load(f)
        else:
            self.manifest = {"shards": [], "next_id": 0, "next_doc_base": 0}

    def _save(self) -> None:
        # doc ids are internal: keep shard id spaces disjoint by recomputing
        # bases as running totals in shard order (GeometricIndex's doc-id
        # mapping is likewise recomputed per shard set change)
        running = 0
        for s in self.manifest["shards"]:
            s["doc_base"] = running
            running += s["n_docs"]
        self.manifest["next_doc_base"] = running
        with open(self._manifest_path, "w") as f:
            json.dump(self.manifest, f, indent=2)

    # --- ingest -----------------------------------------------------------

    def add_batch(self, docs: DataFrame) -> str:
        """Index one batch of corpus rows as a new shard (a MemoryIndex
        flush, GeometricIndex.flushCurrentIndexBlock analog)."""
        sid = self.manifest["next_id"]
        shard_dir = os.path.join(self.root, "shards", f"shard_{sid}")
        build_index(docs, shard_dir, positions=False)
        n = self.spark.read.parquet(os.path.join(shard_dir, "names")).count()
        self.manifest["shards"].append(
            {"dir": shard_dir, "n_docs": n, "doc_base": self.manifest["next_doc_base"]}
        )
        self.manifest["next_id"] = sid + 1
        self.manifest["next_doc_base"] += n
        self._save()
        self.maybe_merge()
        return shard_dir

    def stream_writer(self):
        """``foreachBatch`` handler for Structured Streaming ingest."""

        def handle(batch_df: DataFrame, batch_id: int) -> None:
            if batch_df.isEmpty():
                return
            self.add_batch(batch_df)

        return handle

    # --- geometric merge policy ------------------------------------------

    def _size_class(self, n_docs: int) -> int:
        c = 0
        n = max(1, n_docs)
        while n >= self.radix:
            n //= self.radix
            c += 1
        return c

    def maybe_merge(self) -> bool:
        """GeometricIndex policy: when > radix shards share a size class,
        merge that class into one shard (cascades upward)."""
        merged_any = False
        while True:
            classes: dict[int, list[dict]] = {}
            for s in self.manifest["shards"]:
                classes.setdefault(self._size_class(s["n_docs"]), []).append(s)
            bucket = next(
                (v for v in classes.values() if len(v) > self.radix), None
            )
            if bucket is None:
                return merged_any
            sid = self.manifest["next_id"]
            out = os.path.join(self.root, "shards", f"shard_{sid}")
            merge_indexes(self.spark, [s["dir"] for s in bucket], out)
            n = sum(s["n_docs"] for s in bucket)
            base = min(s["doc_base"] for s in bucket)
            keep = [s for s in self.manifest["shards"] if s not in bucket]
            keep.append({"dir": out, "n_docs": n, "doc_base": base})
            keep.sort(key=lambda s: s["doc_base"])
            for s in bucket:
                shutil.rmtree(s["dir"], ignore_errors=True)
            self.manifest["shards"] = keep
            self.manifest["next_id"] = sid + 1
            self._save()
            merged_any = True

    def compact(self, packed: bool = False) -> str:
        """Merge ALL shards into one (full renumbering — equivalent to a
        batch build over the whole corpus). With ``packed=True`` the
        compacted shard also gets the vbyte block layer, so a
        streaming-built index serves the WAND tier (query/wand.py) exactly
        like a batch build."""
        if len(self.manifest["shards"]) == 1:
            out = self.manifest["shards"][0]["dir"]
        else:
            sid = self.manifest["next_id"]
            out = os.path.join(self.root, "shards", f"shard_{sid}")
            merge_indexes(
                self.spark, [s["dir"] for s in self.manifest["shards"]], out
            )
            n = sum(s["n_docs"] for s in self.manifest["shards"])
            for s in self.manifest["shards"]:
                shutil.rmtree(s["dir"], ignore_errors=True)
            self.manifest["shards"] = [{"dir": out, "n_docs": n, "doc_base": 0}]
            self.manifest["next_id"] = sid + 1
            self._save()
        if packed:
            from galago_git_spark.index.packed import build_packed

            # shard postings come from build_index's sorted part writer
            # OR, after a multi-shard compact, from merge_indexes.remap —
            # both write the repartitionByRange(term, doc) +
            # sortWithinPartitions(term, doc) layout the zero-shuffle
            # pack requires (contract noted in merge.py and asserted by
            # tests/test_merge_incremental.py::test_merged_postings_layout)
            build_packed(self.spark, out, resume=True, presorted=True)
        return out

    # --- query view -------------------------------------------------------

    def open(self) -> Index:
        """Union view over the live shards: per-shard doc ids are offset by
        the shard's doc_base (disjoint id spaces, GeometricIndex's
        document-id mapping)."""
        spark = self.spark
        postings = lengths = names = None
        for s in self.manifest["shards"]:
            off = F.lit(s["doc_base"])
            p = spark.read.parquet(os.path.join(s["dir"], "postings")).withColumn(
                "doc", F.col("doc") + off
            )
            l = spark.read.parquet(os.path.join(s["dir"], "lengths")).withColumn(
                "doc", F.col("doc") + off
            )
            nm = spark.read.parquet(os.path.join(s["dir"], "names")).withColumn(
                "doc", F.col("doc") + off
            )
            postings = p if postings is None else postings.unionByName(p)
            lengths = l if lengths is None else lengths.unionByName(l)
            names = nm if names is None else names.unionByName(nm)
        if postings is None:
            raise ValueError(
                f"no shards in {self.root} — nothing has been indexed yet "
                "(a streaming writer may still be running)"
            )
        termstats = postings.groupBy("term").agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("tf").alias("cf"),
            F.max("tf").alias("max_tf"),
        )
        agg = lengths.agg(
            F.sum("length").alias("cl"), F.count(F.lit(1)).alias("n")
        ).collect()[0]
        return Index(
            spark=spark,
            index_dir=self.root,
            postings=postings,
            lengths=lengths,
            names=names,
            termstats=termstats,
            collection_stats=CollectionStats(int(agg["cl"]), int(agg["n"])),
        )
