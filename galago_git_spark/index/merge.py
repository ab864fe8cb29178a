"""Index merge — the Spark rebuild of ``galago merge-index``
(``core/.../index/merge/MergeIndex.java``, ``GenericIndexMerger.java``,
``PositionIndexMerger.java``).

The reference k-way-merges B-tree parts with a doc-id remapping table
(``DocumentMappingReader``). Here the merge is one declarative plan:

1. union the ``names`` parts, re-assign dense doc ids by the global
   ``(repo, path, commit)`` sort — the SAME deterministic numbering the
   batch build uses, so a merged index is bit-identical in ids to an
   index built from the unioned corpus (tested);
2. broadcast-or-shuffle join the per-source ``(old doc -> new doc)``
   mapping into postings/lengths (Catalyst picks the strategy; the
   mapping is ~#docs rows);
3. termstats merge WITHOUT touching postings: doc sets are disjoint, so
   df and cf add and max_tf maxes (the same accumulation
   ``PositionIndexWriter.java:128-139`` does per part);
4. stats recompute from merged lengths (tiny agg).

Scale: every step is a shuffle-partitioned DataFrame op; nothing is
collected to the driver except per-partition counts inside
``assign_doc_ids`` (O(partitions) rows).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from galago_git_spark.index.build import assign_doc_ids


def _read_part(spark: SparkSession, index_dir: str, part: str) -> DataFrame:
    return spark.read.parquet(os.path.join(index_dir, part))


def merge_indexes(
    spark: SparkSession,
    index_dirs: list[str],
    out_dir: str,
    num_partitions: int | None = None,
) -> None:
    """Merge k indexes (disjoint doc sets) into one at ``out_dir``."""
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    os.makedirs(out_dir, exist_ok=True)

    # 1. global renumbering over the union of names
    names = None
    for i, d in enumerate(index_dirs):
        n = _read_part(spark, d, "names").withColumn("_src", F.lit(i))
        names = n if names is None else names.unionByName(n)
    renumbered = assign_doc_ids(
        names.withColumnRenamed("doc", "old_doc"),
        num_partitions=num_partitions,
    )
    mapping = renumbered.select("_src", "old_doc", "doc").persist()
    mapping.count()  # materialize once; reused by every part below

    (
        renumbered.drop("old_doc", "_src")
        .repartitionByRange(num_partitions, "doc")
        .sortWithinPartitions("doc")
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "names"))
    )

    # 2. remap postings and lengths.
    # LAYOUT CONTRACT: remap("postings", ["term", "doc"]) must keep the
    # repartitionByRange(term, doc) + sortWithinPartitions(term, doc)
    # layout the batch part writers use (build.py write_postings,
    # index/window.py) — packed.build_packed(presorted=True) reads merged
    # postings under that assumption (zero-shuffle pack; exercised by
    # IncrementalIndexer.compact -> build_packed(presorted=True) and
    # asserted in tests/test_merge_incremental.py::
    # test_merged_postings_layout).
    def remap(part: str, sort_cols: list[str]) -> None:
        dfs = []
        cols = _read_part(spark, index_dirs[0], part).columns
        for i, d in enumerate(index_dirs):
            p = (
                _read_part(spark, d, part)
                .withColumnRenamed("doc", "old_doc")
                .withColumn("_src", F.lit(i))
            )
            dfs.append(p)
        un = dfs[0]
        for p in dfs[1:]:
            un = un.unionByName(p)
        out = (
            un.join(mapping, ["_src", "old_doc"])
            .select(*cols)
            .repartitionByRange(num_partitions, *sort_cols)
            .sortWithinPartitions(*sort_cols)
        )
        out.write.mode("overwrite").parquet(os.path.join(out_dir, part))

    remap("lengths", ["doc"])
    remap("postings", ["term", "doc"])

    # 3. termstats: additive merge (disjoint doc sets)
    ts = None
    for d in index_dirs:
        t = _read_part(spark, d, "termstats")
        ts = t if ts is None else ts.unionByName(t)
    (
        ts.groupBy("term")
        .agg(
            F.sum("df").alias("df"),
            F.sum("cf").alias("cf"),
            F.max("max_tf").alias("max_tf"),
        )
        .repartitionByRange(max(1, num_partitions // 4), "term")
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "termstats"))
    )

    # 4. stats from merged lengths
    lengths = _read_part(spark, out_dir, "lengths")
    vocab = _read_part(spark, out_dir, "termstats").count()
    (
        lengths.agg(
            F.sum("length").alias("collection_length"),
            F.count(F.lit(1)).alias("document_count"),
            F.avg("length").alias("avg_doc_length"),
            F.max("length").alias("max_length"),
            F.min("length").alias("min_length"),
            F.count(F.when(F.col("length") > 0, 1)).alias("non_zero_len_doc_count"),
        )
        .withColumn("vocab_count", F.lit(vocab))
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "stats"))
    )
    mapping.unpersist()
