"""Index merge (MergeIndex analog) and incremental/geometric indexing
(GeometricIndex analog) tests: a merged or compacted index must be
equivalent to a batch build over the unioned corpus, and the streaming
union view must score identically to the batch index."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from galago_git_spark.index.build import build_index, open_index
from galago_git_spark.index.merge import merge_indexes
from galago_git_spark.query.executor import execute
from galago_git_spark.sources.corpus import synthetic_code_corpus
from galago_git_spark.streaming.incremental import IncrementalIndexer

QUERY = "#combine(#bm25(def) #bm25(return) #bm25(get_set))"


def _scores_by_name(spark, index_dir_or_idx, k=15):
    idx = (
        index_dir_or_idx
        if hasattr(index_dir_or_idx, "postings")
        else open_index(spark, index_dir_or_idx)
    )
    rows = execute(QUERY, idx, k=k, default_scorer="bm25", with_names=True).collect()
    return [(r["repo"], r["path"], round(r["score"], 9)) for r in rows]


@pytest.fixture(scope="module")
def corpus(spark):
    return synthetic_code_corpus(spark, n_docs=240, seed=42).persist()


def test_merge_equals_batch_build(spark, corpus, tmp_path):
    half_a = corpus.filter(F.crc32(F.col("path")) % 2 == 0)
    half_b = corpus.filter(F.crc32(F.col("path")) % 2 == 1)
    build_index(half_a, str(tmp_path / "a"), positions=False)
    build_index(half_b, str(tmp_path / "b"), positions=False)
    merge_indexes(spark, [str(tmp_path / "a"), str(tmp_path / "b")], str(tmp_path / "m"))
    build_index(corpus, str(tmp_path / "full"), positions=False)

    m, f = open_index(spark, str(tmp_path / "m")), open_index(spark, str(tmp_path / "full"))
    # identical ids: global renumbering reproduces the batch numbering
    mn = m.names.select("doc", "repo", "path").orderBy("doc").collect()
    fn = f.names.select("doc", "repo", "path").orderBy("doc").collect()
    assert mn == fn
    # identical postings and stats
    mp = m.postings.orderBy("term", "doc").collect()
    fp = f.postings.orderBy("term", "doc").collect()
    assert mp == fp
    assert m.collection_stats == f.collection_stats
    mt = m.termstats.orderBy("term").collect()
    ft = f.termstats.orderBy("term").collect()
    assert mt == ft
    # identical ranking (ids included -> rank-identical, tie-breaks and all)
    assert _scores_by_name(spark, m) == _scores_by_name(spark, f)


def test_incremental_view_and_compaction(spark, corpus, tmp_path):
    batches = [
        corpus.filter(F.crc32(F.col("path")) % 3 == i) for i in range(3)
    ]
    inc = IncrementalIndexer(spark, str(tmp_path / "inc"), radix=10)
    for b in batches:
        inc.add_batch(b)
    assert len(inc.manifest["shards"]) == 3

    build_index(corpus, str(tmp_path / "full"), positions=False)
    full = open_index(spark, str(tmp_path / "full"))

    # union view: same docs, same scores (ids differ -> compare by name)
    view = inc.open()
    assert view.collection_stats == full.collection_stats
    assert sorted(_scores_by_name(spark, view)) == sorted(_scores_by_name(spark, full))

    # compaction: single shard, now fully rank-identical to the batch build
    inc.compact()
    assert len(inc.manifest["shards"]) == 1
    compacted = open_index(spark, inc.manifest["shards"][0]["dir"])
    got = compacted.names.select("doc", "repo", "path").orderBy("doc").collect()
    want = full.names.select("doc", "repo", "path").orderBy("doc").collect()
    assert got == want
    assert _scores_by_name(spark, compacted) == _scores_by_name(spark, full)


def test_geometric_merge_policy(spark, tmp_path):
    corpus = synthetic_code_corpus(spark, n_docs=120, seed=7).persist()
    # equal 30-doc batches so all flushed shards share one size class
    i_col = F.regexp_extract(F.col("path"), r"file_(\d+)\.", 1).cast("int")
    batches = [corpus.filter(i_col % 4 == i) for i in range(4)]
    inc = IncrementalIndexer(spark, str(tmp_path / "geo"), radix=2)
    for b in batches:
        inc.add_batch(b)
    # radix=2: the 3rd same-size-class shard triggered a cascade merge
    assert len(inc.manifest["shards"]) == 2
    assert sorted(s["n_docs"] for s in inc.manifest["shards"]) == [30, 90]
    sizes = [s["n_docs"] for s in inc.manifest["shards"]]
    assert sum(sizes) == corpus.count()
    # doc bases are disjoint running offsets
    bases = [s["doc_base"] for s in inc.manifest["shards"]]
    expect, run = [], 0
    for n in sizes:
        expect.append(run)
        run += n
    assert bases == expect
    view = inc.open()
    assert view.lengths.count() == corpus.count()
    corpus.unpersist()


def test_structured_streaming_ingest(spark, corpus, tmp_path):
    src = str(tmp_path / "stream_src")
    # two "arrivals" as separate parquet files
    corpus.filter(F.crc32(F.col("path")) % 2 == 0).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    corpus.filter(F.crc32(F.col("path")) % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    inc = IncrementalIndexer(spark, str(tmp_path / "sidx"), radix=10)
    stream = (
        spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(inc.stream_writer())
        .start()
    )
    q.awaitTermination(300)
    view = inc.open()
    assert view.collection_stats.document_count == corpus.count()
    got = sorted(_scores_by_name(spark, view))
    build_index(corpus, str(tmp_path / "full2"), positions=False)
    want = sorted(_scores_by_name(spark, str(tmp_path / "full2")))
    assert got == want


def test_compact_packed_serves_wand(spark, tmp_path):
    """A streaming-built index compacted with packed=True serves the WAND
    tier rank-identically to the exhaustive path (GeometricIndex merge ->
    DiskIndex parity at the packed layer)."""
    from pyspark.sql import functions as F

    from galago_git_spark.index.build import open_index
    from galago_git_spark.query.executor import execute
    from galago_git_spark.query.wand import wand_topk
    from galago_git_spark.sources.corpus import synthetic_code_corpus
    from galago_git_spark.streaming.incremental import IncrementalIndexer

    root = str(tmp_path / "inc")
    idxr = IncrementalIndexer(spark, root, radix=3)
    corpus = synthetic_code_corpus(spark, n_docs=120, seed=13).persist()
    batches = [
        corpus.filter(F.crc32(F.col("path")) % 3 == i) for i in range(3)
    ]
    for b in batches:
        idxr.add_batch(b)
    shard = idxr.compact(packed=True)
    idx = open_index(spark, shard)
    brute = execute(
        "#combine(#bm25(def) #bm25(get_load0))", idx, k=10,
        default_scorer="bm25",
    ).collect()
    wand = wand_topk(spark, shard, ["def", "get_load0"], k=10).collect()
    assert [r["doc"] for r in wand] == [r["doc"] for r in brute]
    corpus.unpersist()


def test_merged_postings_layout(spark, corpus, tmp_path):
    """merge_indexes.remap must preserve the part writers' sorted layout
    — repartitionByRange(term, doc) + sortWithinPartitions(term, doc) —
    because build_packed(presorted=True) (IncrementalIndexer.compact's
    packed path) streams merged postings with ZERO shuffle under exactly
    that assumption: every parquet file is internally (term, doc)-sorted
    and files cover disjoint term ranges."""
    import glob

    half_a = corpus.filter(F.crc32(F.col("path")) % 2 == 0)
    half_b = corpus.filter(F.crc32(F.col("path")) % 2 == 1)
    build_index(half_a, str(tmp_path / "a"), positions=False)
    build_index(half_b, str(tmp_path / "b"), positions=False)
    merge_indexes(
        spark, [str(tmp_path / "a"), str(tmp_path / "b")], str(tmp_path / "m")
    )

    files = sorted(glob.glob(str(tmp_path / "m" / "postings" / "*.parquet")))
    assert files
    import pyarrow.parquet as pq

    spans = []
    for f in files:
        t = pq.read_table(f, columns=["term", "doc"])
        if t.num_rows == 0:
            continue
        keys = list(zip(t.column("term").to_pylist(), t.column("doc").to_pylist()))
        assert keys == sorted(keys), f"{f} not (term, doc)-sorted within file"
        spans.append((keys[0], keys[-1]))
    # range partitioning: files' key spans are non-overlapping in order
    spans.sort()
    for (lo_a, hi_a), (lo_b, hi_b) in zip(spans, spans[1:]):
        assert hi_a <= lo_b, "file key ranges overlap — range layout broken"
