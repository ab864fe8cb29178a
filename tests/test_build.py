"""Index build pipeline tests: deterministic doc numbering across
parallelism (the north rule's two-cluster-size invariant), part contents,
resume from manifest, and sha256 row identity."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from galago_git_spark.index.build import assign_doc_ids, build_index, open_index
from galago_git_spark.query.executor import execute
from galago_git_spark.sources.corpus import synthetic_code_corpus


@pytest.fixture(scope="module")
def corpus(spark):
    return synthetic_code_corpus(spark, n_docs=300, seed=42)


def test_corpus_deterministic_across_partitioning(spark):
    a = synthetic_code_corpus(spark, n_docs=100, seed=42, partitions=1)
    b = synthetic_code_corpus(spark, n_docs=100, seed=42, partitions=7)
    pa = a.orderBy("repo", "path").toPandas()
    pb = b.orderBy("repo", "path").toPandas()
    assert pa.equals(pb)


def test_doc_ids_dense_and_partition_invariant(spark, corpus):
    ids1 = assign_doc_ids(corpus, num_partitions=2).select("doc", "repo", "path")
    ids2 = assign_doc_ids(corpus, num_partitions=13).select("doc", "repo", "path")
    p1 = ids1.orderBy("doc").toPandas()
    p2 = ids2.orderBy("doc").toPandas()
    assert p1["doc"].tolist() == list(range(len(p1)))
    assert p1.equals(p2)
    # ids follow (repo, path, commit) sort order
    resorted = p1.sort_values(["repo", "path"]).reset_index(drop=True)
    assert resorted["doc"].tolist() == p1["doc"].tolist()


def test_build_parts_and_stats(spark, corpus, tmp_path):
    index_dir = str(tmp_path / "idx")
    manifest = build_index(corpus, index_dir)
    assert set(manifest["parts"]) == {"names", "lengths", "postings", "termstats", "stats"}
    idx = open_index(spark, index_dir)
    n_docs = corpus.count()
    assert idx.collection_stats.document_count == n_docs
    assert idx.names.count() == n_docs
    assert idx.lengths.count() == n_docs
    # postings totals must reconcile with lengths (every token accounted)
    cf_total = idx.postings.agg(F.sum("tf")).collect()[0][0]
    assert cf_total == idx.collection_stats.collection_length
    # termstats reconciles with postings
    ts = idx.termstats.agg(F.sum("cf"), F.sum("df")).collect()[0]
    assert ts[0] == cf_total
    assert ts[1] == idx.postings.count()
    # sha256 row identity vs source corpus (north-rule invariant)
    src = corpus.select("repo", "path", F.sha2("content", 256).alias("h"))
    joined = idx.names.join(src, ["repo", "path"])
    assert joined.filter(F.col("sha256") != F.col("h")).count() == 0


def test_query_over_disk_index(spark, corpus, tmp_path):
    index_dir = str(tmp_path / "idx2")
    build_index(corpus, index_dir)
    idx = open_index(spark, index_dir)
    res = execute("#combine:scorer=bm25(def return)", idx, k=10).collect()
    assert 0 < len(res) <= 10
    scores = [r["score"] for r in res]
    assert scores == sorted(scores, reverse=True)


def test_tokenizer_paths_identical(spark, tmp_path):
    docs = synthetic_code_corpus(spark, n_docs=50, seed=7)
    d1 = str(tmp_path / "native")
    d2 = str(tmp_path / "pandas")
    build_index(docs, d1, tokenizer="native")
    build_index(docs, d2, tokenizer="pandas")
    p1 = spark.read.parquet(d1 + "/postings").orderBy("term", "doc").toPandas()
    p2 = spark.read.parquet(d2 + "/postings").orderBy("term", "doc").toPandas()
    assert p1.equals(p2)


def test_resume_skips_completed_parts(spark, corpus, tmp_path):
    index_dir = str(tmp_path / "idx3")
    build_index(corpus, index_dir)
    manifest_path = os.path.join(index_dir, "manifest.json")
    with open(manifest_path) as f:
        m1 = json.load(f)
    # simulate a partial build: drop one part's manifest entry + files
    import shutil

    shutil.rmtree(os.path.join(index_dir, "termstats"))
    del m1["parts"]["termstats"]
    del m1["parts"]["stats"]
    with open(manifest_path, "w") as f:
        json.dump(m1, f)
    t_names_before = os.path.getmtime(os.path.join(index_dir, "names", "_SUCCESS"))
    build_index(corpus, index_dir, resume=True)
    # completed parts untouched, missing parts rebuilt
    assert os.path.getmtime(os.path.join(index_dir, "names", "_SUCCESS")) == t_names_before
    assert os.path.exists(os.path.join(index_dir, "termstats", "_SUCCESS"))
    idx = open_index(spark, index_dir)
    assert idx.termstats.count() > 0


def test_lineage_and_prior_part(spark, corpus, tmp_path):
    import json as _json

    from pyspark.sql import functions as F

    from galago_git_spark.index.build import build_prior_part
    from galago_git_spark.query.executor import score_frame

    index_dir = str(tmp_path / "idx3")
    build_index(corpus, index_dir, positions=False)
    with open(index_dir + "/manifest.json") as f:
        manifest = _json.load(f)
    # per-partition lineage: every part lists its files with byte+row counts
    for part in ("names", "lengths", "postings", "termstats"):
        lineage = manifest["parts"][part]["lineage"]
        assert lineage and all(e["rows"] >= 0 and e["bytes"] > 0 for e in lineage)
    n_docs = corpus.count()
    assert sum(e["rows"] for e in manifest["parts"]["names"]["lineage"]) == n_docs

    # priors part: static score mixed into ranking
    idx = open_index(spark, index_dir)
    priors = idx.lengths.select(
        "doc", (F.col("length") / 1000.0).alias("prior")
    )
    build_prior_part(priors, index_dir)
    idx2 = open_index(spark, index_dir)
    assert idx2.priors is not None
    scored = score_frame(
        "#combine:0=0.5:1=0.5(#bm25(def) #prior())", idx2, default_scorer="bm25"
    )
    base = score_frame("#combine(#bm25(def))", idx2, default_scorer="bm25")
    sd = {r["doc"]: r["score"] for r in scored.collect()}
    bd = {r["doc"]: r["score"] for r in base.collect()}
    lens = {r["doc"]: r["length"] for r in idx2.lengths.collect()}
    assert sd.keys() == bd.keys()
    for d in sd:
        assert sd[d] == pytest.approx(0.5 * bd[d] + 0.5 * lens[d] / 1000.0, abs=1e-9)


def test_resume_fused_packed(spark, corpus, tmp_path):
    """Fused build (packed=True) resume: the blocks part is skipped when
    manifest-committed, rebuilt when missing (CheckpointedStageExecutor
    pattern over the concurrent wave scheduler)."""
    import shutil

    index_dir = str(tmp_path / "idx_fused")
    m = build_index(corpus, index_dir, packed=True)
    assert "blocks" in m["parts"]
    t_blocks = os.path.getmtime(os.path.join(index_dir, "blocks", "_SUCCESS"))
    t_post = os.path.getmtime(os.path.join(index_dir, "postings", "_SUCCESS"))
    build_index(corpus, index_dir, packed=True, resume=True)
    assert os.path.getmtime(os.path.join(index_dir, "blocks", "_SUCCESS")) == t_blocks
    assert os.path.getmtime(os.path.join(index_dir, "postings", "_SUCCESS")) == t_post
    # drop blocks: resume rebuilds ONLY blocks
    shutil.rmtree(os.path.join(index_dir, "blocks"))
    build_index(corpus, index_dir, packed=True, resume=True)
    assert os.path.exists(os.path.join(index_dir, "blocks", "_SUCCESS"))
    assert os.path.getmtime(os.path.join(index_dir, "postings", "_SUCCESS")) == t_post
    from galago_git_spark.query.wand import wand_topk

    assert wand_topk(spark, index_dir, ["def"], k=5).count() == 5
