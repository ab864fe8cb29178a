"""PageRank operator + single-plan batch retrieval tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from galago_git_spark.operators.pagerank import pagerank


def test_pagerank_two_node_chain(spark):
    # A -> B, lambda=0.5, 1 iteration, start 0.5/0.5:
    # dangling B contributes 0.5*0.5; jump = (0.5*1 + 0.25)/2 = 0.375
    # A: jump = 0.375 ; B: jump + walk from A = 0.375 + 0.25 = 0.625
    nodes = spark.createDataFrame([(0,), (1,)], "doc long")
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    out = {
        r["doc"]: r["score"]
        for r in pagerank(nodes, edges, lambda_=0.5, delta=0.0, max_iter=1).collect()
    }
    assert out[0] == pytest.approx(0.375)
    assert out[1] == pytest.approx(0.625)


def test_pagerank_mass_conserved_and_converges(spark):
    # ring + one dangling spur: total mass stays 1 every iteration
    n = 10
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc long")
    edges = spark.createDataFrame(
        [(i, (i + 1) % (n - 1)) for i in range(n - 1)] + [(0, n - 1)],
        "src long, dst long",
    )
    pr = pagerank(nodes, edges, lambda_=0.5, delta=1e-9, max_iter=30)
    rows = pr.collect()
    assert sum(r["score"] for r in rows) == pytest.approx(1.0, abs=1e-9)
    assert all(r["score"] > 0 for r in rows)


def test_batch_plan_equals_per_query(spark):
    from galago_git_spark.query.batch import batch_bm25_topk, queries_to_terms
    from galago_git_spark.query.executor import execute, inline_index
    from galago_git_spark.sources.corpus import synthetic_code_corpus

    corpus = synthetic_code_corpus(spark, n_docs=150, seed=42)
    docs = corpus.select(
        F.crc32(F.col("path")).cast("long").alias("doc_id"),
        F.col("content").alias("text"),
    )
    idx = inline_index(docs)
    queries = [
        {"number": "q1", "text": "#combine(def return)"},
        {"number": "q2", "text": "#combine:0=0.7:1=0.3(get_load0 run_sort_ctx0)"},
        {"number": "q3", "text": "#combine(index_sort_list0)"},
    ]
    qt = queries_to_terms(spark, queries)
    batch = batch_bm25_topk(idx, qt, k=7).collect()
    by_qid: dict[str, list] = {}
    for r in sorted(batch, key=lambda r: (r["qid"], r["rank"])):
        by_qid.setdefault(r["qid"], []).append((r["doc"], r["score"]))
    for q in queries:
        solo = execute(q["text"], idx, k=7, default_scorer="bm25").collect()
        want = [(r["doc"], r["score"]) for r in solo]
        got = by_qid.get(q["number"], [])
        assert [d for d, _ in got] == [d for d, _ in want], q["number"]
        for (d1, s1), (d2, s2) in zip(got, want):
            assert s1 == pytest.approx(s2, abs=1e-9)


# property test: the single-plan batch tier must match the per-query
# executor for arbitrary flat BM25 query logs (weights, duplicates,
# absent terms) — the batch analog of the kernel property tests
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_VOCAB = [
    "def", "return", "class", "import", "index", "sort", "merge", "scan",
    "table", "row", "data", "value", "zzz_absent_term", "qqq_missing",
]


@pytest.fixture(scope="module")
def batch_idx(spark):
    from galago_git_spark.query.executor import inline_index
    from galago_git_spark.sources.corpus import synthetic_code_corpus

    corpus = synthetic_code_corpus(spark, n_docs=120, seed=7)
    docs = corpus.select(
        F.crc32(F.col("path")).cast("long").alias("doc_id"),
        F.col("content").alias("text"),
    )
    return inline_index(docs)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    log=st.lists(
        st.lists(
            st.tuples(
                st.sampled_from(_VOCAB),
                st.floats(min_value=0.1, max_value=5.0, allow_nan=False),
            ),
            min_size=1,
            max_size=4,
        ),
        min_size=1,
        max_size=3,
    )
)
def test_batch_matches_executor_on_random_logs(spark, batch_idx, log):
    from galago_git_spark.query.batch import batch_bm25_topk, queries_to_terms
    from galago_git_spark.query.executor import execute

    queries = []
    for i, terms in enumerate(log):
        spec = ":".join(f"{j}={round(w, 3)}" for j, (_, w) in enumerate(terms))
        text = f"#combine:{spec}({' '.join(t for t, _ in terms)})"
        queries.append({"number": f"q{i}", "text": text})
    qt = queries_to_terms(spark, queries)
    batch = batch_bm25_topk(batch_idx, qt, k=5).collect()
    by_qid: dict[str, list] = {}
    for r in sorted(batch, key=lambda r: (r["qid"], r["rank"])):
        by_qid.setdefault(r["qid"], []).append((r["doc"], r["score"]))
    for q in queries:
        solo = execute(q["text"], batch_idx, k=5, default_scorer="bm25").collect()
        want = [(r["doc"], r["score"]) for r in solo]
        got = by_qid.get(q["number"], [])
        assert [d for d, _ in got] == [d for d, _ in want], q["text"]
        for (_, s1), (_, s2) in zip(got, want):
            assert s1 == pytest.approx(s2, abs=1e-9)


def test_batch_preserves_nonstring_qid_types(spark, batch_idx):
    # the collected-rows rebuild must keep the INPUT frame's qid/w types
    # (integer TREC topic numbers are legal)
    from galago_git_spark.query.batch import batch_bm25_topk

    qt = spark.createDataFrame(
        [(1, "def", 1.0), (2, "return", 1.0)],
        "qid int, term string, w double",
    )
    rows = batch_bm25_topk(batch_idx, qt, k=3).collect()
    assert rows and isinstance(rows[0]["qid"], int)
    assert {r["qid"] for r in rows} == {1, 2}
