"""Spark executor vs pure-Python golden engine over the ten-doc corpus —
the DeltaScoreDocumentModelTest pattern (optimized-vs-exhaustive equality,
``core/src/test/.../processing/DeltaScoreDocumentModelTest.java:29-105``)
generalized: every query must be rank-identical with scores to 1e-9."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from galago_git_spark.query.executor import execute, inline_index
from galago_git_spark.query.golden import GoldenIndex, rank
from galago_git_spark.sources.corpus import TEN_DOCS, ten_doc_corpus

QUERIES = [
    "#combine(cat moon)",
    "#combine(document)",
    "#combine(everything different)",
    "#combine:0=0.9:1=0.1(cat document)",
    "#combine:scorer=bm25(cat moon document)",
    "#combine(#bm25(cat) #bm25(moon))",
    "#combine(#dirichlet:mu=500(cat) #dirichlet:mu=500(moon))",
    "#combine(#jm(cat) #jm(moon))",
    '"cat jumped"',
    "#combine(#od:1(cat jumped) moon)",
    "#combine(#uw:8(cat moon))",
    "#combine(#syn(cat moon))",
    "#combine(#mincount(cat moon))",
    "#combine(#countsum(cat moon))",
    "#sdm(cat jumped)",
    "#combine(its ugly)",  # apostrophe normalization
    "#combine(absent_term cat)",  # absent term background
    "#combine(the)",  # high-df term
]


@pytest.fixture(scope="module")
def indexes(spark):
    docs = ten_doc_corpus(spark).selectExpr(
        "row_number() over (order by path) - 1 as doc_id", "content as text"
    )
    idx = inline_index(docs)
    ordered_paths = sorted(f"doc{i + 1}.txt" for i in range(10))
    texts = {
        i: TEN_DOCS[int(p[3:-4]) - 1] for i, p in enumerate(ordered_paths)
    }
    gi = GoldenIndex.from_texts(texts)
    return idx, gi


@pytest.mark.parametrize("query", QUERIES)
def test_rank_identity(indexes, query):
    idx, gi = indexes
    want = rank(query, gi, k=10)
    got = execute(query, idx, k=10).collect()
    assert [(r["doc"]) for r in got] == [d for d, _ in want], query
    for r, (_, s) in zip(got, want):
        assert r["score"] == pytest.approx(s, abs=1e-9), query
