"""RM1/RM3 expansion tests against a pure-Python transliteration of
RelevanceModel1.java (posteriors -> tf/|d| weights -> top terms)."""

from __future__ import annotations

import math

import pytest

from galago_git_spark.functions.tokenize import tokenize_py
from galago_git_spark.query.executor import execute, inline_index
from galago_git_spark.query.prf import rm1_weighted_terms, rm3_expand
from galago_git_spark.sources.corpus import TEN_DOCS


def _python_rm1(texts: dict[int, str], initial: list[tuple[int, float]],
                query_terms: set[str], fb_terms: int):
    scores = [s for _, s in initial]
    m = max(scores)
    lse = m + math.log(sum(math.exp(s - m) for s in scores))
    post = {d: math.exp(s - lse) for d, s in initial}
    weights: dict[str, float] = {}
    for d, p in post.items():
        toks = tokenize_py(texts[d])
        for t in toks:
            if t in query_terms:
                continue
            weights[t] = weights.get(t, 0.0) + p * (1.0 / len(toks))
    # p * tf/|d| accumulated one occurrence at a time == p * tf/|d|
    ranked = sorted(weights.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:fb_terms]


@pytest.fixture(scope="module")
def ten_idx(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEN_DOCS)], "doc_id long, text string"
    )
    return inline_index(docs)


def test_rm1_weights_match_reference_loop(spark, ten_idx):
    texts = dict(enumerate(TEN_DOCS))
    query = "#combine(cat moon)"
    fb_docs, fb_terms = 3, 8
    initial = [
        (r["doc"], r["score"])
        for r in execute(query, ten_idx, k=fb_docs).collect()
    ]
    got = rm1_weighted_terms(query, ten_idx, fb_docs=fb_docs, fb_terms=fb_terms)
    want = _python_rm1(texts, initial, {"cat", "moon"}, fb_terms)
    assert [t for t, _ in got] == [t for t, _ in want]
    for (t1, w1), (t2, w2) in zip(got, want):
        assert w1 == pytest.approx(w2, abs=1e-12)


def test_rm3_expansion_shape_and_retrieval(spark, ten_idx):
    node = rm3_expand("#combine(cat moon)", ten_idx, fb_docs=3, fb_terms=5)
    assert node.operator == "combine"
    assert node.parameters["0"] == 0.25
    assert node.parameters["1"] == 0.75
    orig, exp = node.children
    assert orig.operator == "combine"
    assert exp.operator == "combine" and 0 < len(exp.children) <= 5
    # expanded query runs end-to-end and still ranks the cat/moon doc first
    top = execute(node, ten_idx, k=3).collect()
    assert top[0]["doc"] == 1  # "The cat jumped over the moon"


def test_rm1_excludes_query_terms_and_stopwords(spark, ten_idx):
    got = rm1_weighted_terms(
        "#combine(cat moon)", ten_idx, fb_docs=3, fb_terms=20,
        stopwords={"the"},
    )
    terms = {t for t, _ in got}
    assert "cat" not in terms and "moon" not in terms and "the" not in terms


def test_rm_query_string_syntax(spark, ten_idx):
    """#rm as a query operator (RelevanceModelTraversal entry point)."""
    from galago_git_spark.query.executor import execute

    rows = execute("#rm:fbDocs=3:fbTerm=5(cat moon)", ten_idx, k=3).collect()
    assert len(rows) == 3
    base = execute("#combine(cat moon)", ten_idx, k=3).collect()
    # expansion changes the ranking scores (docs sharing fb vocabulary rise)
    assert [r["score"] for r in rows] != [r["score"] for r in base]
