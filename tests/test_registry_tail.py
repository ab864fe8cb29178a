"""Registry-tail operators: #bool, #bool-to-count, #bigram/#ubigram,
#bm25rf, multi-field restriction (#extentor) and smoothing syntax.

Reference: bool/BooleanScoreIterator.java:47-59,
bool/BinaryCountIterator.java:52-57, FeatureFactory.java:46,50,
scoring/BM25RFScoringIterator.java:29-63, StructuredQuery.java:149-198.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from galago_git_spark.functions.fields import field_extents_py
from galago_git_spark.functions.tokenize import tokenize_py
from galago_git_spark.query.executor import (
    compile_count,
    inline_index,
    score_frame,
)
from galago_git_spark.query.parser import parse
from galago_git_spark.query.traversals import transform
from galago_git_spark.sources.corpus import synthetic_code_corpus, ten_doc_corpus


@pytest.fixture(scope="module")
def ten_idx(spark):
    docs = ten_doc_corpus(spark).selectExpr(
        "row_number() over (order by path) - 1 as doc_id", "content as text"
    ).persist()
    idx = inline_index(docs)
    yield docs, idx
    docs.unpersist()


def _doc_tokens(docs):
    return {r["doc_id"]: tokenize_py(r["text"]) for r in docs.collect()}


def test_bool_scores_are_set_membership(ten_idx):
    docs, idx = ten_idx
    toks = _doc_tokens(docs)
    want = {d for d, ts in toks.items() if "document" in ts and "sample" in ts}
    got = score_frame("#bool(#band(document sample))", idx).collect()
    assert {r["doc"] for r in got} == want
    assert all(r["score"] == 1.0 for r in got)


def test_bool_to_count_is_binary(ten_idx):
    docs, idx = ten_idx
    toks = _doc_tokens(docs)
    want = {d for d, ts in toks.items() if "document" in ts or "sample" in ts}
    node = transform(parse("#bool-to-count(#bor(document sample))"))
    rows = compile_count(node, idx).collect()
    assert {r["doc"] for r in rows} == want
    assert all(r["tf"] == 1 for r in rows)


def test_bigram_aliases_match_window_ops(ten_idx):
    _, idx = ten_idx
    a = sorted(
        compile_count(transform(parse("#bigram(sample document)")), idx)
        .select("doc", "tf").collect()
    )
    b = sorted(
        compile_count(transform(parse("#od:1(sample document)")), idx)
        .select("doc", "tf").collect()
    )
    assert a == b and a
    c = sorted(
        compile_count(transform(parse("#ubigram(document sample)")), idx)
        .select("doc", "tf").collect()
    )
    d = sorted(
        compile_count(transform(parse("#intersect(document sample)")), idx)
        .select("doc", "tf").collect()
    )
    assert c == d and c


def test_bm25rf_constant_value(ten_idx):
    docs, idx = ten_idx
    toks = _doc_tokens(docs)
    matching = {d for d, ts in toks.items() if "document" in ts}
    ft = len(matching)
    N = idx.collection_stats.document_count
    rt, R, factor = 2, 5, 0.33
    value = factor * math.log(
        ((rt + 0.5) / (R - rt + 0.5))
        / ((ft - rt + 0.5) / (N - ft - R + rt + 0.5))
    )
    got = score_frame(
        f"#combine:norm=false(#bm25rf:rt={rt}:R={R}(document))", idx
    ).collect()
    by_doc = {r["doc"]: r["score"] for r in got}
    for d in matching:
        assert by_doc[d] == pytest.approx(value)
    for d, s in by_doc.items():
        if d not in matching:
            assert s == 0.0


def test_multi_field_restriction_extentor(spark):
    corpus = synthetic_code_corpus(spark, n_docs=60, seed=7)
    docs = corpus.select(
        F.monotonically_increasing_id().alias("doc_id"),
        F.col("content").alias("text"),
    ).persist()
    idx = inline_index(docs, fields=True)
    term = "the"
    node = transform(parse(f"{term}.comment,def"))
    assert node.operator == "inside"
    got = {
        (r["doc"], r["tf"])
        for r in compile_count(node, idx).select("doc", "tf").collect()
    }
    want = {}
    for row in docs.collect():
        ts = tokenize_py(row["text"])
        exts = [
            (b, e)
            for f, b, e in field_extents_py(row["text"])
            if f in ("comment", "def")
        ]
        hits = {
            p
            for p, t in enumerate(ts, start=1)
            if t == term and any(b <= p < e for b, e in exts)
        }
        if hits:
            want[row["doc_id"]] = len(hits)
    assert got == set(want.items())
    # smoothing syntax parses and runs through the same containment path
    smooth = transform(parse(f"{term}.(comment,def)"))
    got2 = {
        (r["doc"], r["tf"])
        for r in compile_count(smooth, idx).select("doc", "tf").collect()
    }
    assert got2 == got
    docs.unpersist()


def test_escaped_term_syntax():
    """@/.../ SPECIALQUOTE escapes (StructuredLexer.java:152-165):
    the body is a single term; works as #between values
    (BetweenIteratorTest.java:54 pattern)."""
    from galago_git_spark.query.parser import parse
    from galago_git_spark.query.traversals import transform

    n = parse("#combine(@/document faaa/ cat)")
    assert str(n.children[0]) == "#counts:document faaa()"
    b = transform(parse("#between(#field:title() @/document faaa/ @/document fzzz/)"))
    assert b.parameters["0"] == "document faaa"
    assert b.parameters["1"] == "document fzzz"


def test_pl2scorer_alias(ten_idx):
    # FeatureFactory registers PL2ScoringIterator under both "pl2" and
    # "pl2scorer"; the alias must produce identical rankings
    from galago_git_spark.query.executor import execute

    _, idx = ten_idx
    a = [(r["doc"], r["score"]) for r in execute("#combine(#pl2(cat))", idx, k=5).collect()]
    b = [(r["doc"], r["score"]) for r in execute("#combine(#pl2scorer(cat))", idx, k=5).collect()]
    assert a == b and a
