"""Micro posting fixture — exact-score golden test against the reference's
own constants (LocalRetrievalTest.java:237-243, FIXTURES.md §2).

Query #combine(a b) under the default Dirichlet scorer must produce
doc 1 = -5.548387728381024, doc 3 = -5.819614290181323,
docs 2/5/18 = -5.937808679213438 (ties -> ascending docid)."""

from __future__ import annotations

import pytest

from galago_git_spark.index.build import Index
from galago_git_spark.query.executor import execute, _combine_general, _is_scorer
from galago_git_spark.query.golden import GoldenIndex, rank
from galago_git_spark.query.nodes import Node, term_node
from galago_git_spark.query.parser import parse
from galago_git_spark.query.scoring import CollectionStats
from galago_git_spark.query.traversals import transform
from galago_git_spark.sources.corpus import micro_index_tables

GOLDEN = [
    (1, -5.548387728381024),
    (3, -5.819614290181323),
    (2, -5.937808679213438),
    (5, -5.937808679213438),
    (18, -5.937808679213438),
]


@pytest.fixture(scope="module")
def micro_index(spark) -> Index:
    t = micro_index_tables()
    return Index(
        spark=spark,
        index_dir="<micro>",
        postings=spark.createDataFrame(t["postings"]),
        lengths=spark.createDataFrame(t["lengths"]),
        names=spark.createDataFrame(t["names"]),
        termstats=spark.createDataFrame(t["termstats"]),
        # field stats derive from the lengths part: CL=2000, N=20
        collection_stats=CollectionStats(2000, 20),
    )


def test_spark_flat_path_matches_reference_goldens(micro_index):
    got = execute("#combine(a b)", micro_index, k=5).collect()
    assert [(r["doc"], r["rank"]) for r in got] == [
        (d, i + 1) for i, (d, _) in enumerate(GOLDEN)
    ]
    for r, (_, want) in zip(got, GOLDEN):
        assert r["score"] == pytest.approx(want, abs=1e-10)


def test_spark_general_path_matches_reference_goldens(micro_index):
    node = transform(parse("#combine(a b)"))
    scorers = [c for c in node.children]
    assert all(_is_scorer(c) for c in scorers)
    got = (
        _combine_general(scorers, [0.5, 0.5], micro_index)
        .orderBy("score", ascending=False)
        .collect()
    )
    got.sort(key=lambda r: (-r["score"], r["doc"]))
    for r, (d, want) in zip(got[:5], GOLDEN):
        assert r["doc"] == d
        assert r["score"] == pytest.approx(want, abs=1e-10)


def test_golden_engine_matches_reference_goldens():
    gi = GoldenIndex(
        postings={
            "a": {1: [1, 2, 3], 3: [1], 5: [1]},
            "b": {1: [2, 4], 2: [1], 3: [4], 18: [9]},
        },
        lengths={d: 100 for d in range(20)},
    )
    assert gi.stats == CollectionStats(2000, 20)
    got = rank("#combine(a b)", gi, k=5)
    for (d, s), (wd, ws) in zip(got, GOLDEN):
        assert d == wd
        assert s == pytest.approx(ws, abs=1e-12)
