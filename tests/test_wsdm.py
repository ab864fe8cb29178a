"""WSDM expansion tests: default lambdas reduce to 0.8/0.1/0.1 SDM shape;
log-features add ln(cf)/ln(df) terms from real statistics."""

from __future__ import annotations

import math

import pytest

from galago_git_spark.query.executor import inline_index, node_stats
from galago_git_spark.query.nodes import Node, term_node
from galago_git_spark.query.wsdm import wsdm_expand
from galago_git_spark.sources.corpus import TEN_DOCS


@pytest.fixture(scope="module")
def ten_idx(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEN_DOCS)], "doc_id long, text string"
    )
    return inline_index(docs)


def test_default_lambdas_shape(spark, ten_idx):
    node = wsdm_expand(["cat", "moon"], ten_idx)
    assert node.operator == "combine"
    assert node.get_bool("norm") is False
    ops = [c.operator for c in node.children]
    assert ops == ["counts", "counts", "ordered", "unordered"]
    w = node.indexed_weights()
    assert w == [0.8, 0.8, 0.1, 0.1]


def test_log_features_use_real_stats(spark, ten_idx):
    node = wsdm_expand(
        ["cat", "moon"], ten_idx,
        lambdas={"1-lntf": 0.1, "1-lndf": 0.05, "2-lntf": 0.2},
    )
    w = node.indexed_weights()
    ts = ten_idx.term_stats(["cat", "moon"])
    for i, t in enumerate(["cat", "moon"]):
        want = 0.8 + 0.1 * math.log(ts[t].cf) + 0.05 * math.log(ts[t].df)
        assert w[i] == pytest.approx(want, abs=1e-12)
    od = Node("ordered", {"default": 1}, [term_node("cat"), term_node("moon")])
    ns = node_stats(od, ten_idx)
    want_bi = 0.1 + (0.2 * math.log(ns.cf) if ns.cf > 0 else 0.0)
    assert w[2] == pytest.approx(want_bi, abs=1e-12)
    assert w[3] == w[2]  # od and uw share the bigram weight
