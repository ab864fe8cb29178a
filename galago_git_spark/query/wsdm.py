"""Weighted sequential dependence (WSDM) — the Spark rebuild of
``WeightedSequentialDependenceTraversal``
(``core/.../retrieval/traversal/WeightedSequentialDependenceTraversal.java``):

#wsdm(t1..tn) -> flat ``#combine:norm=false`` whose children are the
unigrams plus, per adjacent pair, ``#od:1`` and ``#uw:8`` — each weighted
by a linear feature model:

    w = lambda_const * 1 + lambda_lntf * ln(cf) + lambda_lndf * ln(df)

(features contribute only when their statistic is nonzero — ``ln(0)``
guards at ``WeightedSequentialDependenceTraversal.java:236-276``).
Defaults: 1-const=0.8, 2-const=0.1, all log-features 0.0
(``:102-108``) — i.e. default WSDM is SDM-shaped with unnormalized
0.8/0.1/0.1 weights. Unigram stats come from the termstats part; bigram
stats aggregate the ``#od:1`` virtual postings (cheap when a window part
exists — the od:1 rewrite turns it into one pruned scan)."""

from __future__ import annotations

import math

from galago_git_spark.index.build import Index
from galago_git_spark.query.executor import node_stats
from galago_git_spark.query.nodes import Node, term_node

DEFAULT_LAMBDAS = {
    "1-const": 0.8, "1-lntf": 0.0, "1-lndf": 0.0,
    "2-const": 0.1, "2-lntf": 0.0, "2-lndf": 0.0,
}


def _uni_weight(term: str, index: Index, lam: dict[str, float]) -> float:
    w = lam["1-const"]
    if lam["1-lntf"] or lam["1-lndf"]:
        ts = index.term_stats([term]).get(term)
        if ts is not None:
            if lam["1-lntf"] and ts.cf > 0:
                w += lam["1-lntf"] * math.log(ts.cf)
            if lam["1-lndf"] and ts.df > 0:
                w += lam["1-lndf"] * math.log(ts.df)
    return w


def _bi_weight(t1: str, t2: str, index: Index, lam: dict[str, float]) -> float:
    w = lam["2-const"]
    if lam["2-lntf"] or lam["2-lndf"]:
        od = Node("ordered", {"default": 1}, [term_node(t1), term_node(t2)])
        ns = node_stats(od, index)
        if lam["2-lntf"] and ns.cf > 0:
            w += lam["2-lntf"] * math.log(ns.cf)
        if lam["2-lndf"] and ns.df > 0:
            w += lam["2-lndf"] * math.log(ns.df)
    return w


def wsdm_expand(
    terms: list[str],
    index: Index,
    lambdas: dict[str, float] | None = None,
    norm: bool = False,
) -> Node:
    lam = {**DEFAULT_LAMBDAS, **(lambdas or {})}
    params: dict = {"norm": norm}
    children: list[Node] = []
    for t in terms:
        params[str(len(children))] = _uni_weight(t, index, lam)
        children.append(term_node(t))
    for a, b in zip(terms, terms[1:]):
        w = _bi_weight(a, b, index, lam)
        params[str(len(children))] = w
        children.append(Node("ordered", {"default": 1}, [term_node(a), term_node(b)]))
        params[str(len(children))] = w
        children.append(Node("unordered", {"default": 8}, [term_node(a), term_node(b)]))
    return Node("combine", params, children)
