"""Pseudo-relevance feedback — RM1 / RM3 query expansion, the Spark
rebuild of the reference's expansion models
(``core/.../retrieval/prf/RelevanceModel1.java:71-225``,
``RelevanceModel3.java:30-49``, wired by
``traversal/RelevanceModelTraversal.java``).

Reference semantics preserved exactly:

- first pass: run the (transformed) query, keep top ``fbDocs`` (default
  20, ``RelevanceModel1.java:43``);
- posteriors: softmax over the fb docs' log scores
  (``logstoposteriors``, Indri's RelevanceModel.cpp normalization);
- term weights: ``w(t) = sum_d posterior(d) * tf(t,d) / |d|``
  (``scoreGrams``), excluding the query's own terms and any stopword
  list (``countGrams`` filtering; stemmer = identity per the north
  rule);
- expansion: ``#combine`` of the top ``fbTerm`` (default 100) terms with
  their raw weights (``generateExpansionQuery`` — ``#combine``'s own
  normalization handles scaling);
- RM3: ``#combine:0=fbOrigWeight:1=1-fbOrigWeight(original, expansion)``,
  ``fbOrigWeight`` default 0.25 (``RelevanceModel3.java:27``).

Spark shape: the first pass is a normal ranked query; the term-weight
pass is one plan — postings pruned to the fb docs (tiny ``isin`` /
broadcast semi-join), joined to lengths, weighted by a broadcast
doc->posterior map, aggregated per term. No corpus re-read: the postings
part already carries (term, doc, tf), which is exactly ``countGrams``'s
data (the reference re-tokenizes the stored corpus document instead
because its postings are term-keyed B-trees — column store wins here).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from galago_git_spark.index.build import Index
from galago_git_spark.query.executor import execute
from galago_git_spark.query.nodes import Node, is_term_leaf
from galago_git_spark.query.parser import parse
from galago_git_spark.query.traversals import transform

DEFAULT_FB_DOCS = 20  # RelevanceModel1.java:43
DEFAULT_FB_TERMS = 100  # RelevanceModel1.java:44
DEFAULT_FB_ORIG_WEIGHT = 0.25  # RelevanceModel3.java:27


def _query_terms(node: Node) -> set[str]:
    """StructuredQuery.findQueryTerms analog (identity stemmer)."""
    out: set[str] = set()
    if is_term_leaf(node):
        out.add(str(node.default_param))
    for c in node.children:
        out |= _query_terms(c)
    return out


def rm1_weighted_terms(
    query: str | Node,
    index: Index,
    fb_docs: int = DEFAULT_FB_DOCS,
    fb_terms: int = DEFAULT_FB_TERMS,
    default_scorer: str = "dirichlet",
    stopwords: set[str] | None = None,
) -> list[tuple[str, float]]:
    """Top fb_terms (term, weight) pairs, weight-desc (ties: term asc for
    cross-run determinism)."""
    node = parse(query) if isinstance(query, str) else query
    initial = execute(node, index, k=fb_docs, default_scorer=default_scorer).collect()
    if not initial:
        return []
    # logstoposteriors (RelevanceModel1.java:148-170)
    scores = [r["score"] for r in initial]
    m = max(scores)
    lse = m + math.log(sum(math.exp(s - m) for s in scores))
    posteriors = [(r["doc"], math.exp(r["score"] - lse)) for r in initial]

    spark = index.spark
    post_df = F.broadcast(
        spark.createDataFrame(posteriors, "doc long, posterior double")
    )
    exclude = _query_terms(transform(node, default_scorer)) | (stopwords or set())
    # explicit isin on the fb docs: a broadcast join alone doesn't push the
    # doc set into the parquet scans, an In filter does (row-group pruning
    # on both parts instead of full scans joined against 20 rows)
    fb_doc_ids = [int(d) for d, _ in posteriors]
    weighted = (
        index.postings.filter(F.col("doc").isin(fb_doc_ids))
        .join(post_df, "doc")
        .join(index.lengths.filter(F.col("doc").isin(fb_doc_ids)), "doc")
        .filter(~F.col("term").isin(list(exclude)) if exclude else F.lit(True))
        .groupBy("term")
        .agg(
            F.sum(F.col("posterior") * F.col("tf") / F.col("length")).alias("w")
        )
        .orderBy(F.col("w").desc(), F.col("term").asc())
        .limit(fb_terms)
    )
    return [(r["term"], r["w"]) for r in weighted.collect()]


def rm1_expand(
    query: str | Node, index: Index, **kw
) -> Node:
    """generateExpansionQuery (RelevanceModel1.java:137-146)."""
    node = parse(query) if isinstance(query, str) else query
    wt = rm1_weighted_terms(node, index, **kw)
    if not wt:
        return node
    params: dict = {str(i): w for i, (_, w) in enumerate(wt)}
    children = [Node("text", {"default": t}) for t, _ in wt]
    return Node("combine", params, children)


def rm3_expand(
    query: str | Node,
    index: Index,
    fb_orig_weight: float = DEFAULT_FB_ORIG_WEIGHT,
    **kw,
) -> Node:
    """RelevanceModel3.expand: original and expansion combined 0.25/0.75."""
    node = parse(query) if isinstance(query, str) else query
    exp = rm1_expand(node, index, **kw)
    if exp is node or fb_orig_weight >= 1.0:
        return node
    return Node(
        "combine",
        {"0": fb_orig_weight, "1": 1.0 - fb_orig_weight},
        [node, exp],
    )


def execute_rm3(
    query: str | Node,
    index: Index,
    k: int = 10,
    default_scorer: str = "dirichlet",
    fb_orig_weight: float = DEFAULT_FB_ORIG_WEIGHT,
    **kw,
) -> DataFrame:
    """Two-pass RM3 retrieval: expand then run the expanded query."""
    expanded = rm3_expand(
        query, index, fb_orig_weight=fb_orig_weight,
        default_scorer=default_scorer, **kw,
    )
    return execute(expanded, index, k=k, default_scorer=default_scorer)
