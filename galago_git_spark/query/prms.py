"""PRM-S — Probabilistic Retrieval Model for Semi-structured data.

The Spark rebuild of ``PRMS2Traversal``
(``core/.../retrieval/traversal/PRMS2Traversal.java:85-185``):

    #prms(t1..tn) over fields F ->
      #combine:norm=false(
        for each term t:
          #wsum:w_1..w_|F|( for each field f:
            #<scorer>:lengths=f( #inside(t #field:f()) ) ) )

with mixture weights w_f = P(t | F_f) = cf(t in f) / CL_f, normalized
over the fields (``PRMS2Traversal.java:150-176``) — unless explicit
per-field weights are given, which are used verbatim (missing fields
weight 1.0). Field-scoped scoring (the ``lengths=f`` parameter) is
handled by the executor (``_scorer_env``): tf comes from the
``#inside`` containment count, the length and collection statistics
from the field's extents.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from galago_git_spark.index.build import Index
from galago_git_spark.query.executor import field_collection_stats, compile_count
from galago_git_spark.query.nodes import Node, term_node


def _inside_node(term: str, field: str) -> Node:
    return Node(
        "inside",
        {},
        [term_node(term), Node("field", {"default": field})],
    )


def prms_expand(
    terms: list[str],
    fields: list[str],
    index: Index,
    weights: dict[str, float] | None = None,
    scorer: str = "dirichlet",
) -> Node:
    """Build the expanded PRMS tree (stats-annotated weights)."""
    field_cl = {f: field_collection_stats(index, f).collection_length for f in fields}
    term_nodes: list[Node] = []
    for t in terms:
        params: dict = {}
        children: list[Node] = []
        normalizer = 0.0
        probs: list[float] = []
        for f in fields:
            counts = _inside_node(t, f)
            if weights is not None:
                probs.append(weights.get(f, 1.0))
            else:
                cf = (
                    compile_count(counts, index)
                    .agg(F.coalesce(F.sum("tf"), F.lit(0)))
                    .collect()[0][0]
                )
                p = (cf / field_cl[f]) if field_cl[f] > 0 else 0.0
                probs.append(p)
                normalizer += p
            children.append(Node(scorer, {"lengths": f}, [counts]))
        if weights is None and normalizer > 0:
            probs = [p / normalizer for p in probs]
        for i, p in enumerate(probs):
            params[str(i)] = p
        term_nodes.append(Node("wsum", params, children))
    return Node("combine", {"norm": False}, term_nodes)
