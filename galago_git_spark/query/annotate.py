"""Per-document query-execution traces — the ``annotate=true`` plane.

The reference attaches an :class:`AnnotatedNode` tree to every scored
document when ``annotate`` is set (``retrieval/query/AnnotatedNode.java``,
consumed by ``tools/apps/DebugQuery.java``): each node of the transformed
query records its type, parameters, and the value it returned at that
document.  Here the same trace is computed set-at-a-time: one small Spark
job per query-tree node evaluates that node for ALL traced documents at
once (scans are ``In``-pruned to the doc set via the working-set view, so
a 10-doc trace reads 10 docs' postings), then the per-document trees are
assembled on the driver.  Statistics stay global through the view's
``stats_base`` redirect, so every traced score equals the production
score for that document.

This is a debugging surface: cost is O(#tree nodes) small jobs, not a
per-query production path.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import functions as F

from galago_git_spark.query.nodes import Node

# operators whose value at a document is a boolean match
_INDICATOR_OPS = frozenset(
    ("all", "any", "not", "indicator", "greater", "less", "between",
     "equals", "threshold")
)


def _node_kind(node: Node) -> str:
    from galago_git_spark.query.executor import _SCORE_SUBTREES, _is_scorer

    if node.operator in ("require", "reject"):
        return "filtered-score"
    if _is_scorer(node) or node.operator in _SCORE_SUBTREES \
            or node.operator == "prior":
        return "score"
    if node.operator in _INDICATOR_OPS:
        return "indicator"
    return "count"


def _node_values(node: Node, index, docs: list[int],
                 default_scorer: str) -> tuple[str, dict[int, Any]]:
    """Evaluate one tree node for every traced doc: (kind, doc -> value).
    ``index`` is the working-set view over ``docs``; failures degrade to
    an error string so a partial trace still renders."""
    from galago_git_spark.query.executor import (
        compile_count,
        compile_indicator,
        score_frame,
    )

    kind = _node_kind(node)
    try:
        if kind in ("score", "filtered-score"):
            rows = score_frame(node, index, default_scorer).collect()
            return kind, {int(r["doc"]): float(r["score"]) for r in rows}
        if kind == "indicator":
            on = {
                int(r["doc"])
                for r in compile_indicator(node, index).select("doc").collect()
            }
            return kind, {d: (d in on) for d in docs}
        rows = (
            compile_count(node, index)
            .filter(F.col("doc").isin(docs))
            .select("doc", "tf")
            .collect()
        )
        vals: dict[int, Any] = {d: 0 for d in docs}
        vals.update({int(r["doc"]): int(r["tf"]) for r in rows})
        return kind, vals
    except Exception as e:  # degrade: trace the rest of the tree
        return kind, {d: f"<error: {e}>" for d in docs}


def _walk(node: Node, index, docs: list[int], default_scorer: str,
          out: list) -> int:
    """Post-order value computation; returns this node's slot in ``out``
    (entries: (node, kind, values, child slots))."""
    child_ids = [
        _walk(c, index, docs, default_scorer, out) for c in node.children
    ]
    kind, values = _node_values(node, index, docs, default_scorer)
    out.append((node, kind, values, child_ids))
    return len(out) - 1


def _tree_for_doc(slot: int, entries: list, doc: int) -> dict:
    node, kind, values, child_ids = entries[slot]
    v = values.get(doc)
    if isinstance(v, float):
        rv: Any = round(v, 6)
    else:
        rv = v
    return {
        "type": node.operator,
        "kind": kind,
        "parameters": {k: node.parameters[k] for k in sorted(node.parameters)},
        "document": doc,
        "returnValue": rv,
        "children": [_tree_for_doc(c, entries, doc) for c in child_ids],
    }


def annotate(
    query: str | Node,
    index,
    k: int = 10,
    docs: list | None = None,
    default_scorer: str = "dirichlet",
    part: str | None = None,
    op_repls: dict | None = None,
) -> dict:
    """Trace a query: per-document AnnotatedNode trees over the top-k
    results (or an explicit ``docs`` whitelist of ids or names — the
    DebugQuery ``docid`` parameter).  Returns::

        {"query": ..., "transformed": str(tree),
         "results": [{"doc", "name", "rank", "score", "annotation"}]}

    where ``annotation`` is the per-doc tree (type / parameters /
    returnValue / children), reference shape ``AnnotatedNode.toJSON``.
    """
    from galago_git_spark.operators.docs import name_expr
    from galago_git_spark.query.executor import (
        execute,
        prepare_query,
        working_set_view,
    )

    node, routed = prepare_query(
        query, index, default_scorer, op_repls=op_repls, part=part
    )
    if docs is not None:
        ws = working_set_view(routed, list(docs))
        ranked = execute(node, ws, k=max(k, len(docs)),
                         default_scorer=default_scorer)
    else:
        ranked = execute(node, routed, k=k, default_scorer=default_scorer)
    results = [
        {"doc": int(r["doc"]), "score": float(r["score"]),
         "rank": int(r["rank"])}
        for r in ranked.collect()
    ]
    doc_ids = [r["doc"] for r in results]
    if not doc_ids:
        return {"query": str(query), "transformed": str(node), "results": []}
    names: dict[int, str] = {}
    if routed.names is not None and \
            {"repo", "path", "commit"} <= set(routed.names.columns):
        names = {
            int(r["doc"]): r["name"]
            for r in routed.names.withColumn("name", name_expr())
            .filter(F.col("doc").isin(doc_ids))
            .select("doc", "name")
            .collect()
        }
    ws = working_set_view(routed, doc_ids)
    entries: list = []
    root = _walk(node, ws, doc_ids, default_scorer, entries)
    for r in results:
        r["name"] = names.get(r["doc"])
        r["annotation"] = _tree_for_doc(root, entries, r["doc"])
    return {"query": str(query), "transformed": str(node),
            "results": results}
