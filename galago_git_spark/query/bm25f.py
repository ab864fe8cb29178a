"""BM25F — per-field BM25 (Robertson et al., "Microsoft Cambridge at
TREC-13"), assembled from the reference's building blocks:

- ``#bm25field`` (``BM25FieldScorer.java:35-40``): per-field normalized
  tf ``x-bar_{d,f,t} = tf / (1 + b_f*(len_f/avgdl_f - 1))``;
- ``#bm25fcomb`` (``BM25FCombinationIterator.java:24-35``): per-term
  saturation ``sum_t w_t * s_t/(K + s_t) * idf_t`` where ``s_t`` is the
  field-weighted sum of x-bars.

The reference registers the iterators (FeatureFactory.java:61-63) and
leaves assembly to the caller; :func:`bm25f_expand` is that assembly:

    #bm25fcomb:K=K:idf{t}=ln(N/(df_t+0.5))(
        per term t: #combine:norm=false:{f}=w_f(
            #bm25field:b=b:lengths=f( #inside(t #field:f()) ) ... ) )
"""

from __future__ import annotations

from galago_git_spark.index.build import Index
from galago_git_spark.query.nodes import Node, term_node
from galago_git_spark.query.scoring import bm25_idf


def _inside(term: str, field: str) -> Node:
    return Node("inside", {}, [term_node(term), Node("field", {"default": field})])


def bm25f_expand(
    terms: list[str],
    fields: list[str],
    index: Index,
    field_weights: dict[str, float] | None = None,
    b: float = 0.5,
    K: float = 0.5,
) -> Node:
    field_weights = field_weights or {f: 1.0 for f in fields}
    stats = index.term_stats(list(set(terms)))
    cs = index.collection_stats
    params: dict = {"K": K}
    children: list[Node] = []
    for i, t in enumerate(terms):
        ts = stats.get(t)
        df = ts.df if ts is not None else 0
        params[f"idf{i}"] = bm25_idf(cs.document_count, df)
        params[str(i)] = 1.0
        per_field: dict = {"norm": False}
        fchildren: list[Node] = []
        for j, f in enumerate(fields):
            per_field[str(j)] = field_weights.get(f, 1.0)
            fchildren.append(
                Node("bm25field", {"b": b, "lengths": f}, [_inside(t, f)])
            )
        children.append(Node("combine", per_field, fchildren))
    return Node("bm25fcomb", params, children)
