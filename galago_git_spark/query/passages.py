"""Passage retrieval — the Spark rebuild of RankedPassageModel
(``core/.../retrieval/processing/RankedPassageModel.java:57-97``):
fixed-size sliding windows (``passageSize``/``passageShift``) over each
candidate document, each scored as a pseudo-document; results ranked by
(score desc, doc asc, begin asc) (``ScoredPassage.java:34-49``).

Plan shape (one declarative job, no per-passage iteration):

    candidate docs (term-pruned postings)  ->  explode passage ids k from
    the lengths table (k <= ceil((len-size)/shift): the loop stops at the
    first window reaching the doc end)  ->  per-(term, doc, k) passage tf
    from the positions column  ->  BM25 over (passage tf, passage length)
    with collection-level idf/avgdl  ->  global top-k window.

Passage begins are 0-based token offsets like the reference
(``context.begin += passageShift``); positions are 1-based, so passage k
covers positions (k*shift, k*shift + size].
"""

from __future__ import annotations

from functools import reduce

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from galago_git_spark.index.build import Index
from galago_git_spark.query.scoring import BM25_B, BM25_K, bm25_idf

_PKEY = ["doc", "pbegin", "pend"]


def passage_bm25_topk(
    index: Index,
    terms: list[str],
    k: int = 10,
    size: int = 50,
    shift: int = 25,
    weights: list[float] | None = None,
    b: float = BM25_B,
    k1: float = BM25_K,
) -> DataFrame:
    """(doc, begin, end, score, rank) — BM25 #combine over passages."""
    if weights is None:
        weights = [1.0] * len(terms)
    total = sum(weights) or 1.0
    weights = [w / total for w in weights]
    cs = index.collection_stats
    stats = index.term_stats(list(set(terms)))

    matched = index.postings.filter(F.col("term").isin(terms))
    cand = matched.select("doc").distinct()
    passages = passage_windows(index, cand, size, shift).select(
        "doc",
        F.col("pbegin").alias("begin"),
        F.col("pend").alias("end"),
        "plen",
        (F.col("pbegin") / shift).cast("int").alias("k"),
    )

    # per-(term, doc, k) passage tf: position p belongs to passage k iff
    # k*shift < p <= k*shift + size  ->  k in [ceil((p-size)/shift), (p-1)/shift]
    pos = matched.select("doc", "term", F.explode("positions").alias("p"))
    kmin = F.greatest(
        F.ceil((F.col("p") - size) / F.lit(shift)).cast("int"), F.lit(0)
    )
    kmax = F.floor((F.col("p") - 1) / F.lit(shift)).cast("int")
    ptf = (
        pos.select(
            "doc", "term", F.explode(F.sequence(kmin, kmax)).alias("k")
        )
        .groupBy("doc", "k", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )

    # merge weights of DUPLICATE query terms before building the CASE:
    # chained .when()s on the same term never reach the second branch,
    # which would silently halve a repeated term's contribution (the
    # executor's flat path guards for distinct terms; this is the merge
    # equivalent for the passage plane)
    weight_by_term: dict[str, float] = {}
    for t, w in zip(terms, weights):
        weight_by_term[t] = weight_by_term.get(t, 0.0) + w
    contrib = None
    tf, plen = F.col("tf").cast("double"), F.col("plen")
    for t, w in weight_by_term.items():
        ts = stats.get(t)
        if ts is None:
            continue
        idf = bm25_idf(cs.document_count, ts.df)
        expr = (
            F.lit(w * idf)
            * (tf * (k1 + 1))
            / (tf + k1 * (1 - b + b * plen / F.lit(cs.avg_doc_length)))
        )
        case = F.when(F.col("term") == t, expr)
        contrib = case if contrib is None else contrib.when(F.col("term") == t, expr)
    if contrib is None:
        empty_schema = (
            "doc long, begin int, end int, score double"
            + (", rank int" if k is not None else "")
        )
        return index.spark.createDataFrame([], empty_schema)

    scored = (
        passages.join(ptf, ["doc", "k"], "left")
        .withColumn("c", F.when(F.col("term").isNull(), 0.0).otherwise(contrib))
        .groupBy("doc", "k", "begin", "end")
        .agg(F.sum("c").alias("score"))
    )
    if k is None:  # full scored frame (oracle / re-ranking callers)
        return scored.select(
            "doc", F.col("begin").cast("int"), F.col("end").cast("int"), "score"
        )
    w_rank = Window.orderBy(
        F.col("score").desc(), F.col("doc").asc(), F.col("begin").asc()
    )
    return (
        scored.orderBy(F.col("score").desc(), F.col("doc").asc(), F.col("begin").asc())
        .limit(k)
        .withColumn("rank", F.row_number().over(w_rank))
        .select("doc", F.col("begin").cast("int"), F.col("end").cast("int"), "score", "rank")
    )

# ---------------------------------------------------------------------------
# composable passage operators — PassageFilterIterator.java:44-66 (extents
# restricted to the passage window), PassageLengthIterator.java:26-52
# (length = min(end, |d|) - begin, the lenCheck default), wired through the
# whole count plane so any operator tree (#od/#uw/#syn/#sdm expansions)
# evaluates per-passage, the PassageRestrictionTraversal effect.
# ---------------------------------------------------------------------------


def passage_windows(index: Index, cand_docs: DataFrame, size: int, shift: int) -> DataFrame:
    """(doc, pbegin, pend, plen): sliding windows over candidate docs
    (RankedPassageModel.java:57-97 loop as one explode).

    The loop scores windows k = 0, 1, ... and STOPS after the first
    window whose end reaches the doc length (``lastIteration``,
    :83-97) — so the last window index is ceil((len - size) / shift),
    never beyond. Earlier code emitted every k with k*shift < len, which
    adds truncated tail windows the reference never scores (len=60,
    size=50, shift=25: reference scores [0,50) and [25,60) only, not
    [50,60) — and short tail windows outrank full ones under per-passage
    length normalization). Zero-length docs yield no windows
    (``begin < length`` fails immediately)."""
    last_k = F.greatest(
        F.ceil((F.col("length") - size) / F.lit(shift)).cast("int"),
        F.lit(0),
    )
    return (
        cand_docs.join(index.lengths, "doc")
        .filter(F.col("length") > 0)
        .select("doc", "length", F.explode(F.sequence(F.lit(0), last_k)).alias("k"))
        .withColumn("pbegin", F.col("k") * shift)
        .withColumn("pend", F.least(F.col("pbegin") + size, F.col("length")))
        .withColumn("plen", (F.col("pend") - F.col("pbegin")).cast("double"))
        .select("doc", "pbegin", "pend", "plen")
    )


def passage_count_frame(node, index: Index, passages: DataFrame) -> DataFrame:
    """Passage-scoped analog of executor.compile_count: (doc, pbegin,
    pend, tf, positions). Leaf extents are filtered to the passage
    (PassageFilterIterator.loadExtents: begin >= passage.begin and end <=
    passage.end, i.e. pbegin < p <= pend for 1-based unit extents); window
    matching then runs inside each passage with the same kernels as the
    whole-document path."""
    from galago_git_spark.functions.windows import (
        ordered_window_extents,
        positions_to_extents,
        unordered2_begins_batch,
        unordered_window_extents,
    )
    from galago_git_spark.query.executor import compile_count
    from galago_git_spark.query.nodes import is_term_leaf

    op = node.operator
    if op in ("counts", "extents", "text"):
        pos = compile_count(node, index).select(
            "doc", F.explode("positions").alias("p")
        )
        return (
            pos.join(passages, "doc")
            .filter((F.col("p") > F.col("pbegin")) & (F.col("p") <= F.col("pend")))
            .groupBy(*_PKEY)
            .agg(
                F.count(F.lit(1)).alias("tf"),
                F.sort_array(F.collect_list("p")).alias("positions"),
            )
        )
    if op == "synonym":
        frames = [passage_count_frame(c, index, passages) for c in node.children]
        return (
            reduce(DataFrame.unionByName, frames)
            .groupBy(*_PKEY)
            .agg(
                F.sum("tf").alias("tf"),
                F.sort_array(F.flatten(F.collect_list("positions"))).alias(
                    "positions"
                ),
            )
        )
    if op in ("ordered", "unordered"):
        width = int(node.get_int("default", 1 if op == "ordered" else -1))
        frames = [passage_count_frame(c, index, passages) for c in node.children]
        joined = frames[0].select(*_PKEY, F.col("positions").alias("pos_0"))
        for i, f in enumerate(frames[1:], 1):
            joined = joined.join(
                f.select(*_PKEY, F.col("positions").alias(f"pos_{i}")),
                _PKEY,
                "inner",
            )
        n = len(frames)
        terms = [str(c.default_param) for c in node.children if is_term_leaf(c)]
        all_leaves = len(terms) == n
        fast_ord = op == "ordered" and all_leaves and n >= 2
        fast_uw2 = (
            op == "unordered" and n == 2 and all_leaves and terms[0] != terms[1]
        )
        if fast_ord:
            from galago_git_spark.functions.windows import orderedN_begins_batch

            @F.pandas_udf(T.ArrayType(T.IntegerType()))
            def begins(*cols_: pd.Series) -> pd.Series:
                return pd.Series(
                    orderedN_begins_batch([c.tolist() for c in cols_], width)
                )

            cols = [F.col(f"pos_{i}") for i in range(n)]
        elif fast_uw2:

            @F.pandas_udf(T.ArrayType(T.IntegerType()))
            def begins(c0: pd.Series, c1: pd.Series) -> pd.Series:
                return pd.Series(
                    unordered2_begins_batch(c0.tolist(), c1.tolist(), width)
                )

            cols = [F.col("pos_0"), F.col("pos_1")]
        else:
            match_fn = (
                ordered_window_extents if op == "ordered" else unordered_window_extents
            )

            @F.pandas_udf(T.ArrayType(T.IntegerType()))
            def begins(*cols_: pd.Series) -> pd.Series:
                out = []
                for row in zip(*cols_):
                    exts = match_fn(
                        [positions_to_extents(list(p)) for p in row], width
                    )
                    out.append([b for b, _ in exts])
                return pd.Series(out)

            cols = [F.col(f"pos_{i}") for i in range(n)]
        return (
            joined.withColumn("positions", begins(*cols))
            .withColumn("tf", F.size("positions").cast("long"))
            .filter(F.col("tf") > 0)
            .select(*_PKEY, "tf", "positions")
        )
    raise ValueError(f"unsupported passage count operator: #{op}")


def passage_score_frame(
    query,
    index: Index,
    size: int = 50,
    shift: int = 25,
    default_scorer: str = "dirichlet",
) -> DataFrame:
    """Scored passages (doc, pbegin, pend, score) for an arbitrary
    #combine-of-scorers tree — every count subtree evaluates inside the
    passage (the PassageRestrictionTraversal effect); statistics stay
    collection-level (the reference scores passages with whole-index
    stats); lengths are passage lengths (PassageLengthIterator)."""
    from galago_git_spark.query.executor import (
        _is_scorer,
        _scorer_column,
        node_stats,
        prefetch_node_stats,
    )
    from galago_git_spark.query.nodes import Node
    from galago_git_spark.query.parser import parse
    from galago_git_spark.query.scoring import normalize_weights
    from galago_git_spark.query.traversals import transform

    node = parse(query) if isinstance(query, str) else query
    node = transform(node, default_scorer)
    if _is_scorer(node):
        node = Node("combine", {"0": 1.0, "norm": False}, [node])
    if node.operator != "combine":
        raise ValueError("passage_score_frame expects a #combine tree")
    # flatten nested #combine children into their scorer leaves
    flat: list[tuple[float, object]] = []
    weights = normalize_weights(
        node.indexed_weights(), node.get_bool("norm", True)
    )

    # operators with score-plane semantics the linear passage sum cannot
    # express (non-linear, or needing document-plane state)
    _UNSUPPORTED = ("log", "wsum", "boost", "prior", "threshold",
                    "logprobnot", "bm25fcomb", "bool")

    def _expand(w, c):
        if c.operator == "combine":
            ws = normalize_weights(c.indexed_weights(), c.get_bool("norm", True))
            for wi, ci in zip(ws, c.children):
                _expand(w * wi, ci)
        elif c.operator == "scale":
            # #scale:f(S) is a linear factor on the subtree score — fold it
            # into the passage weight (ScaleIterator analog)
            _expand(w * c.get_float("default", 1.0), c.children[0])
        elif c.operator in _UNSUPPORTED:
            # checked BEFORE _is_scorer: #prior matches both, and its
            # document-plane score has no passage analog
            raise ValueError(
                f"#{c.operator} is not supported inside passage retrieval "
                "(only linear #combine/#scale trees of scorers)"
            )
        elif _is_scorer(c):
            flat.append((w, c))
        else:
            flat.append((w, Node(default_scorer, {}, [c])))

    for w, c in zip(weights, node.children):
        _expand(w, c)
    prefetch_node_stats([c for _, c in flat], index)
    from galago_git_spark.query.executor import compile_count

    cand = (
        reduce(
            DataFrame.unionByName,
            [compile_count(c.children[0], index).select("doc") for _, c in flat],
        )
        .distinct()
    )
    passages = passage_windows(index, cand, size, shift)
    cur = passages
    exprs = []
    cs = index.collection_stats
    for i, (w, s) in enumerate(flat):
        pf = passage_count_frame(s.children[0], index, passages)
        cur = cur.join(
            pf.select(*_PKEY, F.col("tf").alias(f"tf_{i}")), _PKEY, "left"
        )
        tf_i = F.coalesce(F.col(f"tf_{i}"), F.lit(0)).cast("double")
        ts = node_stats(s.children[0], index)
        exprs.append(F.lit(w) * _scorer_column(s, tf_i, F.col("plen"), ts, cs))
    score = reduce(lambda a, b: a + b, exprs)
    return cur.select(*_PKEY, score.alias("score"))


def passage_topk(
    query,
    index: Index,
    k: int = 10,
    size: int = 50,
    shift: int = 25,
    default_scorer: str = "dirichlet",
) -> DataFrame:
    """Ranked passages (ScoredPassage.java:34-49 tie-break)."""
    scored = passage_score_frame(query, index, size, shift, default_scorer)
    w_rank = Window.orderBy(
        F.col("score").desc(), F.col("doc").asc(), F.col("pbegin").asc()
    )
    return (
        scored.orderBy(
            F.col("score").desc(), F.col("doc").asc(), F.col("pbegin").asc()
        )
        .limit(k)
        .withColumn("rank", F.row_number().over(w_rank))
        .select(
            "doc",
            F.col("pbegin").cast("int").alias("begin"),
            F.col("pend").cast("int").alias("end"),
            "score",
            "rank",
        )
    )
