"""Relational query executor — compiles a transformed query ``Node`` tree
into one declarative DataFrame plan.

This is the engine's RankedDocumentModel
(``core/.../processing/RankedDocumentModel.java:44-61``) re-expressed
Spark-first: instead of a document-at-a-time iterator tree, the plan is

    postings scan (term-pruned)  ->  join lengths  ->  per-term score
    columns  ->  groupBy(doc) weighted sum  ->  orderBy(score desc, doc
    asc) limit k  (Spark executes TakeOrderedAndProject — a distributed
    top-k heap, the analog of FixedSizeMinHeap)

Count-typed operators (#od/#uw/#syn/#mincount/#countsum) compose as
DataFrames of virtual postings ``(doc, tf, positions)`` — the same
iterator-type lattice as the reference (ExtentIterator < CountIterator),
with doc-alignment joins playing the role of ConjunctionIterator's
sort-merge ``syncTo`` (``ConjunctionIterator.java:1-133``).

Two physical paths, identical results (tested):

- *flat fast path*: every scorer wraps a plain term — one postings scan
  filtered by all query terms at once, per-term constants folded into a
  literal CASE map, single aggregation. This is the headline-query path.
- *general path*: arbitrary trees — candidate union + one left join per
  scorer child.

Statistics annotation (AnnotateCollectionStatistics.java:59-147) happens
here: term stats come from the termstats table (driver-side pruned
lookup, broadcast as literals); complex count nodes aggregate their own
virtual postings (NodeAggregateIterator analog).
"""

from __future__ import annotations

import math
from functools import reduce

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from galago_git_spark.functions.tokenize import tokenize_col, tokenize_pandas
from galago_git_spark.functions.windows import (
    ordered_window_extents,
    positions_to_extents,
    unordered_window_extents,
)
from galago_git_spark.index.build import Index
from galago_git_spark.query.nodes import Node
from galago_git_spark.query.parser import parse
from galago_git_spark.query.scoring import (
    BM25_B,
    BM25_K,
    DIRICHLET_MU,
    JM_LAMBDA,
    CollectionStats,
    TermStats,
    bil2_col,
    bm25_col,
    bm25_idf,
    dirichlet_col,
    inl2_col,
    jm_col,
    normalize_weights,
    pl2_col,
)
from galago_git_spark.query.traversals import transform

_COUNT_SCHEMA = "doc long, tf long, positions array<int>"
_SCORE_SUBTREES = ("wsum", "scale", "log", "bm25fcomb", "combine", "boost", "logprobnot", "bool")


def inline_index(
    docs: DataFrame, doc_col: str = "doc_id", text_col: str = "text",
    fields: bool = False, field_formats: dict[str, str] | None = None,
    stemmer: str | None = None, tag_fields: list[str] | None = None,
) -> Index:
    """Build an in-memory (lazy, no disk) index view over any table with a
    document id and a text column — used for oracle-checked queries over
    the driver's ``documents`` table and for tests. Same plan shapes as
    the on-disk index, minus persistence. ``tag_fields`` switches to the
    tag-aware token stream with whitelisted SGML tag spans as extents
    (functions/tagtok.py, TagTokenizer semantics)."""
    if tag_fields and fields:
        raise ValueError("tag_fields and fields=True are mutually exclusive")
    if tag_fields:
        from galago_git_spark.functions.tagtok import tagged_tokens_col

        terms_col = tagged_tokens_col(F.col(text_col), tuple(tag_fields))
    else:
        terms_col = tokenize_pandas(F.col(text_col))
    base = docs.select(
        F.col(doc_col).cast("long").alias("doc"),
        terms_col.alias("terms"),
    )
    extents = None
    if fields:
        from galago_git_spark.functions.fields import field_extents_col

        extents = docs.select(
            F.col(doc_col).cast("long").alias("doc"),
            F.explode(field_extents_col(F.col(text_col))).alias("ext"),
        ).select("doc", "ext.field", "ext.begin", "ext.end")
    elif tag_fields:
        from galago_git_spark.functions.tagtok import tagged_extents_col

        extents = docs.select(
            F.col(doc_col).cast("long").alias("doc"),
            F.explode(
                tagged_extents_col(F.col(text_col), tuple(tag_fields))
            ).alias("ext"),
        ).select("doc", "ext.field", "ext.begin", "ext.end")
    tokens = base.select(
        "doc", F.posexplode("terms").alias("pos0", "term")
    ).withColumn("pos", F.col("pos0") + 1)
    postings = tokens.groupBy("term", "doc").agg(
        F.count(F.lit(1)).alias("tf"),
        F.sort_array(F.collect_list("pos")).alias("positions"),
    )
    lengths = base.select("doc", F.size("terms").alias("length"))
    termstats = postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("cf"),
        F.max("tf").alias("max_tf"),
    )
    agg = lengths.agg(
        F.sum("length").alias("cl"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    names = docs.select(F.col(doc_col).cast("long").alias("doc"))
    fields_part = None
    if field_formats:
        from galago_git_spark.index.fieldindex import build_field_part

        fields_part = build_field_part(docs, field_formats, doc_col=doc_col)
    stemmed_parts = None
    default_text_part = "postings"
    if stemmer:
        from galago_git_spark.functions.stem import stem_pandas

        sp = (
            postings.withColumn("term", stem_pandas(F.col("term"), stemmer))
            .groupBy("term", "doc")
            .agg(
                F.sum("tf").alias("tf"),
                F.sort_array(F.flatten(F.collect_list("positions"))).alias(
                    "positions"
                ),
            )
        )
        st = sp.groupBy("term").agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("tf").alias("cf"),
            F.max("tf").alias("max_tf"),
        )
        stemmed_parts = {stemmer: {"postings": sp, "termstats": st}}
        default_text_part = f"postings.{stemmer}"
    return Index(
        stemmed_parts=stemmed_parts,
        default_text_part=default_text_part,
        spark=docs.sparkSession,
        index_dir="<inline>",
        postings=postings,
        lengths=lengths,
        names=names,
        termstats=termstats,
        collection_stats=CollectionStats(int(agg["cl"]), int(agg["n"])),
        extents=extents,
        fields_part=fields_part,
        field_formats=dict(field_formats) if field_formats else None,
    )


# --------------------------------------------------------------------------
# text-part routing (stemmed parts)
# --------------------------------------------------------------------------

def stem_leaves(node: Node, stemmer) -> Node:
    """Apply the part's term transform to every text leaf — the query
    half of stemming (``Stemmer.stemAsRequired``, Stemmer.java:94-101,
    invoked when a leaf routes to ``postings.<stemmer>``). Only the three
    term-leaf operators transform; field names, typed field comparisons,
    and operator parameters never do."""
    from galago_git_spark.functions.stem import stem_as_required

    if node.operator in ("counts", "extents", "text") and not node.children:
        term = node.get_str("default")
        if term is not None:
            params = dict(node.parameters)
            params["default"] = stem_as_required(term, stemmer)
            return Node(node.operator, params, [])
        return node
    if node.operator == "inside":
        # stem only the X side; the #field/#extentor side names tag spans
        return Node(node.operator, dict(node.parameters),
                    [stem_leaves(node.children[0], stemmer)] + node.children[1:])
    return Node(
        node.operator,
        dict(node.parameters),
        [stem_leaves(c, stemmer) for c in node.children],
    )


def _resolve_text_part(index: Index, part: str | None):
    """TextPartAssigner.assignPart (util/TextPartAssigner.java): pick the
    text part for this query — explicit ``part`` wins, else the index's
    default (stemmed when built). Returns (routed index view, stemmer fn
    or None). A view that already applied a transform never re-routes
    (recursive score_frame calls must not double-stem)."""
    if index.stemmer_name is not None:
        return index, None
    part = part or index.default_text_part
    if part == "postings" or not index.stemmed_parts:
        return index, None
    name = part.split(".", 1)[1] if "." in part else part
    if name not in index.stemmed_parts:
        raise ValueError(
            f"unknown text part {part!r}; available: postings, "
            + ", ".join(f"postings.{s}" for s in sorted(index.stemmed_parts))
        )
    from galago_git_spark.functions.stem import get_stemmer

    return index.stemmed_view(name), get_stemmer(name)


def working_set_view(index: Index, working: list) -> Index:
    """WorkingSetDocumentModel.java:33-75 — restrict retrieval to an
    explicit document whitelist (the standard rerank primitive):

    - every whitelisted doc becomes a scoring CANDIDATE (absent query
      terms score their background mass, exactly like the reference's
      per-doc ``iterator.score``, not just matching docs);
    - every count-plane scan (postings / extents / field postings /
      window parts) gets an ``In(doc, working)`` filter — pushed into the
      parquet scan, so a 1000-doc rerank reads 1000 docs' postings;
    - statistics stay GLOBAL via ``stats_base`` (the reference annotates
      collection statistics before the working set applies);
    - ids may be ints (doc ids) or strings (doc names, resolved through
      the names part — ``LocalRetrieval.getDocumentIds``; missing names
      are dropped with the reference's IGNORING semantics).
    """
    import dataclasses

    if not working:
        raise ValueError("working set may not be empty")
    if isinstance(working[0], str):
        from galago_git_spark.operators.docs import doc_id_for_names

        ids = doc_id_for_names(index, list(working))
    else:
        ids = [int(d) for d in working]
    ids = sorted(set(ids))
    in_ws = F.col("doc").isin(ids)
    spark = index.spark
    ws = spark.createDataFrame([(d,) for d in ids], "doc long")
    return dataclasses.replace(
        index,
        postings=index.postings.filter(in_ws),
        lengths=index.lengths.filter(in_ws),
        extents=(index.extents.filter(in_ws)
                 if index.extents is not None else None),
        field_postings=(index.field_postings.filter(in_ws)
                        if index.field_postings is not None else None),
        window_parts=(
            {k: v.filter(in_ws) for k, v in index.window_parts.items()}
            if index.window_parts else None
        ),
        working_docs=ws,
        stats_base=index.stats_base or index,
        _termstats_cache=None,
        _node_stats_cache=None,
    )


# --------------------------------------------------------------------------
# count-plane compilation: Node -> DataFrame(doc, tf, positions)
# --------------------------------------------------------------------------

def compile_count(
    node: Node, index: Index, need_positions: bool = False
) -> DataFrame:
    """``need_positions=True`` marks call sites that consume the result's
    ``positions`` column (window kernels, #syn merges, #inside containment)
    — it disables the window-part rewrite, whose count leaves carry null
    positions (the reference's rewrite likewise only fires in count
    context, WindowRewriteTraversal.java).

    Under an active :func:`~galago_git_spark.query.nodecache.node_cache`
    context (the CachedRetrieval.java analog), compiled frames are
    memoized by node key and persisted on second use, so subtrees shared
    across a query batch are scanned once; the recursion below routes
    children through this wrapper, so sharing applies at every depth."""
    from galago_git_spark.query.nodecache import active_cache

    cache = active_cache()
    if cache is not None:
        return cache.get_or_compile(
            node, index, need_positions, _compile_count_impl
        )
    return _compile_count_impl(node, index, need_positions)


def _compile_count_impl(
    node: Node, index: Index, need_positions: bool = False
) -> DataFrame:
    op = node.operator
    if op in ("counts", "extents", "text"):
        term = str(node.default_param)
        matched = index.postings.filter(F.col("term") == term)
        if "positions" not in matched.columns:
            if need_positions:
                # fail with an actionable message instead of a NoneType
                # crash inside the window kernels (reference postings
                # parts always carry positions; a count-only build here
                # simply cannot serve positional operators)
                raise ValueError(
                    "positional operator (#od/#uw/#sdm/#inside/#syn with "
                    "positions) over an index built without positions — "
                    "rebuild with build_index(positions=True) / "
                    "`build --positions`"
                )
            # count-only build (positions=False) — ExtentsToCountLeaf shape
            matched = matched.withColumn(
                "positions", F.lit(None).cast("array<int>")
            )
        return matched.select("doc", "tf", "positions")
    if op == "null":
        return index.spark.createDataFrame([], _COUNT_SCHEMA)
    if op in ("ordered", "unordered"):
        width = int(node.get_int("default", 1 if op == "ordered" else -1))
        if not need_positions:
            rewritten = _window_part_rewrite(node, index, op, width)
            if rewritten is not None:
                return rewritten
        return _window_frame(node, index, op, width)
    if op == "synonym":
        # positions are only merged when the caller consumes them — in pure
        # count contexts children compile with need_positions=False so the
        # window-part rewrite stays available beneath #syn
        frames = [
            compile_count(c, index, need_positions=need_positions)
            for c in node.children
        ]
        unioned = reduce(DataFrame.unionByName, frames).groupBy("doc")
        if need_positions:
            return unioned.agg(
                F.sum("tf").alias("tf"),
                F.sort_array(F.flatten(F.collect_list("positions"))).alias(
                    "positions"
                ),
            )
        return unioned.agg(F.sum("tf").alias("tf")).withColumn(
            "positions", F.lit(None).cast("array<int>")
        )
    if op == "mincount":
        frames = [compile_count(c, index) for c in node.children]
        joined = frames[0].select("doc", F.col("tf").alias("tf_0"))
        for i, f in enumerate(frames[1:], 1):
            joined = joined.join(
                f.select("doc", F.col("tf").alias(f"tf_{i}")), "doc", "inner"
            )
        tf = F.least(*[F.col(f"tf_{i}") for i in range(len(frames))])
        return joined.select(
            "doc", tf.alias("tf"), F.lit(None).cast("array<int>").alias("positions")
        )
    if op == "countsum":
        frames = [
            compile_count(c, index).select("doc", "tf") for c in node.children
        ]
        return (
            reduce(DataFrame.unionByName, frames)
            .groupBy("doc")
            .agg(F.sum("tf").alias("tf"))
            .withColumn("positions", F.lit(None).cast("array<int>"))
        )
    if op == "booltocount":
        # BinaryCountIterator.java:52-57 (#bool-to-count) — indicator as a
        # count leaf: 1 on matching docs
        ind = compile_indicator(node.children[0], index)
        return ind.select(
            "doc",
            F.lit(1).cast("long").alias("tf"),
            F.lit(None).cast("array<int>").alias("positions"),
        )
    if op == "inside":
        # ExtentInsideIterator.java:60-85 — extents of X contained in a
        # field extent, as a doc-aligned interval-containment join. An X
        # occurrence inside two overlapping field extents counts once
        # (distinct), matching the reference's per-X-extent containment
        # check. Requires a positions build. The field side may be an
        # #extentor over several fields (`x.f1,f2` — StructuredQuery.java:
        # 149-160): the union of their extents.
        fnode = node.children[1]
        if fnode.operator == "extentor":
            fnames = [str(c.default_param) for c in fnode.children]
        elif fnode.operator in ("field", "extents"):
            fnames = [str(fnode.default_param)]
        else:
            raise ValueError("#inside second child must be #field:name()")
        # InsideToFieldPartTraversal.java: a term leaf restricted to one
        # field resolves to the prebuilt field-postings part — a pruned
        # columnar scan instead of the containment join (result-identical,
        # tested)
        from galago_git_spark.query.nodes import is_term_leaf

        if (
            index.field_postings is not None
            and len(fnames) == 1
            and is_term_leaf(node.children[0])
            and not node.get_bool("noOpt", False)
        ):
            return index.field_postings.filter(
                (F.col("field") == fnames[0])
                & (F.col("term") == str(node.children[0].default_param))
            ).select("doc", "tf", "positions")
        if index.extents is None:
            raise ValueError("#inside requires an index built with fields=True")
        x = compile_count(node.children[0], index, need_positions=True)
        fext = index.extents.filter(F.col("field").isin(fnames)).select(
            "doc", "begin", "end"
        )
        pos = x.select("doc", F.explode("positions").alias("p"))
        contained = (
            pos.join(fext, "doc")
            .filter((F.col("p") >= F.col("begin")) & (F.col("p") + 1 <= F.col("end")))
            .select("doc", "p")
        )
        # collect_set dedups a position contained in several overlapping
        # field extents inside the one aggregation shuffle (was a separate
        # distinct shuffle before the groupBy)
        return (
            contained.groupBy("doc")
            .agg(F.sort_array(F.collect_set("p")).alias("positions"))
            .select(
                "doc", F.size("positions").cast("long").alias("tf"), "positions"
            )
        )
    if op == "require":
        # positions pass through verbatim -> propagate need_positions so a
        # positions-consuming ancestor never sees a part-rewritten child
        ind = compile_indicator(node.children[0], index)
        return compile_count(node.children[1], index, need_positions).join(
            ind.select("doc"), "doc", "left_semi"
        )
    if op == "reject":
        ind = compile_indicator(node.children[0], index)
        return compile_count(node.children[1], index, need_positions).join(
            ind.select("doc"), "doc", "left_anti"
        )
    if op in _CUSTOM_COUNT_OPS:
        # the compile callback passed to the user fn is pre-bound to THIS
        # call's need_positions, so a custom op beneath a window/#inside
        # ancestor compiles its children on the positional path by
        # default (the fn may still override the keyword explicitly)
        def _cc(node, index=index, need_positions=need_positions):
            return compile_count(node, index, need_positions)

        return _CUSTOM_COUNT_OPS[op](node, index, _cc)
    raise ValueError(f"unsupported count operator: #{op}")


def _window_part_rewrite(
    node: Node, index: Index, op: str, width: int
) -> DataFrame | None:
    """WindowRewriteTraversal analog (``WindowRewriteTraversal.java``): an
    ``#od:1`` over bare terms becomes a direct lookup of the contiguous
    n-gram part, and a 2-term ``#uw:w`` over distinct bare terms a lookup
    of the matching unordered pair part, when one was built
    (``index/window.py``). Result-identical to the positional match loops
    (tested); positions are not materialized (the reference's rewrite
    likewise yields a count leaf)."""
    from galago_git_spark.query.nodes import is_term_leaf

    if not index.window_parts:
        return None
    if not all(is_term_leaf(c) for c in node.children):
        return None
    from galago_git_spark.index.window import SEP

    terms = [str(c.default_param) for c in node.children]
    n = len(terms)
    uw_key = ("uw", width) if n == 2 else ("uw", n, width)
    if op == "ordered" and width == 1 and n in index.window_parts:
        gram = SEP.join(terms)
        part = index.window_parts[n]
    elif (
        op == "unordered"
        and n >= 2
        and len(set(terms)) == n
        and uw_key in index.window_parts
    ):
        # unordered counts are symmetric in the children, so the part
        # keys on the lexically sorted tuple (WindowProducer.java:120-127)
        gram = SEP.join(sorted(terms))
        part = index.window_parts[uw_key]
    else:
        return None
    return (
        part.filter(F.col("term") == gram)
        .select("doc", "tf", F.lit(None).cast("array<int>").alias("positions"))
    )


def _window_frame(node: Node, index: Index, op: str, width: int) -> DataFrame:
    """#od / #uw via doc-aligned inner joins of children's position arrays
    plus an exact match kernel in an Arrow-batched UDF. The common 2-term
    case (every #sdm pair, every phrase bigram) runs a whole-batch numpy
    searchsorted kernel (functions/windows.ordered2_begins_batch) —
    result-identical to the per-doc greedy loop, no per-row Python."""
    from galago_git_spark.query.nodes import is_term_leaf

    frames = [
        compile_count(c, index, need_positions=True) for c in node.children
    ]
    joined = frames[0].select("doc", F.col("positions").alias("pos_0"))
    for i, f in enumerate(frames[1:], 1):
        joined = joined.join(
            f.select("doc", F.col("positions").alias(f"pos_{i}")), "doc", "inner"
        )
    n = len(frames)
    terms = [
        str(c.default_param) for c in node.children if is_term_leaf(c)
    ]
    all_leaves = len(terms) == n
    fast_ord = op == "ordered" and all_leaves and n >= 2
    fast_uw2 = (
        op == "unordered" and n == 2 and all_leaves and terms[0] != terms[1]
    )
    if fast_ord or fast_uw2:
        from galago_git_spark.functions.windows import (
            orderedN_begins_batch,
            unordered2_begins_batch,
        )

        if fast_ord:

            @F.pandas_udf(T.ArrayType(T.IntegerType()))
            def window_begins(*cols: pd.Series) -> pd.Series:
                return pd.Series(
                    orderedN_begins_batch([c.tolist() for c in cols], width)
                )

        else:

            @F.pandas_udf(T.ArrayType(T.IntegerType()))
            def window_begins(c0: pd.Series, c1: pd.Series) -> pd.Series:
                return pd.Series(
                    unordered2_begins_batch(c0.tolist(), c1.tolist(), width)
                )

    else:
        match_fn = (
            ordered_window_extents if op == "ordered" else unordered_window_extents
        )

        @F.pandas_udf(T.ArrayType(T.IntegerType()))
        def window_begins(*cols: pd.Series) -> pd.Series:
            out = []
            for row in zip(*cols):
                exts = match_fn(
                    [positions_to_extents(list(p)) for p in row], width
                )
                out.append([b for b, _ in exts])
            return pd.Series(out)

    pos_cols = [F.col(f"pos_{i}") for i in range(n)]
    return (
        joined.withColumn("positions", window_begins(*pos_cols))
        .withColumn("tf", F.size("positions").cast("long"))
        .filter(F.col("tf") > 0)
        .select("doc", "tf", "positions")
    )


# --------------------------------------------------------------------------
# indicator plane: Node -> DataFrame(doc)
# --------------------------------------------------------------------------

def compile_indicator(node: Node, index: Index) -> DataFrame:
    op = node.operator
    if op == "all":
        frames = [compile_indicator(c, index) for c in node.children]
        return reduce(lambda a, b: a.join(b, "doc", "left_semi"), frames)
    if op == "any":
        frames = [compile_indicator(c, index) for c in node.children]
        return reduce(DataFrame.unionByName, frames).distinct()
    if op == "not":
        child = compile_indicator(node.children[0], index)
        return index.lengths.select("doc").join(child, "doc", "left_anti")
    if op == "indicator":
        # document-indicator part (DocumentIndicatorWriter.java:20-40;
        # DocumentIndicatorReader default semantics): docs absent from the
        # part take the build-time default
        if index.indicator is None:
            raise ValueError("#indicator requires an indicator part")
        on = index.indicator.filter(F.col("indicator")).select("doc")
        if not index.indicator_default:
            return on
        off = index.indicator.filter(~F.col("indicator")).select("doc")
        return index.lengths.select("doc").join(off, "doc", "left_anti")
    if op in ("greater", "less", "between", "equals"):
        # typed field comparison over the fields part
        # (FieldComparisonIterator.java:45-81; index/fieldindex.py)
        from galago_git_spark.index.fieldindex import field_comparison_docs

        return field_comparison_docs(node, index)
    if op == "threshold":
        # ThresholdIterator.java — on iff child score >= raw threshold
        t = node.get_float("raw", node.get_float("default", 0.0))
        from galago_git_spark.query.executor import score_frame as _sf

        child = node.children[0]
        scored = _sf(child, index)
        return scored.filter(F.col("score") >= F.lit(t)).select("doc")
    # a count node used as an indicator: on iff tf > 0
    return compile_count(node, index).select("doc").distinct()


# --------------------------------------------------------------------------
# statistics annotation
# --------------------------------------------------------------------------

def node_stats(node: Node, index: Index) -> TermStats:
    """NodeStatistics for a count node: leaf -> termstats lookup; complex
    node -> aggregate its virtual postings (NodeAggregateIterator).
    Complex-node results memoize on the Index handle; batch several nodes
    into ONE job with :func:`prefetch_node_stats`."""
    if index.stats_base is not None:
        # restricted view (working set): statistics come from the FULL
        # index — AnnotateCollectionStatistics reads global stats no
        # matter what doc set is being scored
        index = index.stats_base
    if node.operator in ("counts", "extents", "text"):
        term = str(node.default_param)
        found = index.term_stats([term])
        return found.get(term, TermStats(term, 0, 0, 0))
    key = str(node)
    if index._node_stats_cache is None:
        index._node_stats_cache = {}
    cached = index._node_stats_cache.get(key)
    if cached is not None:
        return cached
    frame = compile_count(node, index)
    row = frame.agg(
        F.count(F.lit(1)).alias("df"),
        F.coalesce(F.sum("tf"), F.lit(0)).alias("cf"),
        F.coalesce(F.max("tf"), F.lit(0)).alias("max_tf"),
    ).collect()[0]
    out = TermStats(key, int(row["df"]), int(row["cf"]), int(row["max_tf"]))
    index._node_stats_cache[key] = out
    return out


def _stats_count_children(s: Node) -> list[Node]:
    """Count nodes whose statistics a score subtree will request
    (mirrors the _score_column/_scorer_env recursion)."""
    if s.operator in ("prior", "boost", "bool"):
        return []
    if _is_scorer(s):
        return list(s.children[:1])
    if s.operator in _SCORE_SUBTREES:
        out: list[Node] = []
        for c in s.children:
            if _is_scorer(c) or c.operator in _SCORE_SUBTREES:
                out.extend(_stats_count_children(c))
            else:
                out.append(c)  # will be wrapped in the default scorer
        return out
    return [s]


def prefetch_node_stats(scorers: list[Node], index: Index) -> None:
    """Batch every count node's statistics into at most TWO driver jobs
    per query (one termstats scan for all leaves + one unioned aggregate
    for all complex nodes) instead of one job per node — an #sdm over n
    terms previously fired ~2(n-1) extra stats jobs (VERDICT r1 item 4)."""
    if index.stats_base is not None:
        index = index.stats_base  # global stats for restricted views
    leaves: list[str] = []
    complex_nodes: dict[str, Node] = {}
    if index._node_stats_cache is None:
        index._node_stats_cache = {}
    for s in scorers:
        for c in _stats_count_children(s):
            if c.operator in ("counts", "extents", "text"):
                leaves.append(str(c.default_param))
            else:
                key = str(c)
                if key not in index._node_stats_cache:
                    complex_nodes[key] = c
    if leaves:
        index.term_stats(leaves)  # fills the memo in one scan
    if len(complex_nodes) > 1:
        frames = [
            compile_count(n, index).agg(
                F.lit(key).alias("k"),
                F.count(F.lit(1)).alias("df"),
                F.coalesce(F.sum("tf"), F.lit(0)).alias("cf"),
                F.coalesce(F.max("tf"), F.lit(0)).alias("max_tf"),
            )
            for key, n in complex_nodes.items()
        ]
        rows = reduce(DataFrame.unionByName, frames).collect()
        for r in rows:
            index._node_stats_cache[r["k"]] = TermStats(
                r["k"], int(r["df"]), int(r["cf"]), int(r["max_tf"])
            )


# --------------------------------------------------------------------------
# score plane
# --------------------------------------------------------------------------

def _scorer_column(
    node: Node, tf: Column, length: Column, ts: TermStats, cs: CollectionStats
) -> Column:
    op = node.operator
    if op == "bm25":
        b = node.get_float("b", BM25_B)
        k = node.get_float("k", BM25_K)
        idf = bm25_idf(cs.document_count, ts.df)
        return bm25_col(tf, length, idf, cs.avg_doc_length, b, k)
    if op == "dirichlet":
        mu = node.get_float("mu", DIRICHLET_MU)
        bg = (ts.cf if ts.cf > 0 else 0.5) / cs.collection_length
        return dirichlet_col(tf, length, bg, mu)
    if op == "jm":
        lam = node.get_float("lambda", JM_LAMBDA)
        bg = (ts.cf if ts.cf > 0 else 0.5) / cs.collection_length
        return jm_col(tf, length, bg, lam)
    if op == "bm25field":
        # BM25FieldScorer.java:35-40 — x-bar_{d,f,t} = tf / (1 + b*(len_f/avgdl_f - 1));
        # cs here is the FIELD statistics when lengths=field is set
        b = node.get_float("b", 0.5)
        return tf / (1.0 + F.lit(b) * (length / F.lit(cs.avg_doc_length) - 1.0))
    if op == "pl2":
        return pl2_col(tf, length, max(ts.cf, 1), cs, node.get_float("c", 1.0))
    if op == "inl2":
        return inl2_col(tf, length, ts.df, cs, node.get_float("c", 1.0))
    if op == "bil2":
        return bil2_col(tf, length, cs, node.get_float("c", 1.0))
    if op == "logcount":
        return F.log(tf)
    if op == "bm25rf":
        # BM25RFScoringIterator.java:29-63 — Robertson term-selection-value
        # relevance-feedback weight: a per-term constant emitted on matching
        # docs (count/length irrelevant), 0 elsewhere
        rt = node.get_int("rt", 0)
        R = node.get_int("R", 0)
        N = node.get_int("documentCount", cs.document_count)
        factor = node.get_float("factor", 0.33)
        ft = node.get_int("ft", ts.df)
        numerator = (rt + 0.5) / (R - rt + 0.5)
        denominator = (ft - rt + 0.5) / (N - ft - R + rt + 0.5)
        value = factor * math.log(numerator / denominator)
        return F.when(tf > 0, F.lit(value)).otherwise(0.0)
    if op in _CUSTOM_SCORERS:
        return _CUSTOM_SCORERS[op](node, tf, length, ts, cs)
    raise ValueError(f"unsupported scorer: #{op}")


# user-registered scoring operators — the FeatureFactory external-operator
# hook (FeatureFactory.java:157-206, the `operators` global parameter maps
# operator names to user classes). Here the "class" is a column builder.
_CUSTOM_SCORERS: dict = {}
# user-registered count-plane operators (the count-iterator half of the
# same FeatureFactory hook): name -> frame_fn(node, index, compile_count)
_CUSTOM_COUNT_OPS: dict = {}
# names a user registration may never take over (count ops, combiners, and
# every alias the parser/traversals already claim)
_BUILTIN_OPERATOR_NAMES = frozenset(
    {
        "bm25", "dirichlet", "jm", "pl2", "inl2", "bil2", "bm25field",
        "bm25rf", "logcount", "prior", "counts", "extents", "text",
        "ordered", "unordered", "synonym", "mincount", "countsum", "inside",
        "null", "booltocount", "require", "reject", "combine", "wsum",
        "scale", "log", "boost", "threshold", "logprobnot", "bool", "all",
        "any", "not", "sdm", "fulldep", "wsdm", "prms", "rm", "rm3", "prf",
        "stopword", "ss", "stopstructure", "bm25fcomb", "extentor", "field",
        "greater", "less", "between", "equals", "indicator", "lengths",
        "pdfr", "window", "passagefilter", "passagelengths",
    }
)


def register_scorer(name: str, column_fn) -> None:
    """Register a user scoring operator ``#name`` usable anywhere a
    built-in scorer is (inside #combine/#wsum/#sdm weights, over any
    count-typed subtree). ``column_fn(node, tf, length, ts, cs) -> Column``
    receives the query node (for parameters), the tf and doc-length
    columns, and the node's TermStats / CollectionStats — the same
    contract as the built-in scorers, so the expression stays JVM-side.

    The analog of FeatureFactory's external operator lookup
    (``FeatureFactory.java:157-206``): pure registration, no global
    rewrite; the traversal pipeline learns the name so implicit casting
    treats it as a scorer. Built-in operator names cannot be shadowed."""
    from galago_git_spark.query import traversals

    # alias spellings (#linear, #od, #seqdep, ...) are rewritten to their
    # canonical operator by replace_operators BEFORE scorer dispatch, so a
    # registration under an alias name would be silently ignored — reject
    # them alongside the canonical names
    if (
        name in _BUILTIN_OPERATOR_NAMES
        or name in traversals.ALIASES
        or name in _CUSTOM_COUNT_OPS
        or (name in traversals.SCORERS and name not in _CUSTOM_SCORERS)
    ):
        raise ValueError(f"cannot shadow built-in operator #{name}")
    _CUSTOM_SCORERS[name] = column_fn
    traversals.SCORERS.add(name)


def register_count_op(name: str, frame_fn) -> None:
    """Register a user count-plane operator ``#name`` usable anywhere a
    count-typed subtree is legal (under any scorer, inside #combine via
    the implicit default-scorer cast, as a #require/#reject candidate...).
    ``frame_fn(node, index, compile_count) -> DataFrame(doc, tf,
    positions)`` receives the query node, the Index handle, and a
    ``compile_count`` callback for compiling children — pre-bound to the
    enclosing call's ``need_positions``, so children compile on the
    positional path whenever a window/#inside ancestor will consume the
    result's positions — the count-iterator half of FeatureFactory's
    external operator lookup
    (``FeatureFactory.java:157-206``; :func:`register_scorer` is the
    scoring half). Built-in operator names and alias spellings cannot be
    shadowed."""
    from galago_git_spark.query import traversals

    if (
        name in _BUILTIN_OPERATOR_NAMES
        or name in traversals.ALIASES
        or name in traversals.SCORERS
    ):
        raise ValueError(f"cannot shadow built-in operator #{name}")
    _CUSTOM_COUNT_OPS[name] = frame_fn


def unregister_count_op(name: str) -> None:
    """Remove a count op registered via :func:`register_count_op`."""
    _CUSTOM_COUNT_OPS.pop(name, None)


def unregister_scorer(name: str) -> None:
    """Remove a scorer registered via :func:`register_scorer`. Built-in
    names are never touched (only names actually in the custom registry
    are discarded from the traversal scorer set)."""
    from galago_git_spark.query import traversals

    if name in _CUSTOM_SCORERS:
        del _CUSTOM_SCORERS[name]
        traversals.SCORERS.discard(name)


def _is_scorer(node: Node) -> bool:
    return node.operator in (
        "bm25", "dirichlet", "jm", "pl2", "inl2", "bil2", "bm25field",
        "bm25rf", "logcount", "prior"
    ) or node.operator in _CUSTOM_SCORERS


def _is_flat_term_scorer(node: Node) -> bool:
    return (
        _is_scorer(node)
        and len(node.children) == 1
        and node.children[0].operator in ("counts", "extents", "text")
        and not node.children[0].children
    )


def prepare_query(
    query: str | Node,
    index: Index,
    default_scorer: str = "dirichlet",
    op_repls: dict | None = None,
    part: str | None = None,
    working: list | None = None,
) -> tuple[Node, Index]:
    """Parse + route + transform — the full pre-execution pipeline
    (text-part routing, stemming, ReplaceOperatorTraversal aliasing,
    relevance-model expansion, the traversal rewrite chain), returning
    the transformed node and the routed index view. The shared prologue
    of :func:`score_frame` and the annotation plane
    (``query/annotate.py``, the debug-query tool)."""
    node = parse(query) if isinstance(query, str) else query
    index, _stem_fn = _resolve_text_part(index, part)
    if _stem_fn is not None:
        node = stem_leaves(node, _stem_fn)
    if working is not None and index.working_docs is None:
        index = working_set_view(index, working)
    if op_repls:
        # ReplaceOperatorTraversal runs FIRST in the reference pipeline —
        # before RelevanceModelTraversal — so user aliasing must apply
        # before the rm/rm3/prf dispatch below (and exactly once)
        from copy import deepcopy

        from galago_git_spark.query.traversals import user_replace_operators

        node = user_replace_operators(deepcopy(node), op_repls)
    if node.operator in ("rm", "rm3", "prf"):
        # RelevanceModelTraversal (traversal #1): runs a first-pass query,
        # expands, and re-enters — needs the index, so it lives here
        from galago_git_spark.query.prf import rm3_expand

        base = Node("combine", {k: v for k, v in node.parameters.items()
                                if k not in ("fbDocs", "fbTerm", "fbOrigWeight")},
                    node.children)
        node = rm3_expand(
            base, index,
            fb_orig_weight=node.get_float("fbOrigWeight", 0.25),
            fb_docs=node.get_int("fbDocs", 20),
            fb_terms=node.get_int("fbTerm", 100),
            default_scorer=default_scorer,
        )
    node = transform(node, default_scorer)  # op_repls already applied above
    return node, index


def score_frame(
    query: str | Node,
    index: Index,
    default_scorer: str = "dirichlet",
    op_repls: dict | None = None,
    part: str | None = None,
    working: list | None = None,
) -> DataFrame:
    """Full scored candidate set ``(doc, score)`` — unranked, unlimited.
    The building block for execute() and for oracle-checked wrappers that
    need to rank on rounded scores. ``op_repls`` is the user operator
    aliasing map (ReplaceOperatorTraversal's ``opRepls`` parameter).
    ``part`` picks the text part (``"postings"`` forces the raw part;
    default = the index's DiskIndex-style default, i.e. the stemmed part
    when one was built); query terms are transformed to match.
    ``working``: doc ids or names — score exactly that set
    (WorkingSetDocumentModel, see :func:`working_set_view`)."""
    node, index = prepare_query(
        query, index, default_scorer, op_repls=op_repls, part=part,
        working=working,
    )
    if node.operator in ("require", "reject"):
        # RequireIterator / RejectIterator over a scored child: the filter
        # indicator gates the ranked result (semi/anti join) — supports
        # #require(#between(...) <scored query>) as a query string
        ind = compile_indicator(node.children[0], index).select("doc")
        base = score_frame(node.children[1], index, default_scorer)
        how = "left_semi" if node.operator == "require" else "left_anti"
        return base.join(ind, "doc", how)
    if _is_scorer(node) or (
        node.operator in _SCORE_SUBTREES
        and node.operator not in ("combine", "wsum")
    ):
        node = Node("combine", {"0": 1.0, "norm": False}, [node])
    if node.operator == "combine":
        return _execute_combine(node, index, default_scorer)
    if node.operator == "wsum":
        return _execute_wsum(node, index)
    # bare count node: implicit default scorer over it
    node = Node("combine", {}, [Node(default_scorer, {}, [node])])
    return _execute_combine(node, index, default_scorer)


def execute(
    query: str | Node,
    index: Index,
    k: int = 10,
    default_scorer: str = "dirichlet",
    with_names: bool = False,
    op_repls: dict | None = None,
    part: str | None = None,
    working: list | None = None,
) -> DataFrame:
    """Parse (if needed), transform, compile, and run a ranked query.

    Returns ``(doc, score, rank)`` — score desc, then ascending doc
    (ScoredDocument.java:41-52 tie-break) — limited to k.
    ``op_repls``: user operator aliasing (``{"dummy": "sdm"}`` or
    ``{"dummy": ["stopword", "combine"]}``) applied before the rewrite
    pipeline — ReplaceOperatorTraversal's ``opRepls`` parameter.
    """
    scored = score_frame(query, index, default_scorer, op_repls=op_repls,
                         part=part, working=working)
    out = (
        scored.orderBy(F.col("score").desc(), F.col("doc").asc())
        .limit(k)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("score").desc(), F.col("doc").asc())
            ),
        )
    )
    if with_names:
        out = out.join(index.names, "doc", "left")
    return out


def _execute_combine(node: Node, index: Index, default_scorer: str) -> DataFrame:
    weights = normalize_weights(
        node.indexed_weights(), node.get_bool("norm", True)
    )
    children = node.children
    # wrap any stray count children (defensive; traversal normally did it);
    # score-typed subtrees (#wsum) pass through
    children = [
        c if (_is_scorer(c) or c.operator in _SCORE_SUBTREES)
        else Node(default_scorer, {}, [c])
        for c in children
    ]
    if _flat_eligible(children) and index.working_docs is None:
        # flat path scores MATCHING docs only — a working set needs every
        # whitelisted doc scored, which is the general path's left-join
        # shape with the candidate override below
        return _combine_flat(children, weights, index)
    return _combine_general(children, weights, index)


def _flat_eligible(children: list[Node]) -> bool:
    """Flat fast path requires: every child a scorer over a bare term, all
    terms distinct (the CASE map keys on term), and a single mu across any
    dirichlet scorers (the length term folds into one constant)."""
    if not all(_is_flat_term_scorer(c) for c in children):
        return False
    if not all(c.operator in ("bm25", "dirichlet", "jm") for c in children):
        return False  # DFR scorers run on the general path
    terms = [str(c.children[0].default_param) for c in children]
    if len(set(terms)) != len(terms):
        return False
    mus = {
        c.get_float("mu", DIRICHLET_MU)
        for c in children
        if c.operator == "dirichlet"
    }
    return len(mus) <= 1


def _combine_flat(
    scorers: list[Node], weights: list[float], index: Index
) -> DataFrame:
    """Fast path: one pruned postings scan + single aggregation.

    Handles absent-term background mass (Dirichlet/JM score tf=0) by the
    separable rewrite: per-doc score = sum over present terms of
    (score(tf) - score(0)) + sum over all terms of score(0), where the
    second sum depends only on doc length and per-query constants.
    """
    cs = index.collection_stats
    terms = [str(s.children[0].default_param) for s in scorers]
    stats = index.term_stats(terms)

    contrib_cases = []  # per-present-term delta columns keyed by term
    const_logbg = 0.0  # sum_t w_t * score_t(tf=0) parts independent of len
    len_coeff = 0.0  # coefficient of the per-doc length-dependent term
    tf, length = F.col("tf"), F.col("length")
    any_dirichlet = False

    for w, s in zip(weights, scorers):
        term = str(s.children[0].default_param)
        ts = stats.get(term, TermStats(term, 0, 0, 0))
        op = s.operator
        if op == "bm25":
            b = s.get_float("b", BM25_B)
            kk = s.get_float("k", BM25_K)
            idf = bm25_idf(cs.document_count, ts.df)
            delta = bm25_col(tf, length, idf, cs.avg_doc_length, b, kk)
        elif op == "dirichlet":
            mu = s.get_float("mu", DIRICHLET_MU)
            bg = (ts.cf if ts.cf > 0 else 0.5) / cs.collection_length
            # score = ln(tf + mu*bg) - ln(len + mu); delta = ln((tf+mu*bg)/(mu*bg))
            delta = F.log((tf + F.lit(mu * bg)) / F.lit(mu * bg))
            const_logbg += w * math.log(mu * bg)
            len_coeff += w  # each dirichlet contributes -w*ln(len+mu)
            any_dirichlet = True
            mu_used = mu
        elif op == "jm":
            lam = s.get_float("lambda", JM_LAMBDA)
            bg = (ts.cf if ts.cf > 0 else 0.5) / cs.collection_length
            delta = F.log(
                F.lit(lam) * tf / length + F.lit((1 - lam) * bg)
            ) - F.lit(math.log((1 - lam) * bg))
            const_logbg += w * math.log((1 - lam) * bg)
        else:
            raise ValueError(f"flat path cannot handle #{op}")
        contrib_cases.append((term, F.lit(w) * delta))

    contrib = None
    for term, expr in contrib_cases:
        case = F.when(F.col("term") == term, expr)
        contrib = case if contrib is None else contrib.when(
            F.col("term") == term, expr
        )

    matched = (
        index.postings.filter(F.col("term").isin(terms))
        .select("term", "doc", "tf")
        .join(index.lengths, "doc")
        .withColumn("contrib", contrib)
    )
    per_doc = matched.groupBy("doc").agg(
        F.sum("contrib").alias("delta_sum"), F.first("length").alias("length")
    )
    score = F.col("delta_sum") + F.lit(const_logbg)
    if any_dirichlet:
        # all-dirichlet case: mu may vary per scorer; handle uniform mu here,
        # mixed-mu falls back to the general path upstream if ever needed.
        score = score - F.lit(len_coeff) * F.log(F.col("length") + F.lit(mu_used))
    return per_doc.select("doc", score.alias("score"))


def field_lengths(index: Index, field: str) -> DataFrame:
    """(doc, length) for one field — sum of its extent widths (the
    DiskLengthsReader field-lengths view, ``DiskLengthsReader.java:37-89``)."""
    if index.extents is None:
        raise ValueError(f"field lengths for {field!r} need a fields build")
    return (
        index.extents.filter(F.col("field") == field)
        .groupBy("doc")
        .agg(F.sum(F.col("end") - F.col("begin")).cast("int").alias("length"))
    )


def field_collection_stats(index: Index, field: str) -> CollectionStats:
    """FieldStatistics for a field's lengths (AnnotateCollectionStatistics
    over ``#lengths:field``)."""
    row = field_lengths(index, field).agg(
        F.sum("length").alias("cl"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    return CollectionStats(int(row["cl"] or 0), max(int(row["n"] or 0), 1))


def _candidate_docs(node: Node, index: Index) -> DataFrame | None:
    """Docs a score-typed subtree can match (its count leaves' union)."""
    if node.operator in ("boost", "bool"):
        return compile_indicator(node.children[0], index).select("doc")
    if node.operator in ("wsum", "scale", "log", "bm25fcomb", "combine", "logprobnot"):
        frames = [
            f
            for c in node.children
            for f in [_candidate_docs(c if _is_scorer(c) or c.operator in _SCORE_SUBTREES else Node("dirichlet", {}, [c]), index)]
            if f is not None
        ]
        return reduce(DataFrame.unionByName, frames) if frames else None
    if node.operator == "prior":
        return None
    return compile_count(node.children[0], index).select("doc")


def _scorer_env(
    s: Node, i: int, cur: DataFrame, index: Index,
    fstats_cache: dict[str, CollectionStats],
):
    """Resolve a scorer's (tf column, length column, collection stats),
    honoring a ``lengths=field`` parameter (field-scoped scoring — the
    PRMS shape, PRMS2Traversal.java:160-166)."""
    f = compile_count(s.children[0], index)
    ts = node_stats(s.children[0], index)
    cur = cur.join(f.select("doc", F.col("tf").alias(f"tf_{i}")), "doc", "left")
    tf_i = F.coalesce(F.col(f"tf_{i}"), F.lit(0)).cast("double")
    field = s.get_str("lengths")
    if field:
        cur = cur.join(
            field_lengths(index, field).select(
                "doc", F.col("length").alias(f"len_{i}")
            ),
            "doc", "left",
        )
        length_col = F.coalesce(F.col(f"len_{i}"), F.lit(0)).cast("double")
        if field not in fstats_cache:
            fstats_cache[field] = field_collection_stats(index, field)
        cs = fstats_cache[field]
    else:
        length_col = F.col("length")
        cs = index.collection_stats
    return cur, tf_i, length_col, ts, cs


def _combine_general(
    scorers: list[Node], weights: list[float], index: Index
) -> DataFrame:
    prefetch_node_stats(scorers, index)
    if index.working_docs is not None:
        # WorkingSetDocumentModel: the whitelist IS the candidate set —
        # every listed doc scores (absent terms -> background mass);
        # ids without a lengths row (nonexistent docs) drop out here
        candidates = index.working_docs.join(index.lengths, "doc", "inner")
    else:
        cand_frames = [
            f for s in scorers for f in [_candidate_docs(s, index)]
            if f is not None
        ]
        if cand_frames:
            candidates = (
                reduce(DataFrame.unionByName, cand_frames)
                .distinct()
                .join(index.lengths, "doc", "inner")
            )
        else:
            # pure-prior query: every document is a candidate
            candidates = index.lengths
    cur = candidates
    fstats_cache: dict[str, CollectionStats] = {}
    exprs = []
    for i, (w, s) in enumerate(zip(weights, scorers)):
        if s.operator == "prior":
            # static document prior (DocumentPriorWriter part); missing
            # docs score the configured default (DocumentPriorReader's
            # minimumScore), default 0
            if index.priors is None:
                raise ValueError("#prior requires a priors part (build_prior_part)")
            dflt = s.get_float("default", 0.0)
            cur = cur.join(
                index.priors.select("doc", F.col("prior").alias(f"pr_{i}")),
                "doc", "left",
            )
            exprs.append(
                F.lit(w) * F.coalesce(F.col(f"pr_{i}"), F.lit(dflt))
            )
            continue
        cur, col = _score_column(s, str(i), cur, index, fstats_cache)
        exprs.append(F.lit(w) * col)
    score = reduce(lambda a, b: a + b, exprs)
    return cur.select("doc", score.alias("score"))


def _score_column(
    s: Node, tag: str, cur: DataFrame, index: Index,
    fstats_cache: dict[str, CollectionStats],
) -> tuple[DataFrame, Column]:
    """Score-typed node -> score column over the candidate frame: scorer
    leaves, #wsum mixtures, #scale (ScaleIterator.java:24-28) and #log
    (LogarithmIterator.java) score transforms."""
    if s.operator == "wsum":
        return _wsum_column(s, tag, cur, index, fstats_cache)
    if s.operator == "bm25fcomb":
        # BM25FCombinationIterator.java:24-35 — sum_i w_i*s_i/(K+s_i)*idf_i
        K = s.get_float("K", 0.5)
        weights = s.indexed_weights()
        total = None
        for j, (w, c) in enumerate(zip(weights, s.children)):
            idf = s.get_float(f"idf{j}", 1.0)
            child = c
            if not (_is_scorer(child) or child.operator in _SCORE_SUBTREES):
                child = Node("dirichlet", {}, [child])
            cur, col = _score_column(child, f"{tag}f{j}", cur, index, fstats_cache)
            part = F.lit(w) * col / (F.lit(K) + col) * F.lit(idf)
            total = part if total is None else total + part
        return cur, total
    if s.operator == "combine":
        # nested #combine as a score column (weighted sum of children)
        weights = normalize_weights(s.indexed_weights(), s.get_bool("norm", True))
        total = None
        for j, (w, c) in enumerate(zip(weights, s.children)):
            child = c
            if not (_is_scorer(child) or child.operator in _SCORE_SUBTREES):
                child = Node("dirichlet", {}, [child])
            cur, col = _score_column(child, f"{tag}c{j}", cur, index, fstats_cache)
            part = F.lit(w) * col
            total = part if total is None else total + part
        return cur, total
    if s.operator == "boost":
        # BoostingIterator.java — emits beta iff the child indicator is on
        beta = s.get_float("default", s.get_float("beta", 1.0))
        ind = compile_indicator(s.children[0], index).withColumn(
            f"on_{tag}", F.lit(True)
        )
        cur = cur.join(ind, "doc", "left")
        return cur, F.when(F.col(f"on_{tag}"), F.lit(beta)).otherwise(0.0)
    if s.operator == "bool":
        # BooleanScoreIterator.java:47-59 (#bool) — indicator as a score:
        # 1.0 on matching docs, 0.0 elsewhere (set retrieval as a ranked list)
        ind = compile_indicator(s.children[0], index).withColumn(
            f"on_{tag}", F.lit(True)
        )
        cur = cur.join(ind, "doc", "left")
        return cur, F.when(F.col(f"on_{tag}"), F.lit(1.0)).otherwise(0.0)
    if s.operator == "logprobnot":
        # LogProbNotIterator.java — log(1 - exp(p))
        child = s.children[0]
        if not (_is_scorer(child) or child.operator in _SCORE_SUBTREES):
            child = Node("dirichlet", {}, [child])
        cur, col = _score_column(child, tag + "n", cur, index, fstats_cache)
        return cur, F.log(1.0 - F.exp(col))
    if s.operator == "scale":
        factor = s.get_float("default", 1.0)
        child = s.children[0]
        if not (_is_scorer(child) or child.operator in _SCORE_SUBTREES):
            child = Node("dirichlet", {}, [child])
        cur, col = _score_column(child, tag + "s", cur, index, fstats_cache)
        return cur, F.lit(factor) * col
    if s.operator == "log":
        child = s.children[0]
        if not (_is_scorer(child) or child.operator in _SCORE_SUBTREES):
            child = Node("dirichlet", {}, [child])
        cur, col = _score_column(child, tag + "l", cur, index, fstats_cache)
        return cur, F.log(col)
    cur, tf_i, length_col, ts, cs = _scorer_env(s, tag, cur, index, fstats_cache)
    return cur, _scorer_column(s, tf_i, length_col, ts, cs)


def _wsum_column(
    node: Node, tag: int | str, cur: DataFrame, index: Index,
    fstats_cache: dict[str, CollectionStats],
) -> tuple[DataFrame, Column]:
    """#wsum as a column over an existing candidate frame:
    log(sum w_i * exp(s_i)) (WeightedSumIterator.java:57-63)."""
    weights = normalize_weights(node.indexed_weights(), node.get_bool("norm", True))
    scorers = [
        c if _is_scorer(c) else Node("dirichlet", {}, [c]) for c in node.children
    ]
    score_cols = []
    for j, (w, s) in enumerate(zip(weights, scorers)):
        cur, tf_i, length_col, ts, cs = _scorer_env(
            s, f"{tag}_{j}", cur, index, fstats_cache
        )
        score_cols.append(
            F.lit(w) * F.exp(_scorer_column(s, tf_i, length_col, ts, cs))
        )
    total = reduce(lambda a, b: a + b, score_cols)
    return cur, F.log(total)


def _execute_wsum(node: Node, index: Index) -> DataFrame:
    """Top-level #wsum query."""
    prefetch_node_stats([node], index)
    if index.working_docs is not None:
        # working-set model: the whitelist is the candidate set
        candidates = index.working_docs.join(index.lengths, "doc", "inner")
        cur, col = _wsum_column(node, "w", candidates, index, {})
        return cur.select("doc", col.alias("score"))
    cand = _candidate_docs(node, index)
    if cand is None:
        raise ValueError("#wsum needs at least one count-backed child")
    candidates = cand.distinct().join(index.lengths, "doc", "inner")
    cur, col = _wsum_column(node, "w", candidates, index, {})
    return cur.select("doc", col.alias("score"))
