"""Query rewrite pipeline — the rule-based logical optimizer.

Mirrors the reference's ordered traversal list
(``core/.../retrieval/FeatureFactory.java:109-134``; driver
``LocalRetrieval.java:316-325``). Each rule is a pure ``Node -> Node``
full-tree pass, applied in the reference's order. Rules the Catalyst layer
subsumes (column pruning = ExtentsToCountLeafTraversal, predicate pushdown)
are intentionally absent — Spark does them on the physical plan.
"""

from __future__ import annotations

from copy import deepcopy

from galago_git_spark.functions.wordlists import stop_structures, word_list
from galago_git_spark.query.nodes import Node, is_term_leaf, term_node

# operator aliases (FeatureFactory.java:36-108 registration names)
ALIASES = {
    "od": "ordered",
    "quote": "ordered",  # #quote == #od:1 (ImplicitFeatureCastTraversal)
    "bigram": "ordered",  # BigramIterator.java:15-20 — od restricted to width 1
    "uw": "unordered",
    "intersect": "unordered",  # width -1 => whole document
    "ubigram": "unordered",  # UnorderedWindowBigramIterator.java:19-22
    # parse-only pseudo-op from `x.(f1,f2)` (StructuredQuery.java:196);
    # the reference registers no iterator for it — containment semantics
    # match #inside, so normalize to it here
    "smoothinside": "inside",
    "bool-to-count": "booltocount",
    "syn": "synonym",
    "band": "all",
    "bor": "any",
    "bnot": "not",
    "seqdep": "sdm",
    "fdm": "fulldep",
    "linear": "jm",
    # FeatureFactory.java:105 registers PL2ScoringIterator under a second
    # name for passage contexts
    "pl2scorer": "pl2",
    "count-sum": "countsum",
    "counts-sum": "countsum",
    "log-count": "logcount",
}

SCORERS = {"bm25", "dirichlet", "jm", "pl2", "inl2", "bil2", "bm25field", "bm25rf", "logcount", "prior", "boost", "log", "scale", "bm25fcomb", "logprobnot", "bool"}
COUNT_OPS = {
    "counts", "extents", "text", "ordered", "unordered", "synonym", "mincount",
    "countsum", "inside", "null", "booltocount",
}
_DEFAULT_WINDOW = {"ordered": 1, "unordered": -1}


def _map_children(node: Node, fn) -> Node:
    node.children = [fn(c) for c in node.children]
    return node


def replace_operators(node: Node) -> Node:
    """ReplaceOperatorTraversal.java — operator aliasing."""
    _map_children(node, replace_operators)
    op = ALIASES.get(node.operator, node.operator)
    n = Node(op, dict(node.parameters), node.children)
    if node.operator == "quote":
        n.parameters["default"] = 1
    if node.operator == "intersect":
        n.parameters["default"] = -1
    if op in _DEFAULT_WINDOW and "default" not in n.parameters:
        n.parameters["default"] = _DEFAULT_WINDOW[op]
    return n


def transform_root(node: Node) -> Node:
    """TransformRootTraversal.java — the parser's #root becomes #combine."""
    if node.operator == "root":
        return Node("combine", dict(node.parameters), node.children)
    return node


def _is_text_leaf(n: Node) -> bool:
    return n.operator in ("text", "counts", "extents") and not n.children


def stopstructure_traversal(node: Node) -> Node:
    """StopStructureTraversal.java:44-110 — ``#stopstructure(...)`` ->
    ``#combine(...)`` with the longest matching stop-structure prefix
    ("why is", "tell me about", ...) stripped from the leading text leaves.
    Runs before stopword removal (sTraversalList order,
    FeatureFactory.java:112-113)."""
    _map_children(node, stopstructure_traversal)
    if node.operator != "stopstructure":
        return node
    head = Node("combine", dict(node.parameters), node.children)
    # descend single-child chains to the first text-leaf array
    parent = head
    while len(parent.children) == 1 and not _is_text_leaf(parent.children[0]):
        parent = parent.children[0]
    if not (parent.children and _is_text_leaf(parent.children[0])):
        return head
    if not all(_is_text_leaf(c) for c in parent.children):
        return head
    qstring = " ".join(str(c.default_param) for c in parent.children) + " "
    longest = ""
    for ss in stop_structures():
        if len(ss) > len(longest) and qstring.startswith(ss):
            longest = ss
    if longest:
        rest = qstring[len(longest):].strip()
        parent.children = [term_node(t) for t in rest.split(" ") if t]
    return head


def stopword_traversal(node: Node, stopwords: frozenset[str] | None = None) -> Node:
    """StopWordTraversal.java:47-82 — ``#stopword(...)``/``#ss(...)`` ->
    ``#combine(...)`` with stopword text leaves removed recursively
    (default list: the packaged ``inquery`` resource)."""
    _map_children(node, lambda c: stopword_traversal(c, stopwords))
    if node.operator not in ("stopword", "ss"):
        return node
    words = word_list("inquery") if stopwords is None else stopwords
    head = Node("combine", dict(node.parameters), node.children)
    _remove_stopword_leaves(head, words)
    return head


def _remove_stopword_leaves(node: Node, words: frozenset[str]) -> None:
    kept = []
    for c in node.children:
        if _is_text_leaf(c):
            if str(c.default_param) not in words:
                kept.append(c)
        else:
            _remove_stopword_leaves(c, words)
            kept.append(c)
    node.children = kept


def sdm_traversal(node: Node) -> Node:
    """SequentialDependenceTraversal.java:87-155 — #sdm(t1..tn) ->
    #combine:0=uniw:1=odw:2=uww( #combine(unigrams)
    #combine(#od:1 pairs) #combine(#uw:windowLimit*? pairs) ).

    Defaults: uniw=0.8, odw=0.15, uww=0.05, od width=1, uw width=4*2=8
    (uw width = 4 * number-of-terms-in-window, windowLimit=2).
    """
    _map_children(node, sdm_traversal)
    if node.operator != "sdm":
        return node
    terms = node.children
    uniw = node.get_float("uniw", 0.8)
    odw = node.get_float("odw", 0.15)
    uww = node.get_float("uww", 0.05)
    od_width = node.get_int("od.width", 1)
    uw_width = node.get_int("uw.width", 8)
    unigrams = Node("combine", {}, [deepcopy(t) for t in terms])
    if len(terms) == 1:
        return unigrams
    ods = [
        Node("ordered", {"default": od_width}, [deepcopy(terms[i]), deepcopy(terms[i + 1])])
        for i in range(len(terms) - 1)
    ]
    uws = [
        Node("unordered", {"default": uw_width}, [deepcopy(terms[i]), deepcopy(terms[i + 1])])
        for i in range(len(terms) - 1)
    ]
    return Node(
        "combine",
        {"0": uniw, "1": odw, "2": uww},
        [unigrams, Node("combine", {}, ods), Node("combine", {}, uws)],
    )


def fulldep_traversal(node: Node) -> Node:
    """FullDependenceTraversal.java — #fulldep(t1..tn) ->
    #combine:0=uniw:1=odw:2=uww( #combine(unigrams)
    #combine(#od:1 over every ordered subsequence of 2..windowLimit terms)
    #combine(#uw:4*|S| over the same subsequences) ).

    Defaults mirror the reference: uniw=0.8, odw=0.15, uww=0.05,
    windowLimit=3 (subsets of adjacent-or-not terms, order preserved)."""
    _map_children(node, fulldep_traversal)
    if node.operator != "fulldep":
        return node
    terms = node.children
    uniw = node.get_float("uniw", 0.8)
    odw = node.get_float("odw", 0.15)
    uww = node.get_float("uww", 0.05)
    limit = node.get_int("windowLimit", 3)
    unigrams = Node("combine", {}, [deepcopy(t) for t in terms])
    if len(terms) == 1:
        return unigrams

    # every order-preserving subsequence of size 2..limit
    subseqs: list[list[Node]] = []

    def gen(start: int, cur: list[int]) -> None:
        if 2 <= len(cur) <= limit:
            subseqs.append([deepcopy(terms[i]) for i in cur])
        if len(cur) >= limit:
            return
        for j in range(start, len(terms)):
            gen(j + 1, cur + [j])

    gen(0, [])
    ods = [Node("ordered", {"default": 1}, s) for s in subseqs]
    uws = [
        Node("unordered", {"default": 4 * len(s)}, [deepcopy(c) for c in s])
        for s in subseqs
    ]
    return Node(
        "combine",
        {"0": uniw, "1": odw, "2": uww},
        [unigrams, Node("combine", {}, ods), Node("combine", {}, uws)],
    )


FIELD_COMPARISONS = ("greater", "less", "between", "equals")


def field_comparison_rewrite(node: Node) -> Node:
    """ImplicitFeatureCastTraversal.java:59-81 — a field comparison's
    value children move into positional parameters and its first child
    becomes a #field node:
    ``#between(n_chars 150 300)`` -> ``#between:0=150:1=300(#field:n_chars())``.
    """
    _map_children(node, field_comparison_rewrite)
    if node.operator not in FIELD_COMPARISONS or not node.children:
        return node
    first = node.children[0]
    if first.operator != "field":
        first = Node("field", {"default": first.default_param})
    params = dict(node.parameters)
    for pos, c in enumerate(node.children[1:]):
        params[str(pos)] = c.default_param
    return Node(node.operator, params, [first])


def pdfr_traversal(node: Node) -> Node:
    """ProximityDFRTraversal.java:45-128 — ``#pdfr(t1..tn)`` ->
    ``#combine:norm=false:0=tw:1=1-tw( #combine(term-model terms)
    #combine(prox-model windows) )`` with PL2 terms (c) and BiL2
    proximity scorers (cp) over #od:windowSize bigrams (sequential,
    default) or #uw pairs (pdfrSeq=false)."""
    _map_children(node, pdfr_traversal)
    if node.operator != "pdfr":
        return node
    seq = node.get_bool("pdfrSeq", True)
    tw = node.get_float("termLambda", 1.0)
    c = node.get_float("c", 6.0)
    cp = node.get_float("cp", 0.05)
    term_model = node.get_str("pdfrTerm", "pl2")
    prox_model = node.get_str("pdfrProx", "bil2")
    width = node.get_int("windowSize", 5)
    terms = node.children
    unigrams = Node(
        "combine", {},
        [Node(term_model, {"c": c}, [deepcopy(t)]) for t in terms],
    )
    if len(terms) == 1:
        return Node("combine", {"norm": False, "0": tw}, [unigrams])
    if seq:
        windows = [
            Node("ordered", {"default": width},
                 [deepcopy(terms[i]), deepcopy(terms[i + 1])])
            for i in range(len(terms) - 1)
        ]
    else:
        windows = [
            Node("unordered", {"default": width},
                 [deepcopy(terms[i]), deepcopy(terms[j])])
            for i in range(len(terms))
            for j in range(i + 1, len(terms))
        ]
    prox = Node(
        "combine", {},
        [Node(prox_model, {"c": cp}, [w]) for w in windows],
    )
    return Node(
        "combine", {"norm": False, "0": tw, "1": 1.0 - tw},
        [unigrams, prox],
    )


def implicit_feature_cast(node: Node, default_scorer: str = "dirichlet") -> Node:
    """ImplicitFeatureCastTraversal.java:94-134 — count-typed children of
    score-typed operators get wrapped in the default scorer."""
    scorer = node.get_str("scorer", default_scorer)
    _map_children(node, lambda c: implicit_feature_cast(c, scorer))
    if node.operator in ("combine", "wsum", "rm"):
        new_children = []
        for c in node.children:
            if c.operator in COUNT_OPS:
                new_children.append(Node(scorer, {}, [c]))
            else:
                new_children.append(c)
        node.children = new_children
    return node


def flatten_combine(node: Node) -> Node:
    """FlattenCombineTraversal.java:38-80 — nested #combine flattened;
    child weights scale by the (normalized) parent weight."""
    _map_children(node, flatten_combine)
    if node.operator != "combine":
        return node
    if not any(c.operator == "combine" for c in node.children):
        return node
    parent_w = node.indexed_weights()
    norm = node.get_bool("norm", True)
    if norm and sum(parent_w) > 0:
        parent_w = [w / sum(parent_w) for w in parent_w]
    new_children: list[Node] = []
    new_weights: list[float] = []
    for w, c in zip(parent_w, node.children):
        if c.operator == "combine":
            child_w = c.indexed_weights()
            if c.get_bool("norm", True) and sum(child_w) > 0:
                child_w = [x / sum(child_w) for x in child_w]
            for cw, cc in zip(child_w, c.children):
                new_children.append(cc)
                new_weights.append(w * cw)
        else:
            new_children.append(c)
            new_weights.append(w)
    params: dict = {str(i): w for i, w in enumerate(new_weights)}
    params["norm"] = False  # weights are already normalized products
    return Node("combine", params, new_children)


def merge_combine_children(node: Node) -> Node:
    """MergeCombineChildrenTraversal.java:33-66 — duplicate children of
    #combine merged, weights summed (works on the node string key, the
    same CSE key Galago uses)."""
    _map_children(node, merge_combine_children)
    if node.operator != "combine":
        return node
    weights = node.indexed_weights()
    seen: dict[str, int] = {}
    new_children: list[Node] = []
    new_weights: list[float] = []
    for w, c in zip(weights, node.children):
        key = str(c)
        if key in seen:
            new_weights[seen[key]] += w
        else:
            seen[key] = len(new_children)
            new_children.append(c)
            new_weights.append(w)
    if len(new_children) == len(node.children):
        return node
    params: dict = {str(i): w for i, w in enumerate(new_weights)}
    if "norm" in node.parameters:
        params["norm"] = node.parameters["norm"]
    return Node("combine", params, new_children)


def flatten_window(node: Node) -> Node:
    """FlattenWindowTraversal.java — single-child window ops collapse."""
    _map_children(node, flatten_window)
    if node.operator in ("ordered", "unordered") and len(node.children) == 1:
        return node.children[0]
    return node


PIPELINE = [
    replace_operators,
    stopstructure_traversal,
    stopword_traversal,
    transform_root,
    sdm_traversal,
    fulldep_traversal,
    pdfr_traversal,
    flatten_window,
    field_comparison_rewrite,
    implicit_feature_cast,
    flatten_combine,
    merge_combine_children,
]


def user_replace_operators(node: Node, op_repls: dict) -> Node:
    """User-configured operator replacement — the ``opRepls`` parameter of
    ``ReplaceOperatorTraversal.java:15-22``: a value may be a single
    operator name (``{"dummy": "sdm"}`` → ``#dummy(..)`` becomes
    ``#sdm(..)``) or a list (``{"dummy": ["stopword", "combine"]}`` →
    nested wrapping ``#stopword(#combine(..))``, parameters kept on the
    innermost node). Applied before the static alias pass, like the
    reference runs ReplaceOperatorTraversal first in the pipeline."""
    _map_children(node, lambda c: user_replace_operators(c, op_repls))
    repl = op_repls.get(node.operator)
    if repl is None:
        return node
    names = [repl] if isinstance(repl, str) else list(repl)
    out = Node(names[-1], dict(node.parameters), node.children)
    for name in reversed(names[:-1]):
        out = Node(name, {}, [out])
    return out


def transform(
    node: Node,
    default_scorer: str = "dirichlet",
    op_repls: dict | None = None,
) -> Node:
    """Run the full rewrite pipeline (LocalRetrieval.transformQuery analog).

    ``default_scorer`` is the engine-level default (the analog of the
    reference's ``scorer=`` query parameter consumed by
    ImplicitFeatureCastTraversal); an explicit ``scorer=`` parameter on
    the query root still wins.

    Statistics annotation (AnnotateCollectionStatistics) and the
    delta-readiness check happen in the executor, which holds the index
    handle — the stats *source* is identical (lengths-part field stats +
    per-term node stats)."""
    out = deepcopy(node)
    if op_repls:
        out = user_replace_operators(out, op_repls)
    for rule in PIPELINE:
        if rule is implicit_feature_cast:
            out = implicit_feature_cast(out, default_scorer)
        else:
            out = rule(out)
    return out
