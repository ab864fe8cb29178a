"""Pure-Python golden engine — single-node reference implementation of
Galago's scoring semantics, used as the regression oracle
(the sandbox stand-in for running the Java ``galago batch-search``).

Evaluates the same transformed ``Node`` AST as the Spark executor, over
plain-Python posting structures, with document-at-a-time semantics:
candidates = union of matching docs, every scorer evaluated per candidate
(tf=0 when absent — the Dirichlet background), weighted per #combine,
tie-break score desc then doc asc (ScoredDocument.java:41-52).

Tests assert Spark executor output == this engine's output to 1e-6 on the
ten-doc and synthetic corpora, and both against the reference's published
golden constants on the micro fixture (LocalRetrievalTest.java:237-243).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from galago_git_spark.functions.tokenize import tokenize_py
from galago_git_spark.functions.windows import (
    ordered_window_extents,
    positions_to_extents,
    unordered_window_extents,
)
from galago_git_spark.query.nodes import Node
from galago_git_spark.query.parser import parse
from galago_git_spark.query.scoring import (
    BM25_B,
    BM25_K,
    DIRICHLET_MU,
    JM_LAMBDA,
    CollectionStats,
    normalize_weights,
)
from galago_git_spark.query.traversals import transform


@dataclass
class GoldenIndex:
    """postings: term -> {doc: [positions]}; lengths: doc -> length."""

    postings: dict[str, dict[int, list[int]]]
    lengths: dict[int, int]
    stats: CollectionStats = field(default=None)  # type: ignore[assignment]

    def __post_init__(self) -> None:
        if self.stats is None:
            cl = sum(self.lengths.values())
            self.stats = CollectionStats(cl, len(self.lengths))

    @classmethod
    def from_texts(cls, texts: dict[int, str]) -> "GoldenIndex":
        postings: dict[str, dict[int, list[int]]] = {}
        lengths: dict[int, int] = {}
        for doc, text in texts.items():
            terms = tokenize_py(text)
            lengths[doc] = len(terms)
            for pos, t in enumerate(terms, start=1):
                postings.setdefault(t, {}).setdefault(doc, []).append(pos)
        return cls(postings, lengths)

    def term_cf(self, term: str) -> int:
        return sum(len(v) for v in self.postings.get(term, {}).values())

    def term_df(self, term: str) -> int:
        return len(self.postings.get(term, {}))


def eval_count(node: Node, gi: GoldenIndex) -> dict[int, list[int]]:
    """Count plane: doc -> positions (window begins for window ops)."""
    op = node.operator
    if op in ("counts", "extents", "text"):
        return {d: list(p) for d, p in gi.postings.get(str(node.default_param), {}).items()}
    if op == "null":
        return {}
    if op in ("ordered", "unordered"):
        width = int(node.get_int("default", 1 if op == "ordered" else -1))
        children = [eval_count(c, gi) for c in node.children]
        docs = set(children[0])
        for c in children[1:]:
            docs &= set(c)
        fn = ordered_window_extents if op == "ordered" else unordered_window_extents
        out = {}
        for d in docs:
            exts = fn([positions_to_extents(c[d]) for c in children], width)
            if exts:
                out[d] = [b for b, _ in exts]
        return out
    if op == "synonym":
        out: dict[int, list[int]] = {}
        for c in node.children:
            for d, p in eval_count(c, gi).items():
                out.setdefault(d, []).extend(p)
        return {d: sorted(p) for d, p in out.items()}
    if op == "mincount":
        children = [eval_count(c, gi) for c in node.children]
        docs = set(children[0])
        for c in children[1:]:
            docs &= set(c)
        # tf = min of child counts; positions unknowable -> synthesize 1..tf
        return {d: list(range(1, min(len(c[d]) for c in children) + 1)) for d in docs}
    if op == "countsum":
        out = {}
        for c in node.children:
            for d, p in eval_count(c, gi).items():
                out[d] = out.get(d, 0) + len(p)
        return {d: list(range(1, n + 1)) for d, n in out.items()}
    if op == "require":
        keep = set(eval_count(node.children[0], gi))
        return {d: p for d, p in eval_count(node.children[1], gi).items() if d in keep}
    if op == "reject":
        drop = set(eval_count(node.children[0], gi))
        return {d: p for d, p in eval_count(node.children[1], gi).items() if d not in drop}
    raise ValueError(f"golden: unsupported count op #{op}")


def _score_one(node: Node, tf: int, length: int, cf: int, df: int,
               cs: CollectionStats) -> float:
    op = node.operator
    if op == "bm25":
        b = node.get_float("b", BM25_B)
        k = node.get_float("k", BM25_K)
        idf = math.log(cs.document_count / (df + 0.5))
        return idf * (tf * (k + 1)) / (tf + k * (1 - b + b * length / cs.avg_doc_length))
    if op == "dirichlet":
        mu = node.get_float("mu", DIRICHLET_MU)
        bg = (cf if cf > 0 else 0.5) / cs.collection_length
        return math.log((tf + mu * bg) / (length + mu))
    if op == "jm":
        lam = node.get_float("lambda", JM_LAMBDA)
        bg = (cf if cf > 0 else 0.5) / cs.collection_length
        return math.log(lam * tf / length + (1 - lam) * bg)
    raise ValueError(f"golden: unsupported scorer #{op}")


def rank(query: str | Node, gi: GoldenIndex, k: int = 10,
         default_scorer: str = "dirichlet") -> list[tuple[int, float]]:
    """Top-k (doc, score) — the batch-search analog."""
    node = transform(parse(query)) if isinstance(query, str) else transform(query)
    if node.operator != "combine":
        node = Node("combine", {}, [node])
    scorers = [
        c if c.operator in ("bm25", "dirichlet", "jm")
        else Node(default_scorer, {}, [c])
        for c in node.children
    ]
    weights = normalize_weights(node.indexed_weights(), node.get_bool("norm", True))
    counts = [eval_count(s.children[0], gi) for s in scorers]
    stats = []
    for s, c in zip(scorers, counts):
        child = s.children[0]
        if child.operator in ("counts", "extents", "text"):
            term = str(child.default_param)
            stats.append((gi.term_cf(term), gi.term_df(term)))
        else:
            stats.append((sum(len(p) for p in c.values()), len(c)))
    candidates = set()
    for c in counts:
        candidates |= set(c)
    results = []
    for d in candidates:
        length = gi.lengths[d]
        total = 0.0
        for w, s, c, (cf, df) in zip(weights, scorers, counts, stats):
            tf = len(c.get(d, ()))
            total += w * _score_one(s, tf, length, cf, df, gi.stats)
        results.append((d, total))
    results.sort(key=lambda x: (-x[1], x[0]))
    return results[:k]
