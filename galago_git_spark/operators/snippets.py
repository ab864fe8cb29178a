"""Snippet generation — the SnippetGenerator analog
(``core/.../index/corpus/SnippetGenerator.java:20-160``): match regions of
half-width 5 around query-term occurrences, overlapping/nearby regions
merged, candidate snippets scored by

    -1.2^min(0, total_words - 150) + sum_r 2^|matches_r| + |distinct terms|^2

(big discounted, coverage and proximity rewarded — cacheScore,
SnippetGenerator.java:139-158), regions dropped greedily while the
snippet exceeds the word budget. Highlighting wraps matched tokens in
``<strong>``. Stemming is identity (north rule); the reference stems with
Krovetz.

The per-doc routine is pure Python over one doc's tokens (tiny); the
DataFrame wrapper runs it as an Arrow-batched UDF over result sets —
snippets are generated for top-k result pages, never at corpus scale.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from galago_git_spark.functions.tokenize import tokenize_py

WIDTH = 5  # SnippetGenerator.width
MAX_WORDS = 150


@dataclass
class Region:
    start: int
    end: int
    matches: list[tuple[str, int]] = field(default_factory=list)

    def size(self) -> int:
        return self.end - self.start


def _merge_regions(regions: list[Region], distance: int) -> list[Region]:
    """Left-to-right merge of overlapping-or-within(distance) regions
    (SnippetRegion.overlap/within/merge)."""
    if not regions:
        return []
    out = [regions[0]]
    for r in regions[1:]:
        prev = out[-1]
        if r.start <= prev.end + distance:
            prev.end = max(prev.end, r.end)
            prev.matches.extend(r.matches)
        else:
            out.append(r)
    return out


def _score(regions: list[Region]) -> float:
    wl = sum(r.size() for r in regions)
    prox = sum(2.0 ** len(r.matches) for r in regions)
    words = {t for r in regions for t, _ in r.matches}
    return -(1.2 ** min(0, wl - MAX_WORDS)) + prox + len(words) ** 2


def best_snippet(
    text: str,
    terms: list[str],
    width: int = WIDTH,
    max_words: int = MAX_WORDS,
) -> str:
    """Best highlighted snippet of ``text`` for the query ``terms``."""
    toks = tokenize_py(text or "")
    tset = set(terms)
    n = len(toks)
    regions = [
        Region(max(0, i - width), min(n, i + width + 1), [(t, i)])
        for i, t in enumerate(toks)
        if t in tset
    ]
    if not regions:
        return " ".join(toks[: 2 * width + 1])
    regions = _merge_regions(regions, distance=width)
    # greedy shrink: drop the region whose removal costs the least score
    # while the snippet is over budget (the feasible core of
    # Snippet.expand's deletion moves)
    while len(regions) > 1 and sum(r.size() for r in regions) > max_words:
        best_i, best_s = 0, -float("inf")
        for i in range(len(regions)):
            cand = regions[:i] + regions[i + 1:]
            s = _score(cand)
            if s > best_s:
                best_i, best_s = i, s
        regions.pop(best_i)
    match_pos = {i for r in regions for _, i in r.matches}
    parts = []
    for r in regions:
        words = [
            f"<strong>{toks[i]}</strong>" if i in match_pos else toks[i]
            for i in range(r.start, r.end)
        ]
        parts.append(" ".join(words))
    pre = "..." if regions[0].start > 0 else ""
    post = "..." if regions[-1].end < n else ""
    return pre + "...".join(parts) + post


def snippets_frame(
    docs: DataFrame,
    terms: list[str],
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc, snippet) over a result-page-sized docs frame."""
    tlist = list(terms)

    @F.pandas_udf(T.StringType())
    def snip(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: best_snippet(t, tlist))

    return docs.select(
        F.col(doc_col).alias("doc"), snip(F.col(text_col)).alias("snippet")
    )
