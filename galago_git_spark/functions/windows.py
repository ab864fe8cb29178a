"""Positional window matching — exact ports of Galago's extent-conjunction
match loops, used by both the Spark pandas-UDF operators and the
pure-Python golden scorer (one source of truth).

A term occurrence at token position ``p`` is the extent ``(p, p+1)``;
window operators consume per-doc extent lists sorted by begin.

- :func:`ordered_window_extents` — OrderedWindowIterator.loadExtentsCommon
  (``core/.../retrieval/iterator/OrderedWindowIterator.java:25-85``):
  greedy left-to-right; child i must start after child i-1 ends with gap
  ``begin_i - end_{i-1} < width`` (width -1 = unbounded).
- :func:`unordered_window_extents` — UnorderedWindowIterator
  (``UnorderedWindowIterator.java:28-82``): any order; the min span
  covering one extent of each child must satisfy ``max_end - min_begin
  <= width`` (width -1 = whole document, i.e. #intersect).

These are per-document loops over tiny arrays (a doc's occurrences of the
query terms) inside Arrow-batched UDFs — the batch-level vectorization is
the doc dimension, matching how Galago amortizes: one loadExtents per
matching doc.
"""

from __future__ import annotations


def positions_to_extents(positions: list[int]) -> list[tuple[int, int]]:
    return [(p, p + 1) for p in positions]


def ordered_window_extents(
    children: list[list[tuple[int, int]]], width: int
) -> list[tuple[int, int]]:
    """Exact OrderedWindowIterator greedy loop. ``children`` is one
    begin-sorted extent list per child; returns matched window extents."""
    if any(not c for c in children):
        return []
    idx = [0] * len(children)
    out: list[tuple[int, int]] = []
    not_done = True
    while not_done:
        invalid = False
        begin = children[0][idx[0]][0]
        for i in range(1, len(children)):
            prev_end = children[i - 1][idx[i - 1]][1]
            while prev_end > children[i][idx[i]][0]:
                idx[i] += 1
                if idx[i] >= len(children[i]):
                    return out
            if width == -1:
                continue
            if children[i][idx[i]][0] - prev_end >= width:
                invalid = True
                break
        end = children[-1][idx[-1]][1]
        if not invalid:
            out.append((begin, end))
        idx[0] += 1
        not_done = idx[0] < len(children[0])
    return out


def unordered_window_extents(
    children: list[list[tuple[int, int]]], width: int
) -> list[tuple[int, int]]:
    """Exact UnorderedWindowIterator loop."""
    if any(not c for c in children):
        return []
    idx = [0] * len(children)
    out: list[tuple[int, int]] = []
    min_begin = min(c[0][0] for c in children)
    max_end = max(c[0][1] for c in children)
    while True:
        if width == -1 or (max_end - min_begin <= width):
            out.append((min_begin, max_end))
        for i, c in enumerate(children):
            if c[idx[i]][0] == min_begin:
                idx[i] += 1
                if idx[i] >= len(c):
                    return out
        min_begin = min(c[idx[i]][0] for i, c in enumerate(children))
        max_end = max(c[idx[i]][1] for i, c in enumerate(children))
