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

import numpy as np


def positions_to_extents(positions: list[int]) -> list[tuple[int, int]]:
    return [(p, p + 1) for p in positions]


def _flatten_rows(rows) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batch of per-row position lists -> (values, row-of-value, row starts)."""
    lens = np.fromiter((len(x) for x in rows), dtype=np.int64, count=len(rows))
    starts = np.zeros(len(rows) + 1, dtype=np.int64)
    np.cumsum(lens, out=starts[1:])
    if starts[-1] == 0:
        vals = np.empty(0, dtype=np.int64)
    else:
        vals = np.concatenate([np.asarray(x, dtype=np.int64) for x in rows])
    row_of = np.repeat(np.arange(len(rows), dtype=np.int64), lens)
    return vals, row_of, starts


def _split_begins(
    begins: np.ndarray, rows: np.ndarray, n_rows: int
) -> list[list[int]]:
    counts = np.bincount(rows, minlength=n_rows)
    return [b.tolist() for b in np.split(begins, np.cumsum(counts)[:-1])]


def ordered2_begins_batch(rows0, rows1, width: int) -> list[list[int]]:
    """Vectorized 2-child #od over unit (term) extents — an entire Arrow
    batch of docs in one numpy pass (no per-row Python loop). For each
    occurrence ``a`` of child 0, the greedy loop's shared pointer lands on
    the first child-1 occurrence with ``begin >= a+1`` (ends are monotone
    for unit extents), which is a searchsorted; the match test is
    ``b - (a+1) < width`` (OrderedWindowIterator.java:25-85). Result-
    identical to :func:`ordered_window_extents` begins (tested)."""
    n_rows = len(rows0)
    A, rowA, _ = _flatten_rows(rows0)
    B, rowB, startsB = _flatten_rows(rows1)
    if len(A) == 0 or len(B) == 0:
        return [[] for _ in range(n_rows)]
    # row-block keys: rows are disjoint ranges in one sorted array
    K = int(max(A.max(), B.max())) + 2
    j = np.searchsorted(B + rowB * K, (A + 1) + rowA * K, side="left")
    end_of_row = startsB[rowA + 1]
    valid = j < end_of_row
    jj = np.minimum(j, len(B) - 1)
    if width != -1:
        valid &= (B[jj] - (A + 1)) < width
    return _split_begins(A[valid], rowA[valid], n_rows)


def unordered2_begins_batch(rows0, rows1, width: int) -> list[list[int]]:
    """Vectorized 2-child #uw over unit extents of DISTINCT terms (begins
    never collide across children). The reference merge
    (UnorderedWindowIterator.java:28-82) emits one frontier window per
    consumed element: when ``a`` is the min, the current partner is the
    first ``b > a`` (both searchsorted); span ``partner+1-min <= width``.
    Result-identical to :func:`unordered_window_extents` begins for
    distinct-position inputs (tested)."""
    n_rows = len(rows0)
    A, rowA, startsA = _flatten_rows(rows0)
    B, rowB, startsB = _flatten_rows(rows1)
    if len(A) == 0 or len(B) == 0:
        return [[] for _ in range(n_rows)]
    K = int(max(A.max(), B.max())) + 2
    Ak, Bk = A + rowA * K, B + rowB * K
    ja = np.searchsorted(Bk, Ak, side="right")
    va = ja < startsB[rowA + 1]
    jja = np.minimum(ja, len(B) - 1)
    ib = np.searchsorted(Ak, Bk, side="right")
    vb = ib < startsA[rowB + 1]
    iib = np.minimum(ib, len(A) - 1)
    if width != -1:
        va &= (B[jja] + 1 - A) <= width
        vb &= (A[iib] + 1 - B) <= width
    begins = np.concatenate([A[va], B[vb]])
    rows = np.concatenate([rowA[va], rowB[vb]])
    order = np.lexsort((begins, rows))
    return _split_begins(begins[order], rows[order], n_rows)


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


def ordered2_counts(rows0, rows1, width: int) -> np.ndarray:
    """Per-row match COUNTS for the 2-child #od kernel (tf of the window
    node) — same validity mask as :func:`ordered2_begins_batch` without
    materializing begins lists."""
    n_rows = len(rows0)
    A, rowA, _ = _flatten_rows(rows0)
    B, rowB, startsB = _flatten_rows(rows1)
    if len(A) == 0 or len(B) == 0:
        return np.zeros(n_rows, dtype=np.int64)
    K = int(max(A.max(), B.max())) + 2
    j = np.searchsorted(B + rowB * K, (A + 1) + rowA * K, side="left")
    valid = j < startsB[rowA + 1]
    jj = np.minimum(j, len(B) - 1)
    if width != -1:
        valid &= (B[jj] - (A + 1)) < width
    return np.bincount(rowA[valid], minlength=n_rows)


def unordered2_counts(rows0, rows1, width: int) -> np.ndarray:
    """Per-row match counts for the 2-child #uw kernel over distinct-term
    unit extents — see :func:`unordered2_begins_batch`."""
    n_rows = len(rows0)
    A, rowA, startsA = _flatten_rows(rows0)
    B, rowB, startsB = _flatten_rows(rows1)
    if len(A) == 0 or len(B) == 0:
        return np.zeros(n_rows, dtype=np.int64)
    K = int(max(A.max(), B.max())) + 2
    Ak, Bk = A + rowA * K, B + rowB * K
    ja = np.searchsorted(Bk, Ak, side="right")
    va = ja < startsB[rowA + 1]
    jja = np.minimum(ja, len(B) - 1)
    ib = np.searchsorted(Ak, Bk, side="right")
    vb = ib < startsA[rowB + 1]
    iib = np.minimum(ib, len(A) - 1)
    if width != -1:
        va &= (B[jja] + 1 - A) <= width
        vb &= (A[iib] + 1 - B) <= width
    return np.bincount(rowA[va], minlength=n_rows) + np.bincount(
        rowB[vb], minlength=n_rows
    )


def orderedN_begins_batch(rows_list, width: int) -> list[list[int]]:
    """Vectorized n-child #od over unit extents — the 2-child searchsorted
    kernel generalized to a CHAIN of searchsorteds (one per adjacent child
    pair). The greedy loop's shared pointers are value-determined for
    monotone unit-extent ends, so child c's pointer for occurrence ``a``
    is ``searchsorted(C_c, prev_end)``; a lane dies when any link
    exhausts its row (the loop's early return — later lanes exhaust too,
    monotone) or violates the gap test. Result-identical to
    :func:`ordered_window_extents` begins (hypothesis-tested)."""
    n_rows = len(rows_list[0])
    A0, row0, _ = _flatten_rows(rows_list[0])
    if len(A0) == 0:
        return [[] for _ in range(n_rows)]
    flat = [_flatten_rows(r) for r in rows_list[1:]]
    if any(len(v) == 0 for v, _, _ in flat):
        return [[] for _ in range(n_rows)]
    K = int(max([A0.max()] + [v.max() for v, _, _ in flat])) + 2
    valid = np.ones(len(A0), dtype=bool)
    prev_end = A0 + 1
    for C, rowC, startsC in flat:
        j = np.searchsorted(C + rowC * K, prev_end + row0 * K, side="left")
        ok = j < startsC[row0 + 1]
        jj = np.minimum(j, len(C) - 1)
        if width != -1:
            ok &= (C[jj] - prev_end) < width
        valid &= ok
        prev_end = C[jj] + 1
    return _split_begins(A0[valid], row0[valid], n_rows)
