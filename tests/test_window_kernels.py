"""Vectorized 2-child window kernels vs the reference match loops —
property-based equivalence on randomized position lists (the
DeltaScoreDocumentModelTest "two paths, identical results" pattern)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from galago_git_spark.functions.windows import (
    ordered2_begins_batch,
    ordered_window_extents,
    positions_to_extents,
    unordered2_begins_batch,
    unordered_window_extents,
)

positions = st.lists(
    st.integers(min_value=1, max_value=60), min_size=1, max_size=12, unique=True
).map(sorted)

rows = st.lists(st.tuples(positions, positions), min_size=1, max_size=8)

widths = st.sampled_from([-1, 1, 2, 4, 8])


def _loop_begins(p0, p1, width, fn):
    exts = fn([positions_to_extents(p0), positions_to_extents(p1)], width)
    return [b for b, _ in exts]


@given(rows, widths)
@settings(max_examples=200, deadline=None)
def test_ordered2_matches_greedy_loop(batch, width):
    got = ordered2_begins_batch(
        [r[0] for r in batch], [r[1] for r in batch], width
    )
    want = [
        _loop_begins(p0, p1, width, ordered_window_extents) for p0, p1 in batch
    ]
    assert got == want


@given(rows, widths)
@settings(max_examples=200, deadline=None)
def test_unordered2_matches_merge_loop(batch, width):
    # distinct-position precondition: drop collisions between the lists
    batch = [
        (p0, [x for x in p1 if x not in set(p0)]) for p0, p1 in batch
    ]
    batch = [(p0, p1) for p0, p1 in batch if p0 and p1]
    if not batch:
        return
    got = unordered2_begins_batch(
        [r[0] for r in batch], [r[1] for r in batch], width
    )
    want = [
        _loop_begins(p0, p1, width, unordered_window_extents)
        for p0, p1 in batch
    ]
    assert got == want


def test_empty_rows():
    assert ordered2_begins_batch([[]], [[1]], 1) == [[]]
    assert unordered2_begins_batch([[1]], [[]], 4) == [[]]


children3 = st.lists(
    st.tuples(positions, positions, positions), min_size=1, max_size=6
)


@given(children3, widths)
@settings(max_examples=150, deadline=None)
def test_orderedN_matches_greedy_loop(batch, width):
    from galago_git_spark.functions.windows import orderedN_begins_batch

    got = orderedN_begins_batch(
        [[r[c] for r in batch] for c in range(3)], width
    )
    want = [
        [
            b
            for b, _ in ordered_window_extents(
                [positions_to_extents(r[c]) for c in range(3)], width
            )
        ]
        for r in batch
    ]
    assert got == want


# --------------------------------------------------------------------------
# build-side unordered pair counting (index/window._uw_pair_stream) must
# equal the query-side kernel on arbitrary token streams — the invariant
# that makes the #uw:w part rewrite result-identical
# --------------------------------------------------------------------------

def _uw_pair_counts_buildside(toks: list[str], width: int) -> dict:
    """Reference copy of the _uw_pair_stream inner loop (one doc)."""
    cnt: dict = {}
    length = len(toks)
    for i in range(length - 1):
        t = toks[i]
        seen = {t}
        for j in range(i + 1, min(i + width, length)):
            q = toks[j]
            if q in seen:
                continue
            seen.add(q)
            key = (t, q) if t < q else (q, t)
            cnt[key] = cnt.get(key, 0) + 1
    return cnt


@settings(max_examples=200, deadline=None)
@given(
    toks=st.lists(st.sampled_from("abcde"), min_size=0, max_size=40),
    width=st.integers(min_value=2, max_value=12),
)
def test_uw_part_counts_match_query_kernel(toks, width):
    from galago_git_spark.functions.windows import unordered2_counts

    built = _uw_pair_counts_buildside(toks, width)
    pos = {}
    for p, t in enumerate(toks, start=1):  # 1-based engine positions
        pos.setdefault(t, []).append(p)
    terms = sorted(pos)
    for i, t1 in enumerate(terms):
        for t2 in terms[i + 1:]:
            want = int(
                unordered2_counts([pos[t1]], [pos[t2]], width)[0]
            )
            got = built.get((t1, t2), 0)
            assert got == want, (toks, width, t1, t2, got, want)


@settings(max_examples=150, deadline=None)
@given(
    toks=st.lists(st.sampled_from("abcdef"), min_size=0, max_size=30),
    width=st.integers(min_value=3, max_value=14),
)
def test_uw3_part_candidates_complete(toks, width):
    """The anchored-subset candidate enumeration in _uw_tuple_stream must
    find EVERY triple the n-ary kernel matches (and count identically)."""
    from itertools import combinations

    from galago_git_spark.functions.windows import (
        positions_to_extents,
        unordered_window_extents,
    )

    # rebuild the stream's per-doc logic
    pos = {}
    for p, t in enumerate(toks):
        pos.setdefault(t, []).append(p + 1)
    cands = set()
    for i in range(len(toks)):
        others = sorted({t for t in toks[i + 1 : i + width] if t != toks[i]})
        if len(others) < 2:
            continue
        for combo in combinations(others, 2):
            cands.add(tuple(sorted((toks[i],) + combo)))
    part_counts = {}
    for combo in cands:
        tf = len(unordered_window_extents(
            [positions_to_extents(pos[t]) for t in combo], width
        ))
        if tf > 0:
            part_counts[combo] = tf
    # brute force over ALL distinct triples in the doc
    terms = sorted(pos)
    for combo in combinations(terms, 3):
        tf = len(unordered_window_extents(
            [positions_to_extents(pos[t]) for t in combo], width
        ))
        assert part_counts.get(combo, 0) == tf, (toks, width, combo)
