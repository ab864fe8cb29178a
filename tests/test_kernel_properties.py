"""Adversarial + property tests for the block-max pruning kernels.

The pruning kernels (``query/wand.py``) must return the same top-k as a
brute-force scorer for EVERY input, with no overfetch cushion — an unsound
segment upper bound shows up here as a pruned-away true winner (the round-2
``#sdm`` bound bug: ``min(maxtf_i, maxtf_j)`` under-bounds ``#uw`` counts,
which can reach ``tf_i + tf_j`` per UnorderedWindowIterator.java:28-82, and
``#od`` counts for width > 1, where one later-child occurrence serves many
firsts, OrderedWindowIterator.java:25-85).

Kernels are pure pandas -> pandas functions, so everything here runs
without Spark: blocks are encoded with the real codec and fed directly.
Brute-force window tfs use the exact extent-loop ports
(``functions/windows.py``) — an independent implementation from the
searchsorted batch kernels the WAND path uses, so this doubles as
cross-validation of the two.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from galago_git_spark.functions.windows import (
    ordered_window_extents,
    positions_to_extents,
    unordered_window_extents,
)
from galago_git_spark.index.codec import (
    encode_doc_block,
    encode_positions_block,
    vbyte_encode,
)
from galago_git_spark.query.scoring import BM25_B, BM25_K, bm25_idf
from galago_git_spark.query.wand import (
    _bucket_kernel,
    _sdm_bucket_kernel,
    _sdm_scorer_plan,
)


def _blocks_frame(
    postings: dict[str, list[tuple[int, int, list[int]]]],
    lengths: dict[int, int],
    block_size: int,
    with_pos: bool,
) -> pd.DataFrame:
    """Encode ``term -> [(doc, tf, positions)]`` into the packed-layer block
    schema with the real codec, cutting each term's list every
    ``block_size`` postings (so small sizes force many segments)."""
    avgdl = sum(lengths.values()) / len(lengths)
    rows = []
    for term in sorted(postings):
        plist = sorted(postings[term])
        for s in range(0, len(plist), block_size):
            chunk = plist[s : s + block_size]
            docs = np.array([d for d, _, _ in chunk], dtype=np.uint64)
            tfs = np.array([tf for _, tf, _ in chunk], dtype=np.uint64)
            tfns = [
                tf * (BM25_K + 1)
                / (tf + BM25_K * (1 - BM25_B + BM25_B * lengths[d] / avgdl))
                for d, tf, _ in chunk
            ]
            if with_pos:
                flat = np.array(
                    [p for _, _, pos in chunk for p in pos], dtype=np.uint64
                )
                pos_buf = encode_positions_block(flat, tfs.astype(np.int64))
            else:
                pos_buf = b""
            rows.append(
                {
                    "term": term,
                    "bucket": 0,
                    "first_doc": int(docs[0]),
                    "last_doc": int(docs[-1]),
                    "n": len(chunk),
                    "max_tf": int(tfs.max()),
                    "max_tfn": float(max(tfns)),
                    "docs": encode_doc_block(docs),
                    "tfs": vbyte_encode(tfs),
                    "pos": pos_buf,
                }
            )
    return pd.DataFrame(rows)


def _lengths_frame(lengths: dict[int, int]) -> pd.DataFrame:
    docs = sorted(lengths)
    return pd.DataFrame(
        {"doc": docs, "length": [lengths[d] for d in docs], "bucket": 0}
    )


def _assert_valid_topk(got: pd.DataFrame, brute: list[tuple[int, float]], k: int):
    """``got`` must be a correct top-k of ``brute`` modulo 1e-9 float ties
    (kernel and brute sum contributions in different orders)."""
    by_doc = dict(brute)
    assert len(got) == min(k, len(brute))
    for doc, score in zip(got["doc"], got["score"]):
        assert score == pytest.approx(by_doc[int(doc)], abs=1e-9)
    if len(brute) >= k:
        kth = brute[k - 1][1]
        got_docs = set(int(d) for d in got["doc"])
        for doc, score in zip(got["doc"], got["score"]):
            assert by_doc[int(doc)] >= kth - 1e-9
        for doc, score in brute:
            if score > kth + 1e-9:
                assert doc in got_docs, (
                    f"doc {doc} (score {score}) pruned but beats k-th {kth}"
                )


# --- #sdm kernel: deterministic adversarial fixtures -------------------------


def _sdm_brute(postings, lengths, terms, plan, bgs, mu, od_width, uw_width):
    pos_by = {
        t: {d: pos for d, tf, pos in postings.get(t, [])} for t in terms
    }
    cand = sorted({d for t in terms for d, _, _ in postings.get(t, [])})
    W = sum(w for w, *_ in plan)
    out = []
    for d in cand:
        score = -W * math.log(lengths[d] + mu)
        for (w, kind, i, j), bg in zip(plan, bgs):
            if kind == "uni":
                tf = len(pos_by[terms[i]].get(d, []))
            else:
                pi = pos_by[terms[i]].get(d)
                pj = pos_by[terms[j]].get(d)
                if pi and pj:
                    ext = [positions_to_extents(pi), positions_to_extents(pj)]
                    if kind == "od":
                        tf = len(ordered_window_extents(ext, od_width))
                    else:
                        tf = len(unordered_window_extents(ext, uw_width))
                else:
                    tf = 0
            score += w * math.log(tf + mu * bg)
        out.append((d, score))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out


def test_sdm_kernel_uw_count_exceeds_min_tf():
    """Round-2 verdict counterexample (VERDICT.md r2 'What's wrong' #1):
    the decoy doc's segment sets the threshold, and the true winner — whose
    #uw count (2) exceeds min(tf_x, tf_y) (1) — sits in a segment the old
    min() bound pruned. k=1, no overfetch: the kernel must keep it."""
    terms = ["x", "y"]
    postings = {
        "x": [(0, 4, [0, 20, 40, 60]), (100, 3, [0, 5, 99])],
        "y": [(0, 1, [67]), (100, 1, [3])],
    }
    lengths = {0: 100, 100: 100}
    plan = _sdm_scorer_plan(terms, uniw=0.2, odw=0.0, uww=0.8)
    bgs = [0.01, 0.01, 0.001, 0.001]
    mu, od_width, uw_width = 10.0, 1, 8
    brute = _sdm_brute(postings, lengths, terms, plan, bgs, mu, od_width, uw_width)
    assert brute[0][0] == 100  # the fixture is adversarial as designed
    # sanity: uw count of the winner really exceeds min(tf) in its segment
    ext = [positions_to_extents([0, 5, 99]), positions_to_extents([3])]
    assert len(unordered_window_extents(ext, uw_width)) == 2 > 1
    kernel = _sdm_bucket_kernel(terms, plan, bgs, mu, 1, od_width, uw_width)
    got = kernel(
        _blocks_frame(postings, lengths, 1, with_pos=True),
        _lengths_frame(lengths),
    )
    assert list(got["doc"]) == [100]
    assert got["score"].iloc[0] == pytest.approx(brute[0][1], abs=1e-9)


def test_sdm_kernel_od_count_exceeds_min_tf_when_wide():
    """#od with width > 1 'double dips': one later-child occurrence serves
    many firsts (count <= tf_first, NOT min(tf_i, tf_j)) — the winner's od
    count (2) exceeds min(2, 1) and the old bound pruned its segment."""
    terms = ["x", "y"]
    postings = {
        "x": [(0, 3, [0, 20, 40]), (100, 2, [0, 2])],
        "y": [(0, 1, [41]), (100, 1, [5])],
    }
    lengths = {0: 100, 100: 100}
    plan = _sdm_scorer_plan(terms, uniw=0.2, odw=0.8, uww=0.0)
    bgs = [0.01, 0.01, 0.001, 0.001]
    mu, od_width, uw_width = 10.0, 10, 8
    brute = _sdm_brute(postings, lengths, terms, plan, bgs, mu, od_width, uw_width)
    assert brute[0][0] == 100
    ext = [positions_to_extents([0, 2]), positions_to_extents([5])]
    assert len(ordered_window_extents(ext, od_width)) == 2 > 1
    kernel = _sdm_bucket_kernel(terms, plan, bgs, mu, 1, od_width, uw_width)
    got = kernel(
        _blocks_frame(postings, lengths, 1, with_pos=True),
        _lengths_frame(lengths),
    )
    assert list(got["doc"]) == [100]
    assert got["score"].iloc[0] == pytest.approx(brute[0][1], abs=1e-9)


# --- property tests: kernel == brute force, overfetch = 0 --------------------

TOKENS = ["x", "y", "z"]

corpus_st = st.lists(
    st.lists(
        st.sampled_from(TOKENS + ["_a", "_b", "_c"]), min_size=1, max_size=24
    ),
    min_size=1,
    max_size=12,
)


def _corpus_to_postings(token_docs):
    """Token lists -> (postings, lengths); doc ids are spread so blocks cut
    into several segments."""
    postings: dict[str, list[tuple[int, int, list[int]]]] = {}
    lengths: dict[int, int] = {}
    for i, tokens in enumerate(token_docs):
        doc = i * 7 + (i % 3)
        lengths[doc] = len(tokens)
        for t in TOKENS:
            pos = [p for p, tok in enumerate(tokens) if tok == t]
            if pos:
                postings.setdefault(t, []).append((doc, len(pos), pos))
    return postings, lengths


@settings(max_examples=220, deadline=None)
@given(
    corpus_st,
    st.sampled_from([1, 2, 3]),
    st.sampled_from([1, 3, 5]),
    st.sampled_from([(0.8, 0.15, 0.05), (0.2, 0.0, 0.8), (0.1, 0.8, 0.1)]),
    st.sampled_from([(1, 8), (4, 2), (10, 20)]),
    st.sampled_from([10.0, 500.0]),
)
def test_sdm_kernel_matches_brute_force(
    token_docs, block_size, k, mix, widths, mu
):
    postings, lengths = _corpus_to_postings(token_docs)
    terms = ["x", "y"]
    if not any(t in postings for t in terms):
        return
    od_width, uw_width = widths
    plan = _sdm_scorer_plan(terms, *mix)
    cl = max(sum(lengths.values()), 1)
    bgs = []
    for w, kind, i, j in plan:
        if kind == "uni":
            cf = sum(tf for _, tf, _ in postings.get(terms[i], []))
        else:
            cf = 0
        bgs.append((cf if cf > 0 else 0.5) / cl)
    brute = _sdm_brute(postings, lengths, terms, plan, bgs, mu, od_width, uw_width)
    # only terms present in postings produce blocks
    present = {t: postings[t] for t in terms if t in postings}
    kernel = _sdm_bucket_kernel(terms, plan, bgs, mu, k, od_width, uw_width)
    got = kernel(
        _blocks_frame(present, lengths, block_size, with_pos=True),
        _lengths_frame(lengths),
    )
    _assert_valid_topk(got, brute, k)


@settings(max_examples=220, deadline=None)
@given(
    corpus_st,
    st.sampled_from([1, 2, 3]),
    st.sampled_from([1, 3, 5]),
    st.booleans(),
)
def test_bm25_kernel_matches_brute_force(token_docs, block_size, k, default_tfn):
    postings, lengths = _corpus_to_postings(token_docs)
    terms = [t for t in TOKENS if t in postings]
    if not terms:
        return
    n_docs = len(lengths)
    avgdl = sum(lengths.values()) / n_docs
    weights = {t: 1.0 / len(terms) for t in terms}
    term_info = {
        t: (weights[t], bm25_idf(n_docs, len(postings[t]))) for t in terms
    }
    b, kk = (BM25_B, BM25_K) if default_tfn else (0.9, 2.0)
    brute = []
    for d in sorted({d for t in terms for d, _, _ in postings[t]}):
        score = 0.0
        for t in terms:
            tf = next((tf for dd, tf, _ in postings[t] if dd == d), 0)
            if tf:
                w, idf = term_info[t]
                score += w * idf * (tf * (kk + 1)) / (
                    tf + kk * (1 - b + b * lengths[d] / avgdl)
                )
        brute.append((d, score))
    brute.sort(key=lambda x: (-x[1], x[0]))
    kernel = _bucket_kernel(term_info, k, b, kk, avgdl, default_tfn)
    got = kernel(
        _blocks_frame(postings, lengths, block_size, with_pos=False),
        _lengths_frame(lengths),
    )
    _assert_valid_topk(got, brute, k)
