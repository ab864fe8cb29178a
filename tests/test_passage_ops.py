"""Composable passage operators (#passagefilter/#passagelengths effect —
PassageFilterIterator.java:44-66, PassageLengthIterator.java:26-52,
PassageRestrictionTraversal): arbitrary operator trees evaluated
per-passage."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from galago_git_spark.functions.tokenize import tokenize_py
from galago_git_spark.query.executor import inline_index
from galago_git_spark.query.passages import (
    passage_bm25_topk,
    passage_count_frame,
    passage_topk,
    passage_windows,
)
from galago_git_spark.query.parser import parse
from galago_git_spark.query.traversals import transform
from galago_git_spark.sources.corpus import synthetic_code_corpus

SIZE, SHIFT = 30, 15


@pytest.fixture(scope="module")
def pidx(spark):
    corpus = synthetic_code_corpus(spark, n_docs=60, seed=11)
    docs = corpus.select(
        F.monotonically_increasing_id().alias("doc_id"),
        F.col("content").alias("text"),
    ).persist()
    yield docs, inline_index(docs)
    docs.unpersist()


def test_flat_combine_matches_established_passage_model(pidx):
    """passage_topk over #combine:scorer=bm25 must reproduce the
    oracle-checked passage_bm25_topk ranking exactly."""
    _, idx = pidx
    want = passage_bm25_topk(idx, ["data", "table"], k=10, size=SIZE, shift=SHIFT)
    got = passage_topk(
        "#combine:scorer=bm25(data table)", idx, k=10, size=SIZE, shift=SHIFT
    )
    w = [(r["doc"], r["begin"], r["end"], round(r["score"], 9)) for r in want.collect()]
    g = [(r["doc"], r["begin"], r["end"], round(r["score"], 9)) for r in got.collect()]
    assert g == w


def test_passage_window_counts_match_python_oracle(pidx):
    """#od:1 evaluated inside passages == match loop on passage-filtered
    positions (the PassageFilterIterator contract)."""
    docs, idx = pidx
    node = transform(parse("#od:1(get_load0 set_block_v20)"))
    cand = idx.postings.filter(
        F.col("term").isin(["get_load0", "set_block_v20"])
    ).select("doc").distinct()
    passages = passage_windows(idx, cand, SIZE, SHIFT)
    got = {
        (r["doc"], r["pbegin"], r["tf"])
        for r in passage_count_frame(node, idx, passages).collect()
    }
    want = set()
    for row in docs.collect():
        toks = tokenize_py(row["text"])
        n = len(toks)
        if "get_load0" not in toks or "set_block_v20" not in toks:
            continue
        k = 0
        while k * SHIFT < n or k == 0:
            b, e = k * SHIFT, min(k * SHIFT + SIZE, n)
            pa = [p for p, t in enumerate(toks, 1) if t == "get_load0" and b < p <= e]
            pb = [p for p, t in enumerate(toks, 1) if t == "set_block_v20" and b < p <= e]
            tf = sum(1 for p in pa if p + 1 in pb)
            if tf:
                want.add((row["doc_id"], b, tf))
            k += 1
            if k * SHIFT >= n:
                break
        # k loop mirrors passage_windows' ceil(len/shift) windows
    assert got, "fixture must produce passage phrase matches"
    assert got == want


def test_sdm_over_passages_runs(pidx):
    """#sdm expands to od/uw pairs; the whole tree evaluates per-passage."""
    _, idx = pidx
    out = passage_topk(
        "#sdm(get_load0 set_block_v20)", idx, k=5, size=SIZE, shift=SHIFT
    ).collect()
    assert out
    assert all(r["end"] - r["begin"] <= SIZE for r in out)
    # ranks are 1..n with the ScoredPassage tie-break
    assert [r["rank"] for r in out] == list(range(1, len(out) + 1))


def test_passage_scale_folds_into_weight(pidx):
    """#scale is a linear factor on a subtree score — scaling BOTH children
    by the same factor must not change the passage ranking, and a scaled
    single scorer must score exactly factor * unscaled."""
    _, idx = pidx
    base = passage_topk(
        "#combine(#bm25(data) #bm25(table))", idx, k=10, size=SIZE, shift=SHIFT
    ).collect()
    scaled = passage_topk(
        "#combine:norm=false(#scale:0.5(#bm25(data)) #scale:0.5(#bm25(table)))",
        idx, k=10, size=SIZE, shift=SHIFT,
    ).collect()
    assert [(r["doc"], r["begin"]) for r in scaled] == [
        (r["doc"], r["begin"]) for r in base
    ]
    for s, b in zip(scaled, base):
        assert s["score"] == pytest.approx(b["score"], rel=1e-9)


def test_passage_unsupported_score_op_raises(pidx):
    _, idx = pidx
    with pytest.raises(ValueError, match="passage retrieval"):
        passage_topk(
            "#combine(#log(#bm25(data)) #bm25(table))",
            idx, k=5, size=SIZE, shift=SHIFT,
        )


def test_passage_prior_raises_clear_unsupported(spark):
    """#prior matches _is_scorer too — the _UNSUPPORTED check must win
    (document-plane priors have no passage analog)."""
    idx = inline_index(
        synthetic_code_corpus(spark, n_docs=10, seed=3).selectExpr(
            "row_number() over (order by path) - 1 as doc_id",
            "content as text",
        )
    )
    with pytest.raises(ValueError, match="not supported inside passage"):
        passage_topk("#combine(#prior() #dirichlet(def))", idx, k=3).collect()
