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


def test_passage_window_rule_matches_reference(spark):
    """RankedPassageModel.java:83-97: windows stop at the first end >=
    length — len=60/size=50/shift=25 scores [0,50) and [25,60) ONLY (the
    truncated tail [50,60) must not exist: under per-passage length
    normalization it would outrank full windows). The reference's own
    fixture shape: doc len=106/size=10/shift=5 ends at begin=100,end=106
    (RankedPassageModelTest.java:95-97)."""
    doc60 = " ".join(f"w{i}" for i in range(59)) + " target"
    docs = spark.createDataFrame(
        [(0, doc60), (1, "filler words only")],  # 2nd doc keeps idf positive
        "doc_id long, text string",
    )
    idx = inline_index(docs)
    wins = sorted(
        (r["pbegin"], r["pend"])
        for r in passage_windows(
            idx,
            idx.lengths.filter(F.col("doc") == 0).select("doc"),
            size=50,
            shift=25,
        ).collect()
    )
    assert wins == [(0, 50), (25, 60)]
    got = passage_bm25_topk(idx, ["target"], k=10, size=50, shift=25).collect()
    # both windows are scored (zero-match windows of candidate docs rank
    # by doc/begin, like the reference queue) — the phantom [50,60) is gone
    assert [(r["begin"], r["end"]) for r in got] == [(25, 60), (0, 50)]
    assert got[0]["score"] > 0.0 and got[1]["score"] == 0.0
    # len=106/size=10/shift=5: last window exactly [100, 106)
    doc106 = " ".join(["pad"] * 105) + " tail"
    idx2 = inline_index(
        spark.createDataFrame([(0, doc106)], "doc_id long, text string")
    )
    wins2 = [
        (r["pbegin"], r["pend"])
        for r in passage_windows(
            idx2, idx2.lengths.select("doc"), size=10, shift=5
        ).collect()
    ]
    assert max(wins2) == (100, 106) and (105, 106) not in wins2


def test_passage_duplicate_query_terms_full_weight(pidx):
    """#combine(data data) must weight 'data' fully (two 0.5 shares merge),
    not half — chained CASE branches on a repeated term never fire twice."""
    _, idx = pidx
    single = passage_bm25_topk(idx, ["data"], k=5, size=SIZE, shift=SHIFT).collect()
    doubled = passage_bm25_topk(
        idx, ["data", "data"], k=5, size=SIZE, shift=SHIFT
    ).collect()
    assert [(r["doc"], r["begin"]) for r in doubled] == [
        (r["doc"], r["begin"]) for r in single
    ]
    for d, s in zip(doubled, single):
        assert d["score"] == pytest.approx(s["score"], abs=1e-9)


def test_passage_empty_schema_consistent(pidx):
    _, idx = pidx
    with_k = passage_bm25_topk(idx, ["zzz_absent"], k=5)
    no_k = passage_bm25_topk(idx, ["zzz_absent"], k=None)
    assert with_k.columns == ["doc", "begin", "end", "score", "rank"]
    assert no_k.columns == ["doc", "begin", "end", "score"]
    assert with_k.count() == 0 and no_k.count() == 0


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
        # reference loop (RankedPassageModel.java:83-97): stop after the
        # first window whose end reaches the doc length
        k = 0
        while True:
            b, e = k * SHIFT, min(k * SHIFT + SIZE, n)
            pa = [p for p, t in enumerate(toks, 1) if t == "get_load0" and b < p <= e]
            pb = [p for p, t in enumerate(toks, 1) if t == "set_block_v20" and b < p <= e]
            tf = sum(1 for p in pa if p + 1 in pb)
            if tf:
                want.add((row["doc_id"], b, tf))
            if e >= n:
                break
            k += 1
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
