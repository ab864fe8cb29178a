"""Packed posting layer + block-max WAND tests.

The core correctness engine (SURVEY.md §5 pattern 3, mirroring
``core/src/test/.../processing/DeltaScoreDocumentModelTest.java:29-105``):
the pruned WAND kernel must equal the exhaustive relational path doc-by-doc
and score-by-score.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from galago_git_spark.index.build import build_index
from galago_git_spark.index.codec import (
    decode_doc_block,
    delta_decode,
    delta_encode,
    encode_doc_block,
    vbyte_decode,
    vbyte_encode,
)
from galago_git_spark.index.packed import build_packed, read_blocks
from galago_git_spark.query.wand import wand_topk
from galago_git_spark.sources.corpus import synthetic_code_corpus


# --- codec ------------------------------------------------------------------

def test_vbyte_known_bytes():
    # Galago wire format (CompressedByteBuffer.java:49-67): 7-bit groups,
    # little-endian, hi bit marks each value's final byte.
    assert vbyte_encode(np.array([0], dtype=np.uint64)) == bytes([0x80])
    assert vbyte_encode(np.array([1], dtype=np.uint64)) == bytes([0x81])
    assert vbyte_encode(np.array([127], dtype=np.uint64)) == bytes([0xFF])
    assert vbyte_encode(np.array([128], dtype=np.uint64)) == bytes([0x00, 0x81])
    assert vbyte_encode(np.array([300], dtype=np.uint64)) == bytes([0x2C, 0x82])
    assert list(vbyte_decode(bytes([0x2C, 0x82]))) == [300]


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200))
def test_vbyte_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert list(vbyte_decode(vbyte_encode(arr))) == values


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300
    )
)
def test_doc_block_roundtrip(docs):
    arr = np.array(sorted(set(docs)), dtype=np.uint64)
    out = decode_doc_block(encode_doc_block(arr))
    assert list(out) == list(arr)


def test_delta_codec():
    v = np.array([5, 7, 7, 30], dtype=np.uint64)
    g = delta_encode(v)
    assert list(g) == [5, 2, 0, 23]
    assert list(delta_decode(g)) == [5, 7, 7, 30]


# --- packed layer -----------------------------------------------------------

@pytest.fixture(scope="module")
def packed_index(spark, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("packed") / "idx")
    corpus = synthetic_code_corpus(spark, n_docs=400, seed=42, skew_head=True)
    build_index(corpus, index_dir, positions=False)
    build_packed(spark, index_dir, block_size=32, bucket_bits=7)
    return index_dir


def test_blocks_reconcile_with_postings(spark, packed_index):
    from pyspark.sql import functions as F

    postings = spark.read.parquet(f"{packed_index}/postings")
    blocks = read_blocks(spark, packed_index)
    # every posting appears in exactly one block; totals reconcile
    got = blocks.agg(F.sum("n")).collect()[0][0]
    assert got == postings.count()
    # block doc ranges nest inside their bucket (blocks never span buckets)
    bad = blocks.filter(
        (F.shiftright(F.col("first_doc"), 7) != F.col("bucket"))
        | (F.shiftright(F.col("last_doc"), 7) != F.col("bucket"))
    ).count()
    assert bad == 0
    # decode a head-term block chain: docs strictly increasing, tfs match
    head = blocks.filter(F.col("term") == "the_head_term").orderBy(
        "bucket", "first_doc"
    )
    rows = head.collect()
    assert rows, "skewed head term must exist"
    all_docs = []
    for r in rows:
        d = decode_doc_block(bytes(r["docs"]))
        t = vbyte_decode(bytes(r["tfs"]))
        assert len(d) == r["n"] == len(t)
        assert d[0] == r["first_doc"] and d[-1] == r["last_doc"]
        assert (np.diff(d.astype(np.int64)) > 0).all()
        assert int(t.max()) == r["max_tf"]
        all_docs.extend(d.tolist())
    ref = [
        r["doc"]
        for r in postings.filter(F.col("term") == "the_head_term")
        .orderBy("doc")
        .collect()
    ]
    assert all_docs == ref


# --- WAND vs exhaustive equivalence ----------------------------------------

QUERIES = [
    ["def", "return"],
    ["get_set", "run_load", "index_query"],
    ["the_head_term"],
    ["the_head_term", "def", "score_token"],
    ["zzz_not_a_term", "def"],
]


@pytest.mark.parametrize("terms", QUERIES, ids=["-".join(q)[:30] for q in QUERIES])
def test_wand_rank_identical_to_exhaustive(spark, packed_index, terms):
    from galago_git_spark.index.build import open_index
    from galago_git_spark.query.executor import execute

    idx = open_index(spark, packed_index)
    q = "#combine(" + " ".join(f"#bm25({t})" for t in terms) + ")"
    brute = execute(q, idx, k=10, default_scorer="bm25").collect()
    wand = wand_topk(spark, packed_index, terms, k=10).collect()
    assert [r["doc"] for r in wand] == [r["doc"] for r in brute]
    for w, b in zip(wand, brute):
        assert w["score"] == pytest.approx(b["score"], abs=1e-9)


def test_wand_weighted_and_k(spark, packed_index):
    from galago_git_spark.index.build import open_index
    from galago_git_spark.query.executor import execute

    idx = open_index(spark, packed_index)
    q = "#combine:0=0.7:1=0.3(#bm25(def) #bm25(return))"
    brute = execute(q, idx, k=25, default_scorer="bm25").collect()
    wand = wand_topk(
        spark, packed_index, ["def", "return"], k=25, weights=[0.7, 0.3]
    ).collect()
    assert [r["doc"] for r in wand] == [r["doc"] for r in brute]
    for w, b in zip(wand, brute):
        assert w["score"] == pytest.approx(b["score"], abs=1e-9)


def test_wand_unknown_terms_only(spark, packed_index):
    out = wand_topk(spark, packed_index, ["zzz_not_a_term"], k=5)
    assert out.count() == 0


# --- position payloads + #sdm on the packed tier ---------------------------

def test_positions_block_roundtrip():
    from galago_git_spark.index.codec import (
        decode_positions_block,
        encode_positions_block,
    )

    rows = [[1, 5, 9], [2], [3, 4, 5, 100], [7, 8]]
    counts = np.array([len(r) for r in rows], dtype=np.int64)
    flat = np.array([p for r in rows for p in r], dtype=np.uint64)
    buf = encode_positions_block(flat, counts)
    out = decode_positions_block(buf, counts)
    assert list(out) == list(flat)
    assert decode_positions_block(b"", np.array([], dtype=np.int64)).size == 0


def test_positions_block_roundtrip_zero_counts():
    """Leading, mid, and trailing zero-count docs must round-trip (the
    leading case previously wrapped to cs[-1] in the decoder)."""
    from galago_git_spark.index.codec import (
        decode_positions_block,
        encode_positions_block,
    )

    for rows in ([[], [5, 7]], [[3], [], [9, 11]], [[2, 4], []],
                 [[], [], [1]], [[], [10], [], [12, 20], []]):
        counts = np.array([len(r) for r in rows], dtype=np.int64)
        flat = np.array([p for r in rows for p in r], dtype=np.uint64)
        buf = encode_positions_block(flat, counts)
        out = decode_positions_block(buf, counts)
        assert list(out) == list(flat), rows


@pytest.fixture(scope="module")
def packed_pos_index(spark, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("packedpos") / "idx")
    corpus = synthetic_code_corpus(spark, n_docs=400, seed=42, skew_head=True)
    build_index(corpus, index_dir, positions=True)
    build_packed(spark, index_dir, block_size=32, bucket_bits=7)
    return index_dir


SDM_QUERIES = [
    ["get_load0", "set_block_v20"],
    ["def", "return"],
    ["the_head_term", "def", "get_load0"],
]


@pytest.mark.parametrize(
    "terms", SDM_QUERIES, ids=["-".join(q)[:30] for q in SDM_QUERIES]
)
def test_sdm_wand_rank_identical_to_exhaustive(spark, packed_pos_index, terms):
    from pyspark.sql import functions as F

    from galago_git_spark.index.build import open_index
    from galago_git_spark.query.executor import score_frame
    from galago_git_spark.query.wand import wand_sdm_topk

    idx = open_index(spark, packed_pos_index)
    q = "#sdm(" + " ".join(terms) + ")"
    # exhaustive ranking on ROUNDED scores (the oracle tie-break)
    brute = (
        score_frame(q, idx)
        .withColumn("score", F.round(F.col("score"), 6))
        .orderBy(F.col("score").desc(), F.col("doc").asc())
        .limit(10)
        .collect()
    )
    wand = wand_sdm_topk(spark, packed_pos_index, terms, k=10).collect()
    assert [r["doc"] for r in wand] == [r["doc"] for r in brute]
    assert [r["score"] for r in wand] == [r["score"] for r in brute]


def test_wand_bm25_plan_prunes_position_payloads(spark, packed_pos_index):
    """The BM25-only WAND path never touches position payloads — the block
    scan's ReadSchema must NOT include ``pos`` (parquet column pruning then
    skips those bytes; at scale the pos column dwarfs docs+tfs), while the
    #sdm path must include it."""
    import contextlib
    import io

    from galago_git_spark.query.wand import wand_sdm_topk

    def plan_of(df) -> str:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    bm25_plan = plan_of(wand_topk(spark, packed_pos_index, ["def"], k=5))
    assert "pos:binary" not in bm25_plan
    sdm_plan = plan_of(
        wand_sdm_topk(spark, packed_pos_index, ["def", "return"], k=5)
    )
    assert "pos:binary" in sdm_plan


def test_sdm_wand_requires_positions(spark, packed_index):
    from galago_git_spark.query.wand import wand_sdm_topk

    with pytest.raises(ValueError, match="positions"):
        wand_sdm_topk(spark, packed_index, ["def", "return"], k=5)


# ---------------------------------------------------------------------------
# part-backed #sdm WAND (wand_sdm_parts_topk): window parts packed into
# block layers serve od/uw children as posting leaves — VERDICT r3 item 2
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def packed_parts_index(spark, tmp_path_factory):
    from galago_git_spark.index.build import assign_doc_ids
    from galago_git_spark.index.packed import pack_window_parts
    from galago_git_spark.index.window import (
        build_unordered_window_postings,
        build_window_postings,
    )

    index_dir = str(tmp_path_factory.mktemp("packedparts") / "idx")
    corpus = synthetic_code_corpus(spark, n_docs=400, seed=42, skew_head=True)
    build_index(corpus, index_dir, positions=True)
    build_packed(spark, index_dir, block_size=32, bucket_bits=7)
    numbered = assign_doc_ids(corpus)
    build_window_postings(numbered, index_dir, n=2)
    build_unordered_window_postings(numbered, index_dir, width=8, n=2)
    assert pack_window_parts(spark, index_dir) == [
        "window.od1.2", "window.uw.n2.w8"
    ]
    return index_dir


@pytest.mark.parametrize(
    "terms", SDM_QUERIES, ids=["-".join(q)[:30] for q in SDM_QUERIES]
)
def test_sdm_parts_wand_rank_identical(spark, packed_parts_index, terms):
    """Part-backed #sdm WAND == exhaustive == positional WAND, on rounded
    scores with the oracle tie-break."""
    from pyspark.sql import functions as F

    from galago_git_spark.index.build import open_index
    from galago_git_spark.query.executor import score_frame
    from galago_git_spark.query.wand import wand_sdm_parts_topk, wand_sdm_topk

    idx = open_index(spark, packed_parts_index)
    # compare against the POSITIONAL execution (window parts disabled):
    # the rewrite itself is covered by test_window_index identity tests
    raw = open_index(spark, packed_parts_index)
    raw.window_parts = None
    q = "#sdm(" + " ".join(terms) + ")"
    brute = (
        score_frame(q, raw)
        .withColumn("score", F.round(F.col("score"), 6))
        .orderBy(F.col("score").desc(), F.col("doc").asc())
        .limit(10)
        .collect()
    )
    parts = wand_sdm_parts_topk(spark, packed_parts_index, terms, k=10).collect()
    poswand = wand_sdm_topk(spark, packed_parts_index, terms, k=10).collect()
    assert [(r["doc"], r["score"]) for r in parts] == [
        (r["doc"], r["score"]) for r in brute
    ]
    assert [(r["doc"], r["score"]) for r in parts] == [
        (r["doc"], r["score"]) for r in poswand
    ]


def test_sdm_parts_wand_rejects_duplicate_adjacent_terms(
    spark, packed_parts_index
):
    """#sdm(t t): the uw pair part keys only DISTINCT pairs (same rule as
    _window_part_rewrite), so the part-backed tier must refuse — callers
    fall back to the positional kernel, which handles duplicates exactly
    (covered by test_sdm_wand_rank_identical_to_exhaustive)."""
    from galago_git_spark.query.wand import wand_sdm_parts_topk

    with pytest.raises(ValueError, match="distinct adjacent"):
        wand_sdm_parts_topk(spark, packed_parts_index, ["def", "def"], k=10)


def test_sdm_parts_wand_requires_window_blocks(spark, packed_pos_index):
    from galago_git_spark.query.wand import wand_sdm_parts_topk

    with pytest.raises(ValueError, match="packed window part"):
        wand_sdm_parts_topk(spark, packed_pos_index, ["def", "return"], k=5)


def test_sdm_parts_wand_no_position_payloads(spark, packed_parts_index):
    """The part-backed plan reads NO position payloads anywhere — that is
    the whole point of the tier (the positional kernel must decode pos)."""
    import contextlib
    import io

    from galago_git_spark.query.wand import wand_sdm_parts_topk

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        wand_sdm_parts_topk(
            spark, packed_parts_index, ["def", "return"], k=5
        ).explain("formatted")
    assert "pos:binary" not in buf.getvalue()


def test_presorted_pack_value_identical_to_shuffle_pack(spark, packed_index):
    """The zero-shuffle pack (presorted=True: scan -> broadcast-join ->
    within-partition sort -> encode, no exchange) must decode to exactly
    the postings the range-shuffle pack encodes. Block boundaries may
    differ (they follow task layout), so compare the DECODED streams and
    the per-block invariants, then the WAND results end-to-end."""
    from pyspark.sql import functions as F

    build_packed(
        spark, packed_index, block_size=32, bucket_bits=7,
        out="blocks_presorted", presorted=True,
    )
    postings = spark.read.parquet(f"{packed_index}/postings")

    def decoded(part):
        out = []
        for r in read_blocks(spark, packed_index, part=part).collect():
            d = decode_doc_block(bytes(r["docs"]))
            t = vbyte_decode(bytes(r["tfs"]))
            assert len(d) == r["n"] == len(t)
            assert d[0] == r["first_doc"] and d[-1] == r["last_doc"]
            assert (np.diff(d.astype(np.int64)) > 0).all()
            assert int(t.max()) == r["max_tf"]
            out.extend(zip([r["term"]] * len(d), d.tolist(), t.tolist()))
        return sorted(out)

    a = decoded("blocks")
    b = decoded("blocks_presorted")
    assert a == b
    assert len(a) == postings.count()
    # the CLI/fused build now produces its default "blocks" layer through
    # the presorted path, so the whole WAND suite exercises it end-to-end


def test_presorted_broadcast_guard_falls_back(spark, tmp_path):
    """presorted=True must not broadcast an over-large lengths table:
    beyond broadcast_max_docs the pack falls back to the shuffle path
    (warning emitted) and still produces an identical block layer."""
    import warnings as _w

    from pyspark.sql import functions as F

    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    corpus = synthetic_code_corpus(spark, n_docs=120, seed=7)
    build_index(corpus, a, positions=False, packed=False)
    build_index(corpus, b, positions=False, packed=False)
    build_packed(spark, a, block_size=32, bucket_bits=7, presorted=True)
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        build_packed(
            spark, b, block_size=32, bucket_bits=7, presorted=True,
            broadcast_max_docs=10,
        )
    assert any("broadcast_max_docs" in str(c.message) for c in caught)

    # block boundaries may legally differ between the two paths (a group
    # split across presorted tasks yields extra, smaller blocks) — the
    # DECODED postings must be identical
    def decoded(d):
        out = []
        for r in read_blocks(spark, d).collect():
            docs = decode_doc_block(bytes(r["docs"]))
            tfs = vbyte_decode(bytes(r["tfs"]))
            out.extend(
                (r["term"], int(dc), int(tf)) for dc, tf in zip(docs, tfs)
            )
        return sorted(out)

    assert decoded(a) == decoded(b)


def test_sdm_cost_probe_routes_identically(
    spark, packed_parts_index, monkeypatch
):
    """--wand #sdm routing (VERDICT r4 item 4): the cost probe picks the
    kernel only above the candidate-postings threshold, and the CLI
    returns identical rows whichever side the probe lands on."""
    from galago_git_spark.cli import _run_one
    from galago_git_spark.index.build import open_index
    from galago_git_spark.query.wand import PackedReader, sdm_kernel_pays_off

    reader = PackedReader(spark, packed_parts_index, cache=False)
    # threshold resolution: explicit arg, then env, then module default
    assert sdm_kernel_pays_off(reader, ["def", "return"], min_postings=1)
    assert not sdm_kernel_pays_off(
        reader, ["def", "return"], min_postings=10**9
    )
    monkeypatch.setenv("SPARK_GRAFT_SDM_WAND_MIN_POSTINGS", "1")
    assert sdm_kernel_pays_off(reader, ["def", "return"])
    monkeypatch.setenv("SPARK_GRAFT_SDM_WAND_MIN_POSTINGS", str(10**9))
    assert not sdm_kernel_pays_off(reader, ["def", "return"])

    idx = open_index(spark, packed_parts_index)

    def rows(env_val: str):
        monkeypatch.setenv("SPARK_GRAFT_SDM_WAND_MIN_POSTINGS", env_val)
        got = [
            (r["doc"], round(r["score"], 6))
            for r in _run_one(
                spark, idx, packed_parts_index, "#sdm(def return)", 10,
                "dirichlet", True, reader=reader,
            )
        ]
        # the kernel ranks on ROUNDED scores, the exhaustive path on raw
        # — compare under the shared rounded convention
        return sorted(got, key=lambda t: (-t[1], t[0]))

    assert rows("1") == rows(str(10**9))  # kernel route == exhaustive


def test_batch_wand_rank_identical_to_per_query(spark, packed_index):
    """wand_batch_topk (one job for the whole batch) must return, per
    query, exactly wand_topk's (doc, score, rank) rows — including
    weighted and absent-term queries."""
    from galago_git_spark.query.wand import wand_batch_topk

    batch = {
        "q0": (["def", "return"], None),
        "q1": (["get_set", "run_load", "index_query"], None),
        "q2": (["the_head_term"], None),
        "q3": (["the_head_term", "def", "score_token"], None),
        "q4": (["zzz_not_a_term", "def"], None),
        "q5": (["def", "return"], [0.7, 0.3]),
        "q6": (["zzz_not_a_term"], None),
    }
    got = wand_batch_topk(spark, packed_index, batch, k=10).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["qid"], []).append(
            (r["rank"], r["doc"], round(r["score"], 9))
        )
    for q in by_q.values():
        q.sort()
    for qid, (terms, weights) in batch.items():
        want = [
            (r["rank"], r["doc"], round(r["score"], 9))
            for r in wand_topk(
                spark, packed_index, terms, k=10, weights=weights
            ).collect()
        ]
        assert by_q.get(qid, []) == want, f"{qid} diverged"


def test_cogroup_cache_identical_and_exchange_free(spark, packed_index):
    """PackedReader.enable_cogroup_cache pins the WAND projection and
    the bucketed lengths co-partitioned by bucket (the query-SERVICE
    shape). Resident results must equal cold-path results exactly, and
    the resident batch plan must contain NO exchange between the cached
    relations and the cogroup — the per-batch shuffles are gone."""
    from galago_git_spark.query.wand import PackedReader, wand_batch_topk

    batch = {
        "q0": (["def", "return"], None),
        "q1": (["the_head_term", "score_token"], [0.8, 0.2]),
        "q2": (["zzz_not_a_term", "def"], None),
    }
    cold = sorted(
        (r["qid"], r["rank"], r["doc"], round(r["score"], 9))
        for r in wand_batch_topk(spark, packed_index, batch, k=10).collect()
    )

    reader = PackedReader(spark, packed_index)
    assert reader.enable_cogroup_cache(n_partitions=8)
    assert reader.enable_cogroup_cache()  # idempotent
    # small corpus -> broadcast-lengths mode: one-sided grouped-map
    assert reader._lengths_bc is not None
    df = wand_batch_topk(spark, packed_index, batch, k=10, reader=reader)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the grouped-map subtree reads the cached blocks directly; the only
    # exchange above the InMemoryRelation is the tiny per-qid rank
    # shuffle (plans nested INSIDE it were paid once at persist time)
    gm_part = plan.split("FlatMapGroupsInPandas", 1)[1]
    gm_part = gm_part.split("InMemoryRelation")[0]
    assert "Exchange" not in gm_part
    assert "InMemoryTableScan" in plan
    warm = sorted(
        (r["qid"], r["rank"], r["doc"], round(r["score"], 9))
        for r in df.collect()
    )
    assert warm == cold
    # single-query path shares the same resident frames
    hot = wand_topk(spark, packed_index, ["def", "return"], k=5,
                    reader=reader).collect()
    ref = wand_topk(spark, packed_index, ["def", "return"], k=5).collect()
    assert [(r["doc"], round(r["score"], 9)) for r in hot] == [
        (r["doc"], round(r["score"], 9)) for r in ref
    ]
    # oversized-lengths fallback: force the co-partitioned cached frame
    # (cogroup form) and pin identity there too
    import os

    r2 = PackedReader(spark, packed_index)
    os.environ["GALAGO_SPARK_LENGTHS_BC_MAX_DOCS"] = "1"
    try:
        assert r2.enable_cogroup_cache(n_partitions=8)
    finally:
        del os.environ["GALAGO_SPARK_LENGTHS_BC_MAX_DOCS"]
    assert r2._lengths_bc is None and r2._lengths_cogrp is not None
    df2 = wand_batch_topk(spark, packed_index, batch, k=10, reader=r2)
    plan2 = df2._jdf.queryExecution().executedPlan().toString()
    cg = plan2.split("FlatMapCoGroupsInPandas", 1)[1]
    assert "Exchange" not in cg.split("InMemoryRelation")[0]
    warm2 = sorted(
        (r["qid"], r["rank"], r["doc"], round(r["score"], 9))
        for r in df2.collect()
    )
    assert warm2 == cold
    reader._blocks_cogrp.unpersist()
    r2._blocks_cogrp.unpersist()
    r2._lengths_cogrp.unpersist()


def test_cogroup_cache_size_guard(spark, packed_index):
    """The resident cache refuses when the blocks part exceeds the byte
    cap — executor memory is not a posting store at collection scale."""
    from galago_git_spark.query.wand import PackedReader

    reader = PackedReader(spark, packed_index)
    assert reader.enable_cogroup_cache(max_bytes=1) is False
    assert reader._blocks_cogrp is None
    # cold frames still served
    blocks, lengths = reader.wand_frames()
    assert "docs" in blocks.columns and "length" in lengths.columns
