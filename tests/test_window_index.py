"""Window (n-gram) index tests: the od:1 part rewrite must be
result-identical to the positional match loop."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from galago_git_spark.index.build import assign_doc_ids, build_index, open_index
from galago_git_spark.index.window import (
    build_unordered_window_postings,
    build_window_postings,
)
from galago_git_spark.query.executor import compile_count, execute
from galago_git_spark.query.parser import parse
from galago_git_spark.query.traversals import transform
from galago_git_spark.sources.corpus import synthetic_code_corpus


@pytest.fixture(scope="module")
def windowed_index(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("win") / "idx")
    corpus = synthetic_code_corpus(spark, n_docs=150, seed=42)
    build_index(corpus, d, positions=True)
    numbered = assign_doc_ids(corpus)
    build_window_postings(numbered, d, n=2)
    build_unordered_window_postings(numbered, d, width=8)
    return d


def test_rewrite_equals_positional_loop(spark, windowed_index):
    idx = open_index(spark, windowed_index)
    assert idx.window_parts and 2 in idx.window_parts
    node = transform(parse("#od:1(get_load0 run_sort_ctx0)"))
    via_part = {
        (r["doc"], r["tf"])
        for r in compile_count(node, idx).select("doc", "tf").collect()
    }
    # force the positional loop by hiding the window parts
    idx_nopart = open_index(spark, windowed_index)
    idx_nopart.window_parts = None
    via_loop = {
        (r["doc"], r["tf"])
        for r in compile_count(node, idx_nopart).select("doc", "tf").collect()
    }
    assert via_loop, "fixture must have adjacent pairs"
    assert via_part == via_loop


def test_sdm_identical_with_and_without_part(spark, windowed_index):
    idx = open_index(spark, windowed_index)
    idx_nopart = open_index(spark, windowed_index)
    idx_nopart.window_parts = None
    q = "#sdm(get_load0 run_sort_ctx0)"
    a = [(r["doc"], round(r["score"], 9)) for r in execute(q, idx, k=10).collect()]
    b = [(r["doc"], round(r["score"], 9)) for r in execute(q, idx_nopart, k=10).collect()]
    assert a == b


def test_frequency_threshold_prunes(spark, tmp_path):
    corpus = synthetic_code_corpus(spark, n_docs=80, seed=42)
    d = str(tmp_path / "idx")
    build_index(corpus, d, positions=False)
    numbered = assign_doc_ids(corpus)
    part_dir = build_window_postings(numbered, d, n=2, frequency_threshold=5)
    cfs = (
        spark.read.parquet(f"{part_dir}/postings")
        .groupBy("term")
        .agg(F.sum("tf").alias("cf"))
        .agg(F.min("cf"))
        .collect()[0][0]
    )
    assert cfs >= 5
    # thresholded parts are explicitly queryable but NOT rewrite-safe
    idx = open_index(spark, d)
    assert not idx.window_parts


def test_uw_rewrite_equals_positional_loop(spark, windowed_index):
    """#uw:8 over two distinct bare terms resolves to the unordered pair
    part with counts identical to the positional merge loop."""
    idx = open_index(spark, windowed_index)
    assert idx.window_parts and ("uw", 8) in idx.window_parts
    node = transform(parse("#uw:8(def return)"))
    via_part = {
        (r["doc"], r["tf"])
        for r in compile_count(node, idx).select("doc", "tf").collect()
    }
    idx_nopart = open_index(spark, windowed_index)
    idx_nopart.window_parts = None
    via_loop = {
        (r["doc"], r["tf"])
        for r in compile_count(node, idx_nopart).select("doc", "tf").collect()
    }
    assert via_loop, "fixture must have co-occurring pairs"
    assert via_part == via_loop
    # the part really is in the plan (not the positional join)
    plan = compile_count(node, idx)._jdf.queryExecution().toString()
    assert "window.uw.n2.w8" in plan
    # symmetric children hit the same sorted key
    node_r = transform(parse("#uw:8(return def)"))
    via_part_r = {
        (r["doc"], r["tf"])
        for r in compile_count(node_r, idx).select("doc", "tf").collect()
    }
    assert via_part_r == via_part


def test_uw_rewrite_respects_width_and_context(spark, windowed_index):
    idx = open_index(spark, windowed_index)
    # a different width must NOT use the w8 part
    node5 = transform(parse("#uw:5(def return)"))
    plan5 = compile_count(node5, idx)._jdf.queryExecution().toString()
    assert "window.uw.n2.w8" not in plan5
    # a positions-consuming caller must bypass the part (null positions
    # would poison window/synonym/inside kernels)
    node8 = transform(parse("#uw:8(def return)"))
    plan_pos = (
        compile_count(node8, idx, need_positions=True)
        ._jdf.queryExecution()
        .toString()
    )
    assert "window.uw.n2.w8" not in plan_pos


def test_sdm_identical_with_uw_part(spark, windowed_index):
    """#sdm uses both the od:1 part and the uw:8 part when present — the
    ranking must equal the part-less positional evaluation exactly."""
    idx = open_index(spark, windowed_index)
    idx_nopart = open_index(spark, windowed_index)
    idx_nopart.window_parts = None
    q = "#sdm(def return)"
    a = [(r["doc"], round(r["score"], 9)) for r in execute(q, idx, k=10).collect()]
    b = [(r["doc"], round(r["score"], 9)) for r in execute(q, idx_nopart, k=10).collect()]
    assert a == b


def test_thresholded_part_excluded_from_rewrite(spark, tmp_path):
    """A part built with frequency_threshold > 1 drops rare grams; the
    automatic rewrite must NOT use it (silent empty results otherwise)."""
    corpus = synthetic_code_corpus(spark, n_docs=30, seed=9)
    d = str(tmp_path / "idx")
    build_index(corpus, d, positions=True)
    numbered = assign_doc_ids(corpus)
    build_window_postings(numbered, d, n=2, frequency_threshold=5)
    build_unordered_window_postings(numbered, d, width=8, frequency_threshold=5)
    idx = open_index(spark, d)
    assert not idx.window_parts  # both parts thresholded -> not rewrite-safe
    # and queries still produce the positional-loop answer
    node = transform(parse("#uw:8(def return)"))
    assert compile_count(node, idx).count() > 0


@pytest.fixture(scope="module")
def tuple_windowed_index(spark, tmp_path_factory):
    """Index with the FULL parts tier for 3-term dependence models:
    od1.2, od1.3, uw.n2.w8, uw.n3.w12."""
    corpus = synthetic_code_corpus(spark, n_docs=120, seed=21)
    d = str(tmp_path_factory.mktemp("tupwin") / "idx")
    build_index(corpus, d, positions=True)
    numbered = assign_doc_ids(corpus)
    build_window_postings(numbered, d, n=2)
    build_window_postings(numbered, d, n=3)
    build_unordered_window_postings(numbered, d, width=8, n=2)
    # n>=3 builds require an explicit cost bound (combinatorial guard);
    # the cap is generous so this 120-doc fixture is unaffected
    build_unordered_window_postings(
        numbered, d, width=12, n=3, max_doc_candidates=200_000
    )
    return d


def test_uw3_rewrite_equals_positional_loop(spark, tuple_windowed_index):
    idx = open_index(spark, tuple_windowed_index)
    assert ("uw", 3, 12) in idx.window_parts
    node = transform(parse("#uw:12(def return class)"))
    via_part = {
        (r["doc"], r["tf"])
        for r in compile_count(node, idx).select("doc", "tf").collect()
    }
    plan = compile_count(node, idx)._jdf.queryExecution().toString()
    assert "window.uw.n3.w12" in plan
    idx_nopart = open_index(spark, tuple_windowed_index)
    idx_nopart.window_parts = None
    via_loop = {
        (r["doc"], r["tf"])
        for r in compile_count(node, idx_nopart).select("doc", "tf").collect()
    }
    assert via_loop, "fixture must have 3-term co-occurrences"
    assert via_part == via_loop
    # child order must not matter (sorted tuple key)
    node_r = transform(parse("#uw:12(class def return)"))
    via_r = {
        (r["doc"], r["tf"])
        for r in compile_count(node_r, idx).select("doc", "tf").collect()
    }
    assert via_r == via_part


def test_fulldep_identical_on_full_parts_tier(spark, tuple_windowed_index):
    """#fulldep over 3 terms: with od1.2/od1.3/uw.n2.w8/uw.n3.w12 built,
    every window child resolves to a part — ranking must equal the
    part-less positional evaluation exactly."""
    idx = open_index(spark, tuple_windowed_index)
    idx_nopart = open_index(spark, tuple_windowed_index)
    idx_nopart.window_parts = None
    q = "#fulldep(def return class)"
    a = [(r["doc"], round(r["score"], 9)) for r in execute(q, idx, k=10).collect()]
    b = [(r["doc"], round(r["score"], 9)) for r in execute(q, idx_nopart, k=10).collect()]
    assert a and a == b


def test_uw_part_bypassed_inside_require_under_window(spark, windowed_index):
    """need_positions must flow through #require/#reject: a part-rewritten
    child (null positions) inside a positions-consuming ancestor would
    silently zero the window counts."""
    idx = open_index(spark, windowed_index)
    q = "#uw:20(#require(#band(def) #od:1(def return)) class)"
    node = transform(parse(q))
    plan = compile_count(node, idx)._jdf.queryExecution().toString()
    assert "window.od1.2" not in plan  # positional path under the window
    idx_nopart = open_index(spark, windowed_index)
    idx_nopart.window_parts = None
    a = {(r["doc"], r["tf"]) for r in compile_count(node, idx).select("doc", "tf").collect()}
    b = {(r["doc"], r["tf"]) for r in compile_count(node, idx_nopart).select("doc", "tf").collect()}
    assert a == b


def test_syn_count_context_keeps_part_rewrite(spark, windowed_index):
    """#syn in a pure count context must not force positions onto its
    children (r3 review finding): the od:1 part stays in the plan and the
    tf equals the positional evaluation; a positions-consuming ancestor
    still bypasses the part."""
    idx = open_index(spark, windowed_index)
    node = transform(parse("#syn(#od:1(def return) class)"))
    plan = compile_count(node, idx)._jdf.queryExecution().toString()
    assert "window.od1.2" in plan
    idx_nopart = open_index(spark, windowed_index)
    idx_nopart.window_parts = None
    a = {
        (r["doc"], r["tf"])
        for r in compile_count(node, idx).select("doc", "tf").collect()
    }
    b = {
        (r["doc"], r["tf"])
        for r in compile_count(node, idx_nopart).select("doc", "tf").collect()
    }
    assert a and a == b
    # under a window the synonym's children must carry real positions
    outer = transform(parse("#uw:20(#syn(#od:1(def return) class) def)"))
    plan_pos = compile_count(outer, idx)._jdf.queryExecution().toString()
    assert "window.od1.2" not in plan_pos
    a_o = {
        (r["doc"], r["tf"])
        for r in compile_count(outer, idx).select("doc", "tf").collect()
    }
    b_o = {
        (r["doc"], r["tf"])
        for r in compile_count(outer, idx_nopart).select("doc", "tf").collect()
    }
    assert a_o == b_o


def test_custom_count_op_under_window_gets_positions(spark, windowed_index):
    """register_count_op's compile callback is pre-bound to the caller's
    need_positions: a custom op beneath #uw must compile its children on
    the positional path (r3 review finding — the part rewrite's null
    positions would crash the window kernel)."""
    from galago_git_spark.query.executor import (
        register_count_op,
        unregister_count_op,
    )

    idx = open_index(spark, windowed_index)

    def double(node, index, compile_count):
        return compile_count(node.children[0], index).withColumn(
            "tf", F.col("tf") * 2
        )

    register_count_op("double", double)
    try:
        node = transform(parse("#uw:20(#double(#od:1(def return)) class)"))
        got = {
            (r["doc"], r["tf"])
            for r in compile_count(node, idx).select("doc", "tf").collect()
        }
        idx_nopart = open_index(spark, windowed_index)
        idx_nopart.window_parts = None
        want = {
            (r["doc"], r["tf"])
            for r in compile_count(node, idx_nopart).select("doc", "tf").collect()
        }
        assert got == want
        # and in a pure count context the part rewrite stays available
        plain = transform(parse("#double(#od:1(def return))"))
        plan = compile_count(plain, idx)._jdf.queryExecution().toString()
        assert "window.od1.2" in plan
    finally:
        unregister_count_op("double")


def test_uw3_build_refuses_unbounded(spark, tmp_path):
    """n>=3 unordered-window builds are combinatorial and must refuse to
    run without an explicit cost bound (frequency_threshold>=2 or
    max_doc_candidates); with a too-small cap the kernel raises loudly
    rather than silently truncating (VERDICT r4 item 6)."""
    corpus = synthetic_code_corpus(spark, n_docs=8, seed=3)
    numbered = assign_doc_ids(corpus)
    d = str(tmp_path / "idx")

    with pytest.raises(ValueError, match="combinatorial"):
        build_unordered_window_postings(numbered, d, width=12, n=3)

    with pytest.raises(Exception, match="max_doc_candidates"):
        build_unordered_window_postings(
            numbered, d, width=12, n=3, max_doc_candidates=3
        )

    # threshold alone satisfies the guard (part prunes, build bounded)
    build_unordered_window_postings(
        numbered, d, width=12, n=3, frequency_threshold=2
    )
