"""Operator-extension surface (FeatureFactory.java:157-206 external
operators; ReplaceOperatorTraversal.java opRepls) and the document-fetch
tools (DumpDocFn/DumpDocIdFn/DumpDocNameFn)."""

from __future__ import annotations

import json
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from galago_git_spark.index.build import build_index, open_index
from galago_git_spark.operators.docs import doc_id, doc_name, fetch_document
from galago_git_spark.query.executor import (
    execute,
    register_scorer,
    unregister_scorer,
)
from galago_git_spark.query.parser import parse
from galago_git_spark.query.traversals import transform
from galago_git_spark.sources.corpus import synthetic_code_corpus


@pytest.fixture(scope="module")
def corpus_and_index(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("extdocs")
    cdir, idir = str(root / "corpus"), str(root / "idx")
    corpus = synthetic_code_corpus(spark, n_docs=60, seed=7)
    corpus.write.parquet(cdir)
    build_index(spark.read.parquet(cdir), idir, positions=True)
    return cdir, idir


# --------------------------------------------------------------------------
# register_scorer
# --------------------------------------------------------------------------

def test_register_scorer_runs_through_execute(spark, corpus_and_index):
    _, idir = corpus_and_index
    idx = open_index(spark, idir)

    def mylog(node, tf, length, ts, cs):
        return F.log(tf)

    register_scorer("mylog", mylog)
    try:
        got = [
            (r["doc"], round(r["score"], 9))
            for r in execute("#combine(#mylog(def))", idx, k=10).collect()
        ]
        want = [
            (r["doc"], round(r["score"], 9))
            for r in execute("#combine(#logcount(def))", idx, k=10).collect()
        ]
        assert got and got == want
    finally:
        unregister_scorer("mylog")
    with pytest.raises(ValueError):
        execute("#combine(#mylog(def))", idx, k=10).collect()


def test_register_scorer_reads_node_params(spark, corpus_and_index):
    _, idir = corpus_and_index
    idx = open_index(spark, idir)

    def constw(node, tf, length, ts, cs):
        w = node.get_float("w", 1.0)
        return F.when(tf > 0, F.lit(w)).otherwise(0.0)

    register_scorer("constw", constw)
    try:
        rows = execute("#combine:norm=false(#constw:w=2.5(def))", idx, k=5).collect()
        assert rows and all(abs(r["score"] - 2.5) < 1e-12 for r in rows)
    finally:
        unregister_scorer("constw")


# --------------------------------------------------------------------------
# opRepls user aliasing
# --------------------------------------------------------------------------

def test_op_repls_single_replacement(spark, corpus_and_index):
    _, idir = corpus_and_index
    idx = open_index(spark, idir)
    a = [
        (r["doc"], round(r["score"], 9))
        for r in execute(
            "#dummy(def return)", idx, k=10, op_repls={"dummy": "sdm"}
        ).collect()
    ]
    b = [
        (r["doc"], round(r["score"], 9))
        for r in execute("#sdm(def return)", idx, k=10).collect()
    ]
    assert a and a == b


def test_op_repls_list_nests(spark):
    # {"dummy": ["stopword", "combine"]} -> #dummy(..) becomes
    # #stopword(#combine(..)) before the standard pipeline
    # (ReplaceOperatorTraversal.java:15-22 list form)
    a = transform(
        parse("#dummy(def the return)"),
        op_repls={"dummy": ["stopword", "combine"]},
    )
    b = transform(parse("#stopword(#combine(def the return))"))
    assert str(a) == str(b)


# --------------------------------------------------------------------------
# doc fetch API
# --------------------------------------------------------------------------

def test_doc_name_id_roundtrip(spark, corpus_and_index):
    _, idir = corpus_and_index
    idx = open_index(spark, idir)
    name = doc_name(idx, 3)
    assert name and ":" in name and "@" in name
    assert doc_id(idx, name) == 3
    assert doc_id(idx, "no:such@doc") is None
    assert doc_name(idx, 10**9) is None


def test_fetch_document_by_name_and_number(spark, corpus_and_index):
    cdir, idir = corpus_and_index
    idx = open_index(spark, idir)
    corpus = spark.read.parquet(cdir)
    name = doc_name(idx, 5)
    d = fetch_document(idx, corpus, name, tokenize=True)
    assert d is not None and d["doc"] == 5 and d["name"] == name
    assert d["metadata"]["repo"] and d["metadata"]["commit"]
    assert d["text"] and isinstance(d["terms"], list) and d["terms"]
    # by internal number (int and digit-string)
    assert fetch_document(idx, corpus, 5)["text"] == d["text"]
    assert fetch_document(idx, corpus, "5")["doc"] == 5
    assert fetch_document(idx, corpus, "zz:zz@zz") is None


# --------------------------------------------------------------------------
# CLI: doc / doc-id / doc-name / build-window
# --------------------------------------------------------------------------

def _cli(args: list[str]) -> dict:
    out = subprocess.run(
        [sys.executable, "-m", "galago_git_spark", *args],
        capture_output=True, text=True, check=True, cwd="/root/repo",
    )
    return json.loads(
        [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    )


def test_doc_tools_cli(spark, corpus_and_index):
    cdir, idir = corpus_and_index
    idx = open_index(spark, idir)
    name = doc_name(idx, 2)
    r = _cli(["doc-id", "--index", idir, "--id", name, "--cores", "2"])
    assert r["doc"] == 2
    r = _cli(["doc-name", "--index", idir, "--doc", "2", "--cores", "2"])
    assert r["name"] == name
    r = _cli(["doc", "--index", idir, "--corpus", cdir, "--id", name,
              "--tokenize", "--cores", "2"])
    assert r["found"] and r["doc"] == 2 and r["text"] and r["terms"]
    r = _cli(["doc", "--index", idir, "--corpus", cdir, "--id", "a:b@c",
              "--cores", "2"])
    assert r["found"] is False


def test_build_window_cli(spark, corpus_and_index):
    cdir, idir = corpus_and_index
    r = _cli(["build-window", "--input", cdir, "--index", idir,
              "--unordered", "--width", "8", "--cores", "2"])
    assert r["part"] == "window.uw.n2.w8" and r["ordered"] is False
    r2 = _cli(["build-window", "--input", cdir, "--index", idir,
               "--n", "2", "--cores", "2"])
    assert r2["part"] == "window.od1.2"
    idx = open_index(spark, idir)
    assert ("uw", 8) in idx.window_parts and 2 in idx.window_parts
    # part-backed #uw matches the positional loop on the reopened index
    idx_nopart = open_index(spark, idir)
    idx_nopart.window_parts = None
    q = "#combine(#uw:8(def return))"
    a = [(r["doc"], round(r["score"], 9)) for r in execute(q, idx, k=10).collect()]
    b = [(r["doc"], round(r["score"], 9)) for r in execute(q, idx_nopart, k=10).collect()]
    assert a and a == b


def test_dump_doc_terms_and_manifest_cli(spark, corpus_and_index):
    _, idir = corpus_and_index
    idx = open_index(spark, idir)
    name = doc_name(idx, 1)
    r = _cli(["dump-doc-terms", "--index", idir, "--iid", "0",
              "--eid", name, "--cores", "2"])
    assert set(r["docs"]) == {"0", "1"}
    # oracle: distinct-term and total counts from the postings part
    want = (
        idx.postings.filter(F.col("doc") == 0)
        .agg(F.count(F.lit(1)), F.sum("tf"), F.max("tf"))
        .collect()[0]
    )
    assert r["docs"]["0"]["terms"] == want[0]
    assert r["docs"]["0"]["total"] == want[1]
    assert r["docs"]["0"]["max_tf"] == want[2]
    m = _cli(["dump-manifest", "--index", idir])
    assert "postings" in m["manifest"]["parts"]


def test_get_docs_jsonl_and_rm_terms_cli(spark, corpus_and_index, tmp_path):
    cdir, idir = corpus_and_index
    idx = open_index(spark, idir)
    names = [doc_name(idx, d) for d in (0, 3)]
    f = tmp_path / "ids.txt"
    f.write_text("\n".join(names + ["no:such@doc"]) + "\n")
    r = _cli(["get-docs-jsonl", "--index", idir, "--corpus", cdir,
              "--input", str(f), "--cores", "2"])
    assert r["requested"] == 3 and r["found"] == 2
    r = _cli(["get-rm-terms", "--index", idir, "--query", "#combine(def return)",
              "--num-terms", "5", "--cores", "2"])
    assert len(r["terms"]) == 5
    ws = [t["weight"] for t in r["terms"]]
    assert ws == sorted(ws, reverse=True) and ws[0] > 0


def test_operator_help_cli():
    r = _cli(["operator-help"])
    assert r["aliases"]["uw"] == "unordered"
    assert "ordered" in r["count_operators"]
    assert "bm25" in r["scorers"] and "dirichlet" in r["scorers"]
    assert "combine" in r["score_subtrees"]
    assert r["custom_scorers"] == []


def test_register_scorer_cannot_shadow_builtin(spark):
    with pytest.raises(ValueError, match="shadow"):
        register_scorer("bm25", lambda *a: None)
    with pytest.raises(ValueError, match="shadow"):
        register_scorer("combine", lambda *a: None)
    # unregistering a never-registered builtin name must be a no-op
    from galago_git_spark.query import traversals as tv
    unregister_scorer("bm25")
    assert "bm25" in tv.SCORERS


def test_register_scorer_cannot_shadow_alias_spellings(spark):
    # alias names are rewritten to canonical operators before scorer
    # dispatch, so a registration under them would be silently ignored —
    # they must be rejected like canonical names (r3 review finding)
    from galago_git_spark.query import traversals as tv

    for alias in ("linear", "od", "uw", "seqdep", "pl2scorer", "log-count"):
        assert alias in tv.ALIASES  # guard the fixture against alias churn
        with pytest.raises(ValueError, match="shadow"):
            register_scorer(alias, lambda *a: None)


def test_build_window_id_col_alignment(spark, tmp_path):
    """Window parts built with --id-col over a passthrough-id index must
    attribute tfs to the same doc ids the postings use (review finding:
    silent renumbering misalignment)."""
    from galago_git_spark.index.build import assign_doc_ids

    corpus = synthetic_code_corpus(spark, n_docs=40, seed=17)
    # stable external ids NOT equal to the rank order (shifted by 1000)
    with_ids = assign_doc_ids(corpus).withColumn(
        "myid", F.col("doc") + F.lit(1000)
    ).drop("doc")
    cdir = str(tmp_path / "corpus")
    with_ids.write.parquet(cdir)
    idir = str(tmp_path / "idx")
    _cli(["build", "--input", cdir, "--index", idir, "--positions",
          "--id-col", "myid", "--cores", "2"])
    _cli(["build-window", "--input", cdir, "--index", idir, "--unordered",
          "--width", "8", "--id-col", "myid", "--cores", "2"])
    idx = open_index(spark, idir)
    assert ("uw", 8) in idx.window_parts
    # ids in the part are the passthrough ids
    assert idx.window_parts[("uw", 8)].agg(F.min("doc")).collect()[0][0] >= 1000
    node = transform(parse("#uw:8(def return)"))
    from galago_git_spark.query.executor import compile_count

    idx_nopart = open_index(spark, idir)
    idx_nopart.window_parts = None
    a = {(r["doc"], r["tf"]) for r in compile_count(node, idx).select("doc", "tf").collect()}
    b = {(r["doc"], r["tf"]) for r in compile_count(node, idx_nopart).select("doc", "tf").collect()}
    assert a and a == b


def test_register_count_op_runs_through_execute(spark, corpus_and_index):
    # the count-iterator half of the FeatureFactory hook: a registered
    # #name must work anywhere a count subtree is legal — here under a
    # scorer inside #combine, compared against the equivalent built-in
    from galago_git_spark.query.executor import (
        register_count_op,
        unregister_count_op,
    )

    _, idir = corpus_and_index
    idx = open_index(spark, idir)

    def doubled(node, index, compile_count):
        child = compile_count(node.children[0], index)
        return child.withColumn("tf", F.col("tf") * 2)

    register_count_op("doubletf", doubled)
    try:
        got = [
            (r["doc"], round(r["score"], 9))
            for r in execute(
                "#combine(#bm25(#doubletf(def)))", idx, k=10
            ).collect()
        ]
        want = [
            (r["doc"], round(r["score"], 9))
            for r in execute(
                "#combine(#bm25(#countsum(def def)))", idx, k=10
            ).collect()
        ]
        assert got and got == want
        # shadow guards work both ways across the two registries
        with pytest.raises(ValueError, match="shadow"):
            register_count_op("counts", lambda *a: None)
        with pytest.raises(ValueError, match="shadow"):
            register_count_op("od", lambda *a: None)
        with pytest.raises(ValueError, match="shadow"):
            register_scorer("doubletf", lambda *a: None)
    finally:
        unregister_count_op("doubletf")
    with pytest.raises(ValueError):
        execute("#combine(#bm25(#doubletf(def)))", idx, k=10).collect()
