"""On-disk stemmed postings part + query routing.

Reference semantics: ``BuildIndex.java:409-455`` writes
``postings.<stemmer>`` alongside the raw part; ``DiskIndex.java:200-222``
makes it the default counts/extents part; ``TextPartAssigner.java``
routes bare query terms to it, with ``Stemmer.stemAsRequired`` applied
to the query side. Here: ``build_index(stemmer="porter2")`` →
``open_index`` routing → ``execute(part=...)`` overrides.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from galago_git_spark.index.build import build_index, open_index
from galago_git_spark.query.executor import execute, inline_index


def _corpus(spark):
    rows = [
        ("r", "a.py", "c1", "py", "running tables fast"),
        ("r", "b.py", "c2", "py", "run the table quickly run"),
        ("r", "c.py", "c3", "py", "merge queries merging query"),
    ]
    return spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )


def test_build_writes_stemmed_parts(spark, tmp_path):
    idx_dir = str(tmp_path / "idx")
    manifest = build_index(_corpus(spark), idx_dir, stemmer="porter2")
    assert "postings.porter2" in manifest["parts"]
    assert "termstats.porter2" in manifest["parts"]
    assert manifest["params"]["stemmer"] == "porter2"

    idx = open_index(spark, idx_dir)
    assert idx.default_text_part == "postings.porter2"
    assert "porter2" in idx.stemmed_parts

    sp = {
        (r["term"], r["doc"]): (r["tf"], list(r["positions"]))
        for r in idx.stemmed_parts["porter2"]["postings"].collect()
    }
    # variants merge: doc with "merge ... merging ..." has one merg row,
    # tf 2, positions union-sorted (token coordinates preserved)
    docs = {r["path"]: r["doc"] for r in idx.names.collect()}
    merg = sp[("merg", docs["c.py"])]
    assert merg == (2, [1, 3])
    assert sp[("queri", docs["c.py"])] == (2, [2, 4])
    # raw part unchanged
    raw_terms = {
        r["term"] for r in idx.postings.filter(F.col("doc") == docs["c.py"]).collect()
    }
    assert raw_terms == {"merge", "queries", "merging", "query"}


def test_query_routing_and_part_escape(spark, tmp_path):
    idx_dir = str(tmp_path / "idx2")
    build_index(_corpus(spark), idx_dir, stemmer="porter2")
    idx = open_index(spark, idx_dir)
    docs = {r["path"]: r["doc"] for r in idx.names.collect()}

    # inflected term through the stemmed default part: tabl matches both
    hits = {r["doc"] for r in execute("#combine(tables)", idx, k=5).collect()}
    assert hits == {docs["a.py"], docs["b.py"]}
    # raw-part escape: surface form only
    hits_raw = {
        r["doc"]
        for r in execute("#combine(tables)", idx, k=5, part="postings").collect()
    }
    assert hits_raw == {docs["a.py"]}
    # explicit stemmed part name equals the default routing
    a = execute("#combine(tables queries)", idx, k=5).collect()
    b = execute("#combine(tables queries)", idx, k=5,
                part="postings.porter2").collect()
    assert [(r["doc"], round(r["score"], 9)) for r in a] == [
        (r["doc"], round(r["score"], 9)) for r in b
    ]
    # unknown part fails loudly
    import pytest

    with pytest.raises(ValueError, match="unknown text part"):
        execute("#combine(tables)", idx, k=5, part="postings.nope")


def test_windows_on_stemmed_positions(spark, tmp_path):
    # od:1 over stems uses the merged position lists — 'running tables'
    # stems to run~tabl, adjacent only in doc a
    idx_dir = str(tmp_path / "idx3")
    build_index(_corpus(spark), idx_dir, stemmer="porter2")
    idx = open_index(spark, idx_dir)
    docs = {r["path"]: r["doc"] for r in idx.names.collect()}
    hits = {r["doc"] for r in execute('"running tables"', idx, k=5).collect()}
    assert hits == {docs["a.py"]}


def test_no_double_stem_on_nested_evaluation(spark):
    # require/reject recursion re-enters score_frame with the routed view;
    # 'universities' double-stemmed would become 'univer' (porter2 is not
    # idempotent) and match nothing
    docs = spark.createDataFrame(
        [(0, "universities univers research"), (1, "research only")],
        ["doc_id", "text"],
    )
    idx = inline_index(docs, stemmer="porter2")
    rows = execute(
        "#require(#band(research) #combine(universities))", idx, k=5
    ).collect()
    assert {r["doc"] for r in rows} == {0}


def test_inline_matches_ondisk(spark, tmp_path):
    idx_dir = str(tmp_path / "idx4")
    build_index(_corpus(spark), idx_dir, stemmer="porter2")
    ondisk = open_index(spark, idx_dir)
    docs_inline = _corpus(spark).selectExpr(
        "row_number() over (order by path) - 1 as doc_id", "content as text"
    )
    inline = inline_index(docs_inline, stemmer="porter2")
    a = sorted(
        (r["term"], r["tf"])
        for r in ondisk.stemmed_parts["porter2"]["termstats"]
        .selectExpr("term", "cf as tf").collect()
    )
    b = sorted(
        (r["term"], r["tf"])
        for r in inline.stemmed_parts["porter2"]["termstats"]
        .selectExpr("term", "cf as tf").collect()
    )
    assert a == b


def test_stemmed_packed_wand_rank_identity(spark, tmp_path):
    """build(packed=True, stemmer=...) writes blocks.<stemmer>;
    PackedReader auto-routes to the stemmed tier (text_part resolution)
    and wand_topk over stemAsRequired'd terms is rank-identical to the
    exhaustive stemmed-default path."""
    import os

    from galago_git_spark.functions.stem import porter2, stem_as_required
    from galago_git_spark.query.wand import PackedReader, wand_topk

    rows = [
        ("r", f"d{i}.py", f"c{i}", "py",
         f"running tables merge queries {'fast ' * (i % 4)} value {i}")
        for i in range(30)
    ]
    docs = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    d = str(tmp_path / "idx")
    build_index(docs, d, positions=True, packed=True, stemmer="porter2",
                block_size=16, bucket_bits=4)
    assert os.path.exists(os.path.join(d, "blocks.porter2", "_SUCCESS"))
    idx = open_index(spark, d)
    ex = execute("#combine:scorer=bm25(tables queries fast)", idx, k=8,
                 default_scorer="bm25").collect()
    reader = PackedReader(spark, d)
    assert reader.text_part == "postings.porter2"
    assert reader.stemmer_name == "porter2"
    terms = [stem_as_required(t, porter2)
             for t in ["tables", "queries", "fast"]]
    wd = wand_topk(spark, d, terms, k=8, reader=reader).collect()
    assert [(r["doc"], round(r["score"], 9)) for r in ex] == [
        (r["doc"], round(r["score"], 9)) for r in wd
    ]
    # explicit raw tier still reachable
    raw_reader = PackedReader(spark, d, text_part="postings")
    assert raw_reader.stemmer_name is None
    raw = wand_topk(spark, d, ["tables", "queries", "fast"], k=8,
                    reader=raw_reader).collect()
    ex_raw = execute("#combine:scorer=bm25(tables queries fast)", idx, k=8,
                     default_scorer="bm25", part="postings").collect()
    assert [(r["doc"], round(r["score"], 9)) for r in raw] == [
        (r["doc"], round(r["score"], 9)) for r in ex_raw
    ]
