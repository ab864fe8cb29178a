"""Field extent extraction + #inside containment-join tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from galago_git_spark.functions.fields import field_extents_py, line_field
from galago_git_spark.functions.tokenize import tokenize_py
from galago_git_spark.query.executor import compile_count, inline_index
from galago_git_spark.query.parser import parse
from galago_git_spark.query.traversals import transform
from galago_git_spark.sources.corpus import synthetic_code_corpus

SAMPLE = """def parse_row(batch, col):
    # merge the sorted runs here
    x = run_load(batch)
    # second comment line
def other(y):
    return y"""


def test_line_field_classifier():
    assert line_field("  # comment") == "comment"
    assert line_field("def foo():") == "def"
    assert line_field("    x = 1") is None


def test_extent_positions_align_with_global_tokens():
    exts = field_extents_py(SAMPLE)
    toks = tokenize_py(SAMPLE)
    # every extent's token slice reproduces the line's own tokens
    by_field = {}
    for f, b, e in exts:
        by_field.setdefault(f, []).append(toks[b - 1 : e - 1])
    assert by_field["comment"][0] == ["merge", "the", "sorted", "runs", "here"]
    assert by_field["comment"][1] == ["second", "comment", "line"]
    assert by_field["def"][0] == ["def", "parse_row", "batch", "col"]
    assert by_field["def"][1] == ["def", "other", "y"]
    assert by_field["lead"][0] == toks[:10]


def test_inside_matches_python_oracle(spark):
    corpus = synthetic_code_corpus(spark, n_docs=80, seed=42)
    docs = corpus.select(
        F.monotonically_increasing_id().alias("doc_id"),
        F.col("content").alias("text"),
    ).persist()
    idx = inline_index(docs, fields=True)
    node = transform(parse("#inside(set_block_v20 #field:comment())"))
    got = {
        (r["doc"], r["tf"])
        for r in compile_count(node, idx).select("doc", "tf").collect()
    }
    want = set()
    for row in docs.collect():
        toks = tokenize_py(row["text"])
        exts = [
            (b, e) for f, b, e in field_extents_py(row["text"]) if f == "comment"
        ]
        tf = sum(
            1
            for p, t in enumerate(toks, start=1)
            if t == "set_block_v20" and any(b <= p and p + 1 <= e for b, e in exts)
        )
        if tf > 0:
            want.add((row["doc_id"], tf))
    assert want, "fixture must exercise comment fields"
    assert got == want
    docs.unpersist()


def test_inside_requires_fields(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    idx = inline_index(docs)
    with pytest.raises(ValueError, match="fields=True"):
        compile_count(transform(parse("#inside(a #field:lead())")), idx)


def test_inside_field_part_rewrite_identical(spark, tmp_path):
    """InsideToFieldPartTraversal analog: #inside over a term leaf resolves
    to the prebuilt fieldpostings part; results identical to the
    containment join (noOpt=true forces the join path)."""
    from galago_git_spark.index.build import build_index, open_index
    from galago_git_spark.query.nodes import Node

    corpus = synthetic_code_corpus(spark, n_docs=60, seed=9)
    build_index(corpus, str(tmp_path), fields=True)
    idx = open_index(spark, str(tmp_path))
    assert idx.field_postings is not None
    node = transform(parse("#inside(set_block_v20 #field:comment())"))
    fast = {
        (r["doc"], r["tf"], tuple(r["positions"]))
        for r in compile_count(node, idx).collect()
    }
    node_join = Node("inside", {"noOpt": True}, node.children)
    slow = {
        (r["doc"], r["tf"], tuple(r["positions"]))
        for r in compile_count(node_join, idx).collect()
    }
    assert fast and fast == slow
