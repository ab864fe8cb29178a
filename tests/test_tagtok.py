"""Tag-aware tokenization + SGML tag-span fields.

Reference: TagTokenizer.java:38-108 / TagTokenizerParser.java — markup
never reaches the token stream, script/style content is dropped
(ignoredTags), whitelisted tag spans become token-coordinate extents so
``term.title`` works on parsed-corpus indexes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from galago_git_spark.functions.tagtok import parse_tagged_py
from galago_git_spark.functions.tokenize import tokenize_py
from galago_git_spark.index.build import build_index, open_index
from galago_git_spark.query.executor import compile_count, execute, inline_index
from galago_git_spark.query.parser import parse
from galago_git_spark.query.traversals import transform


def test_markup_stripped_from_token_stream():
    toks, _ = parse_tagged_py("<TITLE>Fast Plans</TITLE> body text", ())
    assert toks == ["fast", "plans", "body", "text"]
    # without tag-awareness the canonical tokenizer leaks 'title'
    assert "title" in tokenize_py("<TITLE>Fast Plans</TITLE> body text")


def test_script_style_content_dropped():
    toks, _ = parse_tagged_py(
        "a <script>var x = hidden;</script> b <style>.c{}</style> c", ()
    )
    assert toks == ["a", "b", "c"]


def test_whitelisted_spans_and_nesting():
    toks, exts = parse_tagged_py(
        "<title>a b</title> mid <h1>c <title>d</title></h1>", ["title", "h1"]
    )
    assert toks == ["a", "b", "mid", "c", "d"]
    assert set(exts) == {("title", 1, 3), ("h1", 4, 6), ("title", 5, 6)}


def test_comments_cdata_and_unclosed():
    toks, exts = parse_tagged_py(
        "<!-- <title>x</title> --> real <title>open tail", ["title"]
    )
    assert toks == ["real", "open", "tail"]
    assert exts == [("title", 2, 4)]  # unclosed closes at doc end


def test_case_insensitive_tags_and_empty_span():
    _, exts = parse_tagged_py("<TITLE></TITLE> x <Title>y</tItLe>", ["title"])
    assert exts == [("title", 2, 3)]  # empty span dropped


@pytest.fixture(scope="module")
def tagged_index(spark, tmp_path_factory):
    rows = [
        ("r", f"d{i}.sgml", f"c{i}", "md",
         f"<DOC><TITLE>table plan {i % 3}</TITLE>"
         f"<script>junk table</script>"
         f"<TEXT>table row table merge scan {i}</TEXT></DOC>")
        for i in range(12)
    ]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    d = str(tmp_path_factory.mktemp("tagidx") / "idx")
    build_index(corpus, d, tag_fields=["title", "text"])
    return d


def test_ondisk_tag_build_and_term_dot_field(spark, tagged_index):
    idx = open_index(spark, tagged_index)
    # 'table.title' — one occurrence per doc inside <TITLE>; body 'table'
    # occurrences excluded; script content never indexed
    node = transform(parse("#inside(table #field:title())"))
    rows = compile_count(node, idx).collect()
    assert len(rows) == 12 and all(r["tf"] == 1 for r in rows)
    assert "junk" not in {
        r["term"] for r in idx.postings.select("term").distinct().collect()
    }
    # extents recorded in manifest params
    import json
    import os

    with open(os.path.join(tagged_index, "manifest.json")) as f:
        assert json.load(f)["params"]["tag_fields"] == ["title", "text"]


def test_part_vs_containment_identity(spark, tagged_index):
    """InsideToFieldPartTraversal parity: the prebuilt field-postings
    part and the extent containment join (noOpt=True) must agree row for
    row on a tag-fields build."""
    idx = open_index(spark, tagged_index)
    assert idx.field_postings is not None
    fast = compile_count(
        transform(parse("#inside(table #field:text())")), idx
    )
    slow = compile_count(
        transform(parse("#inside:noOpt=true(table #field:text())")), idx
    )
    a = sorted((r["doc"], r["tf"], list(r["positions"])) for r in fast.collect())
    b = sorted((r["doc"], r["tf"], list(r["positions"])) for r in slow.collect())
    assert a == b and len(a) == 12


def test_tag_fields_scoring_end_to_end(spark, tagged_index):
    idx = open_index(spark, tagged_index)
    rows = execute("#combine(#inside(plan #field:title()))", idx, k=15).collect()
    assert len(rows) == 12  # every doc's title has 'plan'


def test_inline_matches_ondisk_tag_build(spark, tagged_index):
    idx = open_index(spark, tagged_index)
    rows = [
        (f"<DOC><TITLE>table plan {i % 3}</TITLE>"
         f"<script>junk table</script>"
         f"<TEXT>table row table merge scan {i}</TEXT></DOC>",)
        for i in range(12)
    ]
    docs = spark.createDataFrame(rows, ["text"]).selectExpr(
        "row_number() over (order by text) - 1 as doc_id", "text"
    )
    inline = inline_index(docs, tag_fields=["title", "text"])
    a = sorted(
        (r["term"], r["df"], r["cf"])
        for r in idx.termstats.collect()
    )
    b = sorted(
        (r["term"], r["df"], r["cf"])
        for r in inline.termstats.collect()
    )
    assert a == b


def test_tag_fields_and_code_fields_exclusive(spark):
    docs = spark.createDataFrame([(0, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="mutually exclusive"):
        inline_index(docs, fields=True, tag_fields=["title"])
