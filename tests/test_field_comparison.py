"""Typed fields part + #greater/#less/#between/#equals as query-language
operators (index/disk/FieldIndexWriter.java, FieldComparisonIterator.java:
45-81, GreaterThanIterator.java, InBetweenIterator.java:63-90 strict
bounds, EqualityIterator.java; rewrite ImplicitFeatureCastTraversal.java:
59-81; formats BuildIndex.java:502-517)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from galago_git_spark.index.fieldindex import parse_field_value
from galago_git_spark.query.executor import (
    compile_indicator,
    execute,
    inline_index,
)
from galago_git_spark.query.parser import parse
from galago_git_spark.query.traversals import transform

FORMATS = {"stars": "long", "lang": "string", "score": "double", "pub": "date"}

ROWS = [
    (0, "alpha data table merge", "py", 10, 1.5, "1/7/1920"),
    (1, "beta data row", "go", 25, 2.5, "6/16/1980"),
    (2, "gamma table scan", "py", 40, 0.5, "1/1/2001"),
    (3, "delta data table", "rs", 25, 3.5, "12/31/1999"),
    (4, "epsilon row merge", "go", 5, 2.0, "1/1/2020"),
]


@pytest.fixture(scope="module")
def fidx(spark):
    docs = spark.createDataFrame(
        ROWS, "doc_id long, text string, lang string, stars long, score double, pub string"
    ).persist()
    yield inline_index(docs, field_formats=FORMATS)
    docs.unpersist()


def _docs_of(node_str, idx):
    node = transform(parse(node_str))
    return {r["doc"] for r in compile_indicator(node, idx).collect()}


def test_rewrite_shape():
    node = transform(parse("#between(stars 10 40)"))
    assert node.operator == "between"
    assert node.children[0].operator == "field"
    assert node.parameters["0"] == "10" or node.parameters["0"] == 10
    assert node.parameters["1"] == "40" or node.parameters["1"] == 40


def test_long_comparisons(fidx):
    assert _docs_of("#greater(stars 24)", fidx) == {1, 2, 3}
    assert _docs_of("#less(stars 10)", fidx) == {4}
    # strict bounds on both ends (InBetweenIterator.java:63-90)
    assert _docs_of("#between(stars 10 40)", fidx) == {1, 3}
    assert _docs_of("#equals(stars 25)", fidx) == {1, 3}


def test_string_comparisons(fidx):
    assert _docs_of("#equals(lang py)", fidx) == {0, 2}
    assert _docs_of("#greater(lang py)", fidx) == {3}
    assert _docs_of("#less(lang py)", fidx) == {1, 4}


def test_double_and_date(fidx):
    assert _docs_of("#greater(score 2.0)", fidx) == {1, 3}
    assert _docs_of("#between(pub 1/1/1900 1/1/2000)", fidx) == {0, 1, 3}
    assert _docs_of("#greater(pub 6/16/1980)", fidx) == {2, 3, 4}


def test_date_value_parse_matches_utc_epoch():
    ms = parse_field_value("date", "6/16/1980")
    dt = datetime.datetime(1980, 6, 16, tzinfo=datetime.timezone.utc)
    assert ms == int(dt.timestamp() * 1000)


def test_require_composition_ranked(fidx):
    out = execute(
        "#require(#between(stars 10 40) #combine:scorer=bm25(data table))",
        fidx, k=10,
    ).collect()
    assert {r["doc"] for r in out} <= {1, 3}
    assert [r["doc"] for r in out] == sorted(
        [r["doc"] for r in out],
        key=lambda d: [-r["score"] for r in out if r["doc"] == d][0],
    )


def test_bool_over_comparison(fidx):
    out = execute("#bool(#equals(lang go))", fidx, k=10).collect()
    assert {r["doc"] for r in out} == {1, 4}
    assert all(r["score"] == 1.0 for r in out)


def test_missing_field_raises(fidx):
    with pytest.raises(ValueError, match="no typed field"):
        _docs_of("#greater(bogus 1)", fidx)


def test_on_disk_fields_part_roundtrip(spark, tmp_path):
    from galago_git_spark.index.build import build_index, open_index
    from galago_git_spark.sources.corpus import synthetic_code_corpus

    corpus = synthetic_code_corpus(spark, n_docs=40, seed=3)
    build_index(corpus, str(tmp_path), field_formats={"lang": "string"})
    idx = open_index(spark, str(tmp_path))
    assert idx.field_formats == {"lang": "string"}
    langs = {r["lang"] for r in corpus.select("lang").distinct().collect()}
    some = sorted(langs)[0]
    got = _docs_of(f"#equals(lang {some})", idx)
    names = idx.names.filter(F.col("lang") == some)
    want = {r["doc"] for r in names.select("doc").collect()}
    assert got == want and got


def test_date_field_build_is_session_tz_invariant(spark):
    """Build-side date encoding must be epoch-of-UTC like the query side
    (parse_field_value) regardless of spark.sql.session.timeZone — a
    non-UTC cluster must not shift #between boundaries."""
    from galago_git_spark.index.fieldindex import build_field_part

    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        docs = spark.createDataFrame(
            [(0, "6/16/1980"), (1, "1/2/2020"), (2, "2020-01-02 03:00:00")],
            "doc_id long, pub string",
        )
        part = build_field_part(docs, {"pub": "date"})
        got = {r["doc"]: r["nval"] for r in part.collect()}
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
    assert got[0] == parse_field_value("date", "6/16/1980")
    assert got[1] == parse_field_value("date", "1/2/2020")
    want_ts = int(
        datetime.datetime(
            2020, 1, 2, 3, tzinfo=datetime.timezone.utc
        ).timestamp() * 1000
    )
    assert got[2] == want_ts
