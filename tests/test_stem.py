"""Porter2 stemmer: golden vectors + Python-vs-SQL differential.

The golden fixture (tests/data/porter2_golden.tsv, 16k words) records the
reference's stemmer behavior (``Porter2Stemmer.java`` delegating to
``org/tartarus/snowball/ext/englishStemmer``) over a vector set covering
every algorithm step, the exception lists, apostrophes, digits,
underscores, and random strings. Both the Python implementation
(functions/stem.py) and the independent pure-SQL implementation
(functions/stem_sql.py, used by the DuckDB oracles) must match it
word-for-word, and each other on hypothesis-generated input.
"""

from __future__ import annotations

import os

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from galago_git_spark.functions.stem import (
    get_stemmer,
    porter2,
    register_stemmer,
    stem_as_required,
)
from galago_git_spark.functions.stem_sql import porter2_ctes

FIXTURE = os.path.join(os.path.dirname(__file__), "data", "porter2_golden.tsv")


def _golden() -> dict[str, str]:
    out = {}
    with open(FIXTURE) as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) == 2:
                out[parts[0]] = parts[1]
    return out


def _sql_stem(words: list[str]) -> dict[str, str]:
    con = duckdb.connect()
    con.execute("CREATE TABLE vocab AS SELECT unnest(?) AS term", [words])
    rows = con.execute(
        f"WITH {porter2_ctes('vocab')} SELECT term, stem FROM stemmed"
    ).fetchall()
    return dict(rows)


def test_python_porter2_matches_reference_golden():
    golden = _golden()
    bad = [(w, g, porter2(w)) for w, g in golden.items() if porter2(w) != g]
    assert not bad, f"{len(bad)} mismatches, first: {bad[:5]}"


def test_sql_porter2_matches_reference_golden():
    golden = _golden()
    got = _sql_stem(list(golden))
    bad = [(w, g, got[w]) for w, g in golden.items() if got[w] != g]
    assert not bad, f"{len(bad)} mismatches, first: {bad[:5]}"


def test_corpus_vocab_stems():
    # the driver corpus vocabulary: the five terms porter2 actually changes
    assert porter2("customer") == "custom"
    assert porter2("merge") == "merg"
    assert porter2("query") == "queri"
    assert porter2("table") == "tabl"
    assert porter2("value") == "valu"
    # inflected query forms land on the same stems (the routing test's
    # non-vacuity: 'tables' matches nothing unstemmed)
    assert porter2("tables") == "tabl"
    assert porter2("queries") == "queri"
    assert porter2("merges") == porter2("merging") == "merg"


@settings(max_examples=300, deadline=None)
@given(
    st.text(
        alphabet="abcdefghijklmnopqrstuvwxy'_019",
        min_size=1,
        max_size=14,
    )
)
def test_python_vs_sql_differential(word):
    got = _sql_stem([word])
    assert got[word] == porter2(word)


def test_stem_as_required_windows():
    # Stemmer.java:94-101 — window keys stem per ~-component
    assert stem_as_required("running~tables", porter2) == "run~tabl"
    assert stem_as_required("running", porter2) == "run"


def test_registry_and_custom_transform():
    assert get_stemmer("null")("Running") == "Running"
    assert get_stemmer("porter2")("running") == "run"
    with pytest.raises(ValueError):
        get_stemmer("krovetz")  # north-rule exclusion: never registered
    register_stemmer("suffix_s", lambda t: t.rstrip("s") or t)
    try:
        assert get_stemmer("suffix_s")("tables") == "table"
    finally:
        from galago_git_spark.functions import stem as _stem

        _stem._STEMMERS.pop("suffix_s", None)


def test_stem_pandas_column(spark):
    from pyspark.sql import functions as F

    from galago_git_spark.functions.stem import stem_pandas

    df = spark.createDataFrame(
        [("running",), ("tables",), (None,), ("the",)], ["t"]
    )
    rows = df.select(stem_pandas(F.col("t"), "porter2").alias("s")).collect()
    assert [r["s"] for r in rows] == ["run", "tabl", None, "the"]
