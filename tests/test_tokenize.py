"""Tokenizer golden tests (reference behaviors: TagTokenizer apostrophe
deletion and max token length; code-aware split is this engine's rule)."""

from __future__ import annotations

from pyspark.sql import functions as F

from galago_git_spark.functions.tokenize import (
    tokenize_col,
    tokenize_galago_full_py,
    tokenize_pandas,
    tokenize_py,
)

CASES = [
    ("This is a sample document", ["this", "is", "a", "sample", "document"]),
    ("If the shoe fits, it's ugly", ["if", "the", "shoe", "fits", "its", "ugly"]),
    ("doesn't mean anything", ["doesnt", "mean", "anything"]),
    ("def snake_case_fn(x):", ["def", "snake_case_fn", "x"]),
    ("CamelCase HTTP2 x-y", ["camelcase", "http2", "x", "y"]),
    ("", []),
    ("   \n\t ", []),
    ("a" * 101 + " ok", ["ok"]),  # >100 chars dropped
    ("a" * 100, ["a" * 100]),
]


def test_python_tokenizer_goldens():
    for text, want in CASES:
        assert tokenize_py(text) == want, text


def test_spark_native_matches_python(spark):
    texts = [t for t, _ in CASES] + ["x = 'it\\'s a_b' # c"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = df.select(tokenize_col(F.col("text")).alias("toks")).collect()
    for row, text in zip(got, texts):
        assert row["toks"] == tokenize_py(text), text


def test_pandas_udf_matches_native(spark):
    texts = [t for t, _ in CASES]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    native = [r["toks"] for r in df.select(tokenize_col(F.col("text")).alias("toks")).collect()]
    pudf = [r["toks"] for r in df.select(tokenize_pandas(F.col("text")).alias("toks")).collect()]
    assert native == pudf


def test_galago_full_acronyms():
    assert tokenize_galago_full_py("I.B.M. sells") == ["ibm", "sells"]
    assert tokenize_galago_full_py("visit umass.edu now") == ["visit", "umass", "edu", "now"]
