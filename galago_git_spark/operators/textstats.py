"""Text-analysis operators: language id, quality scoring, token counting,
document fingerprinting. All native Column expressions (JVM-side) with
DuckDB-reproducible math for the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from galago_git_spark.functions.tokenize import tokenize_col
from galago_git_spark.operators.hashing import md5_long

# small deterministic marker lists (inquery-style stopwords for en)
STOPWORDS_EN = [
    "the", "a", "of", "to", "and", "in", "is", "for", "this", "that",
    "it", "on", "as", "with", "was", "are", "be", "by", "at", "an",
]
LANG_MARKERS = {
    "en": ["the", "and", "of", "is", "a"],
    "es": ["el", "la", "de", "que", "y"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "les", "et", "des"],
}

# BPE-ish token regex: word pieces or single non-space punctuation
BPE_TOKEN_RE = r"[a-z0-9_]+|[^a-z0-9_\s]"

FINGERPRINT_MOD = 2_147_483_647  # 2^31 - 1 (Mersenne prime rolling-hash mod)


def quality_features(
    docs: DataFrame, doc_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc, n_tokens, n_chars, avg_token_len, stopword_ratio, punct_ratio,
    uniq_ratio) — the standard cheap quality filters for training-data
    curation, all single-pass column expressions."""
    t = F.col("_terms")
    n_tokens = F.size(t)
    # sum of token lengths == length of the separator-free concatenation —
    # whole-stage-codegen'd, vs an interpreted per-element aggregate lambda
    total_len = F.length(F.concat_ws("", t))
    # membership as an In-set (hash lookup) instead of array_contains over
    # an array literal (a linear scan per token)
    n_stop = F.size(F.filter(t, lambda x: x.isin(*STOPWORDS_EN)))
    text = F.coalesce(F.col(text_col), F.lit(""))
    return docs.select(
        F.col(doc_col).alias("doc"),
        tokenize_col(F.col(text_col)).alias("_terms"),
        F.length(text).alias("n_chars"),
        F.length(F.regexp_replace(text, r"[a-zA-Z0-9_\s]", "")).alias("_n_punct"),
    ).select(
        "doc",
        n_tokens.alias("n_tokens"),
        F.col("n_chars"),
        F.when(n_tokens > 0, total_len / n_tokens).otherwise(F.lit(0.0)).alias("avg_token_len"),
        F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0)).alias("stopword_ratio"),
        F.when(F.col("n_chars") > 0, F.col("_n_punct") / F.col("n_chars"))
        .otherwise(F.lit(0.0))
        .alias("punct_ratio"),
        F.when(n_tokens > 0, F.size(F.array_distinct(t)) / n_tokens)
        .otherwise(F.lit(0.0))
        .alias("uniq_ratio"),
    )


def lang_id(
    docs: DataFrame, doc_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc, pred_lang): argmax over marker-word hit counts; ties broken
    by language code ascending. A deterministic n-gram/stopword heuristic
    (a real model would slot in as a pandas UDF at the same signature)."""
    base = docs.select(
        F.col(doc_col).alias("doc"), tokenize_col(F.col(text_col)).alias("t")
    )
    scores = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        arr = F.array(*[F.lit(m) for m in markers])
        scores.append(
            F.struct(
                F.size(F.filter(F.col("t"), lambda x: F.array_contains(arr, x))).alias("hits"),
                F.lit(lang).alias("lang"),
            )
        )
    # max by (hits desc, lang asc): negate hits and take array_min
    best = F.array_min(
        F.array(*[F.struct((-s.hits).alias("neg"), s.lang.alias("lang")) for s in scores])
    )
    return base.select("doc", best.lang.alias("pred_lang"))


def token_counts(
    docs: DataFrame, doc_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc, ws_tokens, bpe_tokens): whitespace split count and a BPE-ish
    regex token count (sub-word-ish granularity for budget estimates)."""
    return docs.select(
        F.col(doc_col).alias("doc"),
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).alias("ws_tokens"),
        F.regexp_count(F.lower(F.col(text_col)), F.lit(BPE_TOKEN_RE)).alias("bpe_tokens"),
    )


def fingerprint(
    docs: DataFrame, doc_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc, fingerprint): order-sensitive rolling document fingerprint —
    sum over positions of pos * h(term) mod (2^31-1). Order-sensitive
    (reordered docs differ), exactly reproducible in SQL, and computable
    with one explode + groupBy."""
    t = docs.select(
        F.col(doc_col).alias("doc"), tokenize_col(F.col(text_col)).alias("terms")
    )
    tok = t.select("doc", F.posexplode("terms").alias("pos0", "term"))
    contrib = (
        (F.col("pos0") + 1) * (md5_long(F.col("term")) % FINGERPRINT_MOD)
    ) % FINGERPRINT_MOD
    return (
        tok.withColumn("c", contrib)
        .groupBy("doc")
        .agg((F.sum("c") % FINGERPRINT_MOD).alias("fingerprint"))
    )
