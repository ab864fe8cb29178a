"""Tokenization — the engine's analog of Galago's TagTokenizer.

Reference semantics (``core/.../parse/TagTokenizer.java:38-108``,
``core/.../parse/tagtok/TagTokenizerParser.java:372-396``,
``TagTokenizerNormalization.java:40-180``): a deterministic pure function
text -> list of lowercase terms; punctuation splits; apostrophes deleted
(``it's`` -> ``its``); acronyms with single-char parts merged
(``I.B.M.`` -> ``ibm``) while multi-char dotted tokens split
(``umass.edu`` -> ``umass``, ``edu``); tokens longer than
``MAX_TOKEN_LENGTH`` = 100 bytes dropped
(``TagTokenizerParser.java:32-42``).

This engine is code-aware per the north rule: ``_`` is a word character
(identifiers like ``snake_case`` stay whole) and digits are kept. The
canonical rule, shared verbatim by the engine and the DuckDB oracle SQL:

    lower(text) -> delete apostrophes -> split on ``[^a-z0-9_]+``
    -> drop empty tokens and tokens longer than 100 chars

Three implementations with identical output:

- :func:`tokenize_col` — native Spark ``Column`` expression (JVM-side,
  whole-stage-codegen; the hot path for index builds).
- :func:`tokenize_pandas` — Arrow-vectorized pandas UDF (the north-rule
  "vectorized pandas/Arrow UDF" path; useful where a Python-side hook is
  needed, e.g. pluggable term transforms).
- :func:`tokenize_py` — plain-Python oracle used by unit tests and the
  pure-Python golden scorer.

Plus :func:`tokenize_galago_full`, a pandas UDF with the *full* Galago
acronym/period normalization for parity experiments (not the canonical
build rule — dotted tokens differ by design; the north rule fixes the
code-aware rule above).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAX_TOKEN_LENGTH = 100  # TagTokenizerParser.java:32-42
SPLIT_PATTERN = r"[^a-z0-9_]+"
_SPLIT_RE = re.compile(SPLIT_PATTERN)
# Unicode-word tokenizer for non-Latin corpora (e.g. Arabic builds with
# stemmer="arabic"): \w in Python re is Unicode letters/digits/underscore
# — the TagTokenizer keeps Unicode word chars too (TagTokenizer.java
# processes full UTF-16). The Spark-native equivalent of this class is
# the Java regex [^\p{L}\p{N}_]+.
UNICODE_SPLIT_PATTERN = r"[^\w]+"
_UNICODE_SPLIT_RE = re.compile(UNICODE_SPLIT_PATTERN, re.UNICODE)
_APOSTROPHES = "'’"  # ASCII + right-single-quote, TagTokenizerNormalization.java:86-112


def tokenize_col(text: Column) -> Column:
    """Canonical tokenizer as a native Spark Column expression.

    Stays entirely inside whole-stage codegen: lower, regexp_replace,
    split, filter. Returns ``array<string>``.
    """
    cleaned = F.regexp_replace(
        F.lower(F.coalesce(text, F.lit(""))), f"[{_APOSTROPHES}]", ""
    )
    toks = F.split(cleaned, SPLIT_PATTERN)
    return F.filter(
        toks, lambda t: (F.length(t) > 0) & (F.length(t) <= MAX_TOKEN_LENGTH)
    )


def _tokenize_series(s: pd.Series, split_re=None) -> pd.Series:
    """Vectorized pandas implementation of the canonical rule.
    ``split_re`` swaps the separator class (default: code-aware ASCII;
    pass ``_UNICODE_SPLIT_RE`` for Unicode-word tokenization)."""
    cleaned = (
        s.fillna("")
        .str.lower()
        .str.replace(f"[{_APOSTROPHES}]", "", regex=True)
    )
    split = cleaned.str.split(split_re or _SPLIT_RE, regex=True)
    return split.map(
        lambda toks: [t for t in toks if t and len(t) <= MAX_TOKEN_LENGTH]
    )


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_pandas(s: pd.Series) -> pd.Series:
    """Canonical tokenizer as an Arrow-batched pandas UDF."""
    return _tokenize_series(s)


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_pandas_unicode(s: pd.Series) -> pd.Series:
    """Unicode-word tokenizer as an Arrow-batched pandas UDF (non-Latin
    corpora; same normalization, ``\\w``-class separators)."""
    return _tokenize_series(s, _UNICODE_SPLIT_RE)


def tokenize_py(text: str | None) -> list[str]:
    """Plain-Python canonical tokenizer (oracle for tests)."""
    if not text:
        return []
    cleaned = text.lower()
    for ch in _APOSTROPHES:
        cleaned = cleaned.replace(ch, "")
    return [
        t
        for t in _SPLIT_RE.split(cleaned)
        if t and len(t) <= MAX_TOKEN_LENGTH
    ]


# --- fused tokenize + per-doc term frequencies ------------------------------

def group_positions(docs_rep, terms, pos) -> "pd.DataFrame":
    """Group (doc, term, pos) rows into (doc, term, tf, positions) with
    one stable lexsort + boundary split (all C-speed) — ~10x faster than
    groupby().agg(list) (a Python loop per group) at Arrow-batch token
    counts. Stability keeps each group's positions in original =
    ascending order, so no re-sort is needed."""
    import numpy as np

    codes, uniq = pd.factorize(pd.Series(terms), sort=False)
    order = np.lexsort((codes, docs_rep))
    sd, sc, sp = docs_rep[order], codes[order], pos[order]
    change = np.flatnonzero((np.diff(sd) != 0) | (np.diff(sc) != 0)) + 1
    starts = np.concatenate(([0], change))
    counts = np.diff(np.concatenate((starts, [len(sp)])))
    return pd.DataFrame({
        "doc": sd[starts],
        "term": uniq[sc[starts]],
        "tf": counts,
        "positions": np.split(sp, change),
    })

def doc_term_freqs_stream(positions: bool, tokenizer: str = "pandas"):
    """``mapInPandas`` kernel: (doc, content) batches -> (doc, term, tf
    [, positions]) rows, final with no further aggregation — every doc
    lives in exactly one Arrow batch, so per-doc counts computed here ARE
    the posting rows. This replaces explode + a 10^7-group JVM hash
    aggregate (which anti-scaled under shared-heap GC) with C-speed
    pandas groupbys inside each Python worker — the north-star shape
    ("tokenization ... with per-doc term frequencies" in one vectorized
    UDF)."""
    import numpy as np

    split_re = _UNICODE_SPLIT_RE if tokenizer == "unicode" else _SPLIT_RE

    def fn(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            tok_lists = _tokenize_series(pdf["content"], split_re).to_list()
            lengths = np.fromiter((len(t) for t in tok_lists), dtype=np.int64)
            keep = lengths > 0
            if not keep.any():
                continue
            docs_rep = np.repeat(pdf["doc"].to_numpy(), lengths)
            terms = np.concatenate([t for t in tok_lists if t])
            if positions:
                pos = np.concatenate(
                    [np.arange(1, n + 1) for n in lengths[keep]]
                )
                yield group_positions(docs_rep, terms, pos)
            else:
                out = pd.DataFrame({"doc": docs_rep, "term": terms})
                g = (
                    out.groupby(["doc", "term"], sort=False)
                    .size()
                    .reset_index(name="tf")
                )
                yield g

    return fn


def doc_term_freqs(docs_with_ids, positions: bool = False,
                   tokenizer: str = "pandas"):
    """(doc, content) -> posting rows DataFrame via one fused UDF pass."""
    schema = "doc long, term string, tf long"
    if positions:
        schema += ", positions array<int>"
    return docs_with_ids.select("doc", "content").mapInPandas(
        doc_term_freqs_stream(positions, tokenizer), schema=schema
    )


# --- full Galago-style normalization (acronyms/periods) -------------------

_DOTTED_RE = re.compile(r"^[a-z0-9_]+(\.[a-z0-9_]+)+\.?$")


def _normalize_dotted(token: str) -> list[str]:
    """Galago TagTokenizerNormalization acronym rule: if every
    period-separated part is one char, merge (``i.b.m.`` -> ``ibm``);
    otherwise split (``umass.edu`` -> [``umass``, ``edu``])."""
    parts = [p for p in token.split(".") if p]
    if all(len(p) == 1 for p in parts):
        return ["".join(parts)]
    return parts


def tokenize_galago_full_py(text: str | None) -> list[str]:
    """Full Galago-style tokenizer in Python: keeps ``.`` inside tokens
    during the split pass, then applies the acronym rule per token."""
    if not text:
        return []
    cleaned = text.lower()
    for ch in _APOSTROPHES:
        cleaned = cleaned.replace(ch, "")
    out: list[str] = []
    for raw in re.split(r"[^a-z0-9_.]+", cleaned):
        if not raw:
            continue
        raw = raw.strip(".")
        if not raw or len(raw) > MAX_TOKEN_LENGTH:
            continue
        if "." in raw:
            out.extend(t for t in _normalize_dotted(raw) if t)
        else:
            out.append(raw)
    return out


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_galago_full(s: pd.Series) -> pd.Series:
    return s.map(tokenize_galago_full_py)
