"""Corpus sources — the engine's analog of Galago's document sources.

Galago enumerates files and parses many formats
(``core/.../parse/DocumentStreamParser.java:40-63``); our input is already a
table per the north rule: ``(repo, path, commit, lang, content)``. This
module provides:

- :func:`synthetic_code_corpus` — deterministic (pure function of seed)
  distributed generator of a synthetic source-code corpus with Zipfian
  head-term skew (FIXTURES.md §1). Generated via ``spark.range`` +
  ``mapInPandas`` so the content of row *i* is independent of partitioning
  and cluster size.
- :func:`ten_doc_corpus` — the reference's 10-doc fixture
  (``core/src/test/.../LocalRetrievalTest.java:156-172``).
- :func:`micro_index_tables` — the reference's hand-built posting fixture
  (``LocalRetrievalTest.java:36-154``) with its golden stats, as pandas
  DataFrames ready to become Spark tables.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("content", T.StringType(), False),
    ]
)

_LANGS = ["py", "java", "c", "js", "go", "md"]
_KEYWORDS = {
    "py": ["def", "return", "class", "import", "self", "for", "in", "if", "None", "lambda"],
    "java": ["public", "class", "static", "void", "return", "import", "new", "final", "int", "throws"],
    "c": ["int", "return", "struct", "static", "void", "char", "sizeof", "include", "define", "const"],
    "js": ["function", "return", "const", "let", "var", "import", "export", "async", "await", "new"],
    "go": ["func", "return", "package", "import", "var", "type", "struct", "interface", "defer", "go"],
    "md": ["the", "a", "of", "to", "and", "in", "is", "for", "this", "code"],
}
_VOCAB_SIZE = 5000
_HEAD_TERM = "the_head_term"  # FIXTURES.md §6 skew fixture term


def _identifier_vocab() -> list[str]:
    """Deterministic identifier vocabulary (no RNG: pure construction)."""
    stems = [
        "get", "set", "run", "load", "parse", "merge", "index", "query", "score",
        "token", "block", "shard", "count", "term", "doc", "node", "heap", "sort",
        "read", "write", "hash", "split", "batch", "row", "col", "len", "max", "min",
    ]
    suffixes = ["", "_impl", "_fn", "_v2", "_buf", "_ptr", "_ctx", "_map", "_list", "_iter"]
    vocab: list[str] = []
    i = 0
    while len(vocab) < _VOCAB_SIZE:
        s = stems[i % len(stems)]
        t = stems[(i * 7 + 3) % len(stems)]
        suf = suffixes[(i * 13) % len(suffixes)]
        vocab.append(f"{s}_{t}{suf}{i // (len(stems) * len(stems))}")
        i += 1
    return vocab


_VOCAB = _identifier_vocab()


def _row_content(seed: int, i: int, lang: str, skew_head: bool) -> str:
    """Content for global row i — pure function of (seed, i)."""
    rng = np.random.Generator(np.random.Philox(key=np.uint64(seed * 1_000_003 + i)))
    n_tokens = int(rng.integers(30, 300))
    # Zipfian draw over the identifier vocab: head-term skew on purpose.
    ranks = rng.zipf(1.3, size=n_tokens) - 1
    ranks = np.minimum(ranks, _VOCAB_SIZE - 1)
    kws = _KEYWORDS[lang]
    words: list[str] = []
    for j, r in enumerate(ranks):
        if j % 7 == 0:
            words.append(kws[int(rng.integers(0, len(kws)))])
        else:
            words.append(_VOCAB[int(r)])
    lines: list[str] = []
    for start in range(0, len(words), 8):
        chunk = words[start : start + 8]
        kind = (start // 8 + i) % 4
        if kind == 0 and len(chunk) > 2:
            lines.append(f"def {chunk[0]}({', '.join(chunk[1:3])}):")
        elif kind == 1:
            lines.append("    # " + " ".join(chunk))
        elif kind == 2 and chunk:
            lines.append(f"    s = 'it\\'s {' '.join(chunk[:4])}'")
        else:
            lines.append("    " + " = ".join(chunk[:2]) + "(" + ", ".join(chunk[2:5]) + ")")
    if skew_head and (i % 100) < 95:  # head term in 95% of docs
        lines.append(f"    {_HEAD_TERM} = {_HEAD_TERM}")
    return "\n".join(lines)


def synthetic_code_corpus(
    spark: SparkSession,
    n_docs: int = 2000,
    seed: int = 42,
    n_repos: int = 20,
    skew_head: bool = False,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed, deterministic synthetic source-code corpus.

    Row *i*'s content depends only on ``(seed, i)`` — identical at any
    parallelism, which is what makes the two-cluster-size rank-identity
    check meaningful. Scales linearly: generation is embarrassingly
    parallel over ``spark.range``.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].to_numpy()
            rows = []
            for i in ids:
                i = int(i)
                lang = _LANGS[i % len(_LANGS)]
                repo = f"org/project-{i % n_repos}"
                path = f"src/module_{(i // 7) % 20}/file_{i}.{lang}"
                commit = hashlib.sha256(
                    f"{seed}:{repo}:{path}".encode()
                ).hexdigest()[:40]
                rows.append(
                    (repo, path, commit, lang, _row_content(seed, i, lang, skew_head))
                )
            yield pd.DataFrame(
                rows, columns=["repo", "path", "commit", "lang", "content"]
            )

    rng_df = spark.range(0, n_docs, 1, partitions or spark.sparkContext.defaultParallelism)
    return rng_df.mapInPandas(gen, schema=CORPUS_SCHEMA)


# --- reference fixtures ----------------------------------------------------

TEN_DOCS = [
    "This is a sample document",
    "The cat jumped over the moon",
    "If the shoe fits, it's ugly",
    "Though a program be but three lines long, someday it will have to be maintained.",
    "To be trusted is a greater compliment than to be loved",
    "Just because everything is different doesn't mean anything has changed.",
    "everything everything jumped sample ugly",
    "though cat moon cat cat cat",
    "document document document document",
    "program fits",
]


def ten_doc_corpus(spark: SparkSession) -> DataFrame:
    """LocalRetrievalTest.java:156-172 ten-doc corpus as a corpus table."""
    rows = [
        (
            "test",
            f"doc{i + 1}.txt",
            hashlib.sha256(f"test:doc{i + 1}".encode()).hexdigest()[:40],
            "md",
            text,
        )
        for i, text in enumerate(TEN_DOCS)
    ]
    return spark.createDataFrame(rows, schema=CORPUS_SCHEMA)


def micro_index_tables() -> dict[str, pd.DataFrame]:
    """Hand-built posting fixture from LocalRetrievalTest.makeIndex
    (``LocalRetrievalTest.java:36-154``): terms a/b with known postings,
    20 docs of length 100, manifest stats CL=10000, N=100.
    """
    postings = pd.DataFrame(
        [
            ("a", 1, 3, [1, 2, 3]),
            ("a", 3, 1, [1]),
            ("a", 5, 1, [1]),
            ("b", 1, 2, [2, 4]),
            ("b", 2, 1, [1]),
            ("b", 3, 1, [4]),
            ("b", 18, 1, [9]),
        ],
        columns=["term", "doc", "tf", "positions"],
    )
    lengths = pd.DataFrame({"doc": list(range(20)), "length": [100] * 20})
    names = pd.DataFrame(
        {"doc": list(range(20)), "name": [f"DOC{i}" for i in range(20)]}
    )
    stats = pd.DataFrame(
        [
            {
                "collection_length": 10000,
                "document_count": 100,
                "vocab_count": 20,
                "avg_doc_length": 100.0,
                "max_length": 100,
                "min_length": 100,
            }
        ]
    )
    termstats = (
        postings.groupby("term")
        .agg(df=("doc", "size"), cf=("tf", "sum"), max_tf=("tf", "max"))
        .reset_index()
    )
    return {
        "postings": postings,
        "lengths": lengths,
        "names": names,
        "stats": stats,
        "termstats": termstats,
    }
