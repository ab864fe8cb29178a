"""Scoring functions — exact Galago formulas, for rank-identity.

Each scorer exists in three forms with identical math:

- a plain-Python scalar (unit-test oracle / golden scorer),
- a numpy kernel (used inside the vectorized top-k kernels),
- a Spark ``Column`` expression builder (used by the relational executor).

Formulas pinned to the reference (verified against the golden constants of
``core/src/test/.../LocalRetrievalTest.java:237-243``):

- BM25 (``core/.../iterator/scoring/BM25ScoringIterator.java:47-59,120-124``):
  ``idf = ln(N / (df + 0.5))``;
  ``score = idf * tf*(k+1) / (tf + k*(1 - b + b*len/avgdl))``; b=0.75, k=1.2.
- Dirichlet (``DirichletScoringIterator.java:41-47,106-111``):
  ``ln((tf + mu*cf/CL) / (len + mu))``; mu=1500. Absent terms score with
  tf=0 (the background ``mu*cf/CL`` term) — this is why ``#combine``
  needs the union of matching docs scored under *every* child.
- Jelinek-Mercer (``JelinekMercerScorer.java:24-36``):
  ``ln(lambda*tf/len + (1-lambda)*cf/CL)``; lambda=0.5.

Collection statistics come from the *lengths* part's field statistics
(CL = sum(length), N = document count, avgdl = CL/N) — NOT from any
postings-part manifest override; verified numerically: the reference
golden values reproduce only with lengths-derived CL/N
(LocalRetrievalTest fixture: CL=2000, N=20 -> doc1 = -5.548387728381024).

``#combine`` (``ScoreCombinationIterator.java:50-80``): weighted arithmetic
mean; weights normalized to sum 1 when ``norm=true`` (the default).

Tie-break everywhere: score desc, then ascending docid
(``retrieval/ScoredDocument.java:41-52``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

BM25_B = 0.75
BM25_K = 1.2
DIRICHLET_MU = 1500.0
JM_LAMBDA = 0.5


@dataclass(frozen=True)
class CollectionStats:
    """Field statistics (FieldStatistics.java:16-32) for the scored field."""

    collection_length: int
    document_count: int

    @property
    def avg_doc_length(self) -> float:
        return self.collection_length / self.document_count


@dataclass(frozen=True)
class TermStats:
    """NodeStatistics (NodeStatistics.java:15-18): cf, df, max tf."""

    term: str
    df: int  # nodeDocumentCount
    cf: int  # nodeFrequency
    max_tf: int  # maximumCount


# --- BM25 -------------------------------------------------------------------

def bm25_idf(document_count: int, df: int) -> float:
    return math.log(document_count / (df + 0.5))


def bm25_py(tf: float, length: float, df: int, cs: CollectionStats,
            b: float = BM25_B, k: float = BM25_K) -> float:
    idf = bm25_idf(cs.document_count, df)
    return idf * (tf * (k + 1)) / (tf + k * (1 - b + b * length / cs.avg_doc_length))


def bm25_np(tf: np.ndarray, length: np.ndarray, idf: float, avgdl: float,
            b: float = BM25_B, k: float = BM25_K) -> np.ndarray:
    return idf * (tf * (k + 1)) / (tf + k * (1 - b + b * length / avgdl))


def bm25_col(tf: Column, length: Column, idf: Column | float, avgdl: float,
             b: float = BM25_B, k: float = BM25_K) -> Column:
    idf_c = F.lit(idf) if isinstance(idf, float) else idf
    denom = tf + F.lit(k) * (F.lit(1 - b) + F.lit(b) * length / F.lit(avgdl))
    return idf_c * (tf * F.lit(k + 1)) / denom


def bm25_max_score(max_tf: float, min_len: float, idf: float, avgdl: float,
                   b: float = BM25_B, k: float = BM25_K) -> float:
    """Per-term/per-block upper bound: BM25 is monotone increasing in tf and
    decreasing in len, so score(max_tf, min_len) bounds every posting.
    The reference's term-level analog: BM25ScoringIterator.java:61-105
    (maximumScore); block-level bounds strengthen it to block-max WAND."""
    return idf * (max_tf * (k + 1)) / (max_tf + k * (1 - b + b * min_len / avgdl))


# --- Dirichlet ----------------------------------------------------------------

def dirichlet_py(tf: float, length: float, cf: int, cs: CollectionStats,
                 mu: float = DIRICHLET_MU) -> float:
    background = cf / cs.collection_length if cf > 0 else 0.5 / cs.collection_length
    return math.log((tf + mu * background) / (length + mu))


def dirichlet_np(tf: np.ndarray, length: np.ndarray, background: float,
                 mu: float = DIRICHLET_MU) -> np.ndarray:
    return np.log((tf + mu * background) / (length + mu))


def dirichlet_col(tf: Column, length: Column, background: float,
                  mu: float = DIRICHLET_MU) -> Column:
    return F.log((tf + F.lit(mu * background)) / (length + F.lit(mu)))


# --- Jelinek-Mercer -----------------------------------------------------------

def jm_py(tf: float, length: float, cf: int, cs: CollectionStats,
          lam: float = JM_LAMBDA) -> float:
    background = cf / cs.collection_length if cf > 0 else 0.5 / cs.collection_length
    return math.log(lam * tf / length + (1 - lam) * background)


def jm_np(tf: np.ndarray, length: np.ndarray, background: float,
          lam: float = JM_LAMBDA) -> np.ndarray:
    return np.log(lam * tf / length + (1 - lam) * background)


def jm_col(tf: Column, length: Column, background: float,
           lam: float = JM_LAMBDA) -> Column:
    return F.log(F.lit(lam) * tf / length + F.lit((1 - lam) * background))


# --- combine ------------------------------------------------------------------

def normalize_weights(weights: list[float], norm: bool = True) -> list[float]:
    """ScoreCombinationIterator.java:50-69 weight normalization."""
    if not norm:
        return list(weights)
    total = sum(weights)
    if total == 0:
        return list(weights)
    return [w / total for w in weights]


def logsumexp_weighted(weights: list[float], scores: list[float]) -> float:
    """#wsum: stable log of the weighted probability mixture
    (WeightedSumIterator.java:57-63, MathUtils.logSumExp)."""
    m = max(scores)
    return m + math.log(sum(w * math.exp(s - m) for w, s in zip(weights, scores)))
