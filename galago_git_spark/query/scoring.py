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


# --- divergence-from-randomness family ---------------------------------------
#
# PL2 (PL2ScoringIterator.java:47-82): TF = tf*log2(1 + c*avgdl/len);
#   NORM = 1/(TF+1); f = cf/N;
#   score = NORM*(TF*log2(1/f) + f/ln2 + 0.5*log2(2*pi*TF) + TF*(log2(TF) - 1/ln2));
#   clamped at 0 ("this makes max-Score work"); tf=0 -> 0.
# InL2 (InL2ScoringIterator.java:59-72): score = NORM*TFN*log2((N+1)/(df+0.5)).
# BiL2 (BiL2ScoringIterator.java:55-81): Stirling logFactorial(v)=v*ln(v)-v+1.

_LOG2 = math.log(2.0)


def pl2_py(tf: float, length: float, cf: int, cs: CollectionStats,
           c: float = 1.0) -> float:
    if tf == 0:
        return 0.0
    TF = tf * math.log2(1.0 + (c * cs.avg_doc_length) / length)
    norm = 1.0 / (TF + 1.0)
    f = cf / cs.document_count
    score = norm * (
        TF * math.log2(1.0 / f)
        + f / _LOG2
        + 0.5 * math.log2(2.0 * math.pi * TF)
        + TF * (math.log2(TF) - 1.0 / _LOG2)
    )
    return max(score, 0.0)


def pl2_col(tf: Column, length: Column, cf: int, cs: CollectionStats,
            c: float = 1.0) -> Column:
    TF = tf * F.log2(1.0 + F.lit(c * cs.avg_doc_length) / length)
    norm = 1.0 / (TF + 1.0)
    f = cf / cs.document_count
    score = norm * (
        TF * F.lit(math.log2(1.0 / f))
        + F.lit(f / _LOG2)
        + 0.5 * F.log2(F.lit(2.0 * math.pi) * TF)
        + TF * (F.log2(TF) - F.lit(1.0 / _LOG2))
    )
    return F.when(tf > 0, F.greatest(score, F.lit(0.0))).otherwise(0.0)


def inl2_py(tf: float, length: float, df: int, cs: CollectionStats,
            c: float = 1.0) -> float:
    if tf == 0:
        return 0.0
    TFN = tf * math.log2(1.0 + (c * cs.avg_doc_length) / length)
    return (1.0 / (TFN + 1.0)) * TFN * math.log2(
        (cs.document_count + 1.0) / (df + 0.5)
    )


def inl2_col(tf: Column, length: Column, df: int, cs: CollectionStats,
             c: float = 1.0) -> Column:
    TFN = tf * F.log2(1.0 + F.lit(c * cs.avg_doc_length) / length)
    score = (1.0 / (TFN + 1.0)) * TFN * F.lit(
        math.log2((cs.document_count + 1.0) / (df + 0.5))
    )
    return F.when(tf > 0, score).otherwise(0.0)


def _stirling_py(v: float) -> float:
    return v * math.log(v) - v + 1.0


def bil2_py(tf: float, length: float, cs: CollectionStats,
            c: float = 1.0) -> float:
    if tf <= 0 or length <= 1.0:
        return 0.0
    TFN = tf * math.log2(1.0 + (c * cs.avg_doc_length) / length)
    if length - 1.0 - TFN <= 0:
        return 0.0
    norm = 1.0 / (TFN + 1.0)
    pp = 1.0 / (length - 1.0)
    return norm * (
        -_stirling_py(length - 1)
        + _stirling_py(TFN)
        + _stirling_py(length - 1 - TFN)
        - tf * math.log2(pp)
        - (length - 1 - TFN) * math.log2(1 - pp)
    )


def bil2_col(tf: Column, length: Column, cs: CollectionStats,
             c: float = 1.0) -> Column:
    def stirling(v: Column) -> Column:
        return v * F.log(v) - v + 1.0

    TFN = tf * F.log2(1.0 + F.lit(c * cs.avg_doc_length) / length)
    pp = 1.0 / (length - 1.0)
    score = (1.0 / (TFN + 1.0)) * (
        -stirling(length - 1)
        + stirling(TFN)
        + stirling(length - 1 - TFN)
        - tf * F.log2(pp)
        - (length - 1 - TFN) * F.log2(1.0 - pp)
    )
    ok = (tf > 0) & (length > 1.0) & (length - 1.0 - TFN > 0)
    return F.when(ok, score).otherwise(0.0)


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
