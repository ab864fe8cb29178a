"""Seeded random differential fuzz — random corpora x random query trees.

Three independent cross-checks, extending the fixed-query
DeltaScoreDocumentModelTest pattern
(``core/src/test/.../processing/DeltaScoreDocumentModelTest.java:29-105``)
with randomized structure:

1. Spark executor vs the pure-Python golden engine on random token-soup
   corpora and random operator trees (parser -> traversals -> plan
   assembly -> stats plumbing all exercised on shapes no hand-written
   fixture covers).
2. Packed block-max WAND vs the exhaustive relational path on a random
   on-disk index (codec + bucketing + kernel integration on random data).
3. Packed #sdm WAND (overfetch=0, the adversarial setting from the
   round-2 verdict) vs the relational #sdm expansion.

All randomness is seeded — failures reproduce exactly.
"""

from __future__ import annotations

import random

import pytest

from galago_git_spark.query.executor import execute, inline_index
from galago_git_spark.query.golden import GoldenIndex, rank

# Zipf-ish vocabulary: "the"/"of" land in most docs (high-df background,
# ties), tail terms are rare (absent-term paths, small candidate sets).
VOCAB = [
    "the", "of", "cat", "moon", "jumped", "query", "index", "spark",
    "block", "score", "delta", "zebra", "quark", "xylem",
]
WEIGHTS = [40, 25, 12, 10, 8, 6, 5, 4, 3, 2, 2, 1, 1, 1]


def _random_texts(rng: random.Random, n_docs: int) -> dict[int, str]:
    return {
        i: " ".join(rng.choices(VOCAB, weights=WEIGHTS, k=rng.randint(1, 40)))
        for i in range(n_docs)
    }


def _random_count_child(rng: random.Random) -> str:
    r = rng.random()
    t = lambda: rng.choice(VOCAB)  # noqa: E731
    if r < 0.55:
        return t()
    if r < 0.65:
        return f"#od:{rng.randint(1, 3)}({t()} {t()})"
    if r < 0.75:
        n = rng.randint(2, 3)
        w = rng.randint(n, 12)
        return f"#uw:{w}({' '.join(t() for _ in range(n))})"
    if r < 0.85:
        return f"#syn({t()} {t()})"
    if r < 0.9:
        return f"#mincount({t()} {t()})"
    if r < 0.94:
        return f"#countsum({t()} {t()})"
    if r < 0.97:
        return f"#require({t()} {t()})"
    return f"#reject({t()} {t()})"


def _random_scorer(rng: random.Random, child: str) -> str:
    r = rng.random()
    if r < 0.3:
        return child  # bare -> default scorer
    if r < 0.55:
        b = round(rng.uniform(0.2, 0.9), 3)
        k = round(rng.uniform(0.5, 2.0), 3)
        return f"#bm25:b={b}:k={k}({child})"
    if r < 0.8:
        mu = round(rng.uniform(300, 2500), 1)
        return f"#dirichlet:mu={mu}({child})"
    lam = round(rng.uniform(0.1, 0.9), 3)
    return f"#jm:lambda={lam}({child})"


def _random_query(rng: random.Random) -> str:
    n = rng.randint(1, 4)
    children = [_random_scorer(rng, _random_count_child(rng)) for _ in range(n)]
    if rng.random() < 0.4:
        ws = [round(rng.uniform(0.1, 3.0), 3) for _ in range(n)]
        spec = "".join(f":{i}={w}" for i, w in enumerate(ws))
        return f"#combine{spec}({' '.join(children)})"
    return f"#combine({' '.join(children)})"


def _assert_topk(got, want, query) -> None:
    assert [r["doc"] for r in got] == [d for d, _ in want], query
    for r, (_, s) in zip(got, want):
        assert r["score"] == pytest.approx(s, abs=1e-9), query


CASES = [(seed, qi) for seed in (101, 202, 303) for qi in range(8)]


@pytest.fixture(scope="module")
def fuzz_corpora(spark):
    out = {}
    for seed in (101, 202, 303):
        rng = random.Random(seed)
        texts = _random_texts(rng, n_docs=rng.randint(6, 30))
        docs = spark.createDataFrame(
            [(i, t) for i, t in texts.items()], "doc_id long, text string"
        )
        out[seed] = (inline_index(docs), GoldenIndex.from_texts(texts), rng)
    return out


@pytest.mark.parametrize("seed,qi", CASES, ids=[f"s{s}q{q}" for s, q in CASES])
def test_fuzz_executor_vs_golden(fuzz_corpora, seed, qi):
    idx, gi, _ = fuzz_corpora[seed]
    # derive the query stream from its own rng so cases are order-independent
    rng = random.Random(seed * 1000 + qi)
    query = _random_query(rng)
    want = rank(query, gi, k=10)
    got = execute(query, idx, k=10).collect()
    _assert_topk(got, want, query)


# --- packed tier fuzz --------------------------------------------------------


@pytest.fixture(scope="module")
def fuzz_packed_index(spark, tmp_path_factory):
    from galago_git_spark.index.build import build_index, open_index
    from galago_git_spark.index.packed import build_packed

    rng = random.Random(777)
    texts = _random_texts(rng, n_docs=200)
    corpus = spark.createDataFrame(
        [("r0", f"f{i:04d}.py", "c0", "py", t) for i, t in texts.items()],
        "repo string, path string, commit string, lang string, content string",
    )
    index_dir = str(tmp_path_factory.mktemp("fuzzpacked") / "idx")
    build_index(corpus, index_dir, positions=True)
    build_packed(spark, index_dir, block_size=16, bucket_bits=4)
    return index_dir, open_index(spark, index_dir)


@pytest.mark.parametrize("qi", range(6))
def test_fuzz_wand_vs_exhaustive(spark, fuzz_packed_index, qi):
    from galago_git_spark.query.wand import wand_topk

    index_dir, idx = fuzz_packed_index
    rng = random.Random(9000 + qi)
    terms = rng.sample(VOCAB, rng.randint(1, 4))
    q = "#combine(" + " ".join(f"#bm25({t})" for t in terms) + ")"
    brute = execute(q, idx, k=10, default_scorer="bm25").collect()
    wand = wand_topk(spark, index_dir, terms, k=10).collect()
    assert [r["doc"] for r in wand] == [r["doc"] for r in brute], terms
    for w, b in zip(wand, brute):
        assert w["score"] == pytest.approx(b["score"], abs=1e-9), terms


@pytest.mark.parametrize("qi", range(4))
def test_fuzz_sdm_wand_vs_relational_overfetch0(spark, fuzz_packed_index, qi):
    from galago_git_spark.query.wand import wand_sdm_topk

    index_dir, idx = fuzz_packed_index
    rng = random.Random(4000 + qi)
    terms = rng.sample(VOCAB, rng.randint(2, 3))
    q = "#sdm(" + " ".join(terms) + ")"
    brute = execute(q, idx, k=10).collect()
    wand = wand_sdm_topk(spark, index_dir, terms, k=10, overfetch=0).collect()
    assert [r["doc"] for r in wand] == [r["doc"] for r in brute], terms
    for w, b in zip(wand, brute):
        assert w["score"] == pytest.approx(b["score"], abs=1e-6), terms
