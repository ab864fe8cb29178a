"""Similarity-search operators: LSH-bucketed near-dup pairs vs the
brute-force baseline, bucket caps, plan shape (no cartesian product)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from galago_git_spark.operators.simsearch import (
    cosine_pairs,
    lsh_cosine_pairs,
    lsh_hyperplane_buckets,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").persist()
    yield df
    df.unpersist()


def test_lsh_pairs_subset_of_bruteforce_with_recall(emb):
    brute = {
        (r["id_a"], r["id_b"])
        for r in cosine_pairs(emb, threshold=0.4).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in lsh_cosine_pairs(emb, threshold=0.4).collect()
    }
    assert lsh, "LSH path must be non-vacuous on the fixture"
    assert lsh <= brute, "every LSH pair must pass the exact-cosine check"
    assert len(lsh) >= 0.3 * len(brute), (
        f"recall too low: {len(lsh)}/{len(brute)}"
    )


def test_lsh_pairs_plan_has_no_cartesian_product(emb):
    plan = lsh_cosine_pairs(emb, threshold=0.4)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bucket_cap_drops_degenerate_buckets(emb):
    # cap of 1 removes every bucket with >1 member -> no candidates at all
    assert lsh_cosine_pairs(emb, threshold=0.0, max_bucket=1).count() == 0


def test_buckets_deterministic_across_partitioning(emb):
    a = {
        (r["id"], r["bucket"])
        for r in lsh_hyperplane_buckets(emb.repartition(1)).collect()
    }
    b = {
        (r["id"], r["bucket"])
        for r in lsh_hyperplane_buckets(emb.repartition(7)).collect()
    }
    assert a == b


def test_ivf_topk_subset_and_recall(spark, emb):
    from galago_git_spark.operators.simsearch import cosine_topk, ivf_cosine_topk

    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    rest = emb.filter(F.col("vec_id") != 0)
    brute = [r["id"] for r in cosine_topk(rest, qvec, k=10).collect()]
    ivf = [r["id"] for r in ivf_cosine_topk(rest, qvec, k=10, n_cells=16, n_probe=4).collect()]
    assert len(ivf) == 10
    # every IVF hit is a real vector with exact cosine; overlap with the
    # exact top-10 shows the probe actually finds neighbors
    assert len(set(ivf) & set(brute)) >= 3
    # n_probe = n_cells degenerates to (almost) the exhaustive scan
    full = [r["id"] for r in ivf_cosine_topk(rest, qvec, k=10, n_cells=16, n_probe=16).collect()]
    assert full == brute


def test_ivf_assign_deterministic_across_partitioning(emb):
    from galago_git_spark.operators.simsearch import ivf_assign

    a = {(r["id"], r["cell"]) for r in ivf_assign(emb.repartition(1)).collect()}
    b = {(r["id"], r["cell"]) for r in ivf_assign(emb.repartition(5)).collect()}
    assert a == b


def _clustered_fixture(spark):
    """4 well-separated clusters; the first 8 ids (the naive seeds) all sit
    in cluster 0, so the seed quantizer is degenerate and Lloyd refinement
    has something to fix."""
    import numpy as np

    rng = np.random.default_rng(11)
    centers = rng.normal(size=(4, 16))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows, vid = [], 0
    for _ in range(8):
        v = centers[0] + 0.05 * rng.normal(size=16)
        rows.append((vid, [float(x) for x in v])); vid += 1
    for c in range(4):
        for _ in range(30):
            v = centers[c] + 0.05 * rng.normal(size=16)
            rows.append((vid, [float(x) for x in v])); vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return emb, [float(x) for x in centers[3]]


def test_ivf_kmeans_refinement_improves_recall(spark):
    from galago_git_spark.operators.simsearch import cosine_topk, ivf_cosine_topk

    emb, q = _clustered_fixture(spark)
    brute = {r["id"] for r in cosine_topk(emb, q, k=10).collect()}
    base = {
        r["id"]
        for r in ivf_cosine_topk(emb, q, k=10, n_cells=8, n_probe=1).collect()
    }
    refined = {
        r["id"]
        for r in ivf_cosine_topk(
            emb, q, k=10, n_cells=8, n_probe=1, iterations=2
        ).collect()
    }
    assert len(refined & brute) > len(base & brute)


def test_ivf_refined_centroids_deterministic_across_partitioning(spark):
    from galago_git_spark.operators.simsearch import ivf_centroids

    emb, _ = _clustered_fixture(spark)
    a = {
        (r["cent_id"], tuple(r["cvec"]))
        for r in ivf_centroids(emb.repartition(1), n_cells=8, iterations=2).collect()
    }
    b = {
        (r["cent_id"], tuple(r["cvec"]))
        for r in ivf_centroids(emb.repartition(5), n_cells=8, iterations=2).collect()
    }
    assert a == b


def test_cosine_arrow_matches_jvm_impl(emb):
    # the Arrow matmul path must be value-identical (to float tolerance)
    # and rank-identical to the pure-Catalyst higher-order expression
    from galago_git_spark.operators.simsearch import cosine_topk

    qvec = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    rest = emb.filter(F.col("vec_id") != emb.orderBy("vec_id").first()["vec_id"])
    a = cosine_topk(rest, qvec, k=20, impl="arrow").collect()
    j = cosine_topk(rest, qvec, k=20, impl="jvm").collect()
    assert [r["id"] for r in a] == [r["id"] for r in j]
    for ra, rj in zip(a, j):
        assert abs(ra["cosine"] - rj["cosine"]) < 1e-9


def test_ivf_assign_arrow_matches_jvm_impl(emb):
    # exact int64 matmul + argmax must reproduce the crossJoin+window
    # assignment cell-for-cell (same dot, same lowest-cent_id tie-break)
    from galago_git_spark.operators.simsearch import _assign_to, _quantize, _seed_centroids

    e = emb.select(F.col("vec_id").alias("id"), _quantize(F.col("embedding")).alias("qvec"))
    cents = _seed_centroids(emb, 16, "vec_id", "embedding")
    a = {(r["id"], r["cell"]) for r in _assign_to(e, cents, impl="arrow").collect()}
    j = {(r["id"], r["cell"]) for r in _assign_to(e, cents, impl="jvm").collect()}
    assert a == j


def test_lsh_bucket_arrow_matches_jvm_impl(spark, emb):
    # the Arrow sign-matmul bucketizer must reproduce the Catalyst
    # expression bucket-for-bucket, including exact .5 quantization
    # boundaries (Spark round = half away from zero, not numpy's
    # half-to-even) and every per-table seed used by lsh_cosine_pairs
    edge = spark.createDataFrame(
        [(1000 + i, [(-1) ** i * 0.0625] * 64) for i in range(4)],
        "vec_id long, embedding array<float>",
    )
    corpus = emb.select("vec_id", "embedding").unionByName(edge)
    for t in range(4):
        a = {
            (r["id"], r["bucket"])
            for r in lsh_hyperplane_buckets(
                corpus, 4, 64, seed=f"lsht{t}", impl="arrow"
            ).collect()
        }
        j = {
            (r["id"], r["bucket"])
            for r in lsh_hyperplane_buckets(
                corpus, 4, 64, seed=f"lsht{t}", impl="jvm"
            ).collect()
        }
        assert a == j, f"bucket mismatch for table seed lsht{t}"


def test_string_id_columns_pass_through_arrow_kernels(spark, emb):
    # the Arrow kernels must mirror the input id type in their output
    # schemas (r3 review finding: 'id long' was hardcoded) — a corpus
    # keyed by string ids must work end-to-end on every default path
    from galago_git_spark.operators.simsearch import (
        cosine_topk,
        ivf_cosine_topk,
    )

    sids = emb.select(
        F.concat(F.lit("doc-"), F.col("vec_id")).alias("vec_id"), "embedding"
    )
    qvec = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]

    top = cosine_topk(sids, qvec, k=5).collect()
    assert len(top) == 5 and isinstance(top[0]["id"], str)

    pairs = lsh_cosine_pairs(sids, threshold=0.4).collect()
    assert pairs and isinstance(pairs[0]["id_a"], str)

    ivf = ivf_cosine_topk(sids, qvec, k=5, n_cells=8, n_probe=8).collect()
    assert len(ivf) == 5 and isinstance(ivf[0]["id"], str)


def test_pair_cosine_jvm_escape_hatch_matches_arrow(emb):
    # cosine_pairs/lsh_cosine_pairs expose impl="jvm" as the no-Python
    # cross-check path; pair sets and cosines must agree with Arrow
    a = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in cosine_pairs(emb, threshold=0.4, impl="arrow").collect()
    }
    j = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in cosine_pairs(emb, threshold=0.4, impl="jvm").collect()
    }
    assert a.keys() == j.keys() and a
    for k in a:
        assert abs(a[k] - j[k]) < 1e-9


def test_near_dup_groups_and_filter(spark):
    """Connected components over pairs: chain a-b-c collapses to one
    group keyed by the min id; singletons in no pair pass dedup_filter
    untouched; convergence beyond one hop (the chain needs 2 rounds)."""
    from galago_git_spark.operators.dedup import dedup_filter, near_dup_groups

    pairs = spark.createDataFrame(
        [(5, 3), (3, 9), (20, 21), (40, 41), (41, 40)],
        ["doc_a", "doc_b"],
    )
    rows = {r["doc"]: (r["group"], r["keep"])
            for r in near_dup_groups(pairs).collect()}
    assert rows == {
        3: (3, True), 5: (3, False), 9: (3, False),
        20: (20, True), 21: (20, False),
        40: (40, True), 41: (40, False),
    }
    docs = spark.createDataFrame(
        [(d, f"t{d}") for d in (1, 3, 5, 9, 20, 21, 40, 41, 99)],
        ["doc_id", "text"],
    )
    kept = {r["doc_id"] for r in dedup_filter(docs, pairs).collect()}
    assert kept == {1, 3, 20, 40, 99}


def test_minhash_banded_plan_matches_long_shape_construction(spark):
    """minhash_lsh_pairs computes band keys as per-row expressions off the
    wide min columns (no unpivot/re-agg). Pin its pairs to the band keys
    rebuilt the slow way from the public long-shape signatures — the two
    constructions must bucket identically."""
    from galago_git_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_signatures,
    )

    base = [
        "the quick brown fox jumps over the lazy dog tonight",
        "a completely different document about spark shuffles and joins",
        "select name from table where id is not null order by name",
    ]
    rows = []
    for i, t in enumerate(base):
        rows.append((i * 10, t))
        rows.append((i * 10 + 1, t + " extra"))          # near-dup
        rows.append((i * 10 + 2, t.replace("the", "a"))) # near-dup-ish
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    fast = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(docs, n_hashes=16, n_bands=4).collect()
    }

    # reference construction: long shape -> (doc, band) -> h-ordered
    # signature string -> md5 band key -> in-bucket ordered pairs
    sig = minhash_signatures(docs, n_hashes=16).collect()
    per_band: dict[tuple, list] = {}
    for r in sig:
        per_band.setdefault((r["doc"], r["h"] // 4), {})[r["h"]] = r["minhash"]
    import hashlib

    buckets: dict[str, set] = {}
    for (doc, band), hs in per_band.items():
        s = ",".join(str(hs[h]) for h in sorted(hs))
        key = hashlib.md5(f"{band}:{s}".encode()).hexdigest()
        buckets.setdefault(key, set()).add(doc)
    slow = set()
    for ds in buckets.values():
        ds = sorted(ds)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                slow.add((ds[i], ds[j]))
    assert fast == slow and fast, "banded plan diverged from long-shape"


def test_paragraph_dedup_keeps_global_first_occurrence(spark):
    """Repeated paragraphs keep only the smallest (doc, idx) occurrence;
    unique paragraphs always survive; paragraph order inside a doc is
    preserved in the rebuilt text; empty docs come back (0, 0, "")."""
    from galago_git_spark.operators.dedup import paragraph_dedup

    docs = spark.createDataFrame(
        [
            (1, "alpha beta\ncommon footer\ngamma"),
            (2, "common footer\ndelta"),
            (3, "delta\ndelta"),   # intra-doc repeat: 2nd drops too
            (4, ""),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc"]: r for r in paragraph_dedup(docs).collect()}
    assert rows[1]["text_clean"] == "alpha beta\ncommon footer\ngamma"
    assert (rows[1]["n_paras"], rows[1]["n_kept"]) == (3, 3)
    # doc 2's "common footer" lost to doc 1; "delta" is first here
    assert rows[2]["text_clean"] == "delta"
    assert (rows[2]["n_paras"], rows[2]["n_kept"]) == (2, 1)
    # doc 3: both paragraphs are "delta", already kept by doc 2
    assert rows[3]["text_clean"] == ""
    assert (rows[3]["n_paras"], rows[3]["n_kept"]) == (2, 0)
    assert (rows[4]["n_paras"], rows[4]["n_kept"], rows[4]["text_clean"]) == (
        0, 0, "",
    )


def test_paragraph_dedup_regex_special_separator(spark):
    """sep is a LITERAL, not a regex: '.' must split on dots only (an
    unquoted '.' regex would split between every character) and rebuild
    with the same dot."""
    from galago_git_spark.operators.dedup import paragraph_dedup

    docs = spark.createDataFrame(
        [(1, "alpha beta.common tail.gamma"), (2, "common tail.delta")],
        ["doc_id", "text"],
    )
    rows = {r["doc"]: r for r in paragraph_dedup(docs, sep=".").collect()}
    assert rows[1]["text_clean"] == "alpha beta.common tail.gamma"
    assert (rows[1]["n_paras"], rows[1]["n_kept"]) == (3, 3)
    assert rows[2]["text_clean"] == "delta"
    assert (rows[2]["n_paras"], rows[2]["n_kept"]) == (2, 1)


def test_near_dup_groups_long_chain_converges(spark):
    """A 25-hop duplicate CHAIN (diameter 25 > the old per-hop budget of
    max_iter=20) must come back as ONE group — pointer jumping gives
    O(log diameter) convergence (VERDICT r4 item 5); and when the cap
    genuinely cannot be met the loop must raise, never silently split."""
    from galago_git_spark.operators.dedup import near_dup_groups

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(25)], ["doc_a", "doc_b"]
    )
    rows = near_dup_groups(chain).collect()
    assert len(rows) == 26
    assert {r["group"] for r in rows} == {0}
    assert [r["doc"] for r in rows if r["keep"]] == [0]

    with pytest.raises(RuntimeError, match="still changing"):
        near_dup_groups(chain, max_iter=2)
