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
