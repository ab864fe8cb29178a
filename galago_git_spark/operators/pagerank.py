"""PageRank — the Spark rebuild of ``galago pagerank``
(``core/.../tools/apps/PageRankFn.java:40-52``; walk/jump semantics
``links/pagerank/ComputeRandomWalk.java:60-99``,
``ComputeRandomJump.java:60-75``; convergence
``ConvergenceTester.java:38-77``):

- scores init to ``1/|D|`` (defaultScore);
- each iteration every doc keeps nothing and distributes
  ``(1-lambda) * score / outdegree`` along its out-links (self-links
  dropped); docs with no out-links contribute their whole
  ``(1-lambda) * score`` to the jump pool;
- the uniform jump is ``lambda * total_mass / |D|`` plus the dangling
  pool divided by ``|D|``;
- stop when every doc's score moves <= delta, or after max_iter
  (reference defaults lambda=0.5, delta=1e-6, maxItr=10).

The iteration is a classic DataFrame join-agg loop; ``localCheckpoint``
truncates lineage each round so 10^2 iterations stay plannable. All
shuffles key on the doc id; at cluster scale pre-partition ``edges`` by
``src`` once and every join reuses that partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    lambda_: float = 0.5,
    delta: float = 1e-6,
    max_iter: int = 10,
    checkpoint_every: int = 3,
) -> DataFrame:
    """nodes: (doc); edges: (src, dst). Returns (doc, score)."""
    nodes = nodes.select("doc").distinct()
    # the loop joins edges/outdeg every iteration: persist them once so
    # ~max_iter rounds don't re-scan (and re-dedup) the link source each
    # time — the difference between O(1) and O(iterations) source reads
    edges = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))  # no self-links
        .distinct()
        .persist()
    )
    n_docs = nodes.count()
    if n_docs == 0:
        edges.unpersist()
        return nodes.withColumn("score", F.lit(0.0))
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).persist()

    scores = nodes.withColumn("score", F.lit(1.0 / n_docs)).localCheckpoint()
    walk = 1.0 - lambda_

    for it in range(max_iter):
        with_deg = scores.join(outdeg, scores["doc"] == outdeg["src"], "left")
        masses = with_deg.agg(
            F.sum("score").alias("total"),
            F.sum(F.when(F.col("deg").isNull(), F.col("score")).otherwise(0.0)).alias(
                "dangling"
            ),
        ).collect()[0]
        jump = (
            lambda_ * float(masses["total"])
            + walk * float(masses["dangling"] or 0.0)
        ) / n_docs

        contrib = (
            scores.join(edges, scores["doc"] == edges["src"])
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("doc"),
                (F.lit(walk) * F.col("score") / F.col("deg")).alias("m"),
            )
            .groupBy("doc")
            .agg(F.sum("m").alias("m"))
        )
        new_scores = (
            nodes.join(contrib, "doc", "left")
            .select(
                "doc",
                (F.lit(jump) + F.coalesce(F.col("m"), F.lit(0.0))).alias("score"),
            )
        )
        if checkpoint_every and (it + 1) % checkpoint_every == 0:
            new_scores = new_scores.localCheckpoint()

        if delta > 0:
            moved = (
                new_scores.alias("a")
                .join(scores.alias("b"), "doc")
                .agg(F.max(F.abs(F.col("a.score") - F.col("b.score"))).alias("mx"))
                .collect()[0]["mx"]
            )
            scores = new_scores
            if moved is not None and moved <= delta:
                break
        else:
            scores = new_scores

    out = scores.select("doc", "score").localCheckpoint()  # eager: safe to unpersist inputs
    edges.unpersist()
    outdeg.unpersist()
    return out
