"""IR evaluation metrics — the Spark rebuild of the reference's ``eval``
module (``eval/src/main/java/org/lemurproject/galago/core/eval/metric/``),
expressed as pure DataFrame plans (window functions + aggregations, no
UDFs) so a million-query sweep evaluates as one shuffle per metric.

Inputs:

- ``run``:   (qid string, name string, rank int, score double) — a ranked
  result list per query (rank 1-based, the TREC run shape).
- ``qrels``: (qid string, name string, rel int) — graded judgments;
  ``rel > 0`` means relevant (QueryJudgments.isRelevant).

Per-metric semantics match the reference exactly (cited per function);
each returns ``(qid, value double)`` with one row per qid present in
``qrels`` (queries with no relevant docs score 0.0, mimicking trec_eval —
AveragePrecision.java:39-45).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_ERR_MAX_JUDGMENT = 4  # ExpectedReciprocalRank.java:25


def _qids(qrels: DataFrame) -> DataFrame:
    return qrels.select("qid").distinct()


def _r_counts(qrels: DataFrame) -> DataFrame:
    """Per-qid R (#relevant judged) and NR (#nonrelevant judged)."""
    return qrels.groupBy("qid").agg(
        F.sum((F.col("rel") > 0).cast("int")).alias("R"),
        F.sum((F.col("rel") <= 0).cast("int")).alias("NR"),
    )


def _judged(run: DataFrame, qrels: DataFrame) -> DataFrame:
    """Run rows annotated with judgment: rel (null if unjudged), is_rel."""
    return run.join(qrels, ["qid", "name"], "left").withColumn(
        "is_rel", F.coalesce(F.col("rel") > 0, F.lit(False))
    )


def _fill_zero(per_qid: DataFrame, qrels: DataFrame) -> DataFrame:
    return (
        _qids(qrels)
        .join(per_qid, "qid", "left")
        .select("qid", F.coalesce("value", F.lit(0.0)).alias("value"))
    )


def average_precision(run: DataFrame, qrels: DataFrame) -> DataFrame:
    """AP: mean over relevant docs of precision@their rank, unretrieved
    relevant at rank infinity (AveragePrecision.java:27-45)."""
    j = _judged(run, qrels)
    w = Window.partitionBy("qid").orderBy("rank")
    scored = j.withColumn("rel_cum", F.sum(F.col("is_rel").cast("int")).over(w))
    ap = (
        scored.filter("is_rel")
        .groupBy("qid")
        .agg(F.sum(F.col("rel_cum") / F.col("rank")).alias("sum_prec"))
        .join(_r_counts(qrels), "qid")
        .select(
            "qid",
            F.when(F.col("R") > 0, F.col("sum_prec") / F.col("R"))
            .otherwise(0.0)
            .alias("value"),
        )
    )
    return _fill_zero(ap, qrels)


def reciprocal_rank(run: DataFrame, qrels: DataFrame) -> DataFrame:
    """RR = 1/rank of first relevant (ReciprocalRank.java:23-31)."""
    rr = (
        _judged(run, qrels)
        .filter("is_rel")
        .groupBy("qid")
        .agg((F.lit(1.0) / F.min("rank")).alias("value"))
    )
    return _fill_zero(rr, qrels)


def precision_at(run: DataFrame, qrels: DataFrame, k: int) -> DataFrame:
    """P@k with denominator min(k, retrieved) (Precision.java:41-53)."""
    j = _judged(run, qrels)
    p = j.groupBy("qid").agg(
        F.sum(((F.col("rank") <= k) & F.col("is_rel")).cast("int")).alias("relret"),
        F.least(F.count(F.lit(1)), F.lit(k)).alias("denom"),
    )
    p = p.select(
        "qid",
        F.when(F.col("denom") > 0, F.col("relret") / F.col("denom"))
        .otherwise(0.0)
        .alias("value"),
    )
    return _fill_zero(p, qrels)


def r_precision(run: DataFrame, qrels: DataFrame) -> DataFrame:
    """P@R; 0 when R > #retrieved (RPrecision.java:23-32)."""
    j = _judged(run, qrels).join(_r_counts(qrels), "qid")
    p = j.groupBy("qid", "R").agg(
        F.sum((F.col("rank") <= F.col("R")).cast("int") * F.col("is_rel").cast("int")).alias("relret"),
        F.count(F.lit(1)).alias("retrieved"),
    )
    p = p.select(
        "qid",
        F.when(
            (F.col("R") > 0) & (F.col("R") <= F.col("retrieved")),
            F.col("relret") / F.col("R"),
        )
        .otherwise(0.0)
        .alias("value"),
    )
    return _fill_zero(p, qrels)


def ndcg_at(run: DataFrame, qrels: DataFrame, k: int | None = None) -> DataFrame:
    """NDCG: DCG/IDCG with gain 2^rel - 1, discount ln(rank+1) (the log
    base cancels in the ratio) — NormalizedDiscountedCumulativeGain.java:46-110.
    Ideal ranking orders ALL positive judgments by grade."""
    j = _judged(run, qrels)
    if k is not None:
        j = j.filter(F.col("rank") <= k)
    gain = (F.pow(F.lit(2.0), F.coalesce(F.when(F.col("rel") > 0, F.col("rel")), F.lit(0))) - 1.0)
    dcg = j.groupBy("qid").agg(
        F.sum(gain / F.log(F.col("rank") + 1.0)).alias("dcg")
    )
    wi = Window.partitionBy("qid").orderBy(F.col("rel").desc(), F.col("name"))
    ideal = qrels.filter(F.col("rel") > 0).withColumn("irank", F.row_number().over(wi))
    if k is not None:
        ideal = ideal.filter(F.col("irank") <= k)
    idcg = ideal.groupBy("qid").agg(
        F.sum((F.pow(F.lit(2.0), F.col("rel")) - 1.0) / F.log(F.col("irank") + 1.0)).alias("idcg")
    )
    nd = (
        dcg.join(idcg, "qid")
        .select(
            "qid",
            F.when(F.col("idcg") != 0, F.col("dcg") / F.col("idcg"))
            .otherwise(0.0)
            .alias("value"),
        )
    )
    return _fill_zero(nd, qrels)


def err_at(run: DataFrame, qrels: DataFrame, k: int | None = None) -> DataFrame:
    """Expected reciprocal rank (cascade model): r_i = (2^g_i - 1)/2^4;
    ERR = sum r_i/(i) * prod_{j<i}(1 - r_j) (ExpectedReciprocalRank.java:69-78).
    The sequential decay product becomes exp(cumsum(ln(1-r))) over a
    preceding-rows window."""
    j = _judged(run, qrels)
    if k is not None:
        j = j.filter(F.col("rank") <= k)
    g = F.coalesce(F.when(F.col("rel") > 0, F.col("rel")), F.lit(0)).cast("double")
    r = (F.pow(F.lit(2.0), g) - 1.0) / float(2 ** _ERR_MAX_JUDGMENT)
    w = (
        Window.partitionBy("qid")
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # the cascade decay is a signed cumulative product: judgments above
    # _ERR_MAX_JUDGMENT make r > 1 so (1 - r) goes negative, and the
    # reference multiplies that straight through (ExpectedReciprocalRank
    # .java:76) — a plain exp(cumsum(log)) would NULL out those factors
    # and silently drop them from the product. ln|1-r| + sign parity +
    # an exact-zero guard reproduces the sequential multiply.
    factor = 1.0 - F.col("r")
    j = (
        j.withColumn("r", r)
        .withColumn(
            "lnabs",
            F.when(factor != 0.0, F.log(F.abs(factor))).otherwise(F.lit(0.0)),
        )
        .withColumn("isneg", F.when(factor < 0.0, 1).otherwise(0))
        .withColumn("iszero", F.when(factor == 0.0, 1).otherwise(0))
        .withColumn(
            "decay",
            F.when(F.coalesce(F.sum("iszero").over(w), F.lit(0)) > 0, F.lit(0.0))
            .otherwise(
                F.exp(F.coalesce(F.sum("lnabs").over(w), F.lit(0.0)))
                * F.when(
                    F.coalesce(F.sum("isneg").over(w), F.lit(0)) % 2 == 1,
                    F.lit(-1.0),
                ).otherwise(F.lit(1.0))
            ),
        )
    )
    e = j.groupBy("qid").agg(
        F.sum(F.col("r") * F.col("decay") / F.col("rank")).alias("value")
    )
    return _fill_zero(e, qrels)


def bpref(run: DataFrame, qrels: DataFrame) -> DataFrame:
    """Binary preference (BinaryPreference.java:34-72, 2006 bug-fix
    semantics): against the first min(R, retrieved-irrelevant) judged
    irrelevant docs; a relevant doc ranked after ALL of those contributes
    0 (the reference's merge loop exits)."""
    j = _judged(run, qrels)
    rc = _r_counts(qrels)
    wirr = Window.partitionBy("qid").orderBy("rank")
    is_irr = F.col("rel").isNotNull() & ~F.col("is_rel")
    j = j.join(rc, "qid").withColumn(
        "irr_idx",
        F.sum(is_irr.cast("int")).over(wirr),
    )
    # truncated irrelevant set: first R judged-irrelevant retrieved
    j = j.withColumn("irr_in", is_irr & (F.col("irr_idx") <= F.col("R")))
    per_q = j.groupBy("qid", "R", "NR").agg(
        F.sum(F.col("irr_in").cast("int")).alias("irr_size"),
        F.max(F.when(F.col("irr_in"), F.col("rank"))).alias("max_irr_rank"),
        F.sum(F.col("is_rel").cast("int")).alias("rel_ret"),
    )
    # per relevant doc: ahead = #truncated-irrelevant with smaller rank
    ahead = F.sum(F.col("irr_in").cast("int")).over(
        wirr.rowsBetween(Window.unboundedPreceding, -1)
    )
    contrib = (
        j.withColumn("ahead", F.coalesce(ahead, F.lit(0)))
        .filter("is_rel")
        .join(per_q.select("qid", "max_irr_rank"), "qid")
        .filter(F.col("rank") < F.coalesce(F.col("max_irr_rank"), F.lit(0)))
        .groupBy("qid")
        .agg(
            F.sum(
                1.0
                - F.col("ahead")
                / F.least(F.col("R"), F.col("NR")).cast("double")
            ).alias("sum_pref")
        )
    )
    out = (
        per_q.join(contrib, "qid", "left")
        .select(
            "qid",
            F.when(F.col("R") <= 0, 0.0)
            .when(F.col("irr_size") == 0, F.col("rel_ret") / F.col("R"))
            .otherwise(F.coalesce(F.col("sum_pref"), F.lit(0.0)) / F.col("R"))
            .alias("value"),
        )
    )
    return _fill_zero(out, qrels)


METRICS = {
    "map": average_precision,
    "recip_rank": reciprocal_rank,
    "rprec": r_precision,
    "bpref": bpref,
    "ndcg": ndcg_at,
    "err": err_at,
}


def evaluate(
    run: DataFrame, qrels: DataFrame, metrics: list[str] | None = None
) -> DataFrame:
    """Per-query metric table (qid, metric, value) — the ``galago eval``
    --details output shape (eval/.../Eval.java). Metric names accept
    ``P5``/``P10``-style and ``ndcg10``/``err20``-style suffixes."""
    metrics = metrics or ["map", "recip_rank", "ndcg", "P10"]
    frames = []
    for m in metrics:
        if m.startswith("P") and m[1:].isdigit():
            df = precision_at(run, qrels, int(m[1:]))
        elif m.startswith("ndcg") and m[4:].isdigit():
            df = ndcg_at(run, qrels, int(m[4:]))
        elif m.startswith("err") and m[3:].isdigit():
            df = err_at(run, qrels, int(m[3:]))
        else:
            df = METRICS[m](run, qrels)
        frames.append(df.withColumn("metric", F.lit(m)))
    return reduce(DataFrame.unionByName, frames).select("qid", "metric", "value")


def summarize(per_query: DataFrame) -> DataFrame:
    """Arithmetic mean per metric over queries (Eval.java summary)."""
    return per_query.groupBy("metric").agg(F.avg("value").alias("value"))
