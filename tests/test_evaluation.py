"""Evaluation metric tests: the DataFrame plans must equal a direct
pure-Python transliteration of the reference's metric loops
(``eval/.../metric/*.java``) on randomized fixtures."""

from __future__ import annotations

import math
import random

import pytest

from galago_git_spark.evaluation import metrics as M


# --- pure-python oracles (direct ports of the Java loops) -------------------

def o_ap(run, qrels):
    rel_count, s = 0, 0.0
    for rank, name in run:
        if qrels.get(name, 0) > 0:
            rel_count += 1
            s += rel_count / rank
    R = sum(1 for v in qrels.values() if v > 0)
    return s / R if R > 0 else 0.0


def o_rr(run, qrels):
    for rank, name in run:
        if qrels.get(name, 0) > 0:
            return 1.0 / rank
    return 0.0


def o_p_at(run, qrels, k):
    ret = min(len(run), k)
    if ret == 0:
        return 0.0
    relret = sum(1 for rank, name in run if rank <= k and qrels.get(name, 0) > 0)
    return relret / ret


def o_rprec(run, qrels):
    R = sum(1 for v in qrels.values() if v > 0)
    if R > len(run) or R == 0:
        return 0.0
    return o_p_at(run, qrels, R)


def o_ndcg(run, qrels, k=None):
    def dcg(gains, k):
        lim = len(gains) if k is None else min(len(gains), k)
        return sum(
            (2 ** g - 1.0) / math.log(i + 2) for i, g in enumerate(gains[:lim])
        )

    gains = [max(qrels.get(name, 0), 0) for rank, name in run]
    ideal = sorted((v for v in qrels.values() if v > 0), reverse=True)
    n = dcg(ideal, k)
    return dcg(gains, k) / n if n != 0 else 0.0


def o_err(run, qrels, k=None):
    score, decay = 0.0, 1.0
    lim = len(run) if k is None else min(len(run), k)
    for i, (rank, name) in enumerate(run[:lim]):
        g = max(qrels.get(name, 0), 0)
        r = (2 ** g - 1) / 2 ** 4
        score += r * decay / (i + 1)
        decay *= 1 - r
    return score


def o_bpref(run, qrels):
    R = sum(1 for v in qrels.values() if v > 0)
    if R == 0:
        return 0.0
    rel_ret = [(rank, n) for rank, n in run if qrels.get(n, 0) > 0]
    irr_ret = [
        (rank, n) for rank, n in run if n in qrels and qrels[n] <= 0
    ]
    non_rel_count = min(R, sum(1 for v in qrels.values() if v <= 0))
    irrelevant = irr_ret[: min(R, len(irr_ret))]
    s, i, j = 0.0, 0, 0
    if not irrelevant:
        s = len(rel_ret)
    while i < len(rel_ret) and j < len(irrelevant):
        if rel_ret[i][0] < irrelevant[j][0]:
            s += 1.0 - j / non_rel_count
            i += 1
        else:
            j += 1
    return s / R


# --- fixtures ---------------------------------------------------------------

def make_case(seed: int, n_docs: int = 30, n_judged: int = 20):
    rng = random.Random(seed)
    names = [f"d{i}" for i in range(n_docs + 10)]
    retrieved = rng.sample(names, n_docs)
    run = [(i + 1, n) for i, n in enumerate(retrieved)]
    qrels = {n: rng.choice([0, 0, 1, 2, 3]) for n in rng.sample(names, n_judged)}
    return run, qrels


CASES = [make_case(s) for s in range(6)] + [
    ([(1, "a"), (2, "b"), (3, "c")], {"a": 1, "c": 2, "x": 1}),  # unretrieved rel
    ([(1, "a"), (2, "b")], {"x": 1}),  # nothing relevant retrieved
    ([(1, "a")], {"a": 0, "b": 0}),  # no relevant at all
    ([(1, "a"), (2, "b"), (3, "c")], {"a": 1, "b": 1, "c": 1}),  # no judged irrelevant
]


def _spark_eval(spark, run, qrels, metric_names):
    run_df = spark.createDataFrame(
        [("q1", n, r, 1.0 / r) for r, n in run], "qid string, name string, rank int, score double"
    )
    qrels_df = spark.createDataFrame(
        [("q1", n, v) for n, v in qrels.items()], "qid string, name string, rel int"
    )
    per_q = M.evaluate(run_df, qrels_df, metric_names)
    return {r["metric"]: r["value"] for r in per_q.collect()}


@pytest.mark.parametrize("case_i", range(len(CASES)))
def test_metrics_match_reference_loops(spark, case_i):
    run, qrels = CASES[case_i]
    got = _spark_eval(
        spark, run, qrels,
        ["map", "recip_rank", "rprec", "bpref", "ndcg", "ndcg10", "err", "P5", "P10"],
    )
    want = {
        "map": o_ap(run, qrels),
        "recip_rank": o_rr(run, qrels),
        "rprec": o_rprec(run, qrels),
        "bpref": o_bpref(run, qrels),
        "ndcg": o_ndcg(run, qrels),
        "ndcg10": o_ndcg(run, qrels, 10),
        "err": o_err(run, qrels),
        "P5": o_p_at(run, qrels, 5),
        "P10": o_p_at(run, qrels, 10),
    }
    for m, v in want.items():
        assert got[m] == pytest.approx(v, abs=1e-9), (case_i, m, got[m], v)


def test_multi_query_and_summary(spark):
    r1, q1 = CASES[0]
    r2, q2 = CASES[1]
    run_df = spark.createDataFrame(
        [("q1", n, r, 1.0) for r, n in r1] + [("q2", n, r, 1.0) for r, n in r2],
        "qid string, name string, rank int, score double",
    )
    qrels_df = spark.createDataFrame(
        [("q1", n, v) for n, v in q1.items()] + [("q2", n, v) for n, v in q2.items()],
        "qid string, name string, rel int",
    )
    per_q = M.evaluate(run_df, qrels_df, ["map"])
    assert per_q.count() == 2
    summary = {r["metric"]: r["value"] for r in M.summarize(per_q).collect()}
    assert summary["map"] == pytest.approx(
        (o_ap(r1, q1) + o_ap(r2, q2)) / 2, abs=1e-9
    )


def test_err_judgment_above_max_multiplies_negative_decay(spark):
    """ExpectedReciprocalRank.java:71-77 with a judgment above the TREC
    max (4): r > 1 makes the decay factor negative and the reference
    multiplies it through — sequential python mirror must match."""
    run = spark.createDataFrame(
        [("q1", "d1", 1, 3.0), ("q1", "d2", 2, 2.0), ("q1", "d3", 3, 1.0)],
        "qid string, name string, rank int, score double",
    )
    qrels = spark.createDataFrame(
        [("q1", "d1", 5), ("q1", "d2", 3), ("q1", "d3", 1)],
        "qid string, name string, rel int",
    )
    got = {r["qid"]: r["value"] for r in M.err_at(run, qrels).collect()}
    score, decay = 0.0, 1.0
    for i, rel in enumerate([5, 3, 1]):
        r = (2 ** rel - 1) / 2 ** 4
        score += r * decay / (i + 1)
        decay *= 1 - r
    assert got["q1"] == pytest.approx(score, abs=1e-9)


def test_trec_reader_trims_leading_whitespace(spark, tmp_path):
    p = str(tmp_path / "padded_run.txt")
    with open(p, "w") as f:
        f.write("  q1 Q0 doc1 1 5.0 tag\n\tq1 Q0 doc2 2 4.0 tag\n")
    rows = {(r["qid"], r["name"], r["rank"], r["score"])
            for r in __import__("galago_git_spark.evaluation.trec",
                                fromlist=["trec"]).read_run(spark, p).collect()}
    assert rows == {("q1", "doc1", 1, 5.0), ("q1", "doc2", 2, 4.0)}


def test_trec_roundtrip(spark, tmp_path):
    from galago_git_spark.evaluation import trec

    run, qrels = CASES[0]
    res = spark.createDataFrame(
        [("q1", n, r, 1.0 / r) for r, n in run],
        "qid string, name string, rank int, score double",
    )
    p = str(tmp_path / "run.txt")
    trec.format_run(res).coalesce(1).write.mode("overwrite").text(p)
    back = trec.read_run(spark, p)
    assert back.count() == len(run)
    got = {(r["qid"], r["name"], r["rank"]) for r in back.collect()}
    assert got == {("q1", n, r) for r, n in run}

    qp = str(tmp_path / "qrels.txt")
    with open(qp, "w") as f:
        for n, v in qrels.items():
            f.write(f"q1 0 {n} {v}\n")
    qdf = trec.read_qrels(spark, qp)
    assert {(r["name"], r["rel"]) for r in qdf.collect()} == set(qrels.items())
