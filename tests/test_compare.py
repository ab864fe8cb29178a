"""Significance tests vs hand-computed statistics
(eval/.../compare/PairedTTest.java, SignTest.java, RandomizedTest.java,
SupportHypothesis.java). The t-distribution values are cross-checked
against published t-table entries, the binomial against exact math.comb
sums."""

from __future__ import annotations

import math

import pytest

from galago_git_spark.evaluation.compare import (
    _binomial_two_sided,
    compare,
    compare_runs,
    paired_ttest,
    randomized_test,
    sign_test,
    student_t_two_sided_p,
    support_hypothesis,
)

BASE = [0.20, 0.35, 0.10, 0.50, 0.42, 0.28, 0.33, 0.47, 0.15, 0.39]
TREAT = [0.25, 0.38, 0.18, 0.55, 0.40, 0.35, 0.41, 0.52, 0.22, 0.44]


def test_student_t_matches_table_values():
    # classic t-table: P(|T_10| >= 2.228) = 0.05, P(|T_5| >= 2.571) = 0.05
    assert student_t_two_sided_p(2.228, 10) == pytest.approx(0.05, abs=2e-4)
    assert student_t_two_sided_p(2.571, 5) == pytest.approx(0.05, abs=2e-4)
    assert student_t_two_sided_p(0.0, 7) == pytest.approx(1.0)
    # symmetry
    assert student_t_two_sided_p(-1.3, 9) == pytest.approx(
        student_t_two_sided_p(1.3, 9)
    )


def test_paired_ttest_hand_computed():
    # the reference's PairedTTest calls commons-math TTest.tTest(a, b):
    # the UNPAIRED Welch two-sample test with Welch-Satterthwaite df
    # (the paired computation is commented out, PairedTTest.java:33-51) —
    # hand-compute that
    n = len(BASE)
    m1, m2 = sum(BASE) / n, sum(TREAT) / n
    v1 = sum((x - m1) ** 2 for x in BASE) / (n - 1)
    v2 = sum((x - m2) ** 2 for x in TREAT) / (n - 1)
    se2 = v1 / n + v2 / n
    t = (m1 - m2) / math.sqrt(se2)
    df = se2 * se2 / ((v1 / n) ** 2 / (n - 1) + (v2 / n) ** 2 / (n - 1))
    want = 1.0 - student_t_two_sided_p(t, df)
    assert paired_ttest(BASE, TREAT) == pytest.approx(want, rel=1e-12)
    # per-query wins are IGNORED by the two-sample test: a uniform small
    # improvement with overlapping distributions is NOT significant here
    # (the paired test would say > 0.99 — exactly the reference divergence
    # this mirrors)
    assert paired_ttest(BASE, TREAT) < 0.9
    # constant vectors: equal means -> 1-p = 0, different means -> 1
    assert paired_ttest([0.3] * 5, [0.3] * 5) == 0.0
    assert paired_ttest([0.2] * 5, [0.3] * 5) == 1.0


def test_binomial_two_sided_exact():
    # n=10, k=9, p=.5: two-sided = P(X<=1) + P(X>=9) = 2*(1+10)/1024
    assert _binomial_two_sided(10, 9) == pytest.approx(22 / 1024)
    # symmetric observation -> p = 1
    assert _binomial_two_sided(10, 5) == pytest.approx(1.0, abs=1e-12)


def test_sign_test():
    assert sign_test(BASE, TREAT) == pytest.approx(22 / 1024)
    # identical runs differ nowhere -> 1.0 (SignTest.java:34-36)
    assert sign_test(BASE, BASE) == 1.0


def test_randomized_test_significant_and_null():
    p = randomized_test(BASE, TREAT, seed=42)
    assert p < 0.05  # 9/10 improvements
    pn = randomized_test(BASE, BASE, seed=42)
    assert pn > 0.4  # no effect: difference 0 matched ~half the time


def test_support_hypothesis_boost_search():
    # Welch 1-p at boost=1 is ~0.6, below both targets: the walk inflates
    # the baseline until the two-sided test crosses, then bisects
    for target in (0.95, 0.9999):
        b = support_hypothesis("ttest", target, BASE, TREAT)
        assert b > 1.0
        assert paired_ttest(BASE, TREAT, boost=b) == pytest.approx(
            target, abs=0.002
        )
    # signtest reports a raw p (0.02 at boost=1, below target): boosting
    # the baseline flips per-query winners until the step function
    # crosses; the bisection converges just below the crossing boost
    b = support_hypothesis("signtest", 0.95, BASE, TREAT)
    assert b > 1.0
    assert sign_test(BASE, TREAT, boost=b) < 0.95 <= sign_test(
        BASE, TREAT, boost=b + 0.001
    )


def test_compare_dispatch_and_runs():
    res = compare_runs(
        {f"q{i}": v for i, v in enumerate(BASE)},
        {f"q{i}": v for i, v in enumerate(TREAT)},
        ["baseline", "treatment", "treatBetter", "baseBetter", "equal",
         "ttest", "signtest"],
    )
    assert res["treatBetter"] == 9.0
    assert res["baseBetter"] == 1.0
    assert res["equal"] == 0.0
    assert res["baseline"] == pytest.approx(sum(BASE) / 10)
    assert res["ttest"] == pytest.approx(paired_ttest(BASE, TREAT))
    assert 0.0 < res["ttest"] < 0.9  # Welch two-sample: not significant
    with pytest.raises(ValueError, match="unknown comparison"):
        compare("bogus", BASE, TREAT)
