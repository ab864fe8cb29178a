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
    # hand compute: d = treat - base, t = mean(d) / (sd(d)/sqrt(n))
    d = [t - b for b, t in zip(BASE, TREAT)]
    n = len(d)
    mean = sum(d) / n
    sd = math.sqrt(sum((x - mean) ** 2 for x in d) / (n - 1))
    t = mean / (sd / math.sqrt(n))
    want = 1.0 - student_t_two_sided_p(t, n - 1)
    assert paired_ttest(BASE, TREAT) == pytest.approx(want, rel=1e-12)
    # this treatment wins on 9/10 queries: strongly significant
    assert paired_ttest(BASE, TREAT) > 0.99


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
    # comparator output (1-p ~0.998) already above the target: the
    # reference walk shrinks the boost forever -> its >50-iteration
    # guard returns 0 (SupportHypothesis.java:50-53)
    assert support_hypothesis("ttest", 0.95, BASE, TREAT) == 0.0
    # target above the current output: the walk inflates the baseline
    # until the two-sided test crosses the target, then bisects
    b = support_hypothesis("ttest", 0.9999, BASE, TREAT)
    assert b > 1.0
    assert paired_ttest(BASE, TREAT, boost=b) == pytest.approx(0.9999, abs=0.002)


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
    assert 0.99 < res["ttest"] < 1.0
    with pytest.raises(ValueError, match="unknown comparison"):
        compare("bogus", BASE, TREAT)
