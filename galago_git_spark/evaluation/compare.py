"""Query-set comparison / significance tests — the analog of
``eval/.../compare/`` (QuerySetComparatorFactory.java:17-60,
PairedTTest.java:27-57, SignTest.java:20-47, RandomizedTest.java:31-95,
CountBetter.java, CountEqual.java, Mean.java).

These operate on per-query metric vectors (tens to thousands of numbers)
— driver-side numpy is the right tier; the heavy part (computing the
per-query metrics themselves) stays distributed in evaluation/metrics.py.
The t and binomial distributions are computed exactly (log-gamma /
continued-fraction incomplete beta; ``math.comb`` for the sign test) so
no SciPy dependency is needed.
"""

from __future__ import annotations

import math

import numpy as np

SIGN_TOLERANCE = 1e-7  # SignTest.java:22


# --------------------------------------------------------------------------
# Student-t two-sided p-value via the regularized incomplete beta function
# --------------------------------------------------------------------------

def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta (Lentz's algorithm)."""
    MAXIT, EPS, FPMIN = 200, 3e-14, 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < FPMIN:
        d = FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, MAXIT + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        de = d * c
        h *= de
        if abs(de - 1.0) < EPS:
            break
    return h


def _betainc(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_bt = (
        math.lgamma(a + b)
        - math.lgamma(a)
        - math.lgamma(b)
        + a * math.log(x)
        + b * math.log1p(-x)
    )
    bt = math.exp(ln_bt)
    if x < (a + 1.0) / (a + b + 2.0):
        return bt * _betacf(a, b, x) / a
    return 1.0 - bt * _betacf(b, a, 1.0 - x) / b


def student_t_two_sided_p(t: float, df: float) -> float:
    """P(|T_df| >= |t|) — what commons-math ``TTest.tTest`` returns."""
    if df <= 0:
        raise ValueError("df must be positive")
    return _betainc(df / 2.0, 0.5, df / (df + t * t))


# --------------------------------------------------------------------------
# comparators
# --------------------------------------------------------------------------

def paired_ttest(baseline, treatment, boost: float = 1.0) -> float:
    """PairedTTest.java:27-57 — returns 1 - p. Despite the class name,
    the reference's live code path calls commons-math
    ``TTest.tTest(boostedBaseline, treatment)`` — the TWO-SAMPLE Welch
    test with Welch–Satterthwaite degrees of freedom (the actual paired
    computation is commented out in the reference, :33-51). Mirrored
    exactly so `galago eval --compare` p-values match."""
    base = np.asarray(baseline, dtype=np.float64) * boost
    treat = np.asarray(treatment, dtype=np.float64)
    if base.shape != treat.shape or base.size < 2:
        raise ValueError("need equal-length vectors with n >= 2")
    n1, n2 = base.size, treat.size
    m1, m2 = base.mean(), treat.mean()
    v1, v2 = base.var(ddof=1), treat.var(ddof=1)
    se2 = v1 / n1 + v2 / n2
    if se2 == 0.0:
        return 0.0 if m1 == m2 else 1.0
    t = (m1 - m2) / math.sqrt(se2)
    df = se2 * se2 / (
        (v1 / n1) ** 2 / (n1 - 1) + (v2 / n2) ** 2 / (n2 - 1)
    )
    return 1.0 - student_t_two_sided_p(t, df)


def sign_test(baseline, treatment, boost: float = 1.0) -> float:
    """SignTest.java:20-47 — two-sided binomial p-value over the queries
    that differ by more than the tolerance (1e-7)."""
    base = np.asarray(baseline, dtype=np.float64) * boost
    treat = np.asarray(treatment, dtype=np.float64)
    diff = treat - base
    better = int(np.sum(diff > 0))
    different = int(np.sum(np.abs(diff) > SIGN_TOLERANCE))
    if different == 0:
        return 1.0
    return _binomial_two_sided(different, better)


def _binomial_two_sided(n: int, k: int, p: float = 0.5) -> float:
    """commons-math BinomialTest TWO_SIDED: accumulate tail pmfs from both
    ends until the observed count falls outside the remaining range."""

    def pmf(i: int) -> float:
        return math.comb(n, i) * (p ** i) * ((1 - p) ** (n - i))

    lo, hi, total = 0, n, 0.0
    while True:
        p_lo, p_hi = pmf(lo), pmf(hi)
        if p_lo == p_hi:
            total += 2 * p_lo
            lo += 1
            hi -= 1
        elif p_lo < p_hi:
            total += p_lo
            lo += 1
        else:
            total += p_hi
            hi -= 1
        if lo > k or hi < k:
            break
    return min(total, 1.0)


def randomized_test(
    baseline, treatment, boost: float = 1.0, seed: int | None = None
) -> float:
    """RandomizedTest.java:31-95 — Fisher randomization p-value with the
    reference's convergence rule (Efron & Tibshirani p.209 estimate).
    ``seed`` pins the RNG for reproducible tests (the reference uses an
    unseeded Random)."""
    base = np.asarray(baseline, dtype=np.float64) * boost
    treat = np.asarray(treatment, dtype=np.float64)
    difference = treat.mean() - base.mean()
    delta = base - treat  # leftMean - rightMean = mean(sign * (base-treat))
    n = delta.size
    rng = np.random.default_rng(seed)
    batch = 10000
    max_iterations_without_match = 1000000
    iterations, matches = 0, 0
    while True:
        signs = rng.integers(0, 2, size=(batch, n)) * 2 - 1
        sample_diffs = (signs * delta).mean(axis=1)
        matches += int(np.sum(difference <= sample_diffs))
        iterations += batch
        p = matches / iterations
        if matches == 0:
            if iterations < max_iterations_without_match:
                continue
            break
        max_dev = max(0.0000005 / p, min(0.00005 / p, 0.05))
        if math.sqrt(p * (1.0 - p)) / max_dev < iterations:
            break
    return matches / iterations


def count_better(baseline, treatment, use_baseline: bool) -> float:
    """CountBetter.java — queries where one side strictly beats the other."""
    base = np.asarray(baseline, dtype=np.float64)
    treat = np.asarray(treatment, dtype=np.float64)
    return float(np.sum(base > treat) if use_baseline else np.sum(treat > base))


def count_equal(baseline, treatment) -> float:
    base = np.asarray(baseline, dtype=np.float64)
    return float(np.sum(base == np.asarray(treatment, dtype=np.float64)))


COMPARATORS = {
    "baseline": lambda b, t: float(np.mean(b)),
    "treatment": lambda b, t: float(np.mean(t)),
    "basebetter": lambda b, t: count_better(b, t, True),
    "treatbetter": lambda b, t: count_better(b, t, False),
    "equal": count_equal,
    "ttest": paired_ttest,
    "pairedttest": paired_ttest,
    "signtest": sign_test,
    "randomized": randomized_test,
}


_BOOSTABLE = {
    "ttest": paired_ttest,
    "pairedttest": paired_ttest,
    "signtest": sign_test,
    "randomized": randomized_test,
}


def support_hypothesis(test: str, pvalue: float, baseline, treatment) -> float:
    """SupportHypothesis.java:25-78 — search (geometric walk + bisection)
    for the baseline boost at which the significance test crosses the
    target p-value; returns the supported boost (0 on non-convergence)."""
    fn = _BOOSTABLE[test.lower()]
    cur_boost = last_boost = 1.0
    cur_p = last_p = fn(baseline, treatment, boost=cur_boost)
    iterations = 0
    while (last_p < pvalue) == (cur_p < pvalue):
        nxt = cur_boost * (1.05 if cur_p < pvalue else 0.95)
        last_boost, last_p = cur_boost, cur_p
        cur_boost, cur_p = nxt, fn(baseline, treatment, boost=nxt)
        iterations += 1
        if iterations > 50:
            return 0.0
    lo, hi = min(last_boost, cur_boost), max(last_boost, cur_boost)
    while hi - lo > 0.00005:
        mid = (hi + lo) / 2
        if fn(baseline, treatment, boost=mid) > pvalue:
            hi = mid
        else:
            lo = mid
        iterations += 1
        if iterations > 100:
            return 0.0
    return lo


def compare(test_name: str, baseline, treatment) -> float:
    """QuerySetComparatorFactory.create — dispatch by (case-insensitive)
    test name; ``h-<test>-<pvalue>`` runs the hypothesis-support boost
    search (SupportHypothesis.java)."""
    name = test_name.lower()
    if name.startswith("h-"):
        parts = test_name.split("-")
        if len(parts) != 3:
            raise ValueError("expected h-<test>-<pvalue>")
        return support_hypothesis(parts[1], float(parts[2]), baseline, treatment)
    if name not in COMPARATORS:
        raise ValueError(f"unknown comparison test {test_name!r}")
    return COMPARATORS[name](baseline, treatment)


def compare_runs(
    baseline_per_query: dict[str, float],
    treatment_per_query: dict[str, float],
    tests: list[str],
) -> dict[str, float]:
    """Aligned comparison over common qids (QuerySetComparator.evaluate)."""
    qids = sorted(set(baseline_per_query) & set(treatment_per_query))
    if not qids:
        raise ValueError("no common query ids")
    b = [baseline_per_query[q] for q in qids]
    t = [treatment_per_query[q] for q in qids]
    return {name: compare(name, b, t) for name in tests}
