"""Host-side statistical primitives for certification.

The reference uses statsmodels' ``proportion_confint(..., method="beta")``
and scipy's ``binom_test`` (/root/reference/smoothing/smooth.py:148-160,
79-107). statsmodels is not available in this environment, so the
Clopper-Pearson bound is computed directly from the Beta quantile — the
identical estimator.
"""

from __future__ import annotations

import numpy as np
from scipy.stats import beta, binomtest, norm


def clopper_pearson_lower(k: int, n: int, alpha: float) -> float:
    """One-sided (1 - alpha) lower confidence bound on a Bernoulli p.

    Equivalent to ``proportion_confint(k, n, alpha=2*alpha, method="beta")[0]``
    as used at smooth.py:148-160.
    """
    k = int(k)
    n = int(n)
    if k == 0:
        return 0.0
    return float(beta.ppf(alpha, k, n - k + 1))


def clopper_pearson_upper(k: int, n: int, alpha: float) -> float:
    k = int(k)
    n = int(n)
    if k == n:
        return 1.0
    return float(beta.isf(alpha, k + 1, n - k))


def binom_two_sided_pvalue(k: int, n: int, p: float = 0.5) -> float:
    """Two-sided exact binomial test (scipy binom_test replacement)."""
    return float(binomtest(int(k), int(n), p).pvalue)


def gaussian_quantile(p: float) -> float:
    """Phi^{-1}(p) (norm.ppf), the L2 certificate gap (certificate.py:69-70)."""
    return float(norm.ppf(p))
