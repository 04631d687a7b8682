"""Ranking/aggregation unit tests (eval/ranking.py) incl. regressions for
the accuracy-curve orientation and zero-magnitude handling."""

import numpy as np
import pytest

from certifyingfacerecognition_tpu.constants import ATTRS
from certifyingfacerecognition_tpu.eval import ranking as R

rng = np.random.default_rng(21)


def test_accuracy_vs_budget_is_robust_accuracy():
    """The curve is #{||delta|| > t}/instances — robust accuracy, which
    must start at successes/instances and be NON-increasing in the budget
    (regression: the plot once showed its complement)."""
    mags = rng.uniform(0.5, 4.0, 200) ** 2
    lins, acc = R.accuracy_vs_budget(mags, tot_instances=400)
    assert np.all(np.diff(acc) <= 1e-12)
    assert acc[0] == pytest.approx(200 / 400)
    assert acc[-1] <= 0.01 + 0.5 * 0  # ~1% above the 0.99 quantile


def test_delta_components_consistency():
    eps = np.array(list(ATTRS.values()))
    deltas = rng.standard_normal((50, 5)) * eps
    mags = ((deltas / eps) ** 2).sum(1)
    comps, norm_comps = R.delta_components(deltas, mags)
    np.testing.assert_allclose(norm_comps.sum(1), 1.0, rtol=1e-6)
    np.testing.assert_allclose(comps.sum(1), mags, rtol=1e-6)


def test_delta_components_scale_factor_epsilons():
    """With red_ellipse_diag = s/eps^2 the effective semi-axes are
    eps/sqrt(s); the consistency assert must hold with that scaling
    (regression: eps*s crashed eval_files for any --scale-factor != 1)."""
    s = 2.0
    eps = np.array(list(ATTRS.values()))
    deltas = rng.standard_normal((20, 5)) * eps
    mags = (s * (deltas / eps) ** 2).sum(1)
    eff = eps / np.sqrt(s)
    comps, norm_comps = R.delta_components(deltas, mags, eff)
    np.testing.assert_allclose(norm_comps.sum(1), 1.0, rtol=1e-6)


def test_get_ranking_orders_dominant_attribute_first():
    """Synthetic components where attribute 0 clearly dominates, then 1."""
    n = 200
    levels = np.array([0.7, 0.3, 0.15, 0.07, 0.03])
    base = levels[None, :] * rng.uniform(0.9, 1.1, (n, 5))
    norm = base / base.sum(1, keepdims=True)
    failed, order, pvals = R.get_ranking(norm, list(ATTRS.keys()))
    assert not failed
    assert order[0] == "age" and order[1] == "eyeglasses"
    assert len(order) == 5 and len(pvals) == 4


def test_aggregate_results_weighted_average():
    stats = [{"successes": 2, "instances": 10, "avg_mags": 1.0},
             {"successes": 6, "instances": 10, "avg_mags": 2.0}]
    agg = R.aggregate_results(stats)
    assert agg["successes"] == 8 and agg["instances"] == 20
    assert agg["rate"] == pytest.approx(40.0)
    assert agg["avg_mag"] == pytest.approx((2 * 1.0 + 6 * 2.0) / 8)
