"""Tests for the attack layer: loss parity with the reference, and PGD /
FAB-t / APGD on a toy differentiable classifier."""

import os
import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from certifyingfacerecognition_tpu.attacks import losses as L
from certifyingfacerecognition_tpu.attacks.apgd import (apgd_attack,
                                                        apgd_targeted_attack)
from certifyingfacerecognition_tpu.attacks.fab import fab_targeted
from certifyingfacerecognition_tpu.attacks.pgd import (assert_deltas_feasible,
                                                       find_adversaries_pgd)
from certifyingfacerecognition_tpu.ops import geometry as G
from certifyingfacerecognition_tpu.ops.distances import cdist

REF = "/root/reference"
rng = np.random.default_rng(123)

BUDGETS = np.array([0.5, 0.5, 0.2, 0.5, 0.8])


def _toy_region(dirs_first_col=None):
    """Synthetic RegionMatrices: 5 orthonormal dirs in R^512."""
    d = rng.standard_normal((512, 5))
    if dirs_first_col is not None:
        d[:, 0] = dirs_first_col
    q, _ = np.linalg.qr(d)
    dirs = q[:, :5].astype(np.float32)
    if dirs_first_col is not None and np.dot(dirs[:, 0], dirs_first_col) < 0:
        dirs[:, 0] *= -1
    proj_mat = dirs @ dirs.T
    red = (1.0 / BUDGETS**2).astype(np.float32)
    return G.RegionMatrices(
        proj_mat=jnp.asarray(proj_mat),
        ellipse=G.Ellipsoid.from_diag(np.ones(512, np.float32)),
        dirs=jnp.asarray(dirs),
        dirs_inv=jnp.asarray(np.linalg.pinv(dirs)),
        red_ellipse=G.Ellipsoid.from_diag(red),
        red_ellipse_diag=jnp.asarray(red),
        red_ellipse_diag_inv=jnp.asarray(1.0 / red),
    )


def _toy_problem():
    """Identities near a decision boundary so the budget suffices to flip."""
    centers = rng.standard_normal((12, 512)).astype(np.float32)
    a, b = centers[0], centers[1]
    boundary_dir = (b - a) / np.linalg.norm(b - a)
    region = _toy_region(dirs_first_col=boundary_dir)
    # Points slightly on the a-side of the a/b midpoint.
    lats = np.stack([(a + b) / 2 - 0.05 * boundary_dir * (i + 1)
                     for i in range(4)]).astype(np.float32)
    gallery = jnp.asarray(centers)

    def dists_fn(w):
        return cdist(w, gallery, "insightface")

    labels = jnp.argmin(dists_fn(jnp.asarray(lats)), axis=1)
    np.testing.assert_array_equal(np.asarray(labels), 0)
    return dists_fn, jnp.asarray(lats), labels, region


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_compute_loss_parity_with_reference():
    import torch

    # gen_utils imports torchvision (not installed); stub the two symbols.
    tv = types.ModuleType("torchvision")
    tr = types.ModuleType("torchvision.transforms")
    tr.Compose = lambda fns: fns
    tr.Normalize = lambda *a, **k: None
    tv.transforms = tr
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.transforms", tr)
    if REF not in sys.path:
        sys.path.insert(0, REF)
    cwd = os.getcwd()
    try:
        os.chdir(REF)
        from attack_utils import gen_utils as ref
    finally:
        os.chdir(cwd)

    dists = rng.uniform(5, 40, (6, 30)).astype(np.float32)
    labels = np.array([0, 3, 7, 7, 1, 29])
    for loss_type in ["away", "nearest", "diff", "xent", "dlr"]:
        use_probs = loss_type != "dlr"
        want = ref.compute_loss(torch.from_numpy(dists),
                                torch.from_numpy(labels),
                                loss_type=loss_type,
                                use_probs=use_probs).item()
        got = float(L.compute_loss(jnp.asarray(dists), jnp.asarray(labels),
                                   loss_type=loss_type, use_probs=use_probs))
        assert abs(got - want) < 5e-5 * max(1.0, abs(want)), loss_type


def test_pgd_finds_adversaries_on_toy_problem():
    dists_fn, lats, labels, region = _toy_problem()
    res = find_adversaries_pgd(dists_fn, lats, labels,
                               jax.random.PRNGKey(0), region,
                               opt_name="SGD", lr=100.0, iters=10,
                               loss_type="xent", restarts=3)
    assert bool(res.found.all()), "toy adversaries should all be found"
    # success flags must be re-verifiable from the recorded deltas
    pert = np.asarray(res.best_deltas) @ np.asarray(region.dirs).T
    preds = np.argmin(np.asarray(dists_fn(lats + pert)), axis=1)
    np.testing.assert_array_equal(preds != np.asarray(labels),
                                  np.asarray(res.found))
    assert_deltas_feasible(res.best_deltas, region)
    assert np.all(np.asarray(res.magnitudes) <= 1.0 + 1e-3)


def test_pgd_optimizers_run():
    dists_fn, lats, labels, region = _toy_problem()
    for opt in ["Adam", "RMSProp"]:
        res = find_adversaries_pgd(dists_fn, lats, labels,
                                   jax.random.PRNGKey(1), region,
                                   opt_name=opt, lr=0.05, iters=5,
                                   loss_type="away", restarts=1)
        assert np.all(np.isfinite(np.asarray(res.best_deltas)))
        assert_deltas_feasible(res.best_deltas, region)


def test_fab_targeted_finds_min_norm_adversaries():
    dists_fn, lats, labels, region = _toy_problem()
    hi = jax.lax.Precision.HIGHEST

    def logits_fn(deltas):
        pert = jnp.dot(deltas, region.dirs.T, precision=hi)
        return -dists_fn(lats + pert)

    res = fab_targeted(logits_fn, labels, jax.random.PRNGKey(2), region,
                       n_iter=10, n_restarts=2, n_target_classes=2)
    assert bool(res.success.any())
    # every reported success must actually fool the classifier
    preds = np.argmax(np.asarray(logits_fn(res.deltas)), axis=1)
    succ = np.asarray(res.success)
    assert np.all(preds[succ] != np.asarray(labels)[succ])
    # min-norm attack near a boundary: magnitudes should be modest
    assert np.all(np.asarray(res.magnitudes)[succ] < 25.0)


def test_apgd_attacks_run_and_verify():
    dists_fn, lats, labels, region = _toy_problem()
    hi = jax.lax.Precision.HIGHEST

    def logits_fn(deltas):
        pert = jnp.dot(deltas, region.dirs.T, precision=hi)
        return -dists_fn(lats + pert)

    res = apgd_attack(logits_fn, labels, jax.random.PRNGKey(3), region,
                      loss="ce", n_iter=20, n_restarts=1)
    preds = np.argmax(np.asarray(logits_fn(res.deltas)), axis=1)
    succ = np.asarray(res.success)
    assert succ.any()
    assert np.all(preds[succ] != np.asarray(labels)[succ])
    # bounded attack: deltas stay within the ellipsoid budget
    assert np.all(np.asarray(res.magnitudes)[succ] <= 1.0 + 1e-3)

    res_t = apgd_targeted_attack(logits_fn, labels, jax.random.PRNGKey(4),
                                 region, n_iter=15, n_restarts=1,
                                 n_target_classes=2)
    assert np.asarray(res_t.success).any()


def test_square_attack_finds_adversaries_gradient_free():
    """The ellipsoid-native Square redesign must find the toy adversaries
    using only forward evaluations."""
    from certifyingfacerecognition_tpu.attacks.square import square_attack

    dists_fn, lats, labels, region = _toy_problem()

    def logits_fn(deltas):
        pert = jnp.dot(deltas, region.dirs.T)
        return -dists_fn(lats + pert)

    res = square_attack(logits_fn, labels, jax.random.PRNGKey(0), region,
                        n_iter=200, n_restarts=2)
    assert bool(res.success.all())
    assert_deltas_feasible(res.deltas, region)
    # success flags re-verifiable from the recorded deltas
    preds = np.asarray(jnp.argmax(logits_fn(res.deltas), axis=1))
    assert (preds != np.asarray(labels)).all()


def test_pgd_zero_init_has_finite_gradients():
    """random_init=False starts at delta=0, where each sample's distance to
    its own gallery row is exactly 0 — sqrt's gradient there must be the
    torch-cdist subgradient 0, not NaN (regression)."""
    dists_fn, lats, labels, region = _toy_problem()
    res = find_adversaries_pgd(dists_fn, lats, labels,
                               jax.random.PRNGKey(0), region,
                               opt_name="SGD", lr=100.0, iters=5,
                               loss_type="xent", restarts=1,
                               random_init=False)
    assert np.isfinite(np.asarray(res.best_deltas)).all()
    assert np.isfinite(np.asarray(res.magnitudes)).all()


def test_apgd_ce_cli_iters_warn_or_honor(monkeypatch):
    """apgd-ce/dlr: by default the reference's effective 100x1 is in force
    and differing CLI --iters/--restarts trigger a prominent warning;
    --apgd-use-cli-iters passes them through (VERDICT r1 item 9)."""
    import warnings as W

    from certifyingfacerecognition_tpu.attacks import autoattack as AA

    captured = {}

    def fake_apgd(logits_fn, labels, key, region, *, loss, n_iter,
                  n_restarts):
        captured.update(n_iter=n_iter, n_restarts=n_restarts)
        B = labels.shape[0]
        deltas = jnp.zeros((B, 5), jnp.float32)
        return AA.AttackResult(deltas, jnp.zeros((B,), bool),
                               jnp.zeros((B,), jnp.float32))

    monkeypatch.setattr(AA, "apgd_attack", fake_apgd)
    _, lats, labels, region = _toy_problem()

    def logits_fn(deltas):
        return -jnp.ones((labels.shape[0], 12), jnp.float32)

    # Default: CLI values ignored, reference 100x1 in force + warning.
    with pytest.warns(UserWarning, match="apgd-ce.*IGNORED"):
        AA.run_attack(logits_fn, labels, jax.random.PRNGKey(0), region,
                      "apgd-ce", iters=5, restarts=3)
    assert (captured["n_iter"], captured["n_restarts"]) == (100, 1)

    # Honored: no warning, CLI values flow through.
    with W.catch_warnings():
        W.simplefilter("error")
        AA.run_attack(logits_fn, labels, jax.random.PRNGKey(0), region,
                      "apgd-dlr", iters=5, restarts=3,
                      apgd_use_cli_iters=True)
    assert (captured["n_iter"], captured["n_restarts"]) == (5, 3)

    # Matching defaults: no warning either.
    with W.catch_warnings():
        W.simplefilter("error")
        AA.run_attack(logits_fn, labels, jax.random.PRNGKey(0), region,
                      "apgd-ce", iters=100, restarts=1)
    assert (captured["n_iter"], captured["n_restarts"]) == (100, 1)


def test_run_standard_evaluation_sequential_accumulation():
    """Full AutoAttack orchestration (autoattack.py:93-238): clean pass,
    ordered attacks, robust-flag accumulation, per-attack accuracy dict;
    the jitted factory path (make_standard_evaluation) must match the
    closure path bit-for-bit given the same key."""
    from certifyingfacerecognition_tpu.attacks.autoattack import (
        make_standard_evaluation, run_standard_evaluation)

    dists_fn, lats, labels, region = _toy_problem()
    hi = jax.lax.Precision.HIGHEST

    def logits_fn(deltas):
        pert = jnp.dot(deltas, region.dirs.T, precision=hi)
        return -dists_fn(lats + pert)

    res = run_standard_evaluation(
        logits_fn, labels, jax.random.PRNGKey(7), region,
        version="standard", square_queries=50)

    # Robust accuracy starts at the clean value and never increases.
    accs = list(res.robust_accuracy.values())
    assert list(res.robust_accuracy)[0] == "clean"
    assert all(a <= b + 1e-9 for a, b in zip(accs[1:], accs[:-1]))
    # The toy problem is built so attacks succeed.
    assert bool(res.success.any())
    # Success flags re-verify from the recorded deltas; non-broken samples
    # keep the clean (zero) delta.
    preds = np.asarray(jnp.argmax(logits_fn(res.deltas), axis=1))
    np.testing.assert_array_equal(preds != np.asarray(labels),
                                  np.asarray(res.success))
    np.testing.assert_array_equal(np.asarray(res.y_adv), preds)
    assert np.allclose(np.asarray(res.deltas)[~np.asarray(res.success)], 0.0)

    # Factory path: identical results for identical keys.
    def dists2(params, w):
        return dists_fn(w)

    run = make_standard_evaluation(dists2, region, version="standard",
                                   square_queries=50)
    res2 = run({}, lats, labels, jax.random.PRNGKey(7))
    # jit fusion reorders float ops, so deltas match to float tolerance
    # (not bitwise); the decisions must agree exactly.
    assert res2.robust_accuracy == res.robust_accuracy
    np.testing.assert_array_equal(np.asarray(res2.success),
                                  np.asarray(res.success))
    preds2 = np.asarray(jnp.argmax(logits_fn(res2.deltas), axis=1))
    np.testing.assert_array_equal(preds2 != np.asarray(labels),
                                  np.asarray(res2.success))

    # 'rand' preset = the two APGD variants only.
    res3 = run_standard_evaluation(logits_fn, labels, jax.random.PRNGKey(0),
                                   region, version="rand")
    assert set(res3.robust_accuracy) <= {"clean", "apgd-ce", "apgd-dlr"}

    with pytest.raises(ValueError, match="unknown AutoAttack version"):
        run_standard_evaluation(logits_fn, labels, jax.random.PRNGKey(0),
                                region, version="bogus")


def test_run_standard_evaluation_plus_preset():
    """'plus' (reference autoattack.py:300-307) runs the 6-attack list
    minus untargeted FAB — the documented deviation — with the plus
    restart counts (apgd/fab 5); attack order mirrors the reference's."""
    from certifyingfacerecognition_tpu.attacks.autoattack import (
        VERSION_PRESETS, VERSION_RESTARTS, run_standard_evaluation)

    assert VERSION_PRESETS["plus"] == (
        "apgd-ce", "apgd-dlr", "square", "apgd-t", "fab-t")
    assert "fab" not in VERSION_PRESETS["plus"]
    assert VERSION_RESTARTS["plus"] == (5, 5)

    dists_fn, lats, labels, region = _toy_problem()
    hi = jax.lax.Precision.HIGHEST

    def logits_fn(deltas):
        pert = jnp.dot(deltas, region.dirs.T, precision=hi)
        return -dists_fn(lats + pert)

    res = run_standard_evaluation(
        logits_fn, labels, jax.random.PRNGKey(11), region, version="plus",
        square_queries=30, preset_iters=10)
    # Per-attack accuracies reported in order; monotone non-increasing.
    reported = [k for k in res.robust_accuracy if k != "clean"]
    order = [a for a in VERSION_PRESETS["plus"] if a in reported]
    assert reported == order
    accs = list(res.robust_accuracy.values())
    assert all(a <= b + 1e-9 for a, b in zip(accs[1:], accs[:-1]))
    # Recorded adversaries re-verify.
    preds = np.asarray(jnp.argmax(logits_fn(res.deltas), axis=1))
    np.testing.assert_array_equal(preds != np.asarray(labels),
                                  np.asarray(res.success))


def test_run_standard_evaluation_individual():
    """Per-attack mode (autoattack.py:254-278): every attack sees the full
    clean batch independently."""
    from certifyingfacerecognition_tpu.attacks.autoattack import (
        run_standard_evaluation_individual)

    dists_fn, lats, labels, region = _toy_problem()
    hi = jax.lax.Precision.HIGHEST

    def logits_fn(deltas):
        pert = jnp.dot(deltas, region.dirs.T, precision=hi)
        return -dists_fn(lats + pert)

    out = run_standard_evaluation_individual(
        logits_fn, labels, jax.random.PRNGKey(3), region,
        attacks_to_run=("apgd-ce", "square"), square_queries=50,
        preset_iters=20)
    assert set(out) == {"apgd-ce", "square"}
    for name, res in out.items():
        # each result is self-consistent and independent of the others
        preds = np.asarray(jnp.argmax(logits_fn(res.deltas), axis=1))
        np.testing.assert_array_equal(preds != np.asarray(labels),
                                      np.asarray(res.success))
