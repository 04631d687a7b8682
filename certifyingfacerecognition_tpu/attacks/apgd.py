"""AutoPGD (APGD / APGD-targeted) under the Sigma-ellipsoid norm.

Re-design of /root/reference/autoattack/autopgd_base.py for the ``Lsigma2``
norm, as a single jitted program per restart: momentum step (a=0.75), double
re-projection onto {||d||_Sigma <= eps=1} (autopgd_base.py:400-419),
oscillation-based step halving with best-point restoration
(autopgd_base.py:459-505), and the ce / dlr / targeted-dlr losses.

Fidelity notes: the reference's Lsigma2 branches contain two latent crashes
that show this path was never exercised there — the random init drops the
required ellipse arguments (autopgd_base.py:246-252 calls init_deltas with
4 of 7 required params) and ``normalize`` feeds the diagonal Sigma *vector*
into the dense bilinear form (autopgd_base.py:203-217, incompatible bmm
shapes). We implement the evidently intended semantics: on-surface ellipsoid
init and diagonal Sigma-norms throughout.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops import geometry as G
from .losses import ce_loss, dlr_loss, dlr_loss_targeted


class APGDResult(NamedTuple):
    deltas: jnp.ndarray      # [B, k] adversarial deltas (x_best_adv)
    success: jnp.ndarray     # [B] bool (~robust)
    magnitudes: jnp.ndarray  # [B] squared Sigma-norms


def _loss_fn(loss: str):
    if loss == "ce":
        return lambda logits, y, y_t: ce_loss(logits, y)
    if loss == "dlr":
        return lambda logits, y, y_t: dlr_loss(logits, y)
    if loss == "dlr-targeted":
        return dlr_loss_targeted
    raise ValueError(f"unknown loss {loss}")


def _attack_single_run(logits_fn: Callable, labels: jnp.ndarray,
                       y_target: Optional[jnp.ndarray], key: jax.Array,
                       region: G.RegionMatrices, *, n_iter: int, loss: str,
                       eps: float = 1.0, rho: float = 0.75):
    B = labels.shape[0]
    k_dim = region.dirs.shape[1]
    mat = region.red_ellipse_diag
    ell = region.red_ellipse
    crit = _loss_fn(loss)
    y_t = y_target if y_target is not None else jnp.zeros_like(labels)

    n_iter_2 = max(int(0.22 * n_iter), 1)
    n_iter_min = max(int(0.06 * n_iter), 1)
    size_decr = max(int(0.03 * n_iter), 1)

    def lp_norm(v):
        return jnp.sqrt(jnp.maximum(G.sq_distance_diag(mat, v), 0.0))[:, None]

    def normalize(v):
        return v / (lp_norm(v) + 1e-12)

    def loss_and_logits(x_adv):
        logits = logits_fn(x_adv)
        li = crit(logits, labels, y_t)
        return jnp.sum(li), (li, logits)

    grad_fn = jax.value_and_grad(loss_and_logits, has_aux=True)

    x = jnp.zeros((B, k_dim), jnp.float32)  # deltas-as-images origin
    deltas0 = G.init_deltas(key, B, ell, lin_comb=True, on_surface=True)
    x_adv = x + deltas0

    (_, (loss_indiv, logits)), grad = grad_fn(x_adv)
    acc = jnp.argmax(logits, axis=1) == labels
    loss_best = loss_indiv
    x_best = x_adv
    x_best_adv = x_adv
    grad_best = grad
    step_size = 2.0 * eps * jnp.ones((B, 1), jnp.float32)
    loss_steps = jnp.zeros((n_iter, B), jnp.float32)

    state = dict(
        x_adv=x_adv, x_adv_old=x_adv, grad=grad, loss_best=loss_best,
        x_best=x_best, x_best_adv=x_best_adv, grad_best=grad_best,
        step_size=step_size, loss_steps=loss_steps, acc=acc,
        counter3=jnp.asarray(0, jnp.int32),
        k_ctr=jnp.asarray(n_iter_2, jnp.int32),
        loss_best_last_check=loss_best,
        reduced_last_check=jnp.ones((B,), jnp.float32),
    )

    def check_oscillation(loss_steps, i, k_ctr, k3):
        """t_b = #{c < k_ctr : loss[i-c] > loss[i-c-1]}; flag t <= k*k3
        (autopgd_base.py:177-182), with the dynamic window masked.

        Negative history indices wrap to the (still-zero) trailing rows,
        exactly like the reference's python negative indexing — clamping
        instead would double-count the (1,0) pair at the first check."""
        max_k = n_iter_2
        cs = jnp.arange(max_k)
        idx = i - cs
        idx_new = jnp.where(idx >= 0, idx, idx + n_iter)
        idx_old = jnp.where(idx - 1 >= 0, idx - 1, idx - 1 + n_iter)
        newer = loss_steps[idx_new]        # [max_k, B]
        older = loss_steps[idx_old]
        valid = (cs < k_ctr)[:, None]
        t = jnp.sum((newer > older) & valid, axis=0).astype(jnp.float32)
        return t <= k_ctr.astype(jnp.float32) * k3

    def body(i, s):
        grad2 = s["x_adv"] - s["x_adv_old"]
        x_adv_old = s["x_adv"]
        a = jnp.where(i > 0, 0.75, 1.0)

        z = s["x_adv"] + s["step_size"] * normalize(s["grad"])
        z = x + normalize(z - x) * jnp.minimum(eps, lp_norm(z - x))
        z = s["x_adv"] + (z - s["x_adv"]) * a + grad2 * (1.0 - a)
        x_adv = x + normalize(z - x) * jnp.minimum(eps, lp_norm(z - x))

        (_, (loss_indiv, logits)), grad = grad_fn(x_adv)
        pred = jnp.argmax(logits, axis=1) == labels
        acc = s["acc"] & pred
        x_best_adv = jnp.where(pred[:, None], s["x_best_adv"], x_adv)

        loss_steps = s["loss_steps"].at[i].set(loss_indiv)
        improved = loss_indiv > s["loss_best"]
        x_best = jnp.where(improved[:, None], x_adv, s["x_best"])
        grad_best = jnp.where(improved[:, None], grad, s["grad_best"])
        loss_best = jnp.where(improved, loss_indiv, s["loss_best"])

        counter3 = s["counter3"] + 1
        do_check = counter3 == s["k_ctr"]

        fl_osc = check_oscillation(loss_steps, i, s["k_ctr"], rho)
        fl_no_impr = ((1.0 - s["reduced_last_check"])
                      * (s["loss_best_last_check"] >= loss_best))
        fl = jnp.maximum(fl_osc.astype(jnp.float32), fl_no_impr) > 0

        halve = do_check & fl
        step_size = jnp.where(halve[:, None], s["step_size"] / 2.0,
                              s["step_size"])
        x_adv = jnp.where(halve[:, None], x_best, x_adv)
        grad = jnp.where(halve[:, None], grad_best, grad)

        k_ctr = jnp.where(do_check,
                          jnp.maximum(s["k_ctr"] - size_decr, n_iter_min),
                          s["k_ctr"])
        counter3 = jnp.where(do_check, 0, counter3)
        reduced_last_check = jnp.where(do_check, fl.astype(jnp.float32),
                                       s["reduced_last_check"])
        loss_best_last_check = jnp.where(do_check, loss_best,
                                         s["loss_best_last_check"])

        return dict(
            x_adv=x_adv, x_adv_old=x_adv_old, grad=grad, loss_best=loss_best,
            x_best=x_best, x_best_adv=x_best_adv, grad_best=grad_best,
            step_size=step_size, loss_steps=loss_steps, acc=acc,
            counter3=counter3, k_ctr=k_ctr,
            loss_best_last_check=loss_best_last_check,
            reduced_last_check=reduced_last_check)

    state = jax.lax.fori_loop(0, n_iter, body, state)
    return state["x_best"], state["acc"], state["loss_best"], \
        state["x_best_adv"]


def apgd_attack(
    logits_fn: Callable[[jnp.ndarray], jnp.ndarray],
    labels: jnp.ndarray,
    key: jax.Array,
    region: G.RegionMatrices,
    *,
    loss: str = "ce",               # 'ce' | 'dlr' (untargeted)
    n_iter: int = 100,
    n_restarts: int = 1,
    eps: float = 1.0,
) -> APGDResult:
    """Untargeted APGD (apgd-ce / apgd-dlr). Mirrors perturb
    (autopgd_base.py:513-591): per restart, samples still robust get the
    new adversarial point."""
    B = labels.shape[0]
    x = jnp.zeros((B, region.dirs.shape[1]), jnp.float32)
    logits = logits_fn(x)
    acc = jnp.argmax(logits, axis=1) == labels
    adv = x
    for counter in range(n_restarts):
        rk = jax.random.fold_in(key, counter)
        _, acc_curr, _, adv_curr = _attack_single_run(
            logits_fn, labels, None, rk, region, n_iter=n_iter, loss=loss,
            eps=eps)
        # Keep the FIRST successful adversary; initially-misclassified
        # samples keep the clean point (reference perturb only attacks
        # ind_to_fool, autopgd_base.py:513-591).
        newly = (~acc_curr) & acc
        adv = jnp.where(newly[:, None], adv_curr, adv)
        acc = acc & acc_curr
    mags = G.sq_distance_diag(region.red_ellipse_diag, adv)
    return APGDResult(adv, ~acc, mags)


def apgd_targeted_attack(
    logits_fn: Callable[[jnp.ndarray], jnp.ndarray],
    labels: jnp.ndarray,
    key: jax.Array,
    region: G.RegionMatrices,
    *,
    n_iter: int = 100,
    n_restarts: int = 1,
    n_target_classes: int = 9,
    eps: float = 1.0,
) -> APGDResult:
    """Targeted APGD on the targeted DLR loss over the 2nd..(T+1)-th nearest
    classes (autopgd_base.py:634-762)."""
    B = labels.shape[0]
    x = jnp.zeros((B, region.dirs.shape[1]), jnp.float32)
    logits0 = logits_fn(x)
    acc = jnp.argmax(logits0, axis=1) == labels
    order = jnp.argsort(logits0, axis=1)
    adv = x
    for target_class in range(2, n_target_classes + 2):
        y_target = order[:, -target_class]
        for counter in range(n_restarts):
            rk = jax.random.fold_in(jax.random.fold_in(key, target_class),
                                    counter)
            _, acc_curr, _, adv_curr = _attack_single_run(
                logits_fn, labels, y_target, rk, region, n_iter=n_iter,
                loss="dlr-targeted", eps=eps)
            # First success wins; clean point kept for samples that were
            # never correctly classified (see apgd_attack).
            newly = (~acc_curr) & acc
            adv = jnp.where(newly[:, None], adv_curr, adv)
            acc = acc & acc_curr
    mags = G.sq_distance_diag(region.red_ellipse_diag, adv)
    return APGDResult(adv, ~acc, mags)
