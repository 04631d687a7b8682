"""FAB attack (targeted) under the Sigma-ellipsoid norm, as one XLA program.

Re-design of the reference's modified FAB
(/root/reference/autoattack/fab_base.py Lsigma2 branches,
fab_projections.py:122-146, fab_pt.py:104-118). The attack operates in the
reduced attribute space ("deltas", [B, k]); per the reference adapter
(gen_utils.py:259-316) the classifier is a closure
logits(deltas) = -distances(lat + deltas @ dirs^T).

Faithful Lsigma2 semantics:
  * random restart on the ellipsoid surface (fab_base.py:176-185);
  * per-class linearisation distance under the *dual* norm
    sqrt(w^T Sigma^{-1} w) (fab_base.py:216-230);
  * hyperplane bias uses the Sigma-inner product dg^T Sigma x
    (fab_base.py:242-244);
  * closed-form Lagrangian projection onto the decision hyperplane without
    box constraints (fab_projections.py:122-146), applied simultaneously to
    the current and original iterates;
  * extrapolation eta=1.05, interpolation alpha_max=0.1, backward step
    beta=0.9, best-adversary tracked in the Sigma-norm;
  * targeted loop over the 2nd..(T+1)-th nearest classes x restarts
    (fab_base.py:441-496).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..ops import geometry as G


class FABResult(NamedTuple):
    deltas: jnp.ndarray      # [B, k] minimum-Sigma-norm adversarial deltas
    success: jnp.ndarray     # [B] bool
    magnitudes: jnp.ndarray  # [B] squared Sigma-norms


def _projection_lsigma2(t, w, b, mat_inv_diag):
    """Closed-form projection of t onto {x: w.x + b = 0} in the Sigma norm
    (fab_projections.py:122-146)."""
    dist = jnp.sum(w * t, axis=1) + b
    w_sigma_norm = G.sq_distance_diag(mat_inv_diag, w)
    lambd = dist / (w_sigma_norm + 1e-12)
    new_direction = w * mat_inv_diag[None, :]
    return t - new_direction * lambd[:, None]


def fab_targeted(
    logits_fn: Callable[[jnp.ndarray], jnp.ndarray],
    labels: jnp.ndarray,            # [B]
    key: jax.Array,
    region: G.RegionMatrices,
    *,
    n_iter: int = 5,
    n_restarts: int = 2,
    n_target_classes: int = 2,
    alpha_max: float = 0.1,
    eta: float = 1.05,
    beta: float = 0.9,
) -> FABResult:
    """Runs targeted FAB from zero deltas. Returns min-norm deltas (zeros
    where no adversary was found; FAB is minimum-norm so magnitudes may
    exceed the budget — they are reported, not clipped,
    gen_utils.py:311-314)."""
    B = labels.shape[0]
    k = region.dirs.shape[1]
    mat = region.red_ellipse_diag
    mat_inv = region.red_ellipse_diag_inv
    ell = region.red_ellipse
    rows = jnp.arange(B)

    x0 = jnp.zeros((B, k), jnp.float32)
    logits0 = logits_fn(x0)
    y_pred = jnp.argmax(logits0, axis=1)
    pred_mask = y_pred == labels           # attack only correct points
    order = jnp.argsort(logits0, axis=1)   # ascending

    def diffy_and_grad(x1, la_target):
        def f(x):
            y = logits_fn(x)
            diffy = -(y[rows, labels] - y[rows, la_target])
            return jnp.sum(diffy), diffy

        (_, diffy), g = jax.value_and_grad(f, has_aux=True)(x1)
        return diffy, g

    def single_run(run_key, target_class):
        la_target = order[:, -target_class]
        deltas0 = G.init_deltas(run_key, B, ell, lin_comb=True,
                                on_surface=True)
        x1 = x0 + deltas0
        adv = x0
        res2 = jnp.full((B,), 1e10, jnp.float32)

        def body(state, _):
            x1, adv, res2 = state
            df, dg = diffy_and_grad(x1, la_target)      # [B], [B,k]
            # (single linearised class => the dual-norm argmin is trivial)
            w = dg
            b = -df + G.sq_distance_diag(mat, dg, x1)
            # NOTE reference quirk (mirrored deliberately): the Lsigma2
            # projection returns the projected *point* (fab_projections.py:
            # 122-146) yet the update treats it like the displacement of the
            # box-constrained norms — d1_step = x1 + eta * d1 and the
            # alpha-weights are the Sigma-norms of the projected points
            # themselves (fab_base.py:292-316). The paper's reported FAB-t
            # magnitudes (far above the budget) come from this behaviour.
            d1 = _projection_lsigma2(x1, w, b, mat_inv)
            d2 = _projection_lsigma2(x0, w, b, mat_inv)
            a1 = jnp.sqrt(jnp.maximum(G.sq_distance_diag(mat, d1), 0.0))
            a2 = jnp.sqrt(jnp.maximum(G.sq_distance_diag(mat, d2), 0.0))
            a1 = jnp.maximum(a1, 1e-8)
            a2 = jnp.maximum(a2, 1e-8)
            alpha = jnp.clip(a1 / (a1 + a2), 0.0, alpha_max)[:, None]
            d1_step = x1 + eta * d1
            d2_step = x0 + eta * d2
            cand = d1_step * (1.0 - alpha) + d2_step * alpha
            nan_mask = jnp.isnan(jnp.sum(cand, axis=1))
            x1 = jnp.where(nan_mask[:, None], x1, cand)

            preds = jnp.argmax(logits_fn(x1), axis=1)
            is_adv = preds != labels
            t = jnp.sqrt(jnp.maximum(G.sq_distance_diag(mat, x1 - x0), 0.0))
            better = is_adv & (t < res2)
            adv = jnp.where(better[:, None], x1, adv)
            res2 = jnp.where(better, t, res2)
            # backward step toward the original point wherever adversarial
            # (fab_base.py:355-358 applies it to all ind_adv samples).
            x1 = jnp.where(is_adv[:, None], x0 + (x1 - x0) * beta, x1)
            return (x1, adv, res2), None

        (_, adv, res2), _ = jax.lax.scan(body, (x1, adv, res2), None,
                                         length=n_iter)
        return adv, res2

    best = x0
    best_res = jnp.full((B,), jnp.inf, jnp.float32)
    success = jnp.zeros((B,), bool)
    for target_class in range(2, n_target_classes + 2):
        for restart in range(n_restarts):
            run_key = jax.random.fold_in(
                jax.random.fold_in(key, target_class), restart)
            adv, res2 = single_run(run_key, target_class)
            found = res2 < 1e10
            preds = jnp.argmax(logits_fn(adv), axis=1)
            fooled = (preds != labels) & found & pred_mask
            better = res2 < best_res
            take = fooled & better
            best = jnp.where(take[:, None], adv, best)
            best_res = jnp.where(take, res2, best_res)
            success = success | take

    # Reference semantics: FAB deltas are checked for magnitudes only (not
    # clipped to the budget) since it is a minimum-norm attack.
    magnitudes = G.sq_distance_diag(mat, best)
    return FABResult(best, success, magnitudes)
