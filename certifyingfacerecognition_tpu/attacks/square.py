"""Score-based (gradient-free) random-search attack on the semantic
ellipsoid — the Lsigma2 counterpart of the Square attack.

The reference vendors upstream Square (autoattack/square.py) which proposes
localized pixel squares under Linf/L2 and is NOT adapted to the ellipsoid
norm — it is instantiated but unusable for the paper's runs (grep-verified;
SURVEY.md §2.5). This module redesigns the same black-box principle for the
semantic-attack geometry: proposals perturb random attribute coordinates of
delta in [B, k] space, are projected back onto the Sigma-ellipsoid, and are
accepted only when the margin loss improves. Like Square it needs only
forward evaluations (scores), no gradients, so it also works against
non-differentiable or gradient-masked pipelines.

Whole attack = one jitted lax.scan (restarts x iters), vmapped over the
batch; step-size schedule mirrors Square's piecewise decay
(square.py:p_selection).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..ops import geometry as G


class SquareResult(NamedTuple):
    deltas: jnp.ndarray      # [B, k]
    success: jnp.ndarray     # [B] bool
    magnitudes: jnp.ndarray  # [B] squared Sigma-norms


def _margin(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """logit_y - max_{c != y} logit_c; adversarial iff negative
    (upstream square.py margin loss)."""
    B = logits.shape[0]
    rows = jnp.arange(B)
    target = logits[rows, labels]
    others = logits.at[rows, labels].set(-jnp.inf)
    return target - jnp.max(others, axis=1)


def _step_scale(i: jnp.ndarray, n_iter: int) -> jnp.ndarray:
    """Piecewise-decaying exploration scale, analogous to Square's
    p_selection schedule (square.py:26-52)."""
    frac = i.astype(jnp.float32) / max(n_iter, 1)
    scale = jnp.where(frac < 0.1, 1.0,
             jnp.where(frac < 0.3, 0.5,
              jnp.where(frac < 0.6, 0.25,
               jnp.where(frac < 0.8, 0.12, 0.06))))
    return scale


def square_attack(
    logits_fn: Callable[[jnp.ndarray], jnp.ndarray],
    labels: jnp.ndarray,
    key: jax.Array,
    region: G.RegionMatrices,
    *,
    n_iter: int = 100,
    n_restarts: int = 1,
) -> SquareResult:
    """Random-search attack in delta space [B, k] under the reduced
    (diagonal) Sigma-ellipsoid. Returns the first successful delta per
    sample, like find_adversaries_pgd's bookkeeping."""
    B = labels.shape[0]
    ell = region.red_ellipse
    k = region.red_ellipse_diag.shape[0]
    budgets = 1.0 / jnp.sqrt(region.red_ellipse_diag)   # semi-axes [k]

    def eval_margin(deltas):
        return _margin(logits_fn(deltas), labels)

    def one_restart(carry, restart_key):
        best, found = carry
        k0, k1 = jax.random.split(restart_key)
        deltas = G.init_deltas(k0, B, ell, proj_mat=None, random_init=True,
                               lin_comb=True, on_surface=True)
        margin = eval_margin(deltas)

        def body(state, it_key):
            deltas, margin, best, found, i = state
            kc, ks = jax.random.split(it_key)
            # Perturb ONE random attribute coordinate per sample by a
            # budget-scaled signed step (the 1-D analogue of a square).
            coord = jax.random.randint(kc, (B,), 0, k)
            sign = jax.random.rademacher(ks, (B,), jnp.float32)
            step = _step_scale(i, n_iter) * sign * budgets[coord]
            prop = deltas + jnp.zeros_like(deltas).at[
                jnp.arange(B), coord].set(step)
            prop = G.proj2region(prop, None, ell, to_subs=False,
                                 on_surface=False)
            new_margin = eval_margin(prop)
            accept = new_margin < margin
            deltas = jnp.where(accept[:, None], prop, deltas)
            margin = jnp.where(accept, new_margin, margin)
            success = margin < 0
            newly = success & (~found)
            best = jnp.where(newly[:, None], deltas, best)
            found = found | success
            return (deltas, margin, best, found, i + 1), None

        keys = jax.random.split(k1, n_iter)
        init_success = margin < 0
        best = jnp.where((init_success & ~found)[:, None], deltas, best)
        found = found | init_success
        (deltas, margin, best, found, _), _ = jax.lax.scan(
            body, (deltas, margin, best, found, jnp.int32(0)), keys)
        return (best, found), None

    init = (jnp.zeros((B, k), jnp.float32), jnp.zeros((B,), bool))
    (best, found), _ = jax.lax.scan(one_restart, init,
                                    jax.random.split(key, n_restarts))
    magnitudes = G.sq_distance_diag(region.red_ellipse_diag, best)
    return SquareResult(best, found, magnitudes)
