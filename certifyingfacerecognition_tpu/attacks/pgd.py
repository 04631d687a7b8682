"""Latent-space PGD with semantic-ellipsoid projection, as one XLA program.

Re-design of ``find_adversaries_pgd`` (/root/reference/attack_utils/
gen_utils.py:335-393). The reference runs a Python loop of restarts x iters
with a host-side scipy projection after every step; here the whole attack —
restart loop, optimiser (optax SGD/Adam/RMSProp with torch-matching
hyperparameters), best-delta bookkeeping and the in-graph ellipsoid
projection — is a ``lax.scan`` nest inside a single jit.

Semantics preserved from the reference:
  * success is evaluated on the *current* deltas before each step (including
    the random init), and the first successful delta per sample is kept;
  * the loss is the batch mean (gradients scale by 1/B; the default lr=1e2
    compensates, attack_utils/opts.py:14);
  * after the final evaluated iterate, one more (unused) step is taken —
    the reference never re-evaluates it, and neither do we;
  * deltas are projected back into the feasible region after every step
    (diagonal fast path for lin_comb, full subspace+ellipsoid otherwise).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..ops import geometry as G
from ..constants import EMB_SIZE
from .losses import compute_loss


class PGDResult(NamedTuple):
    best_deltas: jnp.ndarray   # [B, k] (or [B, 512] if not lin_comb)
    found: jnp.ndarray         # [B] bool
    magnitudes: jnp.ndarray    # [B] squared Sigma-norms of best_deltas


def make_optimizer(opt_name: str, lr: float, momentum: float = 0.9):
    """torch-matching optimisers (gen_utils.py:88-96)."""
    if opt_name == "SGD":
        return optax.sgd(lr, momentum=momentum)
    if opt_name == "Adam":
        return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    if opt_name == "RMSProp":
        # torch.optim.RMSprop adds eps OUTSIDE the sqrt (grad/(sqrt(nu)+eps));
        # optax's default puts it inside, which diverges when nu is small.
        return optax.rmsprop(lr, decay=0.99, eps=1e-8, eps_in_sqrt=False)
    raise ValueError(f"unknown optimizer {opt_name}")


def find_adversaries_pgd(
    dists_fn: Callable[[jnp.ndarray], jnp.ndarray],
    lat_codes: jnp.ndarray,            # [B, 512]
    labels: jnp.ndarray,               # [B] int
    key: jax.Array,
    region: G.RegionMatrices,
    *,
    opt_name: str = "SGD",
    lr: float = 1e2,
    iters: int = 10,
    momentum: float = 0.9,
    loss_type: str = "xent",
    lin_comb: bool = True,
    random_init: bool = True,
    rand_init_on_surf: bool = True,
    restarts: int = 5,
) -> PGDResult:
    """dists_fn maps perturbed latents [B,512] -> gallery distances [B,N]
    (differentiable). Returns the first successful delta per sample."""
    B = lat_codes.shape[0]
    ell = region.red_ellipse if lin_comb else region.ellipse
    delta_dim = region.dirs.shape[1] if lin_comb else EMB_SIZE
    opt = make_optimizer(opt_name, lr, momentum)
    hi = jax.lax.Precision.HIGHEST

    def perturbed(deltas):
        if lin_comb:
            pert = jnp.dot(deltas, region.dirs.T, precision=hi)
        else:
            pert = deltas
        return lat_codes + pert

    def loss_and_dists(deltas):
        dists = dists_fn(perturbed(deltas))
        loss = compute_loss(dists, labels, loss_type=loss_type,
                            use_probs=loss_type != "dlr")
        return loss, dists

    def project(deltas):
        if lin_comb:
            return G.proj2region(deltas, None, ell, to_subs=False,
                                 on_surface=False)
        return G.proj2region(deltas, region.proj_mat, ell, to_subs=True,
                             on_surface=False)

    def one_restart(carry, restart_key):
        best, found = carry
        deltas = G.init_deltas(restart_key, B, ell,
                               proj_mat=None if lin_comb else region.proj_mat,
                               random_init=random_init, lin_comb=lin_comb,
                               on_surface=rand_init_on_surf)
        opt_state = opt.init(deltas)

        def iter_body(state, _):
            deltas, opt_state, best, found = state
            (_, dists), grads = jax.value_and_grad(
                loss_and_dists, has_aux=True)(deltas)
            preds = jnp.argmin(dists, axis=1)
            success = preds != labels
            newly = success & (~found)
            best = jnp.where(newly[:, None], deltas, best)
            found = found | success
            updates, opt_state = opt.update(grads, opt_state, deltas)
            deltas = project(optax.apply_updates(deltas, updates))
            return (deltas, opt_state, best, found), None

        (deltas, _, best, found), _ = jax.lax.scan(
            iter_body, (deltas, opt_state, best, found), None, length=iters)
        return (best, found), None

    init_best = jnp.zeros((B, delta_dim), jnp.float32)
    init_found = jnp.zeros((B,), bool)
    (best, found), _ = jax.lax.scan(one_restart, (init_best, init_found),
                                    jax.random.split(key, restarts))

    magnitudes = check_deltas(best, region, lin_comb=lin_comb)
    return PGDResult(best, found, magnitudes)


def check_deltas(deltas: jnp.ndarray, region: G.RegionMatrices,
                 lin_comb: bool = True) -> jnp.ndarray:
    """Squared Sigma-norms of the deltas (gen_utils.py:319-332)."""
    if lin_comb:
        return G.sq_distance_diag(region.red_ellipse_diag, deltas)
    return G.sq_distance(region.ellipse.mat(), deltas)


def assert_deltas_feasible(deltas: jnp.ndarray, region: G.RegionMatrices,
                           lin_comb: bool = True, atol: float = 1e-3) -> None:
    """Host-side validity check mirroring the reference's asserts."""
    if lin_comb:
        assert G.in_ellps(deltas, region.red_ellipse, atol=atol), \
            "deltas outside reduced ellipsoid"
    else:
        assert G.in_subs(deltas, region.proj_mat, atol=atol)
        assert G.in_ellps(deltas, region.ellipse, atol=atol)
