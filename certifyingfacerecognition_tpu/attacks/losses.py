"""Attack losses over gallery distances.

Mirror of /root/reference/attack_utils/gen_utils.py:160-223 (away / nearest /
diff / xent / dlr), written as pure jnp so the whole PGD step differentiates
through one fused program. Sign conventions match the reference exactly
(losses are *minimised* by the optimiser, so e.g. xent returns the negated
cross-entropy, gen_utils.py:203-211).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import EMB_SIZE


def compute_loss(all_dists: jnp.ndarray, labels: jnp.ndarray,
                 loss_type: str = "away", use_probs: bool = True,
                 scale_dists: bool = True) -> jnp.ndarray:
    """all_dists: [B, N] distances; labels: [B] int. Returns a scalar."""
    B = all_dists.shape[0]
    rows = jnp.arange(B)

    if use_probs:
        # NOTE: the reference *reassigns* all_dists here (gen_utils.py:163-165)
        # so the xent branch below scales a second time — mirrored faithfully.
        if scale_dists:
            all_dists = all_dists / np.sqrt(EMB_SIZE)
        vals = jax.nn.softmax(-all_dists, axis=1)
    else:
        vals = all_dists

    target_val = vals[rows, labels]
    fill = -1.0 if use_probs else jnp.inf
    mod_vals = vals.at[rows, labels].set(fill)
    if use_probs:
        nearest_val = jnp.max(mod_vals, axis=1)
    else:
        nearest_val = jnp.min(mod_vals, axis=1)

    if loss_type == "away":
        coeff = 1.0 if use_probs else -1.0
        return coeff * jnp.mean(target_val)
    if loss_type == "nearest":
        coeff = -1.0 if use_probs else 1.0
        return coeff * jnp.mean(nearest_val)
    if loss_type == "diff":
        coeff = 1.0 if use_probs else -1.0
        return coeff * jnp.mean(target_val - nearest_val)
    if loss_type == "xent":
        assert use_probs, "xent loss should be used together with probs"
        # all_dists is already scaled once above; the reference scales again
        # (effective 1/EMB_SIZE) — gen_utils.py:203-208.
        scores = -(all_dists / np.sqrt(EMB_SIZE) if scale_dists else all_dists)
        logp = jax.nn.log_softmax(scores, axis=1)
        xent = -logp[rows, labels]
        return -1.0 * jnp.mean(xent)
    if loss_type == "dlr":
        assert not use_probs, "dlr loss works in terms of logits"
        diff1 = target_val - nearest_val
        logits = -all_dists
        topk = jax.lax.top_k(logits, 3)[0]
        diff2 = topk[:, 0] - topk[:, 2]
        return -1.0 * jnp.mean(diff1 / diff2)
    raise ValueError(f"unknown loss type: {loss_type}")


def dlr_loss(logits: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Per-sample DLR loss (autopgd_base.py:220-227)."""
    B = logits.shape[0]
    rows = jnp.arange(B)
    sorted_logits = jnp.sort(logits, axis=1)
    ind = (jnp.argmax(logits, axis=1) == y).astype(logits.dtype)
    num = logits[rows, y] - sorted_logits[:, -2] * ind \
        - sorted_logits[:, -1] * (1.0 - ind)
    den = sorted_logits[:, -1] - sorted_logits[:, -3] + 1e-12
    return -num / den


def dlr_loss_targeted(logits: jnp.ndarray, y: jnp.ndarray,
                      y_target: jnp.ndarray) -> jnp.ndarray:
    """Per-sample targeted DLR loss (autopgd_base.py:668-673)."""
    B = logits.shape[0]
    rows = jnp.arange(B)
    sorted_logits = jnp.sort(logits, axis=1)
    num = logits[rows, y] - logits[rows, y_target]
    den = sorted_logits[:, -1] - 0.5 * (sorted_logits[:, -3]
                                        + sorted_logits[:, -4]) + 1e-12
    return -num / den


def ce_loss(logits: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Per-sample cross-entropy (positive; APGD maximises it)."""
    logp = jax.nn.log_softmax(logits, axis=1)
    return -logp[jnp.arange(logits.shape[0]), y]
