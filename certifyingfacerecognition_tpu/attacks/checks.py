"""Defense sanity checks run before attack evaluation.

JAX-native equivalents of /root/reference/autoattack/checks.py:18-114 —
warnings that flag conditions which make white-box evaluation unreliable:

  * randomized defense (non-deterministic forward): repeated evaluations of
    the same point must agree; under jit a PRNG-keyed model can only be
    randomized via explicit keys, but host callbacks / re-jitted closures
    can still smuggle state in;
  * probability-shaped outputs: attacks expect logits, and softmax outputs
    flatten gradients;
  * zero gradients: dead gradient points break gradient-based attacks;
  * square success-rate anomaly: a score-based attack beating every
    gradient attack suggests gradient masking (checks.py:72-85).

The reference's sys.settrace dynamic-defense detector has no JAX
counterpart — under jit there is no Python to trace; re-tracing IS the
observable, so check_retracing counts jit cache misses instead.
"""

from __future__ import annotations

import warnings
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _warn(msg: str, logger=None) -> None:
    if logger is None:
        warnings.warn(Warning(msg))
    else:
        logger.info(f"Warning: {msg}")


def check_randomized(logits_fn: Callable, x: jnp.ndarray, y: jnp.ndarray,
                     n: int = 5, alpha: float = 1e-4, logger=None) -> bool:
    """Repeated forwards must produce identical accuracy and (normalised)
    outputs (checks.py:18-41). Returns True if randomization detected."""
    outs, corr = [], []
    for _ in range(n):
        out = np.asarray(logits_fn(x))
        corr.append(int((out.argmax(1) == np.asarray(y)).sum()))
        outs.append(out / (np.linalg.norm(out, axis=1, keepdims=True)
                           + 1e-10))
    max_diff = 0.0
    for a in range(n - 1):
        for b in range(a + 1, n):
            max_diff = max(max_diff, float(
                np.linalg.norm(outs[a] - outs[b], axis=1).max()))
    randomized = any(c != corr[-1] for c in corr) or max_diff > alpha
    if randomized:
        _warn("it seems to be a randomized defense! Attack results may be "
              "unreliable; evaluate with multiple seeds.", logger)
    return randomized


def check_range_output(logits_fn: Callable, x: jnp.ndarray,
                       alpha: float = 1e-5, logger=None) -> bool:
    """Detect probability-shaped outputs (checks.py:44-56). Returns True
    if the output looks like a distribution."""
    out = np.asarray(logits_fn(x))
    looks_prob = (out.max() < 1.0 + alpha and out.min() > -alpha
                  and np.all(np.abs(out.sum(-1) - 1.0) < alpha))
    if looks_prob:
        _warn("it seems that the output is a probability distribution; "
              "be sure the attacks receive logits!", logger)
    return looks_prob


def check_zero_gradients(grad: jnp.ndarray, logger=None) -> int:
    """Count samples with identically-zero gradients (checks.py:59-69)."""
    g = np.asarray(grad).reshape(grad.shape[0], -1)
    n_zero = int((np.abs(g).sum(-1) == 0).sum())
    if n_zero:
        _warn(f"there are {n_zero} points with zero gradient! Gradient-"
              "based attacks may be unreliable there.", logger)
    return n_zero


def check_square_sr(acc_dict: Dict[str, float], alpha: float = 0.002,
                    logger=None) -> bool:
    """Score-based Square beating every gradient attack indicates gradient
    masking (checks.py:72-85). acc_dict: attack -> robust accuracy."""
    if "square" not in acc_dict or len(acc_dict) <= 2:
        return False
    best_grad = min(v for k, v in acc_dict.items() if k != "square")
    if acc_dict["square"] < best_grad - alpha:
        _warn(f"Square Attack decreased robust accuracy by "
              f"{best_grad - acc_dict['square']:.2%} vs gradient attacks — "
              "possible gradient masking; consider more Square iterations "
              "or an adaptive attack.", logger)
        return True
    return False


def check_retracing(jitted_fn, inputs, n: int = 3, logger=None) -> bool:
    """JAX analogue of the dynamic-defense check (checks.py:88-114): a
    model whose jit cache keeps missing on identical input shapes is
    changing its computation between calls."""
    if not hasattr(jitted_fn, "_cache_size"):
        return False
    before = jitted_fn._cache_size()
    for _ in range(n):
        jax.block_until_ready(jitted_fn(*inputs))
    misses = jitted_fn._cache_size() - before
    if misses > 1:
        _warn(f"the jitted model re-traced {misses} times on identical "
              "shapes — a dynamic defense? Evaluation may be insufficient.",
              logger)
        return True
    return False


def run_all_checks(logits_fn: Callable, x: jnp.ndarray, y: jnp.ndarray,
                   grad_fn: Optional[Callable] = None, logger=None
                   ) -> Dict[str, bool]:
    """Pre-attack check battery (autoattack.py:99-105)."""
    results = {
        "randomized": check_randomized(logits_fn, x, y, logger=logger),
        "prob_output": check_range_output(logits_fn, x, logger=logger),
    }
    if grad_fn is not None:
        results["zero_grad"] = bool(
            check_zero_gradients(grad_fn(x), logger=logger))
    return results
