"""In-graph adaptive certification: host-free early stopping.

The host-poll engine (``Smooth.certify_adaptive``) dispatches one counts
program per chunk and pulls one scalar back per checkpoint. Under the
axon tunnel a pull costs ~30 ms, which at the reference operating point
(sigma=0.1, slack 1.0 — identities settle at the FIRST checkpoint) is
~15% of the 0.46 s/id wall-clock and makes polling finer than ~2 batches
counterproductive (docs/PERF.md "Adaptive at the REFERENCE operating
point"). This module removes the host from the loop entirely:

  * every stopping rule in both adaptive modes is a comparison of the
    running success count ``n_a`` against the Clopper-Pearson geometry of
    the checkpoint — and CP bounds are monotone in ``n_a``. So the rules
    collapse to two int32 threshold tables (certify-emit / abstain), one
    entry per checkpoint, precomputed ONCE per (mode, n, batch, chunk,
    alpha, slack, gap_target) config with vectorized scipy Beta quantiles
    (`build_thresholds`);
  * the device program (`make_adaptive_run_fn`) fuses N0 selection, the
    chunked MC loop (a ``lax.while_loop`` whose body scans
    ``chunk_batches`` batches), and the threshold comparisons. One
    dispatch per identity; the only host traffic is the final
    (c_a_hat, n_a, m, k_stop, status) 5-tuple;
  * the emitted gap is then computed on host from (n_a, m, k_stop) with
    the exact same scalar arithmetic as the host-poll engine, so results
    are bit-identical whenever the rule set is exactly monotone. The
    builder *verifies* monotonicity per checkpoint (``exact`` flag): the
    only known non-monotone case is guaranteed-mode ``gap_target`` whose
    "provably below target" branch is decreasing in ``n_a``; there the
    suffix-true threshold stops no earlier than the host engine, and the
    emitted gap (computed at a larger ``n_a``) remains a valid CP bound
    that can only be larger.

This is a framework extension — the reference
(/root/reference/smoothing/smooth.py:39-77) has only the fixed-N
estimator; the adaptive contracts are defined in
``Smooth.certify_adaptive`` and pinned by tests/test_adaptive*.py.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable

import numpy as np
from scipy.stats import beta as _beta

import jax
import jax.numpy as jnp


def _cp_lower_vec(k: np.ndarray, n: int, alpha: float) -> np.ndarray:
    """Vectorized utils.stats.clopper_pearson_lower (same scipy call)."""
    k = np.asarray(k, np.int64)
    out = np.zeros(k.shape, np.float64)
    pos = k > 0
    out[pos] = _beta.ppf(alpha, k[pos], n - k[pos] + 1)
    return out


def _cp_upper_vec(k: np.ndarray, n: int, alpha: float) -> np.ndarray:
    """Vectorized utils.stats.clopper_pearson_upper (same scipy call)."""
    k = np.asarray(k, np.int64)
    out = np.ones(k.shape, np.float64)
    lt = k < n
    out[lt] = _beta.isf(alpha, k[lt] + 1, n - k[lt])
    return out


def _gap_vec(certificate, p: np.ndarray) -> np.ndarray:
    """certificate.compute_gap over an array (vectorized when available)."""
    fn = getattr(certificate, "compute_gap_vec", None)
    if fn is not None:
        return np.asarray(fn(p), np.float64)
    return np.array([certificate.compute_gap(float(v)) for v in p],
                    np.float64)


def _suffix_threshold(flags: np.ndarray):
    """Smallest t with flags[t:] all True (len(flags) if none); exact iff
    the True-set is precisely that suffix."""
    run = np.logical_and.accumulate(flags[::-1])
    t = len(flags) - int(run.sum())
    exact = bool(np.array_equal(flags, np.arange(len(flags)) >= t))
    return t, exact


def _prefix_threshold(flags: np.ndarray):
    """Largest t with flags[:t+1] all True (-1 if flags[0] is False); exact
    iff the True-set is precisely that prefix."""
    run = np.logical_and.accumulate(flags)
    t = int(run.sum()) - 1
    exact = bool(np.array_equal(flags, np.arange(len(flags)) <= t))
    return t, exact


@dataclass(frozen=True)
class ThresholdTable:
    """Per-checkpoint stopping thresholds for the device loop.

    At checkpoint k (cumulative valid samples ``m_k[k]``) the loop emits a
    certification iff n_a >= t_emit[k] and an abstention iff
    n_a <= t_abst[k]; both rule sets are exhaustive at the last checkpoint
    by construction. ``alpha_early``/``alpha_final`` reproduce the
    host-poll engine's alpha-spending split for the post-hoc gap.
    """
    t_emit: np.ndarray        # int64 [K]
    t_abst: np.ndarray        # int64 [K]
    m_k: np.ndarray           # int64 [K] cumulative valid samples
    alpha_early: float
    alpha_final: float
    exact: bool               # all rules were exactly monotone in n_a


def build_thresholds(mode: str, n: int, valid: np.ndarray,
                     chunk_batches: int, alpha: float, certificate,
                     slack: float, gap_target) -> ThresholdTable:
    """Precompute the integer stopping thresholds for one adaptive config.

    ``valid`` is the padded per-batch valid-sample vector the loop consumes
    (length K * chunk_batches); the rules evaluated per checkpoint are
    EXACTLY those of Smooth.certify_adaptive (same scipy calls), reduced
    to thresholds via their monotonicity in n_a.
    """
    assert mode in ("guaranteed", "sequential"), mode
    valid = np.asarray(valid, np.int64)
    assert valid.size % chunk_batches == 0
    n_chunks = valid.size // chunk_batches
    m_k = np.cumsum(valid.reshape(n_chunks, chunk_batches).sum(axis=1))

    alpha_early = alpha / (2 * (n_chunks - 1)) if n_chunks > 1 else alpha
    alpha_final = alpha / 2 if n_chunks > 1 else alpha

    t_emit = np.zeros((n_chunks,), np.int64)
    t_abst = np.zeros((n_chunks,), np.int64)
    exact = True
    for k in range(n_chunks):
        m = int(m_k[k])
        last = k == n_chunks - 1
        n_a = np.arange(m + 1)
        with np.errstate(invalid="ignore"):
            if mode == "guaranteed":
                lb_lo = _cp_lower_vec(n_a, n, alpha)
                lb_hi = _cp_lower_vec(n_a + (n - m), n, alpha)
                abst = lb_hi < 0.5
                settled = lb_lo >= 0.5
                if last:
                    emit = settled
                else:
                    gap_lo = np.where(settled,
                                      _gap_vec(certificate,
                                               np.clip(lb_lo, 1e-300, 1)),
                                      -np.inf)
                    gap_hi = _gap_vec(certificate, np.clip(lb_hi, 1e-300, 1))
                    stop = gap_lo >= (1.0 - slack) * gap_hi
                    if gap_target is not None:
                        stop |= (gap_lo >= gap_target) | (gap_hi < gap_target)
                    emit = settled & stop
            else:
                a_k = alpha_final if last else alpha_early
                lb_k = _cp_lower_vec(n_a, m, a_k)
                abst = _cp_upper_vec(n_a, m, a_k) < 0.5
                settled = lb_k >= 0.5
                if last:
                    emit = settled
                else:
                    gap_k = np.where(settled,
                                     _gap_vec(certificate,
                                              np.clip(lb_k, 1e-300, 1)),
                                     -np.inf)
                    gap_best = _gap_vec(certificate, np.clip(
                        _cp_lower_vec(n_a + (n - m), n, alpha_final),
                        1e-300, 1))
                    stop = gap_k >= (1.0 - slack) * gap_best
                    if gap_target is not None:
                        stop |= gap_k >= gap_target
                    emit = settled & stop
        te, ex_e = _suffix_threshold(emit)
        ta, ex_a = _prefix_threshold(abst)
        if last:
            # Exhaustive final checkpoint: not-emitted => abstain, exactly
            # as the host engine's trailing `if last: return ABSTAIN`.
            ta = te - 1
            ex_a = True
        else:
            assert ta < te, (mode, k, ta, te)
        t_emit[k], t_abst[k] = te, ta
        exact = exact and ex_e and ex_a
    return ThresholdTable(t_emit, t_abst, m_k, alpha_early, alpha_final,
                          exact)


# Device-loop status codes (int32).
RUNNING, EMIT, ABSTAIN_STATUS, SELECTION_FAIL = 0, 1, 2, 3


def make_adaptive_run_fn(batch_fn: Callable, num_classes: int,
                         chunk_batches: int, n_chunks: int) -> Callable:
    """Build the single-dispatch adaptive certification program.

    ``batch_fn(params, z, x, sigma, key, n_valid) -> counts [num_classes]``
    is the (optionally shard_map-sharded) primitive from
    smooth._make_batch_fn. The returned jitted function maps

        (params, z, x, sigma, keys0 [B0,·], valid0 [B0],
         keys [K*C,·], valid [K*C], label, t_emit [K], t_abst [K])
        -> (c_a_hat, n_a, m, k_stop, status)   # five int32 scalars

    running the N0 selection scan, then a lax.while_loop over checkpoints
    whose body scans ``chunk_batches`` MC batches and compares the running
    success count against the threshold tables — zero host round-trips.
    """

    def _scan_counts(params, z, x, sigma, keys_i, valid_i):
        def body(c, inp):
            key, nv = inp
            return c + batch_fn(params, z, x, sigma, key, nv), None
        init = jnp.zeros((num_classes,), jnp.float32)
        counts, _ = jax.lax.scan(body, init, (keys_i, valid_i))
        return counts

    @jax.jit
    def run(params, z, x, sigma, keys0, valid0, keys, valid, label,
            t_emit, t_abst):
        counts0 = _scan_counts(params, z, x, sigma, keys0, valid0)
        c_a_hat = jnp.argmax(counts0).astype(jnp.int32)
        status0 = jnp.where(c_a_hat == label, RUNNING,
                            SELECTION_FAIL).astype(jnp.int32)

        def cond(s):
            k, n_a, m, status = s
            return (status == RUNNING) & (k < n_chunks)

        def body(s):
            k, n_a, m, status = s
            keys_k = jax.lax.dynamic_slice_in_dim(
                keys, k * chunk_batches, chunk_batches, 0)
            valid_k = jax.lax.dynamic_slice_in_dim(
                valid, k * chunk_batches, chunk_batches, 0)
            counts = _scan_counts(params, z, x, sigma, keys_k, valid_k)
            n_a = n_a + counts[c_a_hat].astype(jnp.int32)
            m = m + valid_k.sum().astype(jnp.int32)
            status = jnp.where(
                n_a <= t_abst[k], ABSTAIN_STATUS,
                jnp.where(n_a >= t_emit[k], EMIT, RUNNING)).astype(jnp.int32)
            return (k + 1, n_a, m, status)

        init = (jnp.int32(0), jnp.int32(0), jnp.int32(0), status0)
        k, n_a, m, status = jax.lax.while_loop(cond, body, init)
        return c_a_hat, n_a, m, k - 1, status

    return run


def certify_adaptive_device(smooth, z, x, label: int, n0: int, n: int,
                            alpha: float, key: jax.Array, mode: str,
                            chunk_batches: int, slack: float, gap_target):
    """Engine="device" backend for Smooth.certify_adaptive.

    Consumes the same key/valid streams as the host engines, runs the
    whole certification in one dispatch, then reconstructs the host
    engine's return tuple (prediction, gap, n_used) from the five scalars.
    """
    from .smooth import ABSTAIN
    from ..utils.stats import clopper_pearson_lower

    bs = smooth.batch_size
    n0_batches = math.ceil(n0 / bs)
    n_batches = math.ceil(n / bs)
    n_chunks = math.ceil(n_batches / chunk_batches)
    padded = n_chunks * chunk_batches

    k0, k1 = jax.random.split(key)
    keys0 = jax.random.split(k0, n0_batches)
    valid0 = jnp.full((n0_batches,), bs, jnp.int32).at[-1].set(
        n0 - (n0_batches - 1) * bs)
    all_keys = jax.random.split(k1, n_batches)
    valid = np.zeros((padded,), np.int64)
    valid[:n_batches] = bs
    valid[n_batches - 1] = n - (n_batches - 1) * bs
    if padded > n_batches:
        all_keys = jnp.concatenate(
            [all_keys, jnp.zeros((padded - n_batches,) + all_keys.shape[1:],
                                 all_keys.dtype)])

    tab_key = (mode, n, bs, chunk_batches, alpha, slack, gap_target,
               id(smooth.certificate))
    tab = smooth._adaptive_tab_cache.get(tab_key)
    if tab is None:
        tab = build_thresholds(mode, n, valid, chunk_batches, alpha,
                               smooth.certificate, slack, gap_target)
        smooth._adaptive_tab_cache[tab_key] = tab

    run_key = (chunk_batches, n_chunks)
    run = smooth._adaptive_run_cache.get(run_key)
    if run is None:
        run = make_adaptive_run_fn(smooth._batch_fn, smooth.num_classes,
                                   chunk_batches, n_chunks)
        smooth._adaptive_run_cache[run_key] = run

    c_a_hat, n_a, m, k_stop, status = run(
        smooth.params, jnp.asarray(z, jnp.float32),
        jnp.asarray(x, jnp.float32), smooth.sigma, keys0, valid0,
        all_keys, jnp.asarray(valid, jnp.int32), jnp.int32(label),
        jnp.asarray(tab.t_emit, jnp.int32),
        jnp.asarray(tab.t_abst, jnp.int32))
    c_a_hat, n_a, m, k_stop, status = (
        int(c_a_hat), int(n_a), int(m), int(k_stop), int(status))

    if status == SELECTION_FAIL:
        return c_a_hat, 0.0, n0
    if status == ABSTAIN_STATUS:
        return ABSTAIN, 0.0, n0 + m
    assert status == EMIT, status
    if mode == "guaranteed":
        gap = smooth.certificate.compute_gap(
            clopper_pearson_lower(n_a, n, alpha))
    else:
        a_k = (tab.alpha_final if k_stop == n_chunks - 1
               else tab.alpha_early)
        gap = smooth.certificate.compute_gap(
            clopper_pearson_lower(n_a, m, a_k))
    return c_a_hat, gap, n0 + m
