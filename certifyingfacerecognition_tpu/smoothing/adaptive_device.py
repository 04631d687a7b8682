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


def _make_run_core(batch_fn: Callable, num_classes: int,
                   chunk_batches: int, n_chunks: int) -> Callable:
    """The traceable single-identity certification core shared by the
    one-identity (make_adaptive_run_fn) and grouped
    (make_adaptive_run_many_fn) programs: N0 selection scan, then a
    lax.while_loop over checkpoints whose body scans ``chunk_batches`` MC
    batches and compares the running success count against the threshold
    tables — zero host round-trips.

    ``batch_fn(params, z, x, sigma, key, n_valid) -> counts [num_classes]``
    is the (optionally shard_map-sharded) primitive from
    smooth._make_batch_fn. Signature of the returned traceable:

        (params, z, x, sigma, keys0 [B0,·], valid0 [B0],
         keys [K*C,·], valid [K*C], label, t_emit [K], t_abst [K])
        -> int32[5]   # stacked (c_a_hat, n_a, m, k_stop, status)
    """

    def _scan_counts(params, z, x, sigma, keys_i, valid_i):
        def body(c, inp):
            key, nv = inp
            return c + batch_fn(params, z, x, sigma, key, nv), None
        init = jnp.zeros((num_classes,), jnp.float32)
        counts, _ = jax.lax.scan(body, init, (keys_i, valid_i))
        return counts

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
        # ONE stacked array, not five scalars: each standalone scalar costs
        # its own ~30 ms host pull under the axon tunnel, which at the
        # sigma=0.1 operating point (~0.25 s/id compute) would eat the
        # engine's entire dispatch-overhead win (measured: 0.392 s/id with
        # five pulls vs 0.336 host-engine — docs/PERF.md round 4).
        return jnp.stack([c_a_hat, n_a, m, k - 1, status])

    return run


def make_adaptive_run_fn(batch_fn: Callable, num_classes: int,
                         chunk_batches: int, n_chunks: int) -> Callable:
    """Jit the single-identity certification program (see _make_run_core)."""
    return jax.jit(_make_run_core(batch_fn, num_classes, chunk_batches,
                                  n_chunks))


def make_adaptive_run_many_fn(batch_fn: Callable, num_classes: int,
                              chunk_batches: int, n_chunks: int) -> Callable:
    """Build the GROUPED certification program: G identities per dispatch.

    One MC batch already saturates the chip, so the group is a
    ``lax.map`` (sequential in-graph) over the single-identity core, NOT a
    vmap — a vmap'd while_loop would run every lane until the slowest
    stops, wasting compute on stragglers, whereas lax.map gives each
    identity its own early exit. What grouping buys is the amortisation
    of the per-dispatch overhead (launch + one ~30 ms result pull under
    the axon tunnel) over G identities — the dominant cost once adaptive
    stopping cuts per-identity compute to ~2 batches (docs/PERF.md,
    "Adaptive at the REFERENCE operating point").

    Signature: like the single-identity program but with a leading group
    axis G on (z, x, keys0, keys, label); (params, sigma, valid0, valid,
    t_emit, t_abst) are shared. Returns int32[G, 5].
    """
    core = _make_run_core(batch_fn, num_classes, chunk_batches, n_chunks)

    @jax.jit
    def run_many(params, zs, xs, sigma, keys0s, valid0, keyss, valid,
                 labels, t_emit, t_abst):
        def one(per_id):
            z, x, keys0, keys, label = per_id
            return core(params, z, x, sigma, keys0, valid0, keys, valid,
                        label, t_emit, t_abst)
        return jax.lax.map(one, (zs, xs, keys0s, keyss, labels))

    return run_many


def _loop_shapes(smooth, n0: int, n: int, chunk_batches: int):
    bs = smooth.batch_size
    n0_batches = math.ceil(n0 / bs)
    n_batches = math.ceil(n / bs)
    n_chunks = math.ceil(n_batches / chunk_batches)
    padded = n_chunks * chunk_batches
    valid0 = jnp.full((n0_batches,), bs, jnp.int32).at[-1].set(
        n0 - (n0_batches - 1) * bs)
    valid = np.zeros((padded,), np.int64)
    valid[:n_batches] = bs
    valid[n_batches - 1] = n - (n_batches - 1) * bs
    return n0_batches, n_batches, n_chunks, padded, valid0, valid


def _key_streams(key: jax.Array, n0_batches: int, n_batches: int,
                 padded: int):
    """Per-identity key streams — EXACTLY the host engines' derivation
    (certify_adaptive: split(key) -> N0 stream + MC stream)."""
    k0, k1 = jax.random.split(key)
    keys0 = jax.random.split(k0, n0_batches)
    all_keys = jax.random.split(k1, n_batches)
    if padded > n_batches:
        all_keys = jnp.concatenate(
            [all_keys, jnp.zeros((padded - n_batches,) + all_keys.shape[1:],
                                 all_keys.dtype)])
    return keys0, all_keys


def _get_tab(smooth, mode: str, n: int, valid, chunk_batches: int,
             alpha: float, slack: float, gap_target) -> ThresholdTable:
    tab_key = (mode, n, smooth.batch_size, chunk_batches, alpha, slack,
               gap_target, id(smooth.certificate))
    tab = smooth._adaptive_tab_cache.get(tab_key)
    if tab is None:
        tab = build_thresholds(mode, n, valid, chunk_batches, alpha,
                               smooth.certificate, slack, gap_target)
        smooth._adaptive_tab_cache[tab_key] = tab
    return tab


def _result_from_row(smooth, tab: ThresholdTable, mode: str, n0: int,
                     n: int, n_chunks: int, alpha: float, row):
    """(c_a_hat, n_a, m, k_stop, status) -> the host engine's
    (prediction, gap, n_used) tuple, same scalar arithmetic."""
    from .smooth import ABSTAIN
    from ..utils.stats import clopper_pearson_lower

    c_a_hat, n_a, m, k_stop, status = (int(v) for v in row)
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


def certify_adaptive_device(smooth, z, x, label: int, n0: int, n: int,
                            alpha: float, key: jax.Array, mode: str,
                            chunk_batches: int, slack: float, gap_target):
    """Engine="device" backend for Smooth.certify_adaptive.

    Consumes the same key/valid streams as the host engines, runs the
    whole certification in one dispatch, then reconstructs the host
    engine's return tuple (prediction, gap, n_used) from the five scalars.
    """
    (n0_batches, n_batches, n_chunks, padded, valid0,
     valid) = _loop_shapes(smooth, n0, n, chunk_batches)
    keys0, all_keys = _key_streams(key, n0_batches, n_batches, padded)
    tab = _get_tab(smooth, mode, n, valid, chunk_batches, alpha, slack,
                   gap_target)

    run_key = (chunk_batches, n_chunks)
    run = smooth._adaptive_run_cache.get(run_key)
    if run is None:
        run = make_adaptive_run_fn(smooth._batch_fn, smooth.num_classes,
                                   chunk_batches, n_chunks)
        smooth._adaptive_run_cache[run_key] = run

    out = np.asarray(run(
        smooth.params, jnp.asarray(z, jnp.float32),
        jnp.asarray(x, jnp.float32), smooth.sigma, keys0, valid0,
        all_keys, jnp.asarray(valid, jnp.int32), jnp.int32(label),
        jnp.asarray(tab.t_emit, jnp.int32),
        jnp.asarray(tab.t_abst, jnp.int32)))   # one host pull
    return _result_from_row(smooth, tab, mode, n0, n, n_chunks, alpha, out)


def certify_adaptive_device_many(smooth, zs, xs, labels, n0: int, n: int,
                                 alpha: float, keys, mode: str,
                                 chunk_batches: int, slack: float,
                                 gap_target, pad_to: int = 0):
    """Grouped device engine: certify G identities in ONE dispatch.

    Per-identity inputs: ``zs [G, ...]``, ``xs [G, k]``, ``labels [G]``,
    ``keys [G]`` PRNG keys (each identity's key = what the per-identity
    path would receive, e.g. fold_in(master, i) in the CLI). Every
    identity's result is bit-identical to a ``certify_adaptive_device``
    call with the same key: the key streams, threshold tables, and the
    final scalar arithmetic are the same code — grouping only amortises
    the dispatch + result-pull overhead over G.

    ``pad_to``: compile-shape bucket. When G < pad_to the group is padded
    by repeating identity 0 (results discarded), so a CLI sweep reuses ONE
    compiled program for every group including the ragged tail. Returns a
    list of G (prediction, gap, n_used) tuples.
    """
    g = len(labels)
    assert g >= 1 and len(zs) == len(xs) == len(keys) == g
    g_pad = max(g, pad_to)

    (n0_batches, n_batches, n_chunks, padded, valid0,
     valid) = _loop_shapes(smooth, n0, n, chunk_batches)
    tab = _get_tab(smooth, mode, n, valid, chunk_batches, alpha, slack,
                   gap_target)

    streams = [_key_streams(keys[i], n0_batches, n_batches, padded)
               for i in range(g)]
    idx = list(range(g)) + [0] * (g_pad - g)
    keys0s = jnp.stack([streams[i][0] for i in idx])
    keyss = jnp.stack([streams[i][1] for i in idx])
    zs_arr = jnp.asarray(np.stack([np.asarray(zs[i]) for i in idx]),
                         jnp.float32)
    xs_arr = jnp.asarray(np.stack([np.asarray(xs[i]) for i in idx]),
                         jnp.float32)
    labels_arr = jnp.asarray([int(labels[i]) for i in idx], jnp.int32)

    run_key = (chunk_batches, n_chunks, "many", g_pad)
    run = smooth._adaptive_run_cache.get(run_key)
    if run is None:
        run = make_adaptive_run_many_fn(
            smooth._batch_fn, smooth.num_classes, chunk_batches, n_chunks)
        smooth._adaptive_run_cache[run_key] = run

    rows = np.asarray(run(
        smooth.params, zs_arr, xs_arr, smooth.sigma, keys0s, valid0, keyss,
        jnp.asarray(valid, jnp.int32), labels_arr,
        jnp.asarray(tab.t_emit, jnp.int32),
        jnp.asarray(tab.t_abst, jnp.int32)))   # one host pull for G ids
    return [_result_from_row(smooth, tab, mode, n0, n, n_chunks, alpha,
                             rows[i]) for i in range(g)]
