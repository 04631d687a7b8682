"""In-graph adaptive engine (smoothing/adaptive_device.py): parity with the
host-poll engine, threshold-table properties, and the sharded path.

The device engine must reproduce the host engine's (prediction, gap,
n_used) tuple bit-for-bit whenever the stopping rules are exactly monotone
in the success count (the builder verifies this per checkpoint); the one
documented exception is guaranteed-mode gap_target, where the device
engine may stop later and emit a >= (still valid) gap.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from certifyingfacerecognition_tpu.parallel.mesh import get_mesh
from certifyingfacerecognition_tpu.smoothing import adaptive_device as ad
from certifyingfacerecognition_tpu.smoothing.certificate import L2Certificate
from certifyingfacerecognition_tpu.smoothing.smooth import ABSTAIN, Smooth


def _threshold_predictor(tau):
    def fn(z, p):
        return (p[:, 0] > tau).astype(jnp.int32)
    return fn


def _smooth(tau, sigma=1.0, batch_size=200, mesh=None):
    return Smooth(_threshold_predictor(tau), num_classes=2, sigma=sigma,
                  certificate=L2Certificate(), noise_dim=5,
                  batch_size=batch_size, mesh=mesh)


Z = jnp.zeros(4)
X = np.zeros(5)


def _both(sm, seed, n, mode, **kw):
    args = (Z, X, 0, 100, n, 0.001, jax.random.PRNGKey(seed))
    host = sm.certify_adaptive(*args, mode=mode, engine="host", **kw)
    dev = sm.certify_adaptive(*args, mode=mode, engine="device", **kw)
    return host, dev


@pytest.mark.parametrize("mode", ["sequential", "guaranteed"])
def test_device_engine_bit_parity_with_host(mode):
    # Spans clear certify (p=.9987), borderline certify (p=.55), clear
    # abstain-or-flip (p=.16), across chunk sizes incl. ragged tails.
    configs = [(3.0, 10_000, 2), (0.126, 2000, 4), (1.0, 5000, 1),
               (-1.0, 1000, 2), (0.126, 1000, 3)]
    for tau, n, chunk in configs:
        sm = _smooth(tau, batch_size=64 if chunk == 3 else 200)
        for seed in range(3):
            host, dev = _both(sm, seed, n, mode, chunk_batches=chunk)
            assert dev == host, (mode, tau, n, chunk, seed, host, dev)


def test_device_engine_unsettled_run_matches_exactly():
    # Borderline p with slack=0: host runs to m=N; device must too, with
    # the identical emitted gap (same counts, same final CP call).
    sm = _smooth(0.126, batch_size=100)
    host, dev = _both(sm, 7, 2000, "guaranteed", chunk_batches=4, slack=0.0)
    assert dev == host
    assert dev[2] == 100 + 2000  # no early stop fired


def test_device_engine_sequential_gap_target():
    # gap_target only ADDS an emit condition in sequential mode; rule stays
    # monotone, so parity must remain exact.
    sm = _smooth(3.0)
    host, dev = _both(sm, 0, 10_000, "sequential", chunk_batches=2,
                      gap_target=1.0)
    assert dev == host
    assert dev[1] >= 1.0  # the target is met at the stop point


def test_device_engine_guaranteed_gap_target_conservative():
    # The documented non-monotone case: device may stop at the same point
    # or later; decisions match, n_used >= host's, gap >= host's.
    sm = _smooth(3.0)
    host, dev = _both(sm, 0, 10_000, "guaranteed", chunk_batches=2,
                      gap_target=1.0)
    assert dev[0] == host[0]
    assert dev[2] >= host[2]
    assert dev[1] >= host[1] - 1e-12
    assert (dev[1] >= 1.0) == (host[1] >= 1.0)


def test_device_engine_selection_fail():
    # p_A(class 0) ~ 0.16: selection picks class 1; device returns it with
    # n_used = n0 and zero gap, same as host.
    sm = _smooth(-1.0)
    host, dev = _both(sm, 1, 1000, "sequential", chunk_batches=2)
    assert dev == host
    assert dev[0] == 1 and dev[1] == 0.0 and dev[2] == 100


def test_device_engine_sharded_mesh():
    mesh = get_mesh("mc")
    assert mesh.shape["mc"] == 8
    sm = _smooth(3.0, batch_size=64, mesh=mesh)
    pred, gap, n_used = sm.certify_adaptive(
        Z, X, 0, 100, 4000, 0.001, jax.random.PRNGKey(0),
        mode="sequential", chunk_batches=2, engine="device")
    assert pred == 0 and gap > 0
    assert n_used < 100 + 4000  # early stop fired under shard_map


@pytest.mark.parametrize("mode", ["sequential", "guaranteed"])
def test_grouped_engine_bit_parity_with_single(mode):
    # One group mixing all three outcome regimes via per-identity x
    # offsets: clear certify (p=.9987), borderline (p=.55), clear
    # selection-fail (p=.0013). Grouped results must equal per-identity
    # device-engine calls with the same fold_in'd keys.
    sm = _smooth(0.0, batch_size=100)
    offsets = [3.0, 0.126, -3.0, 3.0]
    xs = [np.zeros(5) + np.array([o, 0, 0, 0, 0]) for o in offsets]
    zs = [Z] * 4
    # predictor emits class 1 iff p[0] > tau=0: id0 clear certify (label 1,
    # p=.9987), id1 borderline (label 1, p=.55), id2 clear certify (label
    # 0), id3 selection-fail (label 0 but the model picks 1).
    labels = [1, 1, 0, 0]
    master = jax.random.PRNGKey(42)
    keys = [jax.random.fold_in(master, i) for i in range(4)]
    singles = [sm.certify_adaptive(zs[i], xs[i], labels[i], 100, 2000,
                                   0.001, keys[i], mode=mode,
                                   chunk_batches=2, engine="device")
               for i in range(4)]
    grouped = sm.certify_adaptive_many(zs, xs, labels, 100, 2000, 0.001,
                                       keys, mode=mode, chunk_batches=2)
    assert grouped == singles
    # the regimes actually differ (certify / selection-fail both present)
    assert singles[0][1] > 0 and singles[3][1] == 0.0 and singles[3][0] == 1


def test_grouped_engine_padding_is_invisible():
    sm = _smooth(3.0)
    keys = [jax.random.fold_in(jax.random.PRNGKey(1), i) for i in range(3)]
    zs, xs, labels = [Z] * 3, [X] * 3, [0] * 3
    args = (zs, xs, labels, 100, 2000, 0.001, keys)
    plain = sm.certify_adaptive_many(*args, mode="sequential",
                                     chunk_batches=2)
    padded = sm.certify_adaptive_many(*args, mode="sequential",
                                      chunk_batches=2, pad_to=8)
    assert padded == plain and len(padded) == 3


def test_grouped_engine_sharded_mesh():
    mesh = get_mesh("mc")
    sm = _smooth(3.0, batch_size=64, mesh=mesh)
    keys = [jax.random.fold_in(jax.random.PRNGKey(0), i) for i in range(2)]
    out = sm.certify_adaptive_many([Z, Z], [X, X], [0, 0], 100, 4000,
                                   0.001, keys, mode="sequential",
                                   chunk_batches=2)
    for pred, gap, n_used in out:
        assert pred == 0 and gap > 0 and n_used < 100 + 4000


def test_threshold_tables_are_exact_and_ordered():
    cert = L2Certificate()
    valid = np.full((50,), 200, np.int64)
    valid[-1] = 120
    for mode in ("sequential", "guaranteed"):
        tab = ad.build_thresholds(mode, 9920, valid, chunk_batches=5,
                                  alpha=0.001, certificate=cert, slack=0.1,
                                  gap_target=None)
        assert tab.exact, mode
        assert tab.m_k[-1] == 9920
        # abstain below emit everywhere; final checkpoint exhaustive.
        assert np.all(tab.t_abst < tab.t_emit)
        assert tab.t_abst[-1] == tab.t_emit[-1] - 1
        # Wherever a checkpoint CAN emit (threshold reachable: t <= m_k),
        # emitting must actually clear the CP rule there; unreachable
        # checkpoints carry the m_k+1 sentinel (never fires).
        reachable = [k for k in range(len(tab.m_k))
                     if tab.t_emit[k] <= tab.m_k[k]]
        assert reachable, mode
        for k in reachable:
            m = int(tab.m_k[k])
            last = k == len(tab.m_k) - 1
            a_k = ((tab.alpha_final if last else tab.alpha_early)
                   if mode == "sequential" else 0.001)
            n_den = m if mode == "sequential" else 9920
            lb = ad._cp_lower_vec(np.array([tab.t_emit[k]]), n_den, a_k)[0]
            assert lb >= 0.5, (mode, k)


def test_headline_config_stops_at_first_checkpoint():
    # The deployment headline (docs/PERF.md "The in-graph engine and
    # grouped dispatch"): N=10k, N0=100, alpha=0.001, batch 128, chunk
    # poll = 1, slack 1.0. A pA~1 identity must settle at the FIRST
    # checkpoint - n_used = N0 + 128 = 228, the measured on-chip number -
    # and the emitted gap must be the checkpoint's own CP bound.
    from certifyingfacerecognition_tpu.utils.stats import \
        clopper_pearson_lower

    sm = _smooth(3.0, batch_size=128)   # p(class 0) = .9987
    pred, gap, n_used = sm.certify_adaptive(
        Z, X, 0, 100, 10_000, 0.001, jax.random.PRNGKey(7),
        mode="sequential", chunk_batches=1, slack=1.0, engine="device")
    assert pred == 0 and n_used == 228
    # 79 checkpoints -> alpha_early = alpha / (2*78); gap = the CP lower
    # bound of the first checkpoint's own (n_a, m=128) at that level.
    n_a = 128  # all-success first batch at p=.9987 under this seed
    expect = sm.certificate.compute_gap(
        clopper_pearson_lower(n_a, 128, 0.001 / 156))
    assert gap == expect


def test_threshold_table_single_chunk_alpha():
    # One checkpoint => no alpha split (mirrors the host engine's
    # n_chunks==1 branch).
    cert = L2Certificate()
    tab = ad.build_thresholds("sequential", 400, np.full((2,), 200),
                              chunk_batches=2, alpha=0.01, certificate=cert,
                              slack=0.1, gap_target=None)
    assert tab.alpha_early == tab.alpha_final == 0.01
    assert tab.t_emit.shape == (1,)
