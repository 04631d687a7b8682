"""Pins tools/mix_study's stopping-rule simulator to the device engine's
own threshold tables.

The mix study (tools/mix_study.py) predicts per-identity sample cost by
Monte-Carlo-ing the adaptive engine's stopping rule host-side against the
EXACT integer tables the device engine executes (adaptive_device.
build_thresholds). These tests pin the simulator's accounting at the
degenerate corners where the engine's behavior is itself pinned
(test_adaptive_device.test_headline_config_stops_at_first_checkpoint),
plus the structural invariants any simulated trajectory must satisfy.
"""

import numpy as np

from certifyingfacerecognition_tpu.smoothing import adaptive_device as ad
from certifyingfacerecognition_tpu.smoothing.certificate import L2Certificate
from certifyingfacerecognition_tpu.tools.mix_study import _simulate_samples

# The deployment headline config (docs/PERF.md): N=10k, N0=100, alpha=1e-3,
# batch 128, chunk-1 polls, slack 1.0 -> 79 checkpoints, first at m=128.
N, N0, ALPHA, BS, CHUNK = 10_000, 100, 0.001, 128, 1
N_BATCHES = -(-N // BS)
VALID = np.zeros((N_BATCHES,), np.int64)
VALID[:] = BS
VALID[-1] = N - (N_BATCHES - 1) * BS
TAB = ad.build_thresholds("sequential", N, VALID, CHUNK, ALPHA,
                          L2Certificate(), slack=1.0, gap_target=None)


def _probs(p, label=0, n_classes=10):
    out = np.full((n_classes,), (1.0 - p) / (n_classes - 1))
    out[label] = p
    return out


def test_pa1_stops_at_first_checkpoint_228():
    # pA=1 must stop at the first checkpoint with exactly N0 + 128 = 228
    # samples — the measured on-chip headline number
    # (adaptive_device_r04.jsonl, test_headline_config_stops_at_first_
    # checkpoint).
    rng = np.random.default_rng(0)
    out = _simulate_samples(_probs(1.0), 0, N0, N, TAB, VALID, CHUNK,
                            sims=50, rng=rng)
    assert np.all(out == N0 + 128)


def test_p0_rejected_at_selection_for_n0_only():
    # pA=0: selection (argmax of the N0 multinomial) can never pick the
    # label -> every trajectory costs N0 samples exactly.
    rng = np.random.default_rng(0)
    out = _simulate_samples(_probs(0.0), 0, N0, N, TAB, VALID, CHUNK,
                            sims=50, rng=rng)
    assert np.all(out == N0)


def test_trajectories_land_on_checkpoint_grid_and_cost_is_monotone():
    # Any simulated total lives on {N0} U {N0 + cumulative chunk sizes},
    # and mean cost decreases as p moves off the boundary toward 1 —
    # the shape the coverage sweeps measured (docs/PERF.md "Population
    # sensitivity" table).
    grid = {N0} | set(N0 + np.cumsum(VALID.reshape(-1, CHUNK).sum(1)))
    rng = np.random.default_rng(1)
    means = []
    for p in (0.55, 0.75, 0.95):
        out = _simulate_samples(_probs(p), 0, N0, N, TAB, VALID, CHUNK,
                                sims=200, rng=rng)
        assert set(np.unique(out)) <= grid
        assert out.max() <= N0 + N
        means.append(out.mean())
    assert means[0] > means[1] > means[2]
    assert means[2] == N0 + 128  # p=.95 clears the first checkpoint
