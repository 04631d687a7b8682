"""Sequential-mode coverage sweep at the deployment configuration.

VERDICT r3 weak #3: the sequential estimator's "coverage <= alpha" claim
was pinned only at a generous alpha (tests/test_adaptive.py, alpha=0.1,
N=2000). This tool runs the REAL ``Smooth.certify_adaptive`` code path —
no reimplementation of the stopping rule — at the reference deployment
point (N=10,000, N0=100, alpha=0.001, batch 128, chunk 8 batches) over a
grid of true success probabilities, using a threshold classifier whose
per-sample success is an exact Bernoulli(p) in the smoothing noise
(class 0 iff noise[0] <= Phi^{-1}(p), sigma=1 — the construction of
tests/test_adaptive.py). Per p it reports:

  * emitted-bound violations: certifications whose Phi(gap) exceeds the
    true p. The alpha-spending union bound guarantees
    P(violation) <= alpha per identity; the empirical rate quantifies
    how conservative the bound is in practice.
  * the savings curve: mean/median samples used vs the fixed estimator's
    N0 + N — the theoretical basis for the measured on-chip speedups in
    docs/PERF.md ("Adaptive early stopping").

Usage: python -m certifyingfacerecognition_tpu.tools.coverage_sweep
Env: CS_PGRID ("0.55,0.75,0.9,0.99,0.999"), CS_TRIALS (1000), CS_N
(10000), CS_N0 (100), CS_ALPHA (0.001), CS_BATCH (128), CS_CHUNK (8),
CS_SLACK (0.1), CS_MODE (sequential). One JSON line per p + a summary.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp
from scipy.stats import norm

from ..smoothing.certificate import L2Certificate
from ..smoothing.smooth import Smooth


def make_bernoulli_smooth(p_true: float, batch_size: int) -> Smooth:
    """Smooth over a classifier whose success indicator under the N(0, I)
    smoothing noise is exactly Bernoulli(p_true) per sample."""
    tau = norm.ppf(p_true)

    def predict(z, p):
        return (p[:, 0] > tau).astype(jnp.int32)   # class 0 = success

    return Smooth(predict, num_classes=2, sigma=1.0,
                  certificate=L2Certificate(), noise_dim=5,
                  batch_size=batch_size)


def sweep_point(p_true: float, trials: int, n: int, n0: int, alpha: float,
                batch: int, chunk: int, slack: float, mode: str,
                base_seed: int = 0):
    sm = make_bernoulli_smooth(p_true, batch)
    z, x = jnp.zeros(4), np.zeros(5)
    key = jax.random.PRNGKey(base_seed)
    used, certified, abstained, rejected, violations = [], 0, 0, 0, 0
    t0 = time.time()
    for t in range(trials):
        pred, gap, n_used = sm.certify_adaptive(
            z, x, 0, n0, n, alpha, jax.random.fold_in(key, t), mode=mode,
            chunk_batches=chunk, slack=slack)
        used.append(n_used)
        if pred == 0 and gap > 0:
            certified += 1
            if norm.cdf(gap) > p_true:
                violations += 1
        elif pred == Smooth.ABSTAIN:
            abstained += 1
        else:
            rejected += 1
    return {
        "p_true": p_true, "mode": mode, "trials": trials,
        "N": n, "N0": n0, "alpha": alpha, "batch": batch,
        "chunk_batches": chunk, "slack": slack,
        "certified": certified, "abstain": abstained,
        "selection_rejected": rejected,
        "violations": violations,
        "violation_rate": round(violations / max(certified, 1), 6),
        "mean_samples": round(float(np.mean(used)), 1),
        "p50_samples": int(np.median(used)),
        "savings_vs_fixed": round((n0 + n) / float(np.mean(used)), 2),
        "wall_s": round(time.time() - t0, 1),
    }


def main():
    grid = [float(p) for p in os.environ.get(
        "CS_PGRID", "0.55,0.75,0.9,0.99,0.999").split(",")]
    trials = int(os.environ.get("CS_TRIALS", "1000"))
    n = int(os.environ.get("CS_N", "10000"))
    n0 = int(os.environ.get("CS_N0", "100"))
    alpha = float(os.environ.get("CS_ALPHA", "0.001"))
    batch = int(os.environ.get("CS_BATCH", "128"))
    chunk = int(os.environ.get("CS_CHUNK", "8"))
    slack = float(os.environ.get("CS_SLACK", "0.1"))
    mode = os.environ.get("CS_MODE", "sequential")

    total_viol, total_cert = 0, 0
    for p in grid:
        row = sweep_point(p, trials, n, n0, alpha, batch, chunk, slack,
                          mode)
        total_viol += row["violations"]
        total_cert += row["certified"]
        print(json.dumps(row), flush=True)
    print(json.dumps({
        "summary": {"total_certified": total_cert,
                    "total_violations": total_viol,
                    "alpha": alpha,
                    # Union-bound guarantee: per-identity violation prob
                    # <= alpha; expected violations <= certified * alpha.
                    "expected_upper": round(total_cert * alpha, 2)}}),
        flush=True)


if __name__ == "__main__":
    # Pure statistics — always run on CPU (never contend with TPU jobs).
    # Must precede backend init; the axon sitecustomize overrides
    # JAX_PLATFORMS programmatically (same handling as tools/weak_scaling).
    jax.config.update("jax_platforms", "cpu")
    main()
