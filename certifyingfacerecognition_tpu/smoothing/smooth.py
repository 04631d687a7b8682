"""Randomized-smoothing certifier, TPU-native.

Functional equivalent of /root/reference/smoothing/smooth.py (Cohen-style
certification with pluggable certificates) with the Monte-Carlo loop
re-designed for TPU:

  * the reference evaluates the base classifier through a chain of host
    round-trips (generator micro-batches of 4, CPU softmax —
    models/smoothing_model.py:63-72, gen_utils.py:108-139); here one jitted
    program fuses noise sampling -> perturbation -> synthesis -> embedding ->
    gallery argmin -> class counting, scanned over batches with zero host
    traffic until the final counts;
  * optional multi-chip execution: the batch axis is sharded over a ``mc``
    mesh axis with shard_map; per-class counts are combined with a single
    psum (the only collective this workload needs);
  * abstain/certify decision logic (N0 selection, Clopper-Pearson bound,
    pABar < 0.5 abstention) matches smooth.py:39-77 exactly.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh
from jax import shard_map
from jax.sharding import PartitionSpec as P

from .certificate import Certificate
from ..utils.stats import binom_two_sided_pvalue, clopper_pearson_lower

ABSTAIN = -1


def _make_batch_fn(predict_fn: Callable, num_classes: int,
                   certificate: Certificate, batch_size: int,
                   noise_dim: int, mesh: Optional[Mesh] = None,
                   mc_axis: str = "mc", with_params: bool = False,
                   param_specs=None) -> Callable:
    """One MC batch -> per-class counts [num_classes] (float32).

    The shared primitive under both the fixed-N scan (make_counts_fn) and
    the in-graph adaptive loop (adaptive_device.make_adaptive_run_fn).
    Signature of the returned fn: (params, z, x, sigma, key, n_valid);
    ``params`` is ignored when with_params=False.
    """

    def batch_counts(params, z, x, sigma, key, n_valid):
        noise = certificate.sample_noise(key, (batch_size, noise_dim), sigma)
        p = x[None, :] + noise
        preds = predict_fn(params, z, p) if with_params else predict_fn(z, p)
        weights = (jnp.arange(batch_size) < n_valid).astype(jnp.float32)
        return jnp.zeros((num_classes,), jnp.float32).at[preds].add(weights)

    if mesh is not None:
        n_dev = mesh.shape[mc_axis]
        assert batch_size % n_dev == 0, (
            f"batch_size {batch_size} must divide the {mc_axis} mesh axis "
            f"({n_dev} devices)")
        local_bs = batch_size // n_dev

        # param_specs lets large params arrive sharded (e.g. the identity
        # gallery over the 'id' axis — see parallel.gallery); predict_fn is
        # then responsible for the matching collectives.
        p_specs = P() if param_specs is None else param_specs

        def sharded_batch_counts(params, z, x, sigma, key, n_valid):
            @partial(shard_map, mesh=mesh,
                     in_specs=(p_specs, P(), P(), P(), P(), P()),
                     out_specs=P(), check_vma=False)
            def inner(params, z, x, sigma, key, n_valid):
                idx = jax.lax.axis_index(mc_axis)
                key = jax.random.fold_in(key, idx)
                noise = certificate.sample_noise(
                    key, (local_bs, noise_dim), sigma)
                p = x[None, :] + noise
                preds = (predict_fn(params, z, p) if with_params
                         else predict_fn(z, p))
                offs = idx * local_bs
                weights = ((jnp.arange(local_bs) + offs) < n_valid
                           ).astype(jnp.float32)
                local = jnp.zeros((num_classes,), jnp.float32
                                  ).at[preds].add(weights)
                return jax.lax.psum(local, mc_axis)

            return inner(params, z, x, sigma, key, n_valid)

        return sharded_batch_counts
    return batch_counts


def make_counts_fn(predict_fn: Callable, num_classes: int,
                   certificate: Certificate, batch_size: int,
                   noise_dim: int, mesh: Optional[Mesh] = None,
                   mc_axis: str = "mc", with_params: bool = False,
                   param_specs=None, batch_fn: Optional[Callable] = None
                   ) -> Callable:
    """Build the fused, scanned (and optionally sharded) counting program.

    predict_fn(z [512], p [B, k]) -> int32 predictions [B]. The returned
    function maps (z, x [k], sigma, keys [n_batches], valid [n_batches]) to
    per-class counts [num_classes] (float32), counting only the first
    ``valid[i]`` samples of batch i so the total matches the requested N
    exactly (mirrors the min(batch_size, num) loop at smooth.py:126-137).

    With ``with_params=True``, predict_fn takes (params, z, p) and the
    returned function takes a leading ``params`` pytree. Model weights MUST
    travel this way rather than via closure capture: closed-over arrays are
    baked into the compiled program as constants, which bloats the HLO by
    the full weight footprint (and overflows remote-compile transports).
    """
    if batch_fn is None:
        batch_fn = _make_batch_fn(predict_fn, num_classes, certificate,
                                  batch_size, noise_dim, mesh=mesh,
                                  mc_axis=mc_axis, with_params=with_params,
                                  param_specs=param_specs)

    @jax.jit
    def counts_fn(params, z, x, sigma, keys, valid):
        def body(counts, inp):
            key, n_valid = inp
            return counts + batch_fn(params, z, x, sigma, key, n_valid), None

        init = jnp.zeros((num_classes,), jnp.float32)
        counts, _ = jax.lax.scan(body, init, (keys, valid))
        return counts

    if with_params:
        return counts_fn
    return partial(counts_fn, None)


class Smooth:
    """A smoothed classifier g (API mirror of smooth.py:11-160).

    Args:
      predict_fn: (z [512], p [B, k]) -> argmax-class predictions [B].
      num_classes: gallery size.
      sigma: scalar or [k] distribution parameter (anisotropic diagonal).
      certificate: Certificate instance.
      batch_size: device batch for the MC loop.
      mesh: optional Mesh with an ``mc`` axis to shard the MC batch over.
    """

    ABSTAIN = ABSTAIN

    def __init__(self, predict_fn: Callable, num_classes: int, sigma,
                 certificate: Certificate, noise_dim: int,
                 batch_size: int = 100, mesh: Optional[Mesh] = None,
                 params=None, param_specs=None):
        """If ``params`` is given, predict_fn must take (params, z, p); the
        weights are then passed as runtime arguments instead of being baked
        into the compiled program as constants (see make_counts_fn).
        ``param_specs`` optionally shards those params over the mesh (e.g.
        the gallery over the 'id' axis)."""
        self.num_classes = num_classes
        self.sigma = jnp.asarray(sigma, jnp.float32)
        self.certificate = certificate
        self.batch_size = batch_size
        self.noise_dim = noise_dim
        self.params = params
        self._with_params = params is not None
        self._batch_fn = _make_batch_fn(
            predict_fn, num_classes, certificate, batch_size, noise_dim,
            mesh=mesh, with_params=self._with_params,
            param_specs=param_specs)
        counts_fn = make_counts_fn(
            predict_fn, num_classes, certificate, batch_size, noise_dim,
            mesh=mesh, with_params=self._with_params,
            param_specs=param_specs, batch_fn=self._batch_fn)
        if params is not None:
            self._counts_fn = lambda *a: counts_fn(self.params, *a)
        else:
            self._counts_fn = counts_fn
        # (run_fn, thresholds) caches for the in-graph adaptive engine,
        # keyed by loop shape / full rule config respectively.
        self._adaptive_run_cache = {}
        self._adaptive_tab_cache = {}

    def _sample_noise(self, z, x, num: int, key: jax.Array) -> np.ndarray:
        """Per-class counts from ``num`` noisy forwards (smooth.py:109-138)."""
        n_batches = math.ceil(num / self.batch_size)
        keys = jax.random.split(key, n_batches)
        remainder = num - (n_batches - 1) * self.batch_size
        valid = jnp.full((n_batches,), self.batch_size, jnp.int32
                         ).at[-1].set(remainder)
        counts = self._counts_fn(jnp.asarray(z, jnp.float32),
                                 jnp.asarray(x, jnp.float32),
                                 self.sigma, keys, valid)
        return np.asarray(counts)

    def certify(self, z, x, label: int, n0: int, n: int, alpha: float,
                key: jax.Array):
        """Certify g's prediction around (z, x). Returns (prediction, gap);
        (ABSTAIN, 0.0) on abstention. Decision logic of smooth.py:39-77."""
        k0, k1 = jax.random.split(key)
        counts0 = self._sample_noise(z, x, n0, k0)
        c_a_hat = int(counts0.argmax())
        if c_a_hat != int(label):
            return c_a_hat, 0.0
        counts = self._sample_noise(z, x, n, k1)
        n_a = int(counts[c_a_hat])
        p_a_bar = clopper_pearson_lower(n_a, n, alpha)
        if p_a_bar < 0.5:
            return ABSTAIN, 0.0
        return c_a_hat, self.certificate.compute_gap(p_a_bar)

    def predict(self, z, x, n: int, alpha: float, key: jax.Array) -> int:
        """Monte-Carlo prediction with the two-sided binomial abstention test
        (smooth.py:79-107)."""
        counts = self._sample_noise(z, x, n, key)
        top2 = counts.argsort()[::-1][:2]
        c1, c2 = int(counts[top2[0]]), int(counts[top2[1]])
        if binom_two_sided_pvalue(c1, c1 + c2, 0.5) > alpha:
            return ABSTAIN
        return int(top2[0])

    def certify_adaptive(self, z, x, label: int, n0: int, n: int,
                         alpha: float, key: jax.Array,
                         mode: str = "guaranteed", chunk_batches: int = 8,
                         slack: float = 0.1, gap_target=None,
                         engine: str = "host"):
        """Early-stopping certification. Returns (prediction, gap, n_used).

        The fixed-N estimator (``certify``) spends the full N MC samples on
        every identity that survives selection, even when the decision is
        determined long before. This method consumes the SAME per-batch key
        sequence as ``certify`` but polls the running success count every
        ``chunk_batches`` batches and stops when the outcome is settled
        under one of two rule sets:

        ``mode="guaranteed"`` — deterministic futility bounds, zero
        statistical cost. At m of N samples with n_a successes, the full
        run's final Clopper-Pearson lower bound is bracketed by
        ``CP(n_a, N, alpha)`` (every remaining sample fails) and
        ``CP(n_a + N - m, N, alpha)`` (every remaining sample succeeds).
        If the upper bracket is below 0.5 the full run provably abstains →
        emit ABSTAIN, *identical* to the fixed-N decision for this seed.
        If the lower bracket reaches 0.5 the full run provably certifies →
        certified decisions also match exactly; the emitted gap is the
        lower bracket, a valid radius never exceeding the full run's.
        Honest asymmetry: because the final bound's denominator is the
        full N, the lower bracket stays small until m ≈ N — so WITHOUT a
        ``gap_target`` this mode saves little on certifications (it keeps
        sampling until the bracket is within ``slack`` of the best
        still-achievable gap, which converges only near m = N); its free
        wins are early abstentions and a zero-risk default. With
        ``gap_target`` g₀ (deployments asking "certified at radius ≥
        σ_min·g₀?") it additionally stops the moment the at-target answer
        is settled: lower bracket ≥ g₀ (yes, provably — emit it) or a
        settled certification whose upper bracket is below g₀ (no,
        provably — emit the current valid gap). The at-target bit then
        matches the fixed-N run exactly, per seed.

        ``mode="sequential"`` — alpha-spending checkpoints (union bound
        over K = ceil(batches/chunk_batches) looks: alpha/2 reserved for
        the final look, alpha/(2(K-1)) per early look), the classic
        sequential-testing trade: certifications stop as soon as the
        *checkpoint* bound CP(n_a, m, alpha_k) clears 0.5 (or
        ``gap_target``) — orders of magnitude earlier for p near 1 — and
        clear abstentions stop when CP_upper(n_a, m, alpha_k) < 0.5. The
        cost: radii measured at m < N samples and decisions aligned with
        the fixed-N estimator only statistically (not per-seed). Coverage
        still holds at level alpha: P(any emitted bound exceeds the true
        p) <= sum_k alpha_k = alpha.

        Both modes leave the N0 selection phase untouched. Opt-in: the
        reference's estimator is the fixed-N one, so adaptive mode is never
        the default (BASELINE 'decisions matching reference').

        ``engine="host"`` polls the running count every ``chunk_batches``
        batches with one device dispatch + scalar pull per checkpoint
        (~30 ms each under the axon tunnel). ``engine="device"`` runs the
        ENTIRE certification — selection, MC loop, and stopping rules —
        in one jitted program (lax.while_loop over checkpoints comparing
        n_a against precomputed integer Clopper-Pearson thresholds; see
        adaptive_device.py), making single-batch polling free. Results are
        bit-identical to the host engine whenever the rule set is exactly
        monotone in n_a (always, except guaranteed-mode gap_target, where
        the device engine may stop later and emit a >= but still valid
        gap)."""
        from ..utils.stats import clopper_pearson_upper

        assert mode in ("guaranteed", "sequential"), mode
        assert engine in ("host", "device"), engine
        if engine == "device":
            from .adaptive_device import certify_adaptive_device
            return certify_adaptive_device(
                self, z, x, label, n0, n, alpha, key, mode=mode,
                chunk_batches=chunk_batches, slack=slack,
                gap_target=gap_target)
        k0, k1 = jax.random.split(key)
        counts0 = self._sample_noise(z, x, n0, k0)
        c_a_hat = int(counts0.argmax())
        if c_a_hat != int(label):
            return c_a_hat, 0.0, n0

        # The exact key/valid stream certify() consumes, sliced into
        # fixed-shape chunks (one XLA program regardless of where we stop).
        bs = self.batch_size
        n_batches = math.ceil(n / bs)
        all_keys = jax.random.split(k1, n_batches)
        valid = np.full((n_batches,), bs, np.int64)
        valid[-1] = n - (n_batches - 1) * bs
        n_chunks = math.ceil(n_batches / chunk_batches)
        if n_batches % chunk_batches:
            pad = chunk_batches - n_batches % chunk_batches
            all_keys = jnp.concatenate(
                [all_keys, jnp.zeros((pad,) + all_keys.shape[1:],
                                     all_keys.dtype)])
            valid = np.concatenate([valid, np.zeros((pad,), np.int64)])

        alpha_early = alpha / (2 * (n_chunks - 1)) if n_chunks > 1 else alpha
        alpha_final = alpha / 2 if n_chunks > 1 else alpha

        z = jnp.asarray(z, jnp.float32)
        x = jnp.asarray(x, jnp.float32)
        n_a, m = 0, 0
        for c in range(n_chunks):
            sl = slice(c * chunk_batches, (c + 1) * chunk_batches)
            counts = self._counts_fn(z, x, self.sigma, all_keys[sl],
                                     jnp.asarray(valid[sl]))
            n_a += int(np.asarray(counts[c_a_hat]))  # one-element pull
            m += int(valid[sl].sum())
            last = c == n_chunks - 1

            if mode == "guaranteed":
                lb_lo = clopper_pearson_lower(n_a, n, alpha)
                lb_hi = clopper_pearson_lower(n_a + (n - m), n, alpha)
                if lb_hi < 0.5:
                    return ABSTAIN, 0.0, n0 + m       # full run must abstain
                if lb_lo >= 0.5:                      # full run must certify
                    gap_lo = self.certificate.compute_gap(lb_lo)
                    gap_hi = self.certificate.compute_gap(lb_hi)
                    if gap_target is not None and (gap_lo >= gap_target
                                                   or gap_hi < gap_target):
                        # The "certified at gap >= target" bit is settled
                        # (provably yes / provably no); gap_lo stays valid.
                        return c_a_hat, gap_lo, n0 + m
                    if last or gap_lo >= (1.0 - slack) * gap_hi:
                        return c_a_hat, gap_lo, n0 + m
                if last:                              # unsettled: exact N run
                    if lb_lo < 0.5:
                        return ABSTAIN, 0.0, n0 + m
            else:
                a_k = alpha_final if last else alpha_early
                lb_k = clopper_pearson_lower(n_a, m, a_k)
                if clopper_pearson_upper(n_a, m, a_k) < 0.5:
                    return ABSTAIN, 0.0, n0 + m
                if lb_k >= 0.5:
                    gap_k = self.certificate.compute_gap(lb_k)
                    if gap_target is not None and gap_k >= gap_target:
                        return c_a_hat, gap_k, n0 + m
                    gap_best = self.certificate.compute_gap(
                        clopper_pearson_lower(n_a + (n - m), n, alpha_final))
                    if last or gap_k >= (1.0 - slack) * gap_best:
                        return c_a_hat, gap_k, n0 + m
                if last:
                    return ABSTAIN, 0.0, n0 + m
        raise AssertionError("unreachable")  # pragma: no cover

    def certify_adaptive_many(self, zs, xs, labels, n0: int, n: int,
                              alpha: float, keys,
                              mode: str = "guaranteed",
                              chunk_batches: int = 8, slack: float = 0.1,
                              gap_target=None, pad_to: int = 0):
        """Grouped early-stopping certification: G identities per dispatch.

        Device-engine only (grouping a host-poll loop would multiply, not
        amortise, its per-checkpoint pulls). Each identity's
        (prediction, gap, n_used) is bit-identical to
        ``certify_adaptive(..., engine="device")`` — and therefore to the
        host engine wherever the rules are exactly monotone — given the
        same per-identity key; see adaptive_device.py. Grouping exists
        because adaptive stopping shrinks per-identity device time to a
        couple of batches (~0.25 s at the sigma=0.1 operating point),
        at which point the per-dispatch launch + result-pull overhead
        (~46 ms/id measured) dominates the savings curve; one dispatch
        per G identities divides it by G. ``pad_to`` buckets the compile
        shape so a ragged final group reuses the same program."""
        assert mode in ("guaranteed", "sequential"), mode
        from .adaptive_device import certify_adaptive_device_many
        return certify_adaptive_device_many(
            self, zs, xs, labels, n0, n, alpha, keys, mode=mode,
            chunk_batches=chunk_batches, slack=slack,
            gap_target=gap_target, pad_to=pad_to)
