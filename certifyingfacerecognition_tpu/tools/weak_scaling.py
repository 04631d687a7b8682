"""Weak-scaling scan of the sharded MC-counts program (VERDICT r3 #7).

Scales the fused counts program (noise -> perturb -> synthesis -> embed ->
argmin -> count -> psum, smoothing/smooth.make_counts_fn) over 1/2/4/8
mesh devices at FIXED per-device batch and reports, per device count:

  * compiled per-device FLOPs (XLA cost analysis) — ideal weak scaling is
    a constant; any growth is replicated/redundant work the partitioner
    added;
  * the compiled collective inventory from the optimized HLO: op kind,
    result bytes, and the derived ICI traffic per batch — the measured
    basis for the ICI model in docs/PERF.md ("Weak scaling and the ICI
    model");
  * wall-clock samples/s and the derived efficiency. NOTE the wall-clock
    semantics: on a host with >= n cores the virtual devices genuinely run
    in parallel and ``parallel_efficiency`` = t_1/t_n is the classic
    weak-scaling number; on fewer cores (this repo's dev host has ONE) the
    devices timeshare, the honest wall-clock statement is work
    conservation ``(n * t_1) / t_n`` (== 1 when sharding adds zero
    overhead), and parallel efficiency is NOT measurable. The tool prints
    which interpretation applies (``wallclock_semantics``).

The structural rows (FLOPs, collective bytes) are load- and
host-independent — they are what the multichip claim rests on; the same
program shapes run on real ICI. One JSON line per device count.

Usage (CPU mesh, like the tests):
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python -m certifyingfacerecognition_tpu.tools.weak_scaling

Env knobs: WS_PER_DEV_BATCH (default 8), WS_NBATCHES (4), WS_RESOLUTION
(64), WS_GALLERY (200), WS_DEVICES (comma list, default "1,2,4,8").
"""

from __future__ import annotations

import json
import os
import re
import time

import numpy as np
import jax
import jax.numpy as jnp


# Optimized-HLO collectives and the [dims] of their result (f32 unless the
# program says otherwise; the counts program's collectives are all f32).
_COLLECTIVE_RE = re.compile(
    r"= \w+\[([\d,]*)\]\S* (all-reduce|all-gather|reduce-scatter|"
    r"collective-permute|all-to-all)\(")


def collective_inventory(compiled_text: str):
    """[(kind, result_elems), ...] from an optimized-HLO dump."""
    out = []
    for m in _COLLECTIVE_RE.finditer(compiled_text):
        dims = [int(d) for d in m.group(1).split(",") if d]
        out.append((m.group(2), int(np.prod(dims)) if dims else 1))
    return out


def run_scan(device_counts=None, per_dev_batch=None, n_batches=None,
             resolution=None, n_gallery=None, time_it=True):
    """Returns one result dict per device count (see module docstring)."""
    from ..models import iresnet, stylegan
    from ..models.pipeline import make_lat2embs
    from ..ops import distances as D
    from ..parallel.mesh import MC_AXIS, get_mesh
    from ..smoothing.certificate import L2Certificate
    from ..smoothing.smooth import make_counts_fn

    device_counts = device_counts or [
        int(d) for d in os.environ.get("WS_DEVICES", "1,2,4,8").split(",")]
    per_dev_batch = per_dev_batch or int(
        os.environ.get("WS_PER_DEV_BATCH", "8"))
    n_batches = n_batches or int(os.environ.get("WS_NBATCHES", "4"))
    resolution = resolution or int(os.environ.get("WS_RESOLUTION", "64"))
    n_gallery = n_gallery or int(os.environ.get("WS_GALLERY", "200"))
    assert max(device_counts) <= len(jax.devices()), (
        f"need {max(device_counts)} devices, have {len(jax.devices())} — "
        "run under XLA_FLAGS=--xla_force_host_platform_device_count=8")

    gen_params = stylegan.random_params(resolution, seed=0)
    frm_params = iresnet.convert_torch_state_dict(
        iresnet.random_torch_style_state_dict("iresnet50", seed=0))
    rng = np.random.default_rng(0)
    gallery = jnp.asarray(rng.standard_normal((n_gallery, 512)), jnp.float32)
    dirs = jnp.asarray(np.linalg.qr(
        rng.standard_normal((512, 5)))[0][:, :5].T, jnp.float32)
    embed = make_lat2embs("insightface", resolution, dtype=jnp.float32)

    def predict_fn(params, z, p):
        gp, fp = params
        w = z[None, :] + jnp.dot(p, dirs)
        embs = embed(gp, fp, w).astype(jnp.float32)
        return D.argmin_dist_refined(embs, gallery, "insightface")

    params = (gen_params, frm_params)
    z = jnp.asarray(rng.standard_normal(512), jnp.float32)
    x = jnp.zeros((5,), jnp.float32)
    sigma = jnp.asarray(0.1, jnp.float32)
    ncores = os.cpu_count() or 1

    results = []
    for n in device_counts:
        batch = n * per_dev_batch                   # weak scaling
        mesh = get_mesh(MC_AXIS, n_devices=n) if n > 1 else None
        counts = make_counts_fn(predict_fn, n_gallery, L2Certificate(),
                                batch_size=batch, noise_dim=5, mesh=mesh,
                                with_params=True)
        keys = jax.random.split(jax.random.PRNGKey(0), n_batches)
        valid = jnp.full((n_batches,), batch, jnp.int32)
        lowered = jax.jit(counts).lower(params, z, x, sigma, keys, valid)
        compiled = lowered.compile()
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = float(cost.get("flops", float("nan"))) if cost else None
        coll = collective_inventory(compiled.as_text())
        row = {
            "devices": n,
            "batch": batch,
            "per_device_batch": per_dev_batch,
            # cost_analysis reports the per-device SPMD module (verified:
            # the raw value is constant under weak scaling while total
            # samples grow n-fold), and each device computes
            # n_batches * per_dev_batch samples of it.
            "flops_per_device_per_sample": (
                round(flops / (n_batches * per_dev_batch))
                if flops else None),
            "collectives": [
                {"kind": k, "bytes": 4 * e} for k, e in coll],
            # The counts psum sits inside the lax.scan body, so each
            # static collective executes once per batch: the static sum
            # IS the per-batch ICI payload.
            "collective_bytes_per_batch": 4 * sum(e for _, e in coll),
        }
        if time_it:
            c = compiled(params, z, x, sigma, keys, valid)
            np.asarray(c)                            # sync (CPU: real)
            t0 = time.perf_counter()
            reps = 3
            for _ in range(reps):
                c = compiled(params, z, x, sigma, keys, valid)
            np.asarray(c)
            dt = (time.perf_counter() - t0) / reps
            row["wall_s_per_scan"] = round(dt, 4)
            row["samples_per_s"] = round(n_batches * batch / dt, 1)
        results.append(row)

    if time_it:
        t1 = results[0]["wall_s_per_scan"]
        for row in results:
            n = row["devices"]
            if ncores >= n:
                row["parallel_efficiency"] = round(
                    t1 / row["wall_s_per_scan"], 3)
                row["wallclock_semantics"] = "parallel (cores >= devices)"
            else:
                row["work_conservation"] = round(
                    n * t1 / row["wall_s_per_scan"], 3)
                row["wallclock_semantics"] = (
                    f"timeshared ({ncores} core(s) < {n} devices): "
                    "work conservation, not parallel speedup")
    return results


def _force_cpu_platform(n_devices: int = 8) -> None:
    """Force the virtual CPU platform (the axon sitecustomize overrides
    JAX_PLATFORMS programmatically — same handling as __graft_entry__ and
    tests/conftest.py). Must run before any backend init."""
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags += f" --xla_force_host_platform_device_count={n_devices}"
    if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
        # Virtual devices execute serially on few-core hosts; don't let
        # XLA's 40 s collective rendezvous treat slow progress as a hang.
        flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
                  " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
                  " --xla_cpu_collective_timeout_seconds=1200")
    os.environ["XLA_FLAGS"] = flags.strip()
    jax.config.update("jax_platforms", "cpu")


def main():
    if len(jax.devices()) < 8:
        raise SystemExit(
            "weak_scaling needs >= 8 devices and a CPU platform forced "
            "BEFORE backend init — a JAX backend already initialised on "
            f"{jax.devices()[0].platform!r}; rerun in a fresh process.")
    for row in run_scan():
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    _force_cpu_platform()
    main()
