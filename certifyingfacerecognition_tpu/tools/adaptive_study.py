"""Adaptive early-stopping certification study (docs/PERF.md).

Certifies the SAME identities three ways — fixed-N (the reference's
estimator, smooth.py:39-77), --adaptive guaranteed, and --adaptive
sequential — with identical per-identity key streams, and reports the
deployment metric (identities/hour), per-identity sample counts, and
decision agreement against the fixed-N run. Guaranteed-mode agreement
must print 1.0 (it is a theorem, tests/test_adaptive.py); sequential-mode
agreement quantifies the statistical-alignment trade for these weights
and sigma. One JSON line per mode.

Usage (real TPU):
    python -m certifyingfacerecognition_tpu.tools.adaptive_study

Env knobs: AS_IDS (identities, default 200), AS_GALLERY (1000), AS_N
(10000), AS_N0 (100), AS_SIGMA (3.0 — the certification-rich regime where
early stopping pays; 6.0 = the decision-boundary regime), AS_ALPHA
(0.001), AS_BATCH (128), AS_CHUNK (8 batches per early-stop poll),
AS_SLACK (0.1; 1.0 = stop at decision determination — the multi-x
configuration), AS_GAP_TARGET (optional float), AS_RESOLUTION (1024),
AS_MODES (comma list out of fixed,guaranteed,sequential; agreement vs
fixed is only reported when fixed is in the list), AS_ENGINE (host |
device — the in-graph lax.while_loop engine with zero per-checkpoint
host pulls, smoothing/adaptive_device.py; fixed mode ignores it),
AS_GROUP (identities per dispatch, device engine only — lax.map over
the in-graph loop, amortising the per-dispatch launch + pull overhead).

AS_GALLERY_PAD=M (default off): pad the real AS_GALLERY-row gallery to M
rows with far-away on-device synthetics — decisions/pA structure
untouched, but the distance matmul, top-k and per-class counting run at
deployment gallery scale (the BASELINE 1M-identity head).

AS_AB="FLAG=v1,v2": same-session A/B — re-run the whole study once per
env-flag value in ONE process (fresh pipeline/trace per value; CFR_*
flags are read at trace time), tagging each JSON line with the flag.
This is the certify-loop side of the reproducible-claim discipline
(docs/PERF.md round 4; bench.py --ab is the headline side).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp


def run_study(tag=None):
    from ..models import iresnet, stylegan
    from ..models.pipeline import FacePipeline
    from ..smoothing.certificate import L2Certificate
    from ..smoothing.smooth import Smooth
    from ..utils.profiling import device_sync

    n_ids = int(os.environ.get("AS_IDS", "200"))
    n_gallery = int(os.environ.get("AS_GALLERY", "1000"))
    N = int(os.environ.get("AS_N", "10000"))
    N0 = int(os.environ.get("AS_N0", "100"))
    sigma_v = float(os.environ.get("AS_SIGMA", "3.0"))
    alpha = float(os.environ.get("AS_ALPHA", "0.001"))
    batch = int(os.environ.get("AS_BATCH", "128"))
    chunk = int(os.environ.get("AS_CHUNK", "8"))
    slack = float(os.environ.get("AS_SLACK", "0.1"))
    gap_target = os.environ.get("AS_GAP_TARGET")
    gap_target = float(gap_target) if gap_target else None
    resolution = int(os.environ.get("AS_RESOLUTION", "1024"))
    engine = os.environ.get("AS_ENGINE", "host")
    group = int(os.environ.get("AS_GROUP", "1"))
    if group > 1:
        assert engine == "device", "AS_GROUP > 1 requires AS_ENGINE=device"

    gen_params = stylegan.random_params(resolution, seed=0, realistic=True)
    frm_params = iresnet.convert_torch_state_dict(
        iresnet.random_torch_style_state_dict("iresnet50", seed=0,
                                              realistic=True))
    rng = np.random.default_rng(0)
    z = rng.standard_normal((n_gallery, 512)).astype(np.float32)
    z = z / np.linalg.norm(z, axis=1, keepdims=True) * np.sqrt(512)
    w_all = np.asarray(stylegan.mapping_apply(gen_params, jnp.asarray(z)))
    dirs = jnp.asarray(np.linalg.qr(
        rng.standard_normal((512, 5)))[0][:, :5].T, jnp.float32)

    pipe = FacePipeline(gen_params, frm_params, dirs=dirs,
                        frs_method="insightface", resolution=resolution,
                        dtype=jnp.bfloat16)
    gallery = pipe.lat2embs(jnp.asarray(w_all), chunk=batch)
    device_sync(gallery)
    pipe.gallery = jnp.asarray(np.asarray(gallery, np.float32))
    n_classes = n_gallery
    pad_to = int(os.environ.get("AS_GALLERY_PAD", "0"))
    if pad_to > n_gallery:
        # Deployment-scale head: pad the real gallery with far-away rows
        # generated ON DEVICE (a 2 GB host upload through the ~30 MB/s
        # tunnel proves nothing). Pad rows sit ~8 embedding-shell radii
        # from every real row, so the argmin — and with it the pA
        # structure and every decision — is untouched, while the distance
        # matmul, top-k and per-class counts all run at the padded scale.
        real = pipe.gallery
        r = float(jnp.mean(jnp.linalg.norm(real, axis=1)))
        pad = jax.random.normal(jax.random.PRNGKey(99),
                                (pad_to - n_gallery, 512), jnp.float32)
        pad = pad / jnp.linalg.norm(pad, axis=1, keepdims=True) * r
        pad = pad + jnp.full((512,), 10.0 * r / np.sqrt(512.0), jnp.float32)
        pipe.gallery = jnp.concatenate([real, pad], axis=0)
        device_sync(pipe.gallery)
        n_classes = pad_to
    predict_fn, params = pipe.predict_fn_with_params()
    smoothed = Smooth(predict_fn, n_classes, np.full((5,), sigma_v,
                                                     np.float32),
                      L2Certificate(), noise_dim=5, batch_size=batch,
                      params=params)
    key = jax.random.PRNGKey(7)
    x = np.zeros((5,), np.float32)

    def certify_mode(mode):
        if mode != "fixed" and group > 1:
            return certify_mode_grouped(mode)
        rows, t_start, samples = [], None, 0
        for i in range(n_ids):
            k = jax.random.fold_in(key, i)
            if mode == "fixed":
                pred, gap = smoothed.certify(w_all[i], x, i, N0, N, alpha, k)
                ran = pred == i or pred == -1 or gap > 0.0
                used = N0 + (N if ran else 0)
            else:
                pred, gap, used = smoothed.certify_adaptive(
                    w_all[i], x, i, N0, N, alpha, k, mode=mode,
                    chunk_batches=chunk, slack=slack, gap_target=gap_target,
                    engine=engine)
            if t_start is None:    # exclude the one-time XLA compile
                t_start = time.time()
            else:
                samples += used
            rows.append((int(pred), float(gap)))
        return rows, time.time() - t_start, samples

    def certify_mode_grouped(mode):
        # AS_GROUP identities per dispatch; the first GROUP is the compile
        # run and is excluded from the clock, mirroring the per-identity
        # protocol (n_timed below stays n_ids - group).
        rows, t_start, samples = [], None, 0
        for g0 in range(0, n_ids, group):
            ids = list(range(g0, min(g0 + group, n_ids)))
            out = smoothed.certify_adaptive_many(
                [w_all[i] for i in ids], [x] * len(ids), ids, N0, N, alpha,
                [jax.random.fold_in(key, i) for i in ids], mode=mode,
                chunk_batches=chunk, slack=slack, gap_target=gap_target,
                pad_to=group)
            if t_start is None:
                t_start = time.time()
            else:
                samples += sum(used for _, _, used in out)
            rows.extend((int(p), float(g)) for p, g, _ in out)
        return rows, time.time() - t_start, samples

    modes = [m.strip() for m in os.environ.get(
        "AS_MODES", "fixed,guaranteed,sequential").split(",") if m.strip()]
    results = {}
    for mode in modes:
        rows, elapsed, samples = certify_mode(mode)
        results[mode] = rows
        n_timed = n_ids - (group if mode != "fixed" and group > 1 else 1)
        out = {
            "mode": mode, "ids": n_ids, "N": N, "N0": N0, "sigma": sigma_v,
            "gallery": n_classes,
            "batch": batch, "chunk_batches": chunk, "slack": slack,
            "gap_target": gap_target,
            "engine": engine if mode != "fixed" else None,
            "group": group if mode != "fixed" else None,
            "samples_per_id": round(samples / n_timed, 1),
            "certify_s_per_id": round(elapsed / n_timed, 3),
            "ids_per_hour": round(3600.0 * n_timed / elapsed, 1),
            "certified_correct": sum(1 for i, (p, g) in enumerate(rows)
                                     if p == i),
            "abstain": sum(1 for p, _ in rows if p == -1),
        }
        if mode != "fixed" and "fixed" in results:
            base = results["fixed"]
            out["decision_agreement_vs_fixed"] = round(float(np.mean(
                [p == bp for (p, _), (bp, _) in zip(rows, base)])), 4)
            both = [(g, bg) for (p, g), (bp, bg) in zip(rows, base)
                    if g > 0 and bg > 0]
            out["mean_gap_ratio_vs_fixed"] = (
                round(float(np.mean([g / bg for g, bg in both])), 4)
                if both else None)
        if tag:
            out["env"] = tag
        print(json.dumps(out), flush=True)


def main():
    ab = os.environ.get("AS_AB")
    if not ab:
        run_study()
        return
    flag, _, values = ab.partition("=")
    if not values:
        raise SystemExit(f"AS_AB needs FLAG=v1,v2 (got {ab!r})")
    for val in values.split(","):
        if val == "":
            os.environ.pop(flag, None)
        else:
            os.environ[flag] = val
        run_study(tag={flag: val or None})


if __name__ == "__main__":
    main()
