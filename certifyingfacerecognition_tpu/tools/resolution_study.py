"""Reduced-resolution certification study (SURVEY.md §6 / docs/PERF.md).

Synthesis is ~82% of certification time at 1024^2, but the FRM only ever
sees a 112^2 resize (gen_utils.py:77-85). This tool certifies the SAME
identities at several synthesis resolutions — each with a self-consistent
gallery (embeddings recomputed at that resolution) and identical noise
streams — and reports per-resolution throughput plus decision agreement
against the full-resolution run. One JSON line per resolution.

Usage (real TPU):
    python -m certifyingfacerecognition_tpu.tools.resolution_study

Env knobs: RS_IDS (identities certified, default 200), RS_GALLERY (total
gallery rows, 1000), RS_N (MC samples, 1000), RS_N0 (100), RS_SIGMA (6.0),
RS_ALPHA (0.001), RS_BATCH (128), RS_RESOLUTIONS ("1024,512,256"),
RS_SPECTRAL_GAMMA (0 = plain random weights; >0 = PSD-matched
trained-like proxy weights — calibrate with tools/spectral_study.py,
docs/PERF.md "PSD-matched proxy weights").
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from ..models import iresnet, stylegan
    from ..models.pipeline import FacePipeline
    from ..smoothing.certificate import L2Certificate
    from ..smoothing.smooth import Smooth
    from ..utils.profiling import device_sync

    n_ids = int(os.environ.get("RS_IDS", "200"))
    n_gallery = int(os.environ.get("RS_GALLERY", "1000"))
    N = int(os.environ.get("RS_N", "1000"))
    N0 = int(os.environ.get("RS_N0", "100"))
    # Default sigma sits where decisions are NON-trivial for the
    # realistic random weights (pA ~ 0.5-1.0, probed on-chip): far
    # smaller and every id certifies at every resolution, making
    # agreement vacuous.
    sigma_v = float(os.environ.get("RS_SIGMA", "6.0"))
    alpha = float(os.environ.get("RS_ALPHA", "0.001"))
    batch = int(os.environ.get("RS_BATCH", "128"))
    resolutions = [int(r) for r in os.environ.get(
        "RS_RESOLUTIONS", "1024,512,256").split(",")]
    native = max(resolutions)
    spectral_gamma = float(os.environ.get("RS_SPECTRAL_GAMMA", "0"))

    gen_params = stylegan.random_params(native, seed=0, realistic=True,
                                        spectral_gamma=spectral_gamma)
    # realistic=True: He-scaled FRM weights whose embeddings actually
    # discriminate identities — the parity-test scaling collapses every
    # input onto one gallery class, making agreement trivially 100%.
    frm_params = iresnet.convert_torch_state_dict(
        iresnet.random_torch_style_state_dict("iresnet50", seed=0,
                                              realistic=True))
    rng = np.random.default_rng(0)
    # Realistic W-space identities: mapping network over unit-sphere Z.
    z = rng.standard_normal((n_gallery, 512)).astype(np.float32)
    z = z / np.linalg.norm(z, axis=1, keepdims=True) * np.sqrt(512)
    w_all = np.asarray(stylegan.mapping_apply(gen_params, jnp.asarray(z)))
    dirs = jnp.asarray(np.linalg.qr(
        rng.standard_normal((512, 5)))[0][:, :5].T, jnp.float32)  # [5,512]

    sigma = np.full((5,), sigma_v, np.float32)
    results = {}
    for res in resolutions:
        pipe = FacePipeline(gen_params, frm_params, dirs=dirs,
                            frs_method="insightface", resolution=res,
                            dtype=jnp.bfloat16)
        t0 = time.time()
        gallery = pipe.lat2embs(jnp.asarray(w_all), chunk=batch)
        device_sync(gallery)
        pipe.gallery = jnp.asarray(np.asarray(gallery, np.float32))
        embed_t = time.time() - t0

        predict_fn, params = pipe.predict_fn_with_params()
        smoothed = Smooth(predict_fn, n_gallery, sigma, L2Certificate(),
                          noise_dim=5, batch_size=batch, params=params)
        key = jax.random.PRNGKey(7)
        x = np.zeros((5,), np.float32)

        rows, t_start, samples = [], None, 0
        for i in range(n_ids):
            pred, gap = smoothed.certify(w_all[i], x, i, N0, N, alpha,
                                         jax.random.fold_in(key, i))
            if t_start is None:       # exclude the one-time XLA compile
                t_start = time.time()
            else:
                # N0 selection, + the N-sample estimation unless the
                # selection already mispredicted (Smooth.certify returns
                # (cAHat != label, gap=0) without running it).
                ran_estimation = pred == i or pred == -1 or gap > 0.0
                samples += N0 + (N if ran_estimation else 0)
            rows.append((int(pred), float(gap)))
        n_timed = n_ids - 1
        elapsed = time.time() - t_start
        sps = samples / elapsed
        results[res] = (rows, elapsed, samples)
        print(json.dumps({
            "resolution": res, "spectral_gamma": spectral_gamma,
            "ids": n_ids, "N": N, "N0": N0, "sigma": sigma_v,
            "embed_s": round(embed_t, 1),
            "certify_s_per_id": round(elapsed / n_timed, 3),
            "samples_per_sec": round(sps, 1),
            # identities/hour is the deployment metric and does NOT track
            # samples/s across resolutions: the per-id sample count is
            # decision-dependent (a selection rejection stops at N0, a
            # certification/abstention runs the full N), so a resolution
            # that shifts rejections into abstentions can process MORE
            # samples per second yet FEWER identities per hour.
            "ids_per_hour": round(3600.0 * n_timed / elapsed, 1),
            "certified_correct": sum(1 for i, (p, g) in enumerate(rows)
                                     if p == i),
            "abstain": sum(1 for p, _ in rows if p == -1),
        }), flush=True)

    base, base_elapsed, base_samples = results[native]
    for res in resolutions:
        if res == native:
            continue
        cur, cur_elapsed, cur_samples = results[res]
        dec_agree = np.mean([
            (p == i and bp == i) or (p != i and bp != i)
            for i, ((p, _), (bp, _)) in enumerate(zip(cur, base))])
        both = [(g, bg) for (p, g), (bp, bg) in zip(cur, base)
                if g > 0 and bg > 0]
        gap_corr = (round(float(np.corrcoef([g for g, _ in both],
                                            [b for _, b in both])[0, 1]), 4)
                    if len(both) > 2 else None)
        print(json.dumps({
            "agreement_vs_native": {"resolution": res,
                                    "decision_agreement": round(
                                        float(dec_agree), 4),
                                    "gap_corr": gap_corr,
                                    "n_both_certified": len(both)}}),
              flush=True)

        # --cascade simulation (cli/certify.py): identities whose FAST
        # prediction matches the label are re-certified at native
        # resolution and emit the native row; everything else keeps the
        # fast row. Certified-row agreement with the native run is 100%
        # BY CONSTRUCTION; the only residual deviation is conservative
        # (fast-path rejections the native model would certify), counted
        # below. Blended throughput charges the native re-run per
        # triggering identity at the measured native per-id cost.
        frac = np.mean([p == i for i, (p, _) in enumerate(cur)])
        blended_elapsed = cur_elapsed + frac * base_elapsed
        blended_samples = cur_samples + frac * base_samples
        lost = sum(1 for i, ((p, _), (bp, bg))
                   in enumerate(zip(cur, base))
                   if p != i and bp == i and bg > 0)
        n_timed = n_ids - 1
        print(json.dumps({
            "cascade": {"resolution": res,
                        "native_recert_fraction": round(float(frac), 4),
                        # Raw device throughput over BOTH passes. The
                        # native re-run samples are overhead, not
                        # progress — judge the cascade by ids_per_hour_*
                        # below, never by this number alone.
                        "blended_samples_per_sec": round(
                            blended_samples / blended_elapsed, 1),
                        "ids_per_hour_blended": round(
                            3600.0 * n_timed / blended_elapsed, 1),
                        "ids_per_hour_native": round(
                            3600.0 * n_timed / base_elapsed, 1),
                        "ids_per_hour_speedup": round(
                            float(base_elapsed / blended_elapsed), 2),
                        "certified_row_agreement": 1.0,
                        "lost_certifications": lost}}), flush=True)


if __name__ == "__main__":
    main()
