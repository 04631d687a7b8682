"""Headline benchmark: fused MC-smoothing throughput (samples/sec/chip).

The reference's certification loop achieves ~33 MC samples/sec on an RTX
3090 (README.md:253-269: N=10k + N0=100 forwards in ~300 s), bottlenecked by
generator micro-batches of 4 and per-batch host round-trips
(models/model_settings.py:72, smoothing_model.py:63-72). Here the whole
sample->perturb->synthesize(1024^2)->embed(ArcFace r50)->argmin->count chain
is one resident XLA program scanned over batches; this script measures its
single-chip throughput and prints one JSON line.

Weights are random (throughput is weight-independent); compute is bf16 with
fp32 distance refinement — the deployment configuration whose abstain /
certify decisions are validated against fp32 in tests/test_smoothing.py.

A/B mode (the reproducible-claim discipline, docs/PERF.md round 4): every
claimed optimization must land with a same-session on/off pair. Example:

    python bench.py --ab CFR_XLA_CB_RGB=0,1

measures each env-flag value in ONE process on the same chip (fresh trace
per value — the flags are read at trace time), prints one JSON line per
config plus a summary line, and persists the pair to
``bench_ab_<FLAG>.json`` so the evidence travels with the tree. An empty
value means "unset" (e.g. ``--ab CFR_TAIL=,bc``).

BENCH_MODE=attack switches to the attack-workload benchmark (ids/min
through the jitted PGD or FAB-t program — see measure_attack), so a
regression in the attack backward path (remat, frozen VJPs) is visible
between rounds, not just in docs/PERF.md prose.
"""

import argparse
import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

BASELINE_SAMPLES_PER_SEC = 33.0


def measure():
    """Run the headline benchmark once under the current environment.

    Env flags (BENCH_*, CFR_*) are read at trace time, and every call
    builds fresh closures/jits, so callers may toggle os.environ between
    calls to A/B configurations within one process/session.
    """
    from certifyingfacerecognition_tpu.models import iresnet, stylegan
    from certifyingfacerecognition_tpu.models.pipeline import make_lat2embs
    from certifyingfacerecognition_tpu.ops import distances as D
    from certifyingfacerecognition_tpu.smoothing.certificate import (
        L2Certificate)
    from certifyingfacerecognition_tpu.smoothing.smooth import make_counts_fn

    resolution = int(os.environ.get("BENCH_RESOLUTION", "1024"))
    # insightface (ArcFace r50, 112^2 input) is the headline FRM;
    # facenet/facenet-vggface2 (InceptionResnetV1, 160^2) cover the
    # reference's other two FRS methods (main_attack.py:121-131).
    frs = os.environ.get("BENCH_FRS", "insightface")
    batch = int(os.environ.get("BENCH_BATCH", "128"))
    # Batches scanned per dispatch: the production certify loop scans
    # N/batch ~ 79 batches inside one jit, so the tunnel's ~20-25 ms
    # per-dispatch overhead is amortised away there; 10 (not 3) keeps the
    # bench's dispatch overhead <2% like production's.
    n_batches = int(os.environ.get("BENCH_NBATCHES", "10"))
    n_gallery = int(os.environ.get("BENCH_GALLERY", "1000"))
    # BENCH_MESH_ID > 1: shard the gallery over that many devices (and the
    # MC batch over the rest) — the 1M-identity regime is
    # BENCH_GALLERY=1000000 BENCH_MESH_ID=4 on multi-chip hardware.
    mesh_id = int(os.environ.get("BENCH_MESH_ID", "1"))
    dtype = jnp.bfloat16 if os.environ.get("BENCH_DTYPE", "bf16") == "bf16" \
        else jnp.float32

    gen_params = stylegan.random_params(resolution, seed=0)
    if frs == "insightface":
        frm_params = iresnet.convert_torch_state_dict(
            iresnet.random_torch_style_state_dict("iresnet50", seed=0))
    else:
        from certifyingfacerecognition_tpu.models import facenet

        frm_params = facenet.random_params(seed=0)
    rng = np.random.default_rng(0)
    # Gallery generated ON DEVICE: the deployment regime is
    # BENCH_GALLERY=1000000 (certify.py:64-65 / README.md:66 paper scale),
    # and a 2 GB host->device upload through the axon tunnel (~30 MB/s)
    # would dwarf the benchmark itself. Content is irrelevant to
    # throughput; jax.random.normal is deterministic given the key.
    gallery = jax.random.normal(jax.random.PRNGKey(123), (n_gallery, 512),
                                jnp.float32)
    dirs = jnp.asarray(np.linalg.qr(
        rng.standard_normal((512, 5)))[0][:, :5].T, jnp.float32)  # [5, 512]

    embed = make_lat2embs(frs, resolution, dtype=dtype)

    if mesh_id > 1:
        from jax.sharding import PartitionSpec as P

        from certifyingfacerecognition_tpu.parallel.gallery import (
            make_sharded_gallery_predict_fn)
        from certifyingfacerecognition_tpu.parallel.mesh import get_2d_mesh

        n_dev = len(jax.devices())
        mesh = get_2d_mesh(n_dev // mesh_id, mesh_id)
        predict_fn = make_sharded_gallery_predict_fn(embed, dirs, method=frs)
        params = {"gen": gen_params, "frm": frm_params, "gallery": gallery}
        specs = {"gen": P(), "frm": P(), "gallery": P("id")}
        counts = make_counts_fn(predict_fn, n_gallery, L2Certificate(),
                                batch_size=batch, noise_dim=5, mesh=mesh,
                                with_params=True, param_specs=specs)
    else:
        # The gallery MUST travel as a runtime argument, not a closure:
        # closed-over arrays are baked into the HLO as constants, which at
        # the 1M regime is a 2 GB program upload (CLAUDE.md invariant).
        def predict_fn(params, z, p):
            w = z[None, :] + jnp.dot(p, dirs)
            embs = embed(params["gen"], params["frm"], w
                         ).astype(jnp.float32)
            return D.argmin_dist_refined(embs, params["gallery"], frs)

        counts = make_counts_fn(predict_fn, n_gallery, L2Certificate(),
                                batch_size=batch, noise_dim=5,
                                with_params=True)
        params = jax.device_put({"gen": gen_params, "frm": frm_params,
                                 "gallery": gallery})

    def counts_fn(*a):
        return counts(params, *a)

    z = jnp.asarray(rng.standard_normal(512), jnp.float32)
    x = jnp.zeros((5,), jnp.float32)
    sigma = jnp.asarray(0.1, jnp.float32)
    valid = jnp.full((n_batches,), batch, jnp.int32)

    def run(seed):
        keys = jax.random.split(jax.random.PRNGKey(seed), n_batches)
        return counts_fn(z, x, sigma, keys, valid)

    # block_until_ready is a no-op under the axon remote-execution tunnel
    # (docs/PERF.md "round-2 corrections") — device_sync pulls one element,
    # which is the only reliable barrier here. The ~30 ms pull cost is
    # amortised over reps*n_batches*batch samples (<0.1% of the window).
    from certifyingfacerecognition_tpu.utils.profiling import device_sync

    device_sync(run(0))                           # compile + warm up
    t0 = time.perf_counter()
    reps = 3
    for r in range(1, reps + 1):
        c = run(r)
    device_sync(c)
    dt = time.perf_counter() - t0

    samples = reps * n_batches * batch
    sps = samples / dt
    return {
        "metric": "mc_smoothing_samples_per_sec_per_chip",
        "value": round(sps, 2),
        "unit": "samples/s",
        "vs_baseline": round(sps / BASELINE_SAMPLES_PER_SEC, 2),
    }


def measure_attack():
    """Attack-workload benchmark (BENCH_MODE=attack): identities/minute
    through the full jitted attack program (restarts x iters lax.scan with
    remat'd 1024^2 synthesis backward).

    Reference baselines (RTX 3090, /root/reference/README.md):
      * PGD 5 restarts x 5 iters, chunk of 20 ids: ~1 min/chunk
        (README.md:137,154-155) -> 20 ids/min;
      * FAB-t 2 restarts x 5 iters x 2 targets, chunk of 20: ~1.5 min/chunk
        (README.md:221-223) -> 13.3 ids/min.

    BENCH_ATTACK selects pgd (default) or fab-t; BENCH_BATCH_ATTACK sets
    the chunk size (default 20, the reference's). The gallery is the
    identities' own embeddings (the real workload's labels), so success
    bookkeeping is meaningful, and the attack compute is shape-static
    either way (the scan never early-exits).

    HBM note (v5e 16 GB): fab-t at 1024^2 needs BENCH_BATCH_ATTACK<=8 —
    XLA lays out the tail transpose-conv's activation-grad temps
    (bf16[B,1024,1024,16]) with the 16-wide channel dim minor-most, which
    pads 8x to the (8,128) tile; at batch 16 three such 4 GB temps alone
    exceed the chip (measured 17.79 G needed). PGD's backward schedules
    without that peak and runs at the reference's batch 20.
    """
    from functools import partial

    from certifyingfacerecognition_tpu.attacks.autoattack import (
        find_adversaries_autoattack)
    from certifyingfacerecognition_tpu.attacks.pgd import (
        find_adversaries_pgd)
    from certifyingfacerecognition_tpu.eval.chunk_runner import make_dists_fn
    from certifyingfacerecognition_tpu.models import iresnet, stylegan
    from certifyingfacerecognition_tpu.models.pipeline import make_lat2embs
    from certifyingfacerecognition_tpu.ops import geometry as G
    from certifyingfacerecognition_tpu.utils.profiling import device_sync

    resolution = int(os.environ.get("BENCH_RESOLUTION", "1024"))
    frs = os.environ.get("BENCH_FRS", "insightface")
    attack = os.environ.get("BENCH_ATTACK", "pgd")
    batch = int(os.environ.get("BENCH_BATCH_ATTACK", "20"))
    n_gallery = int(os.environ.get("BENCH_GALLERY", "1000"))
    dtype = jnp.bfloat16 if os.environ.get("BENCH_DTYPE", "bf16") == "bf16" \
        else jnp.float32

    gen_params = stylegan.random_params(resolution, seed=0)
    frm_params = iresnet.convert_torch_state_dict(
        iresnet.random_torch_style_state_dict("iresnet50", seed=0))
    region = G.get_all_matrices()

    # Gallery = the identities' own embeddings (main_attack.py:201-216).
    rng = np.random.default_rng(0)
    z = rng.standard_normal((n_gallery, 512)).astype(np.float32)
    z = z / np.linalg.norm(z, axis=1, keepdims=True) * np.sqrt(512)
    w_all = stylegan.mapping_apply(gen_params, jnp.asarray(z))
    embed = make_lat2embs(frs, resolution, dtype=dtype)

    @jax.jit
    def embed_f32(gp, fp, w):
        return embed(gp, fp, w).astype(jnp.float32)

    emb_bs = 128
    parts = []
    for s in range(0, n_gallery, emb_bs):
        chunk = jax.lax.dynamic_slice_in_dim(
            w_all, s, min(emb_bs, n_gallery - s))
        if chunk.shape[0] < emb_bs:   # pad the ragged tail; same program
            chunk = jnp.concatenate([
                chunk, jnp.zeros((emb_bs - chunk.shape[0], 512), chunk.dtype)])
            parts.append(embed_f32(gen_params, frm_params, chunk)
                         [: n_gallery - s])
        else:
            parts.append(embed_f32(gen_params, frm_params, chunk))
    gallery = jnp.concatenate(parts)
    device_sync(gallery)

    dists_fn = make_dists_fn(frs, resolution, dtype)
    params = {"gen": gen_params, "frm": frm_params, "gallery": gallery}
    lats = w_all[:batch]
    labels = jnp.arange(batch)

    if attack == "pgd":
        # Reference worked example: --iters 5 --restarts 5 (README.md:131).
        @jax.jit
        def step(params, lats, labels, key):
            return find_adversaries_pgd(
                partial(dists_fn, params), lats, labels, key, region,
                opt_name="SGD", lr=1e2, iters=5, restarts=5,
                loss_type="xent", lin_comb=True)

        baseline_ids_per_min, metric = 20.0, "pgd_attack_ids_per_min"
    elif attack == "fab-t":
        # README.md:215: --iters 5 --restarts 2 --n-target-classes 2.
        @jax.jit
        def step(params, lats, labels, key):
            return find_adversaries_autoattack(
                partial(dists_fn, params), lats, labels, key, region,
                "fab-t", iters=5, restarts=2, n_target_classes=2)

        baseline_ids_per_min, metric = 20 / 1.5, "fabt_attack_ids_per_min"
    else:
        raise SystemExit(f"BENCH_ATTACK must be pgd or fab-t (got {attack})")

    key = jax.random.PRNGKey(0)
    device_sync(step(params, lats, labels, key))      # compile + warm up
    reps = 3
    t0 = time.perf_counter()
    for r in range(1, reps + 1):
        out = step(params, lats, labels, jax.random.fold_in(key, r))
    device_sync(out)
    dt = (time.perf_counter() - t0) / reps

    ids_per_min = 60.0 * batch / dt
    return {
        "metric": metric,
        "value": round(ids_per_min, 2),
        "unit": "ids/min",
        "vs_baseline": round(ids_per_min / baseline_ids_per_min, 2),
    }


def _run_ab(spec: str):
    """Same-session A/B over an env flag: ``FLAG=v1,v2[,...]``."""
    flag, _, values = spec.partition("=")
    if not values:
        raise SystemExit(f"--ab needs FLAG=v1,v2 (got {spec!r})")
    results = []
    for val in values.split(","):
        if val == "":
            os.environ.pop(flag, None)
        else:
            os.environ[flag] = val
        row = measure()
        row["env"] = {flag: val or None}
        results.append(row)
        print(json.dumps(row), flush=True)
    base = results[0]["value"]
    summary = {
        "ab_flag": flag,
        "values": [r["env"][flag] for r in results],
        "samples_per_sec": [r["value"] for r in results],
        "ratio_vs_first": [round(r["value"] / base, 4) for r in results],
        "bench_env": {k: v for k, v in os.environ.items()
                      if k.startswith(("BENCH_", "CFR_"))},
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(summary), flush=True)
    out = f"bench_ab_{flag}.json"
    with open(out, "w") as f:
        json.dump({"runs": results, "summary": summary}, f, indent=1)
    print(f"# persisted -> {out}", flush=True)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ab", metavar="FLAG=v1,v2", default=None,
                    help="measure each env-flag value in one session and "
                         "persist the pair to bench_ab_<FLAG>.json")
    args = ap.parse_args()
    mode = os.environ.get("BENCH_MODE", "mc")
    if args.ab:
        _run_ab(args.ab)
    elif mode == "attack":
        print(json.dumps(measure_attack()))
    elif mode == "mc":
        print(json.dumps(measure()))
    else:
        raise SystemExit(f"BENCH_MODE must be mc or attack (got {mode})")


if __name__ == "__main__":
    main()
