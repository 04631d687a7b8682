"""Stage-by-stage profile of the certification pipeline at a given
(batch, gallery) point.

Two questions this harness answers (docs/PERF.md round 3):

  * where the in-context Pallas-chain overhead is — ``pre`` (the XLA
    <=512^2 prefix), ``pret`` (+ the NHWC -> [H,W,C,B] boundary
    transpose), ``synth`` (+ the chain tail + postprocess), ``resize``;
  * where the large-gallery head cost is — ``embed`` (everything before
    the gallery), ``matmul`` (+ the [B, N] distance expansion), ``topk``
    (+ lax.top_k candidate selection), ``refine`` (+ exact re-rank; the
    full production head).

Each stage is timed with the in-jit scan trick (sync-floor-immune, see
tools/tail_kernel_bench.py) by varying the latent input per step. All
weights are threaded as arguments — closure constants overflow the
remote-compile upload (CLAUDE.md invariant).

    python -m certifyingfacerecognition_tpu.tools.gallery_bench \
        --gallery 100000 --batch 128 --stages embed,matmul,topk,refine
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--gallery", type=int, default=100000)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--resolution", type=int, default=1024)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--injit", type=int, default=4)
    p.add_argument("--stages", type=str, default="all")
    p.add_argument("--pre-res", type=int, default=0,
                   help="cut the pre/pret stages after the block with this "
                        "output resolution (default: the chain boundary, "
                        "or the full synthesis when the chain is off)")
    args = p.parse_args(argv)

    from ..constants import INP_RESOLS, MEAN, STD
    from ..models import iresnet, stylegan
    from ..models.pipeline import make_lat2embs
    from ..ops import distances as D
    from ..ops.resize import transform_for_frs, transform_for_frs_cb
    from ..utils.profiling import measure

    dtype = jnp.bfloat16
    gen_params = stylegan.random_params(args.resolution, seed=0)
    frm_params = iresnet.convert_torch_state_dict(
        iresnet.random_torch_style_state_dict("iresnet50", seed=0))
    embed = make_lat2embs("insightface", args.resolution, dtype=dtype)
    use_cb = stylegan.cb_out_active(args.resolution, dtype)
    img_size = INP_RESOLS["insightface"]

    # Gallery generated on-device (tunnel uploads run at ~30 MB/s).
    key = jax.random.PRNGKey(0)
    gallery = jax.random.normal(key, (args.gallery, 512), jnp.float32)
    w0 = jax.random.normal(jax.random.PRNGKey(1), (args.batch, 512),
                           jnp.float32)

    def pre_blocks(gp, w):
        """The XLA synthesis prefix: everything before the Pallas chain
        (mirrors stylegan.synthesis_apply's pre-tail loop). Returns the
        NHWC block output the chain boundary consumes."""
        channels = stylegan.RESOLUTIONS_TO_CHANNELS[args.resolution]
        if args.pre_res:
            bc_first = int(np.log2(args.pre_res))  # last block = pre_res out
        else:
            bc_first = stylegan._bc_first_block(args.resolution, dtype)
        wp = stylegan.truncation_apply(gp, w, resolution=args.resolution)
        wp = wp.astype(dtype)
        syn = gp["synthesis"]
        prec = stylegan.nn.precision_for(dtype)
        p0 = syn["layer0"]
        x = jnp.broadcast_to(p0["const"].astype(dtype)[None],
                             (w.shape[0],) + p0["const"].shape)
        x = stylegan._epilogue(p0, x, wp[:, 0], dtype=dtype, prec=prec)
        for bi in range(1, min(len(channels), bc_first)):
            x = stylegan._synthesis_block(syn, x, wp, block_idx=bi,
                                          dtype=dtype, prec=prec)
        return x

    def stage_pre(gp, fp, g, w):
        return pre_blocks(gp, w)

    def stage_pret(gp, fp, g, w):
        # Returned as a program OUTPUT so the transpose cannot be elided
        # (a sum over all elements would be folded through the transpose).
        return jnp.transpose(pre_blocks(gp, w), (1, 2, 3, 0))

    def stage_synth(gp, fp, g, w):
        return stylegan.synthesize_from_w(gp, w, resolution=args.resolution,
                                          dtype=dtype, cb_out=use_cb)

    def stage_resize(gp, fp, g, w):
        img = stage_synth(gp, fp, g, w)
        if use_cb:
            return transform_for_frs_cb(img, img_size, MEAN, STD)
        return transform_for_frs(img, img_size, MEAN, STD)

    def stage_embed(gp, fp, g, w):
        return embed(gp, fp, w).astype(jnp.float32)

    def stage_matmul(gp, fp, g, w):
        e = stage_embed(gp, fp, g, w)
        return D.sq_euclidean_matmul(e, g)

    def stage_matmul_high(gp, fp, g, w):
        # 3-pass bf16 distance expansion (vs HIGHEST's 6): candidate-set
        # selection only — the exact f32 re-rank still decides.
        e = stage_embed(gp, fp, g, w)
        return D.sq_euclidean_matmul(e, g, precision=jax.lax.Precision.HIGH)

    def stage_topk(gp, fp, g, w):
        d2 = stage_matmul(gp, fp, g, w)
        return D._topk_candidates(d2, 8)

    def stage_refine(gp, fp, g, w):
        e = stage_embed(gp, fp, g, w)
        return D.argmin_dist_refined(e, g, "insightface")

    stages = {"pre": stage_pre, "pret": stage_pret, "synth": stage_synth,
              "resize": stage_resize, "embed": stage_embed,
              "matmul": stage_matmul, "matmul_high": stage_matmul_high,
              "topk": stage_topk, "refine": stage_refine}
    names = (list(stages) if args.stages == "all"
             else args.stages.split(","))

    prev = 0.0
    for name in names:
        fn = stages[name]
        n = args.injit

        def rep_fn(gp, fp, g, w0, fn=fn):
            def step(c, _):
                # optimization_barrier: the stage output must be fully
                # materialised even though only one element feeds the
                # carry — without it XLA elides e.g. the pret stage's
                # transpose (one output element needs one input element).
                out = jax.lax.optimization_barrier(fn(gp, fp, g, w0 + c))
                lf = jax.tree_util.tree_leaves(out)[0]
                return c + lf.reshape(-1)[0].astype(jnp.float32) * 0, None

            c, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=n)
            return c

        ms = measure(jax.jit(rep_fn), gen_params, frm_params, gallery, w0,
                     reps=args.reps) * 1e3 / n
        sps = args.batch / (ms / 1e3)
        print(json.dumps({"stage": name, "ms_per_batch": round(ms, 2),
                          "delta_ms": round(ms - prev, 2),
                          "samples_per_sec": round(sps, 1)}), flush=True)
        prev = ms


if __name__ == "__main__":
    main()
