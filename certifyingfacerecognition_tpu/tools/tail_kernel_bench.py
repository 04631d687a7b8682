"""Standalone timing harness for the Pallas synthesis-tail chain kernels.

Times each chain-mode kernel (ops/synthesis_tail_bc.py) in isolation with
``utils/profiling.measure`` (axon-safe sync, sync floor subtracted) and
reports measured ms vs the kernel's HBM read+write traffic floor at the
measured sustained bandwidth (~360 GB/s, docs/PERF.md). This is the tool
behind PERF.md's per-layer chain table; re-run after any kernel change:

    python -m certifyingfacerecognition_tpu.tools.tail_kernel_bench
    python -m certifyingfacerecognition_tpu.tools.tail_kernel_bench --batch 128 --layers up1024

Layers (all B=128 bf16 by default, 1024^2-config channel counts):
    up512   : upconv_blur 256^2 x64 -> 512^2 x32   (chain-mode _up_fused)
    conv512 : conv3x3 512^2 x32                    (chain-mode _conv_fused)
    up1024  : upconv_blur 512^2 x32 -> 1024^2 x16  (chain-mode _up_fused)
    rgb1024 : final conv3x3 + instnorm + ToRGB 1024^2 x16 (_conv_rgb_final)
    chain   : the whole >=512^2 tail (tail_chain_bc)
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

HBM_GBPS = 360.0  # sustained, measured through this part (docs/PERF.md)


class _DeviceRng:
    """Generates test tensors ON THE DEVICE (jax.random) — the axon tunnel
    uploads at ~30 MB/s, so host-generated multi-GB activations would
    dominate the harness wall-clock."""

    def __init__(self, seed):
        self.key = jax.random.PRNGKey(seed)

    def split(self):
        self.key, k = jax.random.split(self.key)
        return k


def _rand(rng, shape, dtype=jnp.bfloat16, scale=1.0):
    # normal() directly in the target dtype: a f32 intermediate of the
    # 1024^2 x 16 x 128 activation alone is 8.6 GB of the 16 GB HBM.
    return jax.random.normal(rng.split(), shape, dtype) * jnp.asarray(
        scale, dtype)


def _mk_block(rng, ci, co, h2, with_rgb):
    """Random chain-block param dict for an up(ci->co, H->h2) + conv(co)."""
    blk = {
        "k4": _rand(rng, (4, 4, ci, co), jnp.float32, 0.1),
        "up_nb": _rand(rng, (h2, h2, co), jnp.float32, 0.1),
        "up_s0p1": _rand(rng, (128, co), jnp.float32, 0.1) + 1.0,
        "up_s1": _rand(rng, (128, co), jnp.float32, 0.1),
        "k": _rand(rng, (3, 3, co, co), jnp.float32, 0.1),
        "conv_nb": _rand(rng, (h2, h2, co), jnp.float32, 0.1),
        "conv_s0p1": _rand(rng, (128, co), jnp.float32, 0.1) + 1.0,
        "conv_s1": _rand(rng, (128, co), jnp.float32, 0.1),
    }
    if with_rgb:
        blk["w_rgb"] = _rand(rng, (co, 3), jnp.float32, 0.3)
        blk["b_rgb"] = _rand(rng, (3,), jnp.float32, 0.1)
    return blk


def build_case(name, batch, dtype):
    """Build one named case lazily: (jitted_fn, inputs, floor_ms)."""
    from ..ops import synthesis_tail_bc as bc

    rng = _DeviceRng(0)
    b = batch

    def floor_ms(nbytes):
        return nbytes / (HBM_GBPS * 1e9) * 1e3

    def aff(ci):
        return jnp.stack([jnp.ones((ci, b), jnp.float32),
                          jnp.zeros((ci, b), jnp.float32)])

    if name.startswith("up") and name != "up1024":
        # upconv_blur H^2 x ci -> (2H)^2 x co for the 1024-config channel
        # ladder: up128 (64x256->128x128), up256 (128x128->256x64),
        # up512 (256x64->512x32).
        h2 = int(name[2:])
        ci, co = {128: (256, 128), 256: (128, 64), 512: (64, 32)}[h2]
        x = _rand(rng, (h2 // 2, h2 // 2, ci, b), dtype)
        blk = _mk_block(rng, ci, co, h2, False)

        def up_case(x, blk):
            return bc._up_fused(x, blk["k4"], blk["up_nb"], aff(ci), 1e-8)

        return (jax.jit(up_case), (x, blk),
                floor_ms(((h2 // 2)**2 * ci + h2**2 * co) * b * 2))

    if name.startswith("conv") and name != "conv1024":
        h = int(name[4:])
        co = {128: 128, 256: 64, 512: 32}[h]
        x = _rand(rng, (h, h, co, b), dtype)
        blk = _mk_block(rng, 2 * co, co, h, False)

        def conv_case(x, blk):
            return bc._conv_fused(x, blk["k"], blk["conv_nb"], aff(co), 1e-8)

        return (jax.jit(conv_case), (x, blk),
                floor_ms(2 * h**2 * co * b * 2))

    if name == "up1024":                   # 512^2 x 32 -> 1024^2 x 16
        x = _rand(rng, (512, 512, 32, b), dtype)
        blk2 = _mk_block(rng, 32, 16, 1024, True)

        def up1024(x, blk):
            return bc._up_fused(x, blk["k4"], blk["up_nb"], aff(32), 1e-8)

        return (jax.jit(up1024), (x, blk2),
                floor_ms((512**2 * 32 + 1024**2 * 16) * b * 2))

    if name == "rgb1024":  # final conv + stats + apply + ToRGB (x read 2x)
        x = _rand(rng, (1024, 1024, 16, b), dtype)
        blk2 = _mk_block(rng, 32, 16, 1024, True)

        def rgb1024(x, blk):
            return bc._conv_rgb_final(x, blk["k"], blk["conv_nb"], aff(16),
                                      blk["conv_s0p1"], blk["conv_s1"],
                                      blk["w_rgb"], blk["b_rgb"], 1e-8)

        return (jax.jit(rgb1024), (x, blk2),
                floor_ms((2 * 1024**2 * 16 + 1024**2 * 3) * b * 2))

    if name == "rgbstats1024":          # stats pass of the final layer only
        x = _rand(rng, (1024, 1024, 16, b), dtype)
        blk2 = _mk_block(rng, 32, 16, 1024, True)

        def rgbstats(x, blk):
            return bc._final_stats(x, blk["k"], blk["conv_nb"], aff(16),
                                   1e-8)

        return (jax.jit(rgbstats), (x, blk2),
                floor_ms(1024**2 * 16 * b * 2))

    if name == "rgbapply1024":          # apply+ToRGB pass only
        x = _rand(rng, (1024, 1024, 16, b), dtype)
        blk2 = _mk_block(rng, 32, 16, 1024, True)
        coefs = jnp.stack([jnp.ones((16, b), jnp.float32),
                           jnp.zeros((16, b), jnp.float32)])

        def rgbapply(x, blk, coefs):
            return bc._final_apply(x, blk["k"], blk["conv_nb"], aff(16),
                                   coefs, blk["w_rgb"], blk["b_rgb"])

        return (jax.jit(rgbapply), (x, blk2, coefs),
                floor_ms((1024**2 * 16 + 1024**2 * 3) * b * 2))

    if name.startswith("chain"):  # whole >=(suffix)^2 tail; default >=512
        first = int(name[5:] or "512")
        ladder = [(256, 128, 128), (128, 64, 256), (64, 32, 512),
                  (32, 16, 1024)]
        ladder = [(ci, co, h2) for ci, co, h2 in ladder if h2 >= first]
        ci0 = ladder[0][0]
        x = _rand(rng, (ladder[0][2] // 2, ladder[0][2] // 2, ci0, b),
                  dtype)
        blocks = tuple(
            _mk_block(rng, ci, co, h2, h2 == 1024)
            for ci, co, h2 in ladder)

        def chain(x, blocks):
            return bc.tail_chain_bc(x, blocks)

        tail_bytes = (ladder[0][2] // 2)**2 * ci0    # read chain input
        for ci, co, h2 in ladder:
            # up writes raw; conv reads it and writes raw (the final conv
            # instead reads its input twice and writes only the 3-ch rgb).
            if h2 == 1024:
                tail_bytes += h2**2 * (co * 3 + 3)
            else:
                tail_bytes += h2**2 * co * 3
            if h2 != ladder[0][2]:
                tail_bytes += (h2 // 2)**2 * ci      # up reads prev conv
        return (jax.jit(chain), (x, blocks), floor_ms(tail_bytes * b * 2))

    raise ValueError(f"unknown layer {name!r}")


ALL_LAYERS = ("up512", "conv512", "up1024", "rgb1024", "rgbstats1024",
              "rgbapply1024", "chain")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--layers", type=str, default="all",
                   help="comma list of up512,conv512,up1024,rgb1024,chain")
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--dtype", type=str, default="bf16")
    p.add_argument("--injit", type=int, default=0,
                   help="run each case N times inside ONE jit (lax.scan "
                        "with a varying input scale to defeat CSE) and "
                        "divide — immune to the ~30 ms sync-floor noise "
                        "that can distort per-call measure() numbers")
    args = p.parse_args(argv)

    from ..utils.profiling import measure

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    names = (ALL_LAYERS if args.layers == "all"
             else tuple(args.layers.split(",")))
    for name in names:
        fn, inputs, floor = build_case(name, args.batch, dtype)
        if args.injit:
            n = args.injit
            x0, rest = inputs[0], inputs[1:]

            def scale_small(tree, c):
                # Thread the carry through the SMALL param leaves only
                # (kernel weights) — scaling the multi-GB activation or the
                # 67 MB noise maps would add their own traffic to the
                # measurement. This defeats XLA's loop-invariant hoisting.
                return jax.tree.map(
                    lambda lf: lf * c.astype(lf.dtype)
                    if lf.size < 2**16 else lf, tree)

            def rep_fn(x0, rest):
                def step(c, _):
                    out = fn.__wrapped__(x0, *scale_small(rest, c))
                    lf = jax.tree_util.tree_leaves(out)[0]
                    return c + lf.reshape(-1)[0].astype(jnp.float32) * 0, None

                c, _ = jax.lax.scan(step, jnp.float32(1.0), None, length=n)
                return c

            ms = measure(jax.jit(rep_fn), x0, rest,
                         reps=args.reps) * 1e3 / n
        else:
            ms = measure(fn, *inputs, reps=args.reps) * 1e3
        print(json.dumps({"layer": name, "ms": round(ms, 2),
                          "floor_ms": round(floor, 2),
                          "x_floor": round(ms / floor, 2)}), flush=True)
        del fn, inputs


if __name__ == "__main__":
    main()
