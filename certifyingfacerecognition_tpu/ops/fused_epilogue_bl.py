"""Pallas TPU kernel: blur + StyleGAN epilogue in BATCH-IN-LANES layout.

The round-1 channel-minor kernel (ops/fused_blur_epilogue.py) wins 2x
standalone but LOSES in context: XLA keeps the surrounding convs'
activations in its small-channel TPU layout — batch in the 128-lane minor
dim — so every kernel invocation paid two ~29 ms layout conversions of the
4 GB tensor (docs/PERF.md). This kernel instead ADOPTS that layout: the
activation is handled as [H, W, C, B] with the batch as the lane dim and
the channels as sublanes, which is exactly XLA's native layout for these
small-channel convs at B=128, so the logical transpose at the boundary can
lower to a free bitcast.

Batch-in-lanes also simplifies everything the round-1 kernel fought:
rows/cols are plain leading dims (no 8-sublane halo alignment, no lane
rolls — the 3x3 blur is six slice-adds), and the per-(b,c) moments are
direct VPU reductions to a [C, B] tile — no one-hot MXU matmuls.

Same math as the reference chain (stylegan_generator_model.py:441-463,
538-565):  t = lrelu(blur3x3(y) + noise*nw + bias);
           out = instnorm(t) * (s0+1) + s1.
Two streaming passes (moments, then apply): y read twice, out written
once — 3 traversals of the big tensor vs XLA's 5. Gradients fall back to
the XLA reference implementation via custom_vjp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_blur_epilogue import _xla_impl


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _dma_tile(y_ref, scr, sem, i, j, *, nh, nw, th, wt):
    """Copy tile (i, j) of y [H, W, C, B] plus 1-pixel halos into the
    (th+2, wt+2, C, B) scratch. H/W are leading dims, so starts are
    unconstrained; DMA SIZES must be static, hence one predicated copy per
    (row-edge x col-edge) case. Out-of-image halos stay zero (= the
    depthwise blur's zero padding) via a memset on edge tiles."""
    edge = jnp.logical_or(jnp.logical_or(i == 0, i == nh - 1),
                          jnp.logical_or(j == 0, j == nw - 1))

    @pl.when(edge)
    def _():
        scr[...] = jnp.zeros_like(scr)

    # (predicate, src_start, dst_start, size) per axis; predicates are
    # mutually exclusive and cover every grid index.
    def axis_cases(idx, n, t):
        if n == 1:
            return [(idx == 0, 0, 1, t)]
        return [(idx == 0, 0, 1, t + 1),
                (idx == n - 1, idx * t - 1, 0, t + 1),
                (jnp.logical_and(idx > 0, idx < n - 1), idx * t - 1, 0,
                 t + 2)]

    for rpred, r0, rd, rs in axis_cases(i, nh, th):
        for cpred, c0, cd, cs in axis_cases(j, nw, wt):
            @pl.when(jnp.logical_and(rpred, cpred))
            def _(r0=r0, rd=rd, rs=rs, c0=c0, cd=cd, cs=cs):
                cp = pltpu.make_async_copy(
                    y_ref.at[pl.ds(r0, rs), pl.ds(c0, cs)],
                    scr.at[pl.ds(rd, rs), pl.ds(cd, cs)], sem)
                cp.start()
                cp.wait()


def _compute_t(scr, nb_ref, th: int, wt: int):
    """t = lrelu(blur3x3(y) + noise*nw + bias) for the tile centre from
    the haloed scratch; f32 compute (the depthwise-conv emitter also
    accumulates bf16 inputs in f32)."""
    rows = scr[:].astype(jnp.float32)                 # [th+2, wt+2, C, B]
    v = (rows[0:th] + 2.0 * rows[1:th + 1] + rows[2:th + 2]) * 0.25
    h = (v[:, 0:wt] + 2.0 * v[:, 1:wt + 1] + v[:, 2:wt + 2]) * 0.25
    t = h + nb_ref[:].astype(jnp.float32)[..., None]  # nb [th, wt, C]
    return jnp.where(t >= 0, t, 0.2 * t)              # [th, wt, C, B]


def _stats_kernel(y_ref, nb_ref, out_ref, scr, sem, *, th, wt, nh, nw):
    i, j = pl.program_id(0), pl.program_id(1)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    _dma_tile(y_ref, scr, sem, i, j, nh=nh, nw=nw, th=th, wt=wt)
    t = _compute_t(scr, nb_ref, th, wt)
    out_ref[0] += jnp.sum(t, axis=(0, 1))             # [C, B]
    out_ref[1] += jnp.sum(t * t, axis=(0, 1))


def _apply_kernel(y_ref, nb_ref, coef_ref, out_ref, scr, sem,
                  *, th, wt, nh, nw):
    i, j = pl.program_id(0), pl.program_id(1)
    _dma_tile(y_ref, scr, sem, i, j, nh=nh, nw=nw, th=th, wt=wt)
    t = _compute_t(scr, nb_ref, th, wt)
    a = coef_ref[0][None, None]                       # [1, 1, C, B]
    off = coef_ref[1][None, None]
    out_ref[...] = (t * a + off).astype(out_ref.dtype)


def _pick_tiles(h: int, w: int, c: int, b: int):
    """Largest (th, wt) whose scratch + f32 temps fit comfortably in VMEM
    (leave room for the pipelined nb/out blocks)."""
    th, wt = 8, w
    while h % th:
        th //= 2

    def vmem_bytes(wt):
        scr = (th + 2) * (wt + 2) * c * b * 2
        f32 = 2 * th * (wt + 2) * c * b * 4           # v + t temps
        out = 2 * th * wt * c * b * 2                 # double-buffered
        return scr + f32 + out

    while wt > 8 and (vmem_bytes(wt) > 10 * 1024 * 1024 or w % wt):
        wt //= 2
    return th, wt


def _pallas_impl(y_t, noise_nw, bias, s0p1, s1, eps):
    """y_t: [H, W, C, B] (batch-in-lanes); noise_nw [H, W, C]; bias [C];
    s0p1/s1 [B, C]."""
    h, w, c, b = y_t.shape
    th, wt = _pick_tiles(h, w, c, b)
    nh, nw = h // th, w // wt

    nb = (noise_nw + bias[None, None]).astype(y_t.dtype)   # [H, W, C]

    common = dict(th=th, wt=wt, nh=nh, nw=nw)
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    scratch = [pltpu.VMEM((th + 2, wt + 2, c, b), y_t.dtype),
               pltpu.SemaphoreType.DMA(())]
    nb_spec = pl.BlockSpec((th, wt, c), lambda i, j: (i, j, 0),
                           memory_space=pltpu.VMEM)

    sums = pl.pallas_call(
        functools.partial(_stats_kernel, **common),
        grid=(nh, nw),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), nb_spec],
        out_specs=pl.BlockSpec((2, c, b), lambda i, j: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, c, b), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=params,
        interpret=_interpret(),
    )(y_t, nb)

    n = h * w
    mean = sums[0] / n                                   # [C, B]
    var = jnp.maximum(sums[1] / n - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    s0p1_t, s1_t = s0p1.T, s1.T                          # [C, B]
    a = rstd * s0p1_t
    off = (-mean * rstd) * s0p1_t + s1_t
    coefs = jnp.stack([a, off]).astype(jnp.float32)      # [2, C, B]

    return pl.pallas_call(
        functools.partial(_apply_kernel, **common),
        grid=(nh, nw),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), nb_spec,
                  pl.BlockSpec((2, c, b), lambda i, j: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((th, wt, c, b), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w, c, b), y_t.dtype),
        scratch_shapes=scratch,
        compiler_params=params,
        interpret=_interpret(),
    )(y_t, nb, coefs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def blur_epilogue_bl(y_t, noise_nw, bias, s0p1, s1, eps=1e-8):
    """Batch-in-lanes fused blur3x3 -> +noise -> +bias -> lrelu ->
    instnorm -> AdaIN.

    y_t [H, W, C, B] — the [B, H, W, C] activation logically transposed
    (1, 2, 3, 0); at B = 128 that transpose is a relayout XLA can elide
    because its small-channel conv layout is already batch-minor.
    noise_nw [H, W, C] (noise pre-multiplied by its weight); bias [C];
    s0p1 = style_scale + 1 [B, C]; s1 = style_shift [B, C].
    Returns [H, W, C, B].
    """
    return _pallas_impl(y_t, noise_nw, bias, s0p1, s1, eps)


def _fwd(y_t, noise_nw, bias, s0p1, s1, eps):
    return _pallas_impl(y_t, noise_nw, bias, s0p1, s1, eps), \
        (y_t, noise_nw, bias, s0p1, s1)


def _bwd(eps, res, g):
    # Backward routes through the XLA reference implementation in the
    # standard [B, H, W, C] layout (attacks differentiate the same math).
    y_t, noise_nw, bias, s0p1, s1 = res

    def ref(y_t, noise_nw, bias, s0p1, s1):
        y = jnp.transpose(y_t, (3, 0, 1, 2))
        out = _xla_impl(y, noise_nw, bias, s0p1, s1, eps)
        return jnp.transpose(out, (1, 2, 3, 0))

    _, vjp = jax.vjp(ref, y_t, noise_nw, bias, s0p1, s1)
    return vjp(g)


blur_epilogue_bl.defvjp(_fwd, _bwd)
