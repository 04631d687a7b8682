"""Pallas TPU kernel: fused blur + StyleGAN epilogue for the high-res tail.

The hottest non-conv work in MC certification is the per-layer chain that
follows every fused up-conv (stylegan_generator_model.py:441-463,538-565):

    t   = lrelu(blur3x3(y) + noise*nw + bias)
    out = instnorm(t) * (s0 + 1) + s1

XLA runs this as four HBM traversals of the largest activations (blur
read+write, stats read, apply read+write — measured at the bandwidth
roofline, docs/PERF.md). This kernel pair does it in three by never
materialising the blurred tensor:

  pass A (stats):  stream y row-tiles, recompute t in VMEM, reduce
                   sum(t)/sum(t^2) per (b, c) with a one-hot MXU matmul —
                   reads y once, writes 16 KB of moments;
  pass B (apply):  stream y again, recompute t, apply the normalisation
                   affine folded with the AdaIN style into a single
                   (t * A + B) — reads y + writes out.

Recompute beats materialise here because the op is HBM-bound and the VPU
work per byte is small. Gradients fall back to the XLA reference
implementation via custom_vjp (the backward recomputes the XLA forward),
so the attack path differentiates through the same math.

Layout: activations are handled as [B, H, W*C] rows — the W*C minor dim
(16384 for every StyleGAN tail layer) tiles perfectly onto the (8, 128)
vregs; W-shifts for the blur become C-lane shifts done with slice+concat
inside VMEM. Halo rows are DMA'd manually (BlockSpec blocks cannot
overlap); image borders get zero halos, matching the conv's zero padding.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH = 64  # max row-tile height (f32 intermediates must fit VMEM)


def _interpret() -> bool:
    """Run the kernels in interpreter mode off-TPU (tests on CPU)."""
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Reference (XLA) implementation — f32 parity path and backward pass
# ---------------------------------------------------------------------------

def _xla_impl(y, noise_nw, bias, s0p1, s1, eps):
    """y [B,H,W,C]; noise_nw [H,W,C]; bias [C]; s0p1/s1 [B,C]."""
    from ..models import nn

    t = nn.lrelu(nn.blur_3x3(y) + noise_nw[None] + bias)
    t = nn.instance_norm(t, eps=eps)
    return t * s0p1[:, None, None, :] + s1[:, None, None, :]


# ---------------------------------------------------------------------------
# In-kernel helpers
# ---------------------------------------------------------------------------

def _shift_lanes(x: jnp.ndarray, c: int, left: bool) -> jnp.ndarray:
    """Shift by one pixel along W (== C lanes) with zero boundary.

    Implemented as a circular lane roll + boundary mask — Mosaic lowers
    rolls natively, while offset lane slices + concat are unsupported
    ('result/input offset mismatch on non-concat dimension')."""
    wc = x.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    if left:   # pixel w+1 -> position w; last pixel has no right neighbour
        rolled = pltpu.roll(x, wc - c, 1)      # == roll left by c
        return jnp.where(lane < wc - c, rolled, 0.0)
    rolled = pltpu.roll(x, c, 1)               # roll right by c
    return jnp.where(lane >= c, rolled, 0.0)


PAD = 8  # halo rows per side; Mosaic DMA slices must be 8-sublane aligned


def _compute_t(y_scr, noise_ref, bias_ref, c: int, th: int):
    """Recompute t = lrelu(blur(y) + noise_nw + bias) for the th center
    rows (scratch rows [PAD, PAD+th)) of a PAD-haloed scratch tile. Blur
    accumulates in f32, matching the depthwise-conv emitter's f32
    accumulation on bf16 inputs; returned in f32 (callers cast)."""
    rows = y_scr[:].astype(jnp.float32)                 # [th+2*PAD, WC]
    # vertical [1,2,1]/4 over the full scratch via sublane rolls (the
    # wrap-around rows land in the halo region and are sliced away at the
    # 8-aligned offsets below — Mosaic rejects offset row slices in
    # arithmetic, but aligned slices of a rolled value are fine).
    up = pltpu.roll(rows, 1, 0)                         # rows[r-1]
    dn = pltpu.roll(rows, rows.shape[0] - 1, 0)         # rows[r+1]
    v_full = (up + 2.0 * rows + dn) * 0.25
    v = v_full[PAD:PAD + th]                            # [th, WC]
    # horizontal [1,2,1]/4 via C-lane shifts
    h = (_shift_lanes(v, c, left=False) + 2.0 * v
         + _shift_lanes(v, c, left=True)) * 0.25
    t = h + noise_ref[:].astype(jnp.float32) \
        + bias_ref[:].astype(jnp.float32)
    return jnp.where(t >= 0, t, 0.2 * t)                # lrelu


def _dma_rows_with_halo(y_ref, scr, sem, b, i, n_tiles, th):
    """Copy rows [i*th-PAD, i*th+th+PAD) of image b into scratch (all DMA
    shapes/offsets 8-row aligned); out-of-image rows stay zero (== the
    conv's zero padding) via a scratch memset on the edge tiles."""
    # n_tiles is static: emit only branches whose slices are in-bounds
    # (pl.when traces every branch, so dead branches must still be valid).
    if n_tiles == 1:
        scr[...] = jnp.zeros_like(scr)
        cp = pltpu.make_async_copy(
            y_ref.at[b, pl.ds(0, th), :], scr.at[pl.ds(PAD, th), :], sem)
        cp.start()
        cp.wait()
        return

    first = i == 0
    last = i == n_tiles - 1

    @pl.when(jnp.logical_or(first, last))
    def _():
        scr[...] = jnp.zeros_like(scr)

    @pl.when(first)
    def _():
        cp = pltpu.make_async_copy(
            y_ref.at[b, pl.ds(0, th + PAD), :],
            scr.at[pl.ds(PAD, th + PAD), :], sem)
        cp.start()
        cp.wait()

    start = pl.multiple_of(i * th - PAD, PAD)  # provably 8-aligned

    @pl.when(last)
    def _():
        cp = pltpu.make_async_copy(
            y_ref.at[b, pl.ds(start, th + PAD), :],
            scr.at[pl.ds(0, th + PAD), :], sem)
        cp.start()
        cp.wait()

    @pl.when(jnp.logical_not(jnp.logical_or(first, last)))
    def _():
        cp = pltpu.make_async_copy(
            y_ref.at[b, pl.ds(start, th + 2 * PAD), :], scr.at[:], sem)
        cp.start()
        cp.wait()


# ---------------------------------------------------------------------------
# Pass A: moments
# ---------------------------------------------------------------------------

def _stats_kernel(y_ref, noise_ref, bias_ref, m_ref, out_ref, scr, sem,
                  *, c, th, n_tiles):
    i = pl.program_id(0)
    b = pl.program_id(1)

    @pl.when(jnp.logical_and(i == 0, b == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    _dma_rows_with_halo(y_ref, scr, sem, b, i, n_tiles, th)
    t = _compute_t(scr, noise_ref, bias_ref, c, th)
    m = m_ref[:]                                        # [WC, C] one-hot
    s1 = jax.lax.dot(t, m, precision=jax.lax.Precision.HIGHEST)
    s2 = jax.lax.dot(t * t, m, precision=jax.lax.Precision.HIGHEST)
    out_ref[0, b, :] += jnp.sum(s1, axis=0)
    out_ref[1, b, :] += jnp.sum(s2, axis=0)


def _moments(y2, noise2, bias_wc, m_onehot, *, c, th):
    B, H, WC = y2.shape
    n_tiles = H // th
    kernel = functools.partial(_stats_kernel, c=c, th=th, n_tiles=n_tiles)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles, B),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                 # y (HBM)
            pl.BlockSpec((th, WC), lambda i, b: (i, 0),
                         memory_space=pltpu.VMEM),                # noise
            pl.BlockSpec((th, WC), lambda i, b: (0, 0),
                         memory_space=pltpu.VMEM),                # bias
            pl.BlockSpec((WC, c), lambda i, b: (0, 0),
                         memory_space=pltpu.VMEM),                # one-hot
        ],
        out_specs=pl.BlockSpec((2, B, c), lambda i, b: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, B, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((th + 2 * PAD, WC), y2.dtype),
                        pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(y2, noise2, bias_wc, m_onehot)


# ---------------------------------------------------------------------------
# Pass B: apply
# ---------------------------------------------------------------------------

def _apply_kernel(y_ref, noise_ref, bias_ref, coef_ref, mt_ref, out_ref,
                  scr, sem, *, c, th, n_tiles, w):
    i = pl.program_id(0)
    b = pl.program_id(1)
    _dma_rows_with_halo(y_ref, scr, sem, b, i, n_tiles, th)
    t = _compute_t(scr, noise_ref, bias_ref, c, th)
    # coef_ref: [2, B, C] f32; expand per-channel coeffs to the W*C lane
    # layout with the transposed one-hot (an MXU broadcast).
    mt = mt_ref[:]                                      # [C, WC]
    a = jax.lax.dot(coef_ref[0, b, :][None, :], mt,
                    precision=jax.lax.Precision.HIGHEST)
    off = jax.lax.dot(coef_ref[1, b, :][None, :], mt,
                      precision=jax.lax.Precision.HIGHEST)
    out_ref[0, :, :] = (t * a + off).astype(out_ref.dtype)


def _apply(y2, noise2, bias_wc, coefs, m_onehot, *, c, th):
    B, H, WC = y2.shape
    n_tiles = H // th
    kernel = functools.partial(_apply_kernel, c=c, th=th, n_tiles=n_tiles,
                               w=WC // c)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles, B),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((th, WC), lambda i, b: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((th, WC), lambda i, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, B, c), lambda i, b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, WC), lambda i, b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, WC), lambda i, b: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, WC), y2.dtype),
        scratch_shapes=[pltpu.VMEM((th + 2 * PAD, WC), y2.dtype),
                        pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(y2, noise2, bias_wc, coefs, m_onehot)


# ---------------------------------------------------------------------------
# Public op
# ---------------------------------------------------------------------------

def _pallas_impl(y, noise_nw, bias, s0p1, s1, eps):
    B, H, W, C = y.shape
    WC = W * C
    th = min(TH, H)
    while H % th:
        th //= 2
    y2 = y.reshape(B, H, WC)
    noise2 = noise_nw.reshape(H, WC)
    bias_wc = jnp.tile(bias, (W,)).reshape(1, WC).astype(y.dtype)
    bias_tile = jnp.broadcast_to(bias_wc, (th, WC))
    m_onehot = jnp.asarray(
        np.kron(np.ones((W, 1), np.float32), np.eye(C, dtype=np.float32)))

    sums = _moments(y2, noise2, bias_tile, m_onehot, c=C, th=th)
    n = H * W
    mean = sums[0] / n                                   # [B, C] f32
    var = jnp.maximum(sums[1] / n - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    a = rstd * s0p1                                      # [B, C] f32
    off = (-mean * rstd) * s0p1 + s1
    coefs = jnp.stack([a, off]).astype(jnp.float32)      # [2, B, C]

    out = _apply(y2, noise2, bias_tile, coefs, m_onehot.T, c=C, th=th)
    return out.reshape(B, H, W, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def blur_epilogue(y, noise_nw, bias, s0p1, s1, eps=1e-8):
    """Fused blur3x3 -> +noise -> +bias -> lrelu -> instnorm -> AdaIN.

    y [B,H,W,C] bf16 (H divisible by 8, W*C divisible by 128);
    noise_nw [H,W,C] (noise buffer pre-multiplied by its weight);
    bias [C]; s0p1 = style_scale + 1 [B,C]; s1 = style_shift [B,C].
    """
    return _pallas_impl(y, noise_nw, bias, s0p1, s1, eps)


def _fwd(y, noise_nw, bias, s0p1, s1, eps):
    return _pallas_impl(y, noise_nw, bias, s0p1, s1, eps), \
        (y, noise_nw, bias, s0p1, s1)


def _bwd(eps, res, g):
    # Backward recomputes the XLA forward — exact same math, and the
    # attack path pays the XLA cost only when differentiating.
    _, vjp = jax.vjp(lambda *a: _xla_impl(*a, eps), *res)
    return vjp(g)


blur_epilogue.defvjp(_fwd, _bwd)
