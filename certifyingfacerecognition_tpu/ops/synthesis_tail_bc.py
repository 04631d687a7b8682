"""Pallas TPU kernels: the full StyleGAN >=512^2 synthesis tail in one layout.

Round-1/2 finding (docs/PERF.md): fusing the blur+epilogue chain alone is a
net LOSS in context — whatever layout the Pallas kernel adopts, XLA inserts
~27 ms layout conversions of the 4 GB activation at the custom-call
boundary, and XLA's own convs are only fast in ITS layout. The fix is to
remove the boundary entirely: these kernels implement the *whole* tail —
up-conv, blur, epilogue, 3x3 conv, ToRGB — so the activation never leaves
one layout between the 256^2 block output and the final RGB image.

Storage layout: activations live in HBM as [H, W, C, B] — the TPU (8,128)
tile applies to the minor two dims, so C<=64 channels sit in sublanes
(no padding) and the 128-sample MC batch exactly fills the lanes. A
[H, W, B, C] layout would be padded C->128 in lanes: an 8x HBM blowup
(compile-checked — Mosaic tiles HBM memrefs too). B must be a multiple
of 128: partial lane tiles cannot be DMA'd.

Compute formulation — "M-packed group dots". A gr x 4 block of output
pixels (gr = 2 when 8*Co <= 128, else 1) is computed as gr+2 MXU dots,
one per window row: each rhs is the CONTIGUOUS [6*Ci, B] reshape of one
haloed-tile row slice (K on sublanes, zero gather cost), against a
block-structured lhs W[dr] [gr*4*Co, 6*Ci]. M = gr*4*Co = 128/256 fills
the MXU's M tiles exactly and the result reshapes [gr, 4, Co, B]
straight into the storage orientation. No minor-dim transposes, no
9-way lane-concatenation (earlier cuts spent ~15 ms/traversal there),
at a (gr+2)*6/9/gr tap redundancy (2x-2.7x) — far cheaper than idling
7/8 of the MXU on K = C taps. The up-conv packs a 2x4 block of the
blur-halo grid the same way: BOTH row parities of a yb row pair read
the same two input rows, so each group is two exact K = 3*Ci dots.
Groups are unrolled inside a per-row-block fori loop (a fori over
individual groups paid ~50 ms of loop overhead per 1024^2 pass), and
tile DMA is double-buffered (prefetch next tile during compute).

Two per-layer structures exist:
  * standalone half-layers (conv_epilogue_bc & co): two streaming passes
    (moments, then apply) recomputing t = lrelu(conv(x) + noise*nw +
    bias) — input read twice, output written once;
  * chain mode (tail_chain_bc): ONE pass per layer — the activation is
    written RAW and the folded instnorm+AdaIN affine is applied by the
    NEXT layer's kernel right after its tile DMA (see the chain section
    below). This halves the tail's HBM traffic vs XLA (~45 -> ~23 GB
    per 128-batch); it still trails XLA end-to-end because a Pallas
    kernel body serialises its DMA/VPU/MXU phases (docs/PERF.md).

Math matches the reference chain exactly
(stylegan_generator_model.py:227-322,441-463,538-565):
    up-half:   t = lrelu(blur3x3(upconv4x4s2(x)) + noise*nw + bias)
    conv-half: t = lrelu(conv3x3(x)*wscale + noise*nw + bias)
    both:      out = instnorm(t) * (s0+1) + s1
    ToRGB:     rgb = conv1x1(out)/sqrt(C) + bias_rgb   (emitted [3,H,W,B])

Gradients fall back to the XLA implementation via custom_vjp (attacks
differentiate the same math through the frozen-conv VJPs of models/nn.py).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 8  # output pixels per M-packed dot


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# XLA reference implementations (backward pass + test oracle).
# I/O layout matches the kernels: x [H, W, C, B]; rgb [3, H, W, B].
# ---------------------------------------------------------------------------

def _nhwc(x_cb):
    return jnp.transpose(x_cb, (3, 0, 1, 2))


def _cb(x_nhwc):
    return jnp.transpose(x_nhwc, (1, 2, 3, 0))


def _epilogue_ref(t, nb, s0p1, s1, eps):
    from ..models import nn

    dtype = t.dtype
    t = nn.lrelu(t + nb[None])
    t = nn.instance_norm(t, eps=eps)
    out = t * s0p1[:, None, None, :] + s1[:, None, None, :]
    # nb/s* are f32; cast back so the output dtype matches the Pallas
    # forward (f32 internal compute, activation-dtype output).
    return out.astype(dtype)


def _conv_ref(x_cb, k_hwio, nb, s0p1, s1, eps):
    from ..models import nn

    y = nn.conv2d_frozen(_nhwc(x_cb), k_hwio.astype(x_cb.dtype),
                         ((1, 1), (1, 1)), 1, None)
    return _cb(_epilogue_ref(y, nb, s0p1, s1, eps))


def _conv_rgb_ref(x_cb, k_hwio, nb, s0p1, s1, w_rgb, b_rgb, eps):
    from ..models import nn

    y = nn.conv2d_frozen(_nhwc(x_cb), k_hwio.astype(x_cb.dtype),
                         ((1, 1), (1, 1)), 1, None)
    out = _epilogue_ref(y, nb, s0p1, s1, eps)
    rgb = jnp.einsum("bhwc,cd->bhwd", out, w_rgb.astype(out.dtype)) + b_rgb
    return jnp.transpose(rgb.astype(x_cb.dtype), (3, 1, 2, 0))


def _upconv_ref(x_cb, k4_hwio, nb, s0p1, s1, eps):
    from ..models import nn
    from ..models.stylegan import _upconv

    y = _upconv(_nhwc(x_cb), k4_hwio.astype(x_cb.dtype), None)
    y = nn.blur_3x3(y)
    return _cb(_epilogue_ref(y, nb, s0p1, s1, eps))


# ---------------------------------------------------------------------------
# Weight packing (tiny, traced once per call)
# ---------------------------------------------------------------------------

def _conv_group_rows(co):
    """Pixel rows per M-packed group: 2x4 when that still fits one MXU
    M-tile (co <= 16), else 1x4 (M = 4*co = 128/256). Measured (round 3):
    every output row participates in ALL gr+2 dots, so MACs/output =
    (gr+2)*6*Ci — raising gr only pays while it fills an otherwise idle
    part of the 128-row M-tile; gr=4 (M=256) is a strict 1.5x MXU-work
    regression over gr=2."""
    return 2 if 8 * co <= 128 else 1


def _w_conv_packed(k_hwio):
    """HWIO [3,3,Ci,Co] -> W [gr+2, gr*4*Co, 6*Ci]: one lhs per window
    row dr, applied to the contiguous [6*Ci, B] reshape of the haloed
    tile's row rb*gr+dr, cols 4g..4g+5.

    Output pixel (dr2, mc) of the gr x 4 group sits at M rows
    (dr2*4+mc)*Co..+Co and convolves kernel row sr = dr - dr2 (when
    0 <= sr <= 2) at window cols mc..mc+2:
    W[dr][(dr2*4+mc)*Co+o, (mc+s)*Ci+ci] = k[dr-dr2, s, ci, o].

    Built as one stack of concatenated blocks — the original element-wise
    .at[].set construction lowered to ~100 serial scatter ops that cost
    ~4-5 ms PER FORWARD inside the jitted pipeline (docs/PERF.md round 3).
    """
    _, _, ci, co = k_hwio.shape
    gr = _conv_group_rows(co)
    kT = jnp.transpose(k_hwio, (0, 1, 3, 2))           # [3, 3, Co, Ci]
    zb = jnp.zeros((co, ci), k_hwio.dtype)

    def mblock(dr, dr2, mc):
        sr = dr - dr2
        cols = []
        for col in range(6):
            scol = col - mc
            if 0 <= sr <= 2 and 0 <= scol <= 2:
                cols.append(kT[sr, scol])
            else:
                cols.append(zb)
        return jnp.concatenate(cols, axis=1)           # [Co, 6*Ci]

    return jnp.stack([
        jnp.concatenate([mblock(dr, dr2, mc)
                         for dr2 in range(gr) for mc in range(4)], axis=0)
        for dr in range(gr + 2)
    ])                                                 # [gr+2, gr4Co, 6Ci]


def _w_up_packed(k4_hwio):
    """_upconv kernel HWIO [4,4,Ci,Co] -> W [2, 8*Co, 3*Ci]: one lhs per
    input row tap a, computing a 2x4 block of the blur-halo yb grid in
    two dots.

    Phase decomposition (out[o] = sum_kh K[kh] xd[o+kh-2], xd 2-dilated):
    the yb row PAIR (2k, 2k+1) — global rows 2*i0-1+{2k,2k+1}, phases
    p = 1-rp — reads the SAME two input rows k, k+1 of the haloed tile.
    Columns start on the ODD global grid: col mc of a 4-col group has
    phase q = (mc+1)%2 and window column c = mc//2 + b of the contiguous
    [3*Ci, B] reshape of tile cols 2g..2g+2:
    W[a][(rp*4+mc)*Co+o, (mc//2+b)*Ci+ci] = k4[2a+(1-rp), 2b+q, ci, o]."""
    _, _, ci, co = k4_hwio.shape
    kT = jnp.transpose(k4_hwio, (0, 1, 3, 2))          # [4, 4, Co, Ci]
    zb = jnp.zeros((co, ci), k4_hwio.dtype)

    def mblock(a, rp, mc):
        p = 1 - rp
        q = (mc + 1) % 2
        cols = [zb, zb, zb]
        for b in range(2):
            cols[mc // 2 + b] = kT[2 * a + p, 2 * b + q]
        return jnp.concatenate(cols, axis=1)           # [Co, 3*Ci]

    return jnp.stack([
        jnp.concatenate([mblock(a, rp, mc)
                         for rp in range(2) for mc in range(4)], axis=0)
        for a in range(2)
    ])                                                 # [2, 8Co, 3Ci]


def _w_rgb_packed(w_rgb, npx):
    """ToRGB [Co, 3] -> CHANNEL-MAJOR block matrix [3*npx, npx*Co] so a
    whole group's RGB is one dot against the [npx*Co, B]-flattened
    activation chunk AND the result [3, npx, B] lands directly in the
    [3, H, W, B] output orientation: row ch*npx + px holds w_rgb[:, ch]
    at cols px*Co.. — the earlier px-major block-diagonal needed a
    per-chunk [.., 3, B] -> [3, .., B] transpose whose 3-sublane layout
    Mosaic lowers as slow shuffles."""
    import jax.scipy.linalg as jsl

    return jnp.concatenate(
        [jsl.block_diag(*([w_rgb[:, ch][None, :]] * npx))
         for ch in range(w_rgb.shape[1])])


def _b_rgb_packed(b_rgb, npx):
    """RGB bias [3] -> [3*npx, 1] row-aligned with _w_rgb_packed so the
    kernels add it on the 2D dot result (a [3npx,1]+[3npx,B] broadcast;
    a [3]->[3,1,1,1] broadcast is a shape cast Mosaic cannot lower)."""
    return jnp.repeat(jnp.asarray(b_rgb, jnp.float32), npx)[:, None]


# ---------------------------------------------------------------------------
# Shared kernel machinery
# ---------------------------------------------------------------------------

def _dma_ops(x_ref, scr, sem, i, j, *, nh, nw, th, tw, start):
    """Start (or wait for) the copy of tile (i, j) of x [H, W, C, B] plus
    1-pixel halos into the leading (th+2, tw+2) region of the scratch
    slot; out-of-image halos are zero (the convs' zero padding). H/W are
    leading dims so DMA starts are unconstrained; sizes must be static,
    hence one predicated copy per edge case (exactly one predicate fires
    per tile). The scratch may be wider than tw+2 (up-conv window slack)
    — the extra columns only ever feed discarded outputs."""
    if start:
        edge = jnp.logical_or(jnp.logical_or(i == 0, i == nh - 1),
                              jnp.logical_or(j == 0, j == nw - 1))

        @pl.when(edge)
        def _():
            scr[...] = jnp.zeros_like(scr)

    def axis_cases(idx, n, t):
        # the interior/last starts are clamped so the dead branches stay
        # well-formed when idx arrives as the python constant 0 (the g=0
        # self-start of the double-buffered path)
        lo = jnp.maximum(jnp.asarray(idx * t - 1), 0)
        if n == 1:
            return [(idx == 0, 0, 1, t)]
        return [(idx == 0, 0, 1, t + 1),
                (idx == n - 1, lo, 0, t + 1),
                (jnp.logical_and(idx > 0, idx < n - 1), lo, 0, t + 2)]

    for rpred, r0, rd, rs in axis_cases(i, nh, th):
        for cpred, c0, cd, cs in axis_cases(j, nw, tw):
            @pl.when(jnp.logical_and(rpred, cpred))
            def _(r0=r0, rd=rd, rs=rs, c0=c0, cd=cd, cs=cs):
                cp = pltpu.make_async_copy(
                    x_ref.at[pl.ds(r0, rs), pl.ds(c0, cs)],
                    scr.at[pl.ds(rd, rs), pl.ds(cd, cs)], sem)
                if start:
                    cp.start()
                else:
                    cp.wait()


def _dma_tile_db(x_ref, scr2, sems, g, *, nh, nw, th, tw):
    """Double-buffered tile fetch over a FLAT grid index g: start the
    first copy at g=0, prefetch tile g+1 into the other slot, then wait
    for this tile's slot. Returns the ready slot's sub-ref. Hides the
    HBM read latency under the tile's MXU/VPU work — the synchronous
    version serialised ~12 ms of DMA per 1024^2 pass."""
    slot = lax.rem(g, 2)

    @pl.when(g == 0)
    def _():
        _dma_ops(x_ref, scr2.at[0], sems.at[0], 0, 0,
                 nh=nh, nw=nw, th=th, tw=tw, start=True)

    @pl.when(g + 1 < nh * nw)
    def _():
        gn = g + 1
        _dma_ops(x_ref, scr2.at[lax.rem(gn, 2)], sems.at[lax.rem(gn, 2)],
                 gn // nw, lax.rem(gn, nw),
                 nh=nh, nw=nw, th=th, tw=tw, start=True)

    _dma_ops(x_ref, scr2.at[slot], sems.at[slot], g // nw, lax.rem(g, nw),
             nh=nh, nw=nw, th=th, tw=tw, start=False)
    return scr2.at[slot]


def _lrelu(t):
    return jnp.where(t >= 0, t, 0.2 * t)


def _coefs_from_sums(sums, n, s0p1_t, s1_t, eps):
    """Fold instnorm + AdaIN into one (a, off) affine pair [2, C, B] f32.
    sums [2, C, B]; s0p1_t/s1_t [C, B]."""
    mean = sums[0] / n
    var = jnp.maximum(sums[1] / n - mean * mean, 0.0)
    rstd = lax.rsqrt(var + eps)
    a = rstd * s0p1_t
    off = (-mean * rstd) * s0p1_t + s1_t
    return jnp.stack([a, off]).astype(jnp.float32)


def _compiler_params():
    return pltpu.CompilerParams(vmem_limit_bytes=127 * 1024 * 1024)


def _conv_groups(scr, w_ref, nb_ref, th, tw, ci, co, b, consume):
    """Run the M-packed conv over the tile: a fori loop over gr-row
    blocks with the 4-column groups UNROLLED inside (one loop iteration
    per ~tw/4 MXU dots — per-group loop overhead dominated the first cut
    of these kernels). consume(rb, t_block [gr, tw, co, B] f32, carry).
    Slices go through the refs (Mosaic has no dynamic_slice on values);
    each [1, 6, ci, B] row-window reshapes to [6ci, B] for free."""
    gr = _conv_group_rows(co)
    ng = tw // 4
    w = w_ref[:]

    def body(rb, carry):
        r0 = rb * gr
        cols = []
        for g in range(ng):
            y = jnp.zeros((gr * 4 * co, b), jnp.float32)
            for dr in range(gr + 2):
                rhs = scr[pl.ds(r0 + dr, 1), pl.ds(g * 4, 6)].reshape(
                    6 * ci, b)
                y += jnp.dot(w[dr], rhs,
                             preferred_element_type=jnp.float32)
            cols.append(y.reshape(gr, 4, co, b))
        yb = jnp.concatenate(cols, axis=1)             # [gr, tw, co, B]
        nbc = nb_ref[pl.ds(r0, gr)]                    # [gr, tw, co]
        t = _lrelu(yb + nbc.astype(jnp.float32)[:, :, :, None])
        return consume(rb, t, carry)

    return body, th // gr


def _up_rows(scr, w_ref, th, tw, ci, co, b, yb_ref):
    """Deconv the haloed tile into the yb scratch rows [2*i0-1, 2*i0+2*th]
    x cols [2*j0-1, ...] (blur halo grid). One fori loop over yb row
    PAIRS (both parities share the same two input rows — see
    _w_up_packed), 4-column groups unrolled: 2 MXU dots per group."""
    ng = (2 * tw + 4) // 4
    w = w_ref[:]

    def body(kk, c):
        cols = []
        for gc in range(ng):
            y = jnp.zeros((GROUP * co, b), jnp.float32)
            for a in range(2):
                rhs = scr[pl.ds(kk + a, 1), pl.ds(2 * gc, 3)].reshape(
                    3 * ci, b)
                y += jnp.dot(w[a], rhs,
                             preferred_element_type=jnp.float32)
            cols.append(y.reshape(2, 4, co, b))
        block = jnp.concatenate(cols, axis=1)      # [2, 2tw+4, co, B]
        yb_ref[pl.ds(2 * kk, 2)] = block.astype(yb_ref.dtype)
        return c

    lax.fori_loop(0, th + 1, body, 0)


def _blur_t(yb_ref, nb_ref, i, j, nh, nw, th, tw):
    """Zero the out-of-image yb border ring, 3x3-blur, add noise+bias,
    lrelu. Returns t [2th, 2tw, Co, B] f32."""
    zero = jnp.zeros_like(yb_ref[0:1])

    @pl.when(i == 0)
    def _():
        yb_ref[0:1] = zero

    @pl.when(i == nh - 1)
    def _():
        yb_ref[2 * th + 1:2 * th + 2] = zero

    zcol = jnp.zeros_like(yb_ref[:, 0:1])

    @pl.when(j == 0)
    def _():
        yb_ref[:, 0:1] = zcol

    @pl.when(j == nw - 1)
    def _():
        yb_ref[:, 2 * tw + 1:2 * tw + 2] = zcol

    # blur arithmetic in the activation dtype (the XLA path's depthwise
    # blur also emits bf16); only the epilogue sum is f32 — halves the
    # VPU traffic on the largest tensors of the pipeline
    r = yb_ref[pl.ds(0, 2 * th + 2), pl.ds(0, 2 * tw + 2)]
    half = jnp.asarray(0.5, r.dtype)
    quarter = jnp.asarray(0.25, r.dtype)
    v = (r[0:2 * th] + r[2:2 * th + 2]) * quarter + r[1:2 * th + 1] * half
    h = ((v[:, 0:2 * tw] + v[:, 2:2 * tw + 2]) * quarter
         + v[:, 1:2 * tw + 1] * half)
    return _lrelu(h.astype(jnp.float32)
                  + nb_ref[:].astype(jnp.float32)[:, :, :, None])


# ---------------------------------------------------------------------------
# conv-half kernels
# ---------------------------------------------------------------------------

def _conv_stats_kernel(x_ref, w_ref, nb_ref, sums_ref, scr2, sems,
                       *, th, tw, nh, nw, ci, co):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        sums_ref[:] = jnp.zeros_like(sums_ref)

    scr = _dma_tile_db(x_ref, scr2, sems, g, nh=nh, nw=nw, th=th, tw=tw)
    b = scr.shape[3]

    def consume(rb, t, carry):
        return (carry[0] + jnp.sum(t, axis=(0, 1)),
                carry[1] + jnp.sum(t * t, axis=(0, 1)))

    body, n = _conv_groups(scr, w_ref, nb_ref, th, tw, ci, co, b, consume)
    z = jnp.zeros((co, b), jnp.float32)
    s1_, s2_ = lax.fori_loop(0, n, body, (z, z))
    sums_ref[0] += s1_
    sums_ref[1] += s2_


def _conv_apply_kernel(x_ref, w_ref, nb_ref, coef_ref, out_ref, scr2, sems,
                       *, th, tw, nh, nw, ci, co):
    g = pl.program_id(0)
    scr = _dma_tile_db(x_ref, scr2, sems, g, nh=nh, nw=nw, th=th, tw=tw)
    b = scr.shape[3]
    a_c, off_c = coef_ref[0], coef_ref[1]                      # [co, B]

    gr = _conv_group_rows(co)

    def consume(rb, t, carry):
        out = t * a_c[None, None] + off_c[None, None]
        out_ref[pl.ds(rb * gr, gr)] = out.astype(out_ref.dtype)
        return carry

    body, n = _conv_groups(scr, w_ref, nb_ref, th, tw, ci, co, b, consume)
    lax.fori_loop(0, n, body, 0)


def _conv_rgb_apply_kernel(x_ref, w_ref, nb_ref, coef_ref, wrgb_ref,
                           brgb_ref, out_ref, scr2, sems,
                           *, th, tw, nh, nw, ci, co):
    g = pl.program_id(0)
    scr = _dma_tile_db(x_ref, scr2, sems, g, nh=nh, nw=nw, th=th, tw=tw)
    b = scr.shape[3]
    a_c, off_c = coef_ref[0], coef_ref[1]
    wrgb = wrgb_ref[:]                                         # [24, 8co]

    gr = _conv_group_rows(co)

    def consume(rb, t, carry):
        out = (t * a_c[None, None] + off_c[None, None]).astype(
            out_ref.dtype)
        # out [gr, tw, co, B] -> channel-major RGB dot per 4-col group
        tw_ = out.shape[1]
        cols = []
        for g2 in range(tw_ // 4):
            chunk = out[:, g2 * 4:(g2 + 1) * 4]        # [gr, 4, co, B]
            v = jnp.dot(wrgb, chunk.reshape(gr * 4 * co, b),
                        preferred_element_type=jnp.float32)
            v = v + brgb_ref[:]                        # [3*gr*4, B]
            cols.append(v.reshape(3, gr, 4, b))
        rgb = jnp.concatenate(cols, axis=2)            # [3, gr, tw, B]
        out_ref[:, pl.ds(rb * gr, gr)] = rgb.astype(out_ref.dtype)
        return carry

    body, n = _conv_groups(scr, w_ref, nb_ref, th, tw, ci, co, b, consume)
    lax.fori_loop(0, n, body, 0)


def _pick_tiles_conv(h, w, b, ci, co):
    budget = 26 * 1024 * 1024

    def usage(th, tw):
        scr = 2 * (th + 2) * (tw + 2) * ci * b * 2
        out = 2 * th * tw * co * b * 2
        return scr + out

    th = min(8, h)
    while h % th:
        th //= 2
    tw = w
    while tw > GROUP and (usage(th, tw) > budget or w % tw):
        tw //= 2
    return th, tw


def _conv_impl(x, k_hwio, nb, s0p1, s1, eps, w_rgb=None, b_rgb=None):
    """x [H, W, Ci, B]; k_hwio [3,3,Ci,Co] (wscale folded in);
    nb [H, W, Co] (noise*nw + bias); s0p1/s1 [B, Co].
    Returns [H, W, Co, B], or [3, H, W, B] when w_rgb [Co,3]/b_rgb [3]
    are given (ToRGB fused into the apply pass)."""
    h, w, ci, b = x.shape
    co = k_hwio.shape[3]
    th, tw = _pick_tiles_conv(h, w, b, ci, co)
    nh, nw = h // th, w // tw

    wp = _w_conv_packed(k_hwio).astype(x.dtype)
    nbt = nb.astype(x.dtype)                                   # [H, W, Co]

    common = dict(th=th, tw=tw, nh=nh, nw=nw, ci=ci, co=co)
    scratch = [pltpu.VMEM((2, th + 2, tw + 2, ci, b), x.dtype),
               pltpu.SemaphoreType.DMA((2,))]
    w_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    nb_spec = pl.BlockSpec((th, tw, co), lambda g: (g // nw, g % nw, 0),
                           memory_space=pltpu.VMEM)
    coef_spec = pl.BlockSpec((2, co, b), lambda g: (0, 0, 0),
                             memory_space=pltpu.VMEM)

    sums = pl.pallas_call(
        functools.partial(_conv_stats_kernel, **common),
        grid=(nh * nw,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), w_spec, nb_spec],
        out_specs=pl.BlockSpec((2, co, b), lambda g: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, co, b), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(x, wp, nbt)

    coefs = _coefs_from_sums(sums, h * w, s0p1.T, s1.T, eps)   # [2, Co, B]

    if w_rgb is None:
        return pl.pallas_call(
            functools.partial(_conv_apply_kernel, **common),
            grid=(nh * nw,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY), w_spec, nb_spec,
                      coef_spec],
            out_specs=pl.BlockSpec((th, tw, co, b),
                                   lambda g: (g // nw, g % nw, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((h, w, co, b), x.dtype),
            scratch_shapes=scratch,
            compiler_params=_compiler_params(),
            interpret=_interpret(),
        )(x, wp, nbt, coefs)

    # ToRGB fused into the apply pass: the final Co-channel activation is
    # never written to HBM at all — only the [3, H, W, B] image (pad-free
    # minor dims (W, B)).
    return pl.pallas_call(
        functools.partial(_conv_rgb_apply_kernel, **common),
        grid=(nh * nw,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), w_spec, nb_spec,
                  coef_spec, pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((3, th, tw, b),
                               lambda g: (0, g // nw, g % nw, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, h, w, b), x.dtype),
        scratch_shapes=scratch,
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(x, wp, nbt, coefs,
      _w_rgb_packed(w_rgb, 4 * _conv_group_rows(co)).astype(x.dtype),
      _b_rgb_packed(b_rgb, 4 * _conv_group_rows(co)))


# ---------------------------------------------------------------------------
# up-half kernels
# ---------------------------------------------------------------------------

def _up_stats_kernel(x_ref, w_ref, nb_ref, sums_ref, scr2, yb, sems,
                     *, th, tw, nh, nw, ci, co):
    g = pl.program_id(0)
    i, j = g // nw, lax.rem(g, nw)

    @pl.when(g == 0)
    def _():
        sums_ref[:] = jnp.zeros_like(sums_ref)

    scr = _dma_tile_db(x_ref, scr2, sems, g, nh=nh, nw=nw, th=th, tw=tw)
    b = scr.shape[3]
    _up_rows(scr, w_ref, th, tw, ci, co, b, yb)
    t = _blur_t(yb, nb_ref, i, j, nh, nw, th, tw)
    sums_ref[0] += jnp.sum(t, axis=(0, 1))                     # [Co, B]
    sums_ref[1] += jnp.sum(t * t, axis=(0, 1))


def _up_apply_kernel(x_ref, w_ref, nb_ref, coef_ref, out_ref, scr2, yb, sems,
                     *, th, tw, nh, nw, ci, co):
    g = pl.program_id(0)
    i, j = g // nw, lax.rem(g, nw)
    scr = _dma_tile_db(x_ref, scr2, sems, g, nh=nh, nw=nw, th=th, tw=tw)
    b = scr.shape[3]
    _up_rows(scr, w_ref, th, tw, ci, co, b, yb)
    t = _blur_t(yb, nb_ref, i, j, nh, nw, th, tw)
    out = t * coef_ref[0][None, None] + coef_ref[1][None, None]
    out_ref[...] = out.astype(out_ref.dtype)


def _pick_tiles_up(h, w, b, ci, co):
    budget = 30 * 1024 * 1024

    def usage(th, tw):
        scr = 2 * (th + 2) * (tw + 4) * ci * b * 2
        yb = (2 * th + 2) * (2 * tw + 4) * co * b * 2
        t32 = 2 * (2 * th) * (2 * tw + 2) * co * b * 4
        out = 2 * (2 * th) * (2 * tw) * co * b * 2
        return scr + yb + t32 + out

    th = min(8, h)
    while h % th:
        th //= 2
    tw = w
    while tw > GROUP and (usage(th, tw) > budget or w % tw):
        tw //= 2
    return th, tw


def _up_impl(x, k4_hwio, nb, s0p1, s1, eps):
    """x [H, W, Ci, B]; k4_hwio [4,4,Ci,Co] (the models/stylegan._upconv
    kernel, wscale folded at conversion); nb [2H, 2W, Co]; s0p1/s1 [B, Co].
    Returns [2H, 2W, Co, B]."""
    h, w, ci, b = x.shape
    co = k4_hwio.shape[3]
    th, tw = _pick_tiles_up(h, w, b, ci, co)
    nh, nw = h // th, w // tw

    wp = _w_up_packed(k4_hwio).astype(x.dtype)                 # [2,8Co,3Ci]
    nbt = nb.astype(x.dtype)                                   # [2H, 2W, Co]

    common = dict(th=th, tw=tw, nh=nh, nw=nw, ci=ci, co=co)
    scratch = [pltpu.VMEM((2, th + 2, tw + 4, ci, b), x.dtype),
               pltpu.VMEM((2 * th + 2, 2 * tw + 4, co, b), x.dtype),
               pltpu.SemaphoreType.DMA((2,))]
    w_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    nb_spec = pl.BlockSpec((2 * th, 2 * tw, co),
                           lambda g: (g // nw, g % nw, 0),
                           memory_space=pltpu.VMEM)

    sums = pl.pallas_call(
        functools.partial(_up_stats_kernel, **common),
        grid=(nh * nw,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), w_spec, nb_spec],
        out_specs=pl.BlockSpec((2, co, b), lambda g: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, co, b), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(x, wp, nbt)

    coefs = _coefs_from_sums(sums, 4 * h * w, s0p1.T, s1.T, eps)

    return pl.pallas_call(
        functools.partial(_up_apply_kernel, **common),
        grid=(nh * nw,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), w_spec, nb_spec,
                  pl.BlockSpec((2, co, b), lambda g: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((2 * th, 2 * tw, co, b),
                               lambda g: (g // nw, g % nw, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2 * h, 2 * w, co, b), x.dtype),
        scratch_shapes=scratch,
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(x, wp, nbt, coefs)


# ---------------------------------------------------------------------------
# Public entry points (custom_vjp: forward = Pallas, backward = XLA ref)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def conv_epilogue_bc(x, k_hwio, nb, s0p1, s1, eps=1e-8):
    """Fused conv3x3 -> +noise+bias -> lrelu -> instnorm -> AdaIN in the
    [H, W, C, B] layout. x [H, W, Ci, B]; k_hwio [3,3,Ci,Co] with wscale
    folded in; nb = noise*noise_weight + bias [H, W, Co]; s0p1/s1 [B, Co]."""
    return _conv_impl(x, k_hwio, nb, s0p1, s1, eps)


def _conv_fwd(x, k_hwio, nb, s0p1, s1, eps):
    return _conv_impl(x, k_hwio, nb, s0p1, s1, eps), \
        (x, k_hwio, nb, s0p1, s1)


def _conv_bwd(eps, res, g):
    _, vjp = jax.vjp(lambda *a: _conv_ref(*a, eps), *res)
    return vjp(g)


conv_epilogue_bc.defvjp(_conv_fwd, _conv_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def conv_epilogue_rgb_bc(x, k_hwio, nb, s0p1, s1, w_rgb, b_rgb, eps=1e-8):
    """conv_epilogue_bc with the 1x1 ToRGB head fused into the apply pass:
    the final Co-channel activation never touches HBM. w_rgb [Co, 3]
    (with the 1/sqrt(Co) wscale folded in); b_rgb [3].
    Returns [3, H, W, B]."""
    return _conv_impl(x, k_hwio, nb, s0p1, s1, eps, w_rgb, b_rgb)


def _conv_rgb_fwd(x, k_hwio, nb, s0p1, s1, w_rgb, b_rgb, eps):
    return _conv_impl(x, k_hwio, nb, s0p1, s1, eps, w_rgb, b_rgb), \
        (x, k_hwio, nb, s0p1, s1, w_rgb, b_rgb)


def _conv_rgb_bwd(eps, res, g):
    _, vjp = jax.vjp(lambda *a: _conv_rgb_ref(*a, eps), *res)
    return vjp(g)


conv_epilogue_rgb_bc.defvjp(_conv_rgb_fwd, _conv_rgb_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def upconv_blur_epilogue_bc(x, k4_hwio, nb, s0p1, s1, eps=1e-8):
    """Fused 4x4-stride-2 up-conv -> blur3x3 -> +noise+bias -> lrelu ->
    instnorm -> AdaIN in the [H, W, C, B] layout. x [H, W, Ci, B]; k4_hwio
    [4,4,Ci,Co] (models/stylegan._upconv kernel, wscale folded at
    conversion); nb [2H, 2W, Co]; s0p1/s1 [B, Co]. Returns [2H,2W,Co,B]."""
    return _up_impl(x, k4_hwio, nb, s0p1, s1, eps)


def _up_fwd(x, k4_hwio, nb, s0p1, s1, eps):
    return _up_impl(x, k4_hwio, nb, s0p1, s1, eps), \
        (x, k4_hwio, nb, s0p1, s1)


def _up_bwd(eps, res, g):
    _, vjp = jax.vjp(lambda *a: _upconv_ref(*a, eps), *res)
    return vjp(g)


upconv_blur_epilogue_bc.defvjp(_up_fwd, _up_bwd)


# ---------------------------------------------------------------------------
# Chain mode: deferred-affine fused layers (ONE traversal per layer),
# as full-width row-streaming kernels.
#
# Each layer's instnorm+AdaIN is an affine (a, off) per (C, B) computed
# from that layer's t statistics. Instead of a second apply pass, t is
# written to HBM RAW and the affine is applied by the NEXT layer's kernel
# right after the tile DMA (a single in-VMEM traversal). A layer then
# costs exactly read(in) + write(out) of HBM traffic — the >=512^2 tail
# drops from XLA's ~45 GB to ~23 GB per 128-batch. Only the final ToRGB
# layer needs its own stats pass (its affine has no downstream reader).
#
# Round 2 shipped chain mode default-OFF: the 2-D-tiled kernels lost to
# XLA by ~18% despite the traffic savings, because (a) VMEM budgets
# forced 8x16-pixel tiles — 2048 grid steps per 1024^2 pass at ~7 us of
# fixed per-step cost, plus (th+2)(tw+2)/(th*tw) halo re-read traffic —
# and (b) the up kernels materialised the whole deconv grid and a full
# f32 t tile before blurring, serialising the MXU and VPU phases.
#
# The round-3 kernels stream FULL-WIDTH ROWS instead:
#   * 1-D grid over row blocks; the 2 halo rows every tile needs are
#     carried in VMEM from the previous (sequential) grid step, so every
#     input byte is DMA'd exactly once and the next tile's fresh rows
#     prefetch during this tile's compute;
#   * the up kernels deconv ONE yb row pair per inner step and blur +
#     noise + lrelu the previous pair immediately (a 2-slot pair ring),
#     so MXU dots and VPU blur interleave and no full-tile t buffer
#     exists — the freed VMEM goes to row width;
#   * column work is chunked (cwg 4-pixel groups per fori step) to bound
#     unrolled code size without paying per-group loop overhead.
#
# Grid steps per 1024^2 pass drop 2048 -> 128-512, halo traffic to zero.
# Measured per-layer timings vs the round-2 kernels: docs/PERF.md.
# ---------------------------------------------------------------------------

# Tunable so kernel-shape experiments (tools/tail_kernel_bench) can probe
# larger row blocks without an edit; v5e VMEM is 128 MB total.
_STREAM_BUDGET = int(os.environ.get("CFR_TAIL_VMEM_BUDGET_MB", "100")) \
    * 1024 * 1024


def _stream_cases(idx, nh, th):
    """Fresh-row DMA cases (pred, src_row0, dst_row0, nrows) for tile
    `idx` of the rolling full-width scheme. Slot rows [0 .. th+1] hold
    input rows [idx*th-1 .. idx*th+th]; rows 0..1 arrive by carry from
    the previous tile (or are the zero top halo), so the fresh rows are
    [idx*th+1 .. idx*th+th] clipped to the image — plus row 0 itself on
    the first tile, which has no predecessor to carry from. Cases with
    zero fresh rows (th == 1 on the last tile) are omitted entirely."""
    if nh == 1:
        return [(idx == 0, 0, 1, th)]
    cases = [(idx == 0, 0, 1, th + 1)]
    if th > 1:
        cases.append((idx == nh - 1, idx * th + 1, 2, th - 1))
    cases.append((jnp.logical_and(idx > 0, idx < nh - 1),
                  idx * th + 1, 2, th))
    return cases


def _stream_dma(x_ref, scr2, sems, idx, slot, *, nh, th, w, start):
    """Start (or wait for) tile `idx`'s fresh-row copy into scr2[slot].
    Image cols land at scr cols [1 .. w]; the border cols (the convs'
    zero padding) are zeroed once at grid step 0 and never written."""
    for pred, r0, d0, n in _stream_cases(idx, nh, th):
        @pl.when(pred)
        def _(r0=r0, d0=d0, n=n):
            cp = pltpu.make_async_copy(
                x_ref.at[pl.ds(r0, n)],
                scr2.at[slot, pl.ds(d0, n), pl.ds(1, w)],
                sems.at[slot])
            if start:
                cp.start()
            else:
                cp.wait()


def _stream_setup(x_ref, scr2, sems, i, aff_ref, *, nh, th, w, apply_aff):
    """Per-grid-step prologue of the rolling scheme: wait for this tile's
    fresh rows, zero the stale bottom halo row on the last tile, copy the
    2 carry rows for the NEXT tile and prefetch its fresh rows (both
    overlap this tile's compute), then apply the producing layer's
    deferred affine to the freshly arrived rows only — carried rows were
    affined last step, and the zero halo rows/cols must stay zero
    (0*a + off != 0). Returns the active slot index."""
    cur = lax.rem(i, 2)
    nxt = lax.rem(i + 1, 2)
    _, _, wpad, ci, b = scr2.shape

    @pl.when(i == 0)
    def _():
        # First use of the scratch: zero the border cols (fresh DMAs only
        # ever write cols [1 .. w], carries copy full rows whose borders
        # are already zero — so these stay zero for the whole grid) and
        # the top halo row, then self-start tile 0's DMA. Zeroing is
        # SLICE-wise: a whole-buffer zero materialises a scratch-sized
        # zeros temp that alone blows the 128 MB VMEM budget.
        zc = jnp.zeros((th + 2, 1, ci, b), scr2.dtype)
        for s in range(2):
            scr2[s, :, 0:1] = zc
            for c in range(w + 1, wpad):
                scr2[s, :, c:c + 1] = zc
        scr2[0, 0:1] = jnp.zeros((1, wpad, ci, b), scr2.dtype)
        _stream_dma(x_ref, scr2, sems, 0, 0, nh=nh, th=th, w=w, start=True)

    _stream_dma(x_ref, scr2, sems, i, cur, nh=nh, th=th, w=w, start=False)

    @pl.when(i == nh - 1)
    def _():
        # Bottom halo: this slot's row th+1 is stale (or, single-tile
        # grids, never written).
        scr2[cur, th + 1:th + 2] = jnp.zeros((1, wpad, ci, b), scr2.dtype)

    @pl.when(i + 1 < nh)
    def _():
        # Prefetch the next tile's fresh rows (dst rows [2:] — disjoint
        # from the carry rows [0:2] copied below, so it can start before
        # the affine runs on this tile).
        _stream_dma(x_ref, scr2, sems, i + 1, nxt, nh=nh, th=th, w=w,
                    start=True)

    if apply_aff:
        # Row-wise RMW: a single multi-row slice value here costs a
        # slice-sized register-allocator spill slot (measured: 72 MB of
        # spills and 2x VMEM traffic on the 1024^2 layers).
        a = aff_ref[0].astype(scr2.dtype)
        off = aff_ref[1].astype(scr2.dtype)
        for pred, _, d0, n in _stream_cases(i, nh, th):
            @pl.when(pred)
            def _(d0=d0, n=n):
                def rowfn(r, c):
                    scr2[cur, pl.ds(d0 + r, 1), pl.ds(1, w)] = (
                        scr2[cur, pl.ds(d0 + r, 1), pl.ds(1, w)]
                        * a[None, None] + off[None, None])
                    return c

                lax.fori_loop(0, n, rowfn, 0)

    @pl.when(i + 1 < nh)
    def _():
        # Carry the 2 halo rows the next tile needs — AFTER the affine,
        # so carried rows arrive already-affined (they are not covered by
        # the next step's fresh-row affine).
        scr2[nxt, 0:1] = scr2[cur, th:th + 1]
        scr2[nxt, 1:2] = scr2[cur, th + 1:th + 2]
    return cur


def _pick_cwg(ng, cap=16):
    """Largest divisor of ng up to cap (column groups per inner step)."""
    c = cap
    while ng % c:
        c //= 2
    return c


def _pick_th_up(h, w, b, ci, co):
    """Input rows per grid step for the streaming up kernel."""
    def usage(th):
        scr = 2 * (th + 2) * (w + 4) * ci * b * 2
        out = 2 * (2 * th) * (2 * w) * co * b * 2
        yb = 2 * 2 * (2 * w + 4) * co * b * 2
        tr = 10 * 1024 * 1024               # chunk-sized blur transients
        return scr + out + yb + tr

    th = min(h, 8)
    while th > 1 and (h % th or usage(th) > _STREAM_BUDGET):
        th //= 2
    return th


def _pick_th_conv_s(h, w, b, ci, co, *, with_out=True):
    """Rows per grid step for the streaming conv kernels (multiple of the
    M-packed group height gr)."""
    gr = _conv_group_rows(co)

    def usage(th):
        scr = 2 * (th + 2) * (w + 2) * ci * b * 2
        out = 2 * th * w * co * b * 2 if with_out else 0
        return scr + out

    th = min(h, 8)
    while th > gr and (h % th or th % gr or usage(th) > _STREAM_BUDGET):
        th //= 2
    return th


def _up_stream_kernel(x_ref, w_ref, nb_ref, aff_ref, sums_ref, out_ref,
                      scr2, yb2, sems, *, th, nh, w, ci, co, cwg,
                      apply_aff):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        sums_ref[:] = jnp.zeros_like(sums_ref)

    cur = _stream_setup(x_ref, scr2, sems, i, aff_ref, nh=nh, th=th, w=w,
                        apply_aff=apply_aff)
    b = scr2.shape[4]
    wk = w_ref[:]
    ng = (w + 2) // 2                  # yb col groups: cover cols [0, 2w+2)
    ncc = ng // cwg

    def one_group(k, slot, g):
        y = jnp.zeros((GROUP * co, b), jnp.float32)
        for a2 in range(2):
            rhs = scr2[cur, pl.ds(k + a2, 1), pl.ds(2 * g, 3)].reshape(
                3 * ci, b)
            y += jnp.dot(wk[a2], rhs, preferred_element_type=jnp.float32)
        yb2[slot, :, pl.ds(4 * g, 4)] = y.reshape(2, 4, co, b).astype(
            yb2.dtype)

    def deconv_pair(k, slot):
        def chunk(cc, c):
            for u in range(cwg):
                one_group(k, slot, cc * cwg + u)
            return c

        lax.fori_loop(0, ncc, chunk, 0)
        for u in range(ng - ncc * cwg):
            one_group(k, slot, ncc * cwg + u)
        # Out-of-image blur halo cols of the yb grid (the deconv's values
        # there are the uncropped transpose-conv, not the zero padding the
        # blur must see).
        yb2[slot, :, 0:1] = jnp.zeros((2, 1, co, b), yb2.dtype)
        yb2[slot, :, 2 * w + 1:2 * w + 2] = jnp.zeros((2, 1, co, b),
                                                      yb2.dtype)

    # The yb pair ring is keyed on the GLOBAL pair index i*th + k: tile
    # i+1's warm-up pair (its input rows 0..1 = tile i's rows th..th+1,
    # both already affined) is exactly tile i's last pair and is already
    # sitting in the right slot — so only tile 0 deconvs a warm-up pair.
    # Recomputing it every step cost (th+1)/th of the deconv MXU work.
    # (Round-3b experiment, measured and REJECTED: a 3-slot ring with
    # per-tile static slot indices + the blur lagged two pairs behind the
    # deconv. The bigger ring pushed _pick_th_up to th=1 and the
    # end-of-tile warm-up-pair copy it requires costs a full extra yb
    # traversal per tile — up512 14.1 -> 14.6 ms, up1024 23.2 -> 24.2,
    # even with the VMEM budget raised so th=2 survives.)
    base = i * th

    @pl.when(i == 0)
    def _():
        deconv_pair(0, 0)
        # yb row 0 of the top tile is the out-of-image blur halo row.
        yb2[0, 0:1] = jnp.zeros((1, 2 * w + 4, co, b), yb2.dtype)

    q = jnp.asarray(0.25, yb2.dtype)
    hf = jnp.asarray(0.5, yb2.dtype)
    z = jnp.zeros((co, b), jnp.float32)
    # Blur/epilogue column chunking: values stay <= ~2 MB so Mosaic keeps
    # them out of giant register spill slots (see _stream_setup note).
    # Scaled inversely with co — a fixed 128 at co=128 made 8.5 MB slice
    # values and 43 MB of spill slots (VMEM OOM on the 128^2 layer).
    tcw = min(2 * w, max(8, 2048 // co))
    ntc = (2 * w) // tcw

    def body(k, carry):
        slot = lax.rem(base + k, 2)
        deconv_pair(k, slot)

        @pl.when(jnp.logical_and(k == th, i == nh - 1))
        def _():
            # last yb row of the bottom tile: out-of-image blur halo.
            yb2[slot, 1:2] = jnp.zeros((1, 2 * w + 4, co, b), yb2.dtype)

        prev = lax.rem(base + k + 1, 2)       # pair k-1's slot

        def blur_chunk(tc, carry):
            s1, s2 = carry
            c0 = tc * tcw
            p = yb2[prev, :, pl.ds(c0, tcw + 2)]   # [2, tcw+2, co, b]
            c = yb2[slot, :, pl.ds(c0, tcw + 2)]
            # t rows 2k-2 / 2k-1 blur yb rows (2k-2, 2k-1, 2k) /
            # (2k-1, 2k, 2k+1); blur in the activation dtype, epilogue f32.
            v0 = (p[0] + c[0]) * q + p[1] * hf
            v1 = (p[1] + c[1]) * q + c[0] * hf

            def hb(v):
                return (v[0:tcw] + v[2:tcw + 2]) * q + v[1:tcw + 1] * hf

            t = jnp.stack([hb(v0), hb(v1)])        # [2, tcw, co, b]
            nbc = nb_ref[pl.ds(2 * k - 2, 2), pl.ds(c0, tcw)]
            t = _lrelu(t.astype(jnp.float32)
                       + nbc.astype(jnp.float32)[..., None])
            out_ref[pl.ds(2 * k - 2, 2), pl.ds(c0, tcw)] = t.astype(
                out_ref.dtype)
            return (s1 + jnp.sum(t, axis=(0, 1)),
                    s2 + jnp.sum(t * t, axis=(0, 1)))

        return lax.fori_loop(0, ntc, blur_chunk, carry)

    s1_, s2_ = lax.fori_loop(1, th + 1, body, (z, z))
    sums_ref[0] += s1_
    sums_ref[1] += s2_


def _conv_stream_body(scr2, cur, wk, nb_ref, ybc, *, th, w, ci, co, b, cwg,
                      consume):
    """Software-pipelined fori over (row block, column chunk) of cwg
    4-col groups. Each iteration ISSUES chunk idx's M-packed MXU dots
    into the f32 ring ybc[idx%2] and then VPU-processes chunk idx-1
    (noise+bias+lrelu + consume(r0, cc, t)) out of the other slot — the
    two halves are data-independent, so Mosaic's scheduler overlaps the
    MXU dots with the previous chunk's VPU epilogue instead of
    serialising them (the round-2 kernels' main loss; docs/PERF.md).
    Chunk-sized (~1-2 MB) values stay out of slice-sized register spill
    slots, and chunk offsets (multiples of 4*cwg >= 8) satisfy the
    sublane alignment of any (w, ...)-minor operand.

    Returns (prologue, body, epilogue, n): run prologue(), fori body over
    [1, n) threading the carry, then epilogue(carry) for the last chunk.
    """
    gr = _conv_group_rows(co)
    ncc = (w // 4) // cwg
    n = (th // gr) * ncc

    def dots(idx, slot):
        rb = idx // ncc
        cc = lax.rem(idx, ncc)
        r0 = rb * gr
        cols = []
        for u in range(cwg):
            g = cc * cwg + u
            y = jnp.zeros((gr * 4 * co, b), jnp.float32)
            for dr in range(gr + 2):
                rhs = scr2[cur, pl.ds(r0 + dr, 1), pl.ds(4 * g, 6)
                           ].reshape(6 * ci, b)
                y += jnp.dot(wk[dr], rhs, preferred_element_type=jnp.float32)
            cols.append(y.reshape(gr, 4, co, b))
        ybc[slot] = jnp.concatenate(cols, axis=1)     # [gr, 4cwg, co, b]

    def process(idx, slot, carry):
        rb = idx // ncc
        cc = lax.rem(idx, ncc)
        r0 = rb * gr
        nbc = nb_ref[pl.ds(r0, gr), pl.ds(4 * cwg * cc, 4 * cwg)]
        t = _lrelu(ybc[slot] + nbc.astype(jnp.float32)[..., None])
        return consume(r0, cc, t, carry)

    def prologue():
        dots(0, 0)

    # The body is unrolled 2x so every ybc slot index is STATIC: with the
    # earlier dynamic `rem(idx, 2)` slots Mosaic cannot prove the dots'
    # store and the previous chunk's load are disjoint and serialises the
    # MXU and VPU phases (measured: rgbapply1024 at its serial sum,
    # 22.3 ms). Static slots make the (dots i+1 || process i) pairs
    # provably independent. The fori runs over PAIRS; the leftover
    # chunk(s) are peeled into the epilogue with compile-time slots.
    def body(j, carry):
        idx = 2 * j + 1
        dots(idx, 1)
        carry = process(idx - 1, 0, carry)
        dots(idx + 1, 0)
        return process(idx, 1, carry)

    if n % 2 == 0:
        def epilogue(carry):
            dots(n - 1, (n - 1) % 2)
            carry = process(n - 2, (n - 2) % 2, carry)
            return process(n - 1, (n - 1) % 2, carry)
    else:
        def epilogue(carry):
            return process(n - 1, (n - 1) % 2, carry)

    # body pairs cover idx 1..2*((n-1)//2), i.e. everything the epilogue
    # doesn't peel; returns the PAIR count for the fori over [0, pairs).
    return prologue, body, epilogue, (n - 1) // 2


def _conv_stream_kernel(x_ref, w_ref, nb_ref, aff_ref, sums_ref, out_ref,
                        scr2, ybc, sems, *, th, nh, w, ci, co, cwg,
                        apply_aff):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        sums_ref[:] = jnp.zeros_like(sums_ref)

    cur = _stream_setup(x_ref, scr2, sems, i, aff_ref, nh=nh, th=th, w=w,
                        apply_aff=apply_aff)
    b = scr2.shape[4]
    gr = _conv_group_rows(co)

    def consume(r0, cc, t, carry):
        out_ref[pl.ds(r0, gr), pl.ds(4 * cwg * cc, 4 * cwg)] = t.astype(
            out_ref.dtype)
        return (carry[0] + jnp.sum(t, axis=(0, 1)),
                carry[1] + jnp.sum(t * t, axis=(0, 1)))

    pro, body, epi, n = _conv_stream_body(
        scr2, cur, w_ref[:], nb_ref, ybc, th=th, w=w, ci=ci, co=co, b=b,
        cwg=cwg, consume=consume)
    z = jnp.zeros((co, b), jnp.float32)
    pro()
    s1_, s2_ = epi(lax.fori_loop(0, n, body, (z, z)))
    sums_ref[0] += s1_
    sums_ref[1] += s2_


def _conv_stats_stream_kernel(x_ref, w_ref, nb_ref, aff_ref, sums_ref,
                              scr2, ybc, sems, *, th, nh, w, ci, co, cwg,
                              apply_aff):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        sums_ref[:] = jnp.zeros_like(sums_ref)

    cur = _stream_setup(x_ref, scr2, sems, i, aff_ref, nh=nh, th=th, w=w,
                        apply_aff=apply_aff)
    b = scr2.shape[4]

    def consume(r0, cc, t, carry):
        return (carry[0] + jnp.sum(t, axis=(0, 1)),
                carry[1] + jnp.sum(t * t, axis=(0, 1)))

    pro, body, epi, n = _conv_stream_body(
        scr2, cur, w_ref[:], nb_ref, ybc, th=th, w=w, ci=ci, co=co, b=b,
        cwg=cwg, consume=consume)
    z = jnp.zeros((co, b), jnp.float32)
    pro()
    s1_, s2_ = epi(lax.fori_loop(0, n, body, (z, z)))
    sums_ref[0] += s1_
    sums_ref[1] += s2_


def _conv_rgb_stream_kernel(x_ref, w_ref, nb_ref, aff_ref, coef_ref,
                            wrgb_ref, brgb_ref, out_ref, scr2, ybc, sems,
                            *, th, nh, w, ci, co, cwg, apply_aff):
    i = pl.program_id(0)
    cur = _stream_setup(x_ref, scr2, sems, i, aff_ref, nh=nh, th=th, w=w,
                        apply_aff=apply_aff)
    b = scr2.shape[4]
    gr = _conv_group_rows(co)
    a_c, off_c = coef_ref[0], coef_ref[1]
    wrgb = wrgb_ref[:]

    def consume(r0, cc, t, carry):
        out = (t * a_c[None, None] + off_c[None, None]).astype(
            out_ref.dtype)                            # [gr, 4cwg, co, b]
        cols = []
        for u in range(cwg):
            chunk = out[:, u * 4:(u + 1) * 4]         # [gr, 4, co, b]
            v = jnp.dot(wrgb, chunk.reshape(gr * 4 * co, b),
                        preferred_element_type=jnp.float32)
            v = v + brgb_ref[:]                       # [3*gr*4, b]
            cols.append(v.reshape(3, gr, 4, b))
        rgb = jnp.concatenate(cols, axis=2)           # [3, gr, 4cwg, b]
        out_ref[:, pl.ds(r0, gr), pl.ds(4 * cwg * cc, 4 * cwg)] = (
            rgb.astype(out_ref.dtype))
        return carry

    pro, body, epi, n = _conv_stream_body(
        scr2, cur, w_ref[:], nb_ref, ybc, th=th, w=w, ci=ci, co=co, b=b,
        cwg=cwg, consume=consume)
    pro()
    epi(lax.fori_loop(0, n, body, 0))


def _up_fused(x, k4_hwio, nb, aff, eps, *, apply_aff=True):
    """One-traversal up layer (chain mode): the producing layer's deferred
    affine `aff` [2, Ci, B] f32 is applied to x on read. Returns
    (t_raw [2H, 2W, Co, B], sums [2, Co, B])."""
    h, w, ci, b = x.shape
    co = k4_hwio.shape[3]
    th = _pick_th_up(h, w, b, ci, co)
    nh = h // th
    cwg = min(16, (w + 2) // 2)
    wp = _w_up_packed(k4_hwio).astype(x.dtype)
    nbt = nb.astype(x.dtype)

    sums, t_raw = pl.pallas_call(
        functools.partial(_up_stream_kernel, th=th, nh=nh, w=w, ci=ci,
                          co=co, cwg=cwg, apply_aff=apply_aff),
        grid=(nh,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((2 * th, 2 * w, co), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((2, ci, b), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((2, co, b), lambda i: (0, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((2 * th, 2 * w, co, b),
                                lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((2, co, b), jnp.float32),
                   jax.ShapeDtypeStruct((2 * h, 2 * w, co, b), x.dtype)],
        scratch_shapes=[pltpu.VMEM((2, th + 2, w + 4, ci, b), x.dtype),
                        pltpu.VMEM((2, 2, 2 * w + 4, co, b), x.dtype),
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(x, wp, nbt, aff)
    return t_raw, sums


def _conv_fused(x, k_hwio, nb, aff, eps, *, apply_aff=True):
    """One-traversal conv layer (chain mode): returns (t_raw, sums)."""
    h, w, ci, b = x.shape
    co = k_hwio.shape[3]
    th = _pick_th_conv_s(h, w, b, ci, co)
    nh = h // th
    cwg = _pick_cwg(w // 4, cap=max(2, 2048 // (4 * co)))
    wp = _w_conv_packed(k_hwio).astype(x.dtype)
    nbt = nb.astype(x.dtype)

    sums, t_raw = pl.pallas_call(
        functools.partial(_conv_stream_kernel, th=th, nh=nh, w=w, ci=ci,
                          co=co, cwg=cwg, apply_aff=apply_aff),
        grid=(nh,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((th, w, co), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((2, ci, b), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((2, co, b), lambda i: (0, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((th, w, co, b), lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((2, co, b), jnp.float32),
                   jax.ShapeDtypeStruct((h, w, co, b), x.dtype)],
        scratch_shapes=[pltpu.VMEM((2, th + 2, w + 2, ci, b), x.dtype),
                        pltpu.VMEM((2, _conv_group_rows(co), 4 * cwg, co,
                                    b), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(x, wp, nbt, aff)
    return t_raw, sums


def _final_stats(x, k_hwio, nb, aff, eps, *, apply_aff=True):
    """Stats pass of the final conv layer (timeable in isolation —
    tools/tail_kernel_bench 'rgbstats1024'). Returns sums [2, Co, B]."""
    h, w, ci, b = x.shape
    co = k_hwio.shape[3]
    cwg = _pick_cwg(w // 4, cap=max(2, 2048 // (4 * co)))
    wp = _w_conv_packed(k_hwio).astype(x.dtype)
    nbt = nb.astype(x.dtype)
    w_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    aff_spec = pl.BlockSpec((2, ci, b), lambda i: (0, 0, 0),
                            memory_space=pltpu.VMEM)

    th = _pick_th_conv_s(h, w, b, ci, co, with_out=False)
    nh = h // th
    return pl.pallas_call(
        functools.partial(_conv_stats_stream_kernel, th=th, nh=nh, w=w,
                          ci=ci, co=co, cwg=cwg, apply_aff=apply_aff),
        grid=(nh,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), w_spec,
                  pl.BlockSpec((th, w, co), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM), aff_spec],
        out_specs=pl.BlockSpec((2, co, b), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, co, b), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, th + 2, w + 2, ci, b), x.dtype),
                        pltpu.VMEM((2, _conv_group_rows(co), 4 * cwg, co,
                                    b), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(x, wp, nbt, aff)


def _final_apply(x, k_hwio, nb, aff, coefs, w_rgb, b_rgb, *,
                 apply_aff=True):
    """Apply+ToRGB pass of the final conv layer (timeable in isolation).
    coefs [2, Co, B] f32 is the final layer's own folded affine."""
    h, w, ci, b = x.shape
    co = k_hwio.shape[3]
    cwg = _pick_cwg(w // 4, cap=max(2, 2048 // (4 * co)))
    wp = _w_conv_packed(k_hwio).astype(x.dtype)
    nbt = nb.astype(x.dtype)
    w_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    aff_spec = pl.BlockSpec((2, ci, b), lambda i: (0, 0, 0),
                            memory_space=pltpu.VMEM)

    th = _pick_th_conv_s(h, w, b, ci, co, with_out=False)
    nh = h // th
    return pl.pallas_call(
        functools.partial(_conv_rgb_stream_kernel, th=th, nh=nh, w=w,
                          ci=ci, co=co, cwg=cwg, apply_aff=apply_aff),
        grid=(nh,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), w_spec,
                  pl.BlockSpec((th, w, co), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM), aff_spec,
                  pl.BlockSpec((2, co, b), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((3, th, w, b), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, h, w, b), x.dtype),
        scratch_shapes=[pltpu.VMEM((2, th + 2, w + 2, ci, b), x.dtype),
                        pltpu.VMEM((2, _conv_group_rows(co), 4 * cwg, co,
                                    b), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(x, wp, nbt, aff, coefs,
      _w_rgb_packed(w_rgb, 4 * _conv_group_rows(co)).astype(x.dtype),
      _b_rgb_packed(b_rgb, 4 * _conv_group_rows(co)))


def _conv_rgb_final(x, k_hwio, nb, aff, s0p1, s1, w_rgb, b_rgb, eps, *,
                    apply_aff=True):
    """Final conv layer: its affine has no downstream reader, so it keeps
    a two-pass (stats, then apply fused with ToRGB) structure — with the
    INPUT affine still applied on read in both passes. Returns
    [3, H, W, B]; the final Co-channel activation never touches HBM."""
    h, w, _, _ = x.shape
    sums = _final_stats(x, k_hwio, nb, aff, eps, apply_aff=apply_aff)
    coefs = _coefs_from_sums(sums, h * w, s0p1.T, s1.T, eps)
    return _final_apply(x, k_hwio, nb, aff, coefs, w_rgb, b_rgb,
                        apply_aff=apply_aff)


def _chain_impl(x, blocks, eps):
    b = x.shape[3]
    # The chain input is the NORMALISED 256^2-block output — its "deferred
    # affine" is the identity, so the first kernel skips the apply pass.
    aff = jnp.stack([jnp.ones((x.shape[2], b), jnp.float32),
                     jnp.zeros((x.shape[2], b), jnp.float32)])
    cur = x
    for li, blk in enumerate(blocks):
        cur, sums = _up_fused(cur, blk["k4"], blk["up_nb"], aff, eps,
                              apply_aff=li > 0)
        n = cur.shape[0] * cur.shape[1]
        aff = _coefs_from_sums(sums, n, blk["up_s0p1"].T, blk["up_s1"].T,
                               eps)
        if li < len(blocks) - 1:
            cur, sums = _conv_fused(cur, blk["k"], blk["conv_nb"], aff, eps)
            aff = _coefs_from_sums(sums, n, blk["conv_s0p1"].T,
                                   blk["conv_s1"].T, eps)
        else:
            return _conv_rgb_final(cur, blk["k"], blk["conv_nb"], aff,
                                   blk["conv_s0p1"], blk["conv_s1"],
                                   blk["w_rgb"], blk["b_rgb"], eps)


def _chain_ref(x, blocks, eps, remat=False):
    """XLA reference for the whole chain. remat=True mirrors the default
    XLA path's memory discipline (models/stylegan._synthesis_block): each
    half-layer of every >=512^2 block is its own jax.checkpoint, so the
    chain backward holds one half-layer's activations instead of the whole
    un-rematerialised tail (which OOMs 16 GB HBM at attack batch 32)."""
    wrap = jax.checkpoint if remat else (lambda f: f)

    cur = x
    for li, blk in enumerate(blocks):
        cur = wrap(lambda c, b: _upconv_ref(
            c, b["k4"], b["up_nb"], b["up_s0p1"], b["up_s1"], eps))(cur, blk)
        if li < len(blocks) - 1:
            cur = wrap(lambda c, b: _conv_ref(
                c, b["k"], b["conv_nb"], b["conv_s0p1"], b["conv_s1"],
                eps))(cur, blk)
        else:
            return wrap(lambda c, b: _conv_rgb_ref(
                c, b["k"], b["conv_nb"], b["conv_s0p1"], b["conv_s1"],
                b["w_rgb"], b["b_rgb"], eps))(cur, blk)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def tail_chain_bc(x, blocks, eps=1e-8):
    """The whole >=512^2 tail as a chain of deferred-affine fused layers.

    x [H, W, Ci, B] (the NORMALISED 256^2-block output in CB layout);
    blocks: tuple of dicts with keys k4 [4,4,Ci,Co] (up-conv kernel),
    up_nb [2H,2W,Co], up_s0p1/up_s1 [B,Co], k [3,3,Co,Co] (wscale
    folded), conv_nb, conv_s0p1, conv_s1, and on the LAST block
    w_rgb [Co,3] / b_rgb [3]. Returns the image [3, H_out, W_out, B]."""
    return _chain_impl(x, blocks, eps)


def _chain_fwd(x, blocks, eps):
    return _chain_impl(x, blocks, eps), (x, blocks)


def _chain_bwd(eps, res, g):
    x, blocks = res
    _, vjp = jax.vjp(lambda x, blocks: _chain_ref(x, blocks, eps,
                                                  remat=True), x, blocks)
    return vjp(g)


tail_chain_bc.defvjp(_chain_fwd, _chain_bwd)
