"""StyleGAN-1 generator, TPU-native (functional JAX, NHWC).

Re-design of the reference PyTorch implementation
(/root/reference/models/stylegan_generator_model.py) with the same numerical
semantics but TPU-first structure:

  * pure ``apply(params, x)`` functions over a parameter pytree, fully
    jit/vmap/grad-safe — no modules, no host round-trips;
  * NHWC activations / HWIO kernels (MXU-friendly layouts);
  * the fused-scale transposed conv (stylegan_generator_model.py:643-672,
    used for resolutions >= 128) has its 4x4 kernel precomputed at weight
    conversion time instead of being rebuilt every forward pass;
  * intermediate ToRGB heads are skipped (the reference computes and
    discards one per resolution, stylegan_generator_model.py:380-395);
  * optional bfloat16 compute (instance-norm statistics stay f32).

Equalised-learning-rate (wscale) conventions, truncation buffers, fixed
per-layer noise and the AdaIN style modulation all match the reference —
see convert_torch_state_dict for the exact mapping.
"""

from __future__ import annotations

import functools
import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import nn
from ..constants import (STYLEGAN_TRUNCATION_LAYERS, STYLEGAN_TRUNCATION_PSI)

# Resolution -> per-block channel counts (stylegan_generator_model.py:23-32).
RESOLUTIONS_TO_CHANNELS = {
    8: [512, 512, 512],
    16: [512, 512, 512, 512],
    32: [512, 512, 512, 512, 512],
    64: [512, 512, 512, 512, 512, 256],
    128: [512, 512, 512, 512, 512, 256, 128],
    256: [512, 512, 512, 512, 512, 256, 128, 64],
    512: [512, 512, 512, 512, 512, 256, 128, 64, 32],
    1024: [512, 512, 512, 512, 512, 256, 128, 64, 32, 16],
}

# Minimal resolution for the `auto` fused-scale strategy
# (stylegan_generator_model.py:192).
AUTO_FUSED_SCALE_MIN_RES = 128

W_DIM = 512
MAPPING_LAYERS = 8
MAPPING_LR_MULT = 0.01


def num_layers(resolution: int) -> int:
    return int(np.log2(resolution)) * 2 - 2


def is_fused_layer(layer_idx: int) -> bool:
    """Up-conv layers at resolution >= 128 use the fused transposed conv."""
    cur_res = 2 ** (layer_idx // 2 + 2)
    return cur_res >= AUTO_FUSED_SCALE_MIN_RES


def _wscale(fan_in: int, gain: float = math.sqrt(2.0), lr_mult: float = 1.0
            ) -> float:
    """Runtime equalised-lr scale (stylegan_generator_model.py:508-535)."""
    return gain / math.sqrt(fan_in) * lr_mult


# ---------------------------------------------------------------------------
# Forward passes
# ---------------------------------------------------------------------------

def mapping_apply(params: Dict, z: jnp.ndarray, *,
                  dtype=jnp.float32) -> jnp.ndarray:
    """8-layer mapping network Z -> W (stylegan_generator_model.py:265-295)."""
    prec = nn.precision_for(dtype)
    x = nn.pixel_norm(z.astype(dtype))
    scale = _wscale(W_DIM, lr_mult=MAPPING_LR_MULT)
    for i in range(MAPPING_LAYERS):
        p = params["mapping"][f"dense{i}"]
        x = nn.dense(x, p["weight"].astype(dtype), precision=prec)
        x = x * scale + p["bias"].astype(dtype) * MAPPING_LR_MULT
        x = nn.lrelu(x)
    return x


def truncation_apply(params: Dict, w: jnp.ndarray, *, resolution: int,
                     truncation_psi: Optional[float] = STYLEGAN_TRUNCATION_PSI,
                     truncation_layers: int = STYLEGAN_TRUNCATION_LAYERS
                     ) -> jnp.ndarray:
    """W [B,512] -> W+ [B,L,512] with psi-truncation toward w_avg
    (stylegan_generator_model.py:298-328)."""
    L = num_layers(resolution)
    if w.ndim == 2:
        wp = jnp.broadcast_to(w[:, None, :], (w.shape[0], L, W_DIM))
    else:
        wp = w
    if truncation_psi is None:
        return wp
    coefs = np.ones((1, L, 1), np.float32)
    coefs[:, :truncation_layers, :] *= truncation_psi
    w_avg = params["truncation"]["w_avg"].reshape(1, 1, W_DIM)
    return w_avg + (wp - w_avg) * jnp.asarray(coefs, wp.dtype)


def _style(p: Dict, w_layer: jnp.ndarray, c: int, *, dtype, prec
           ) -> tuple:
    """AdaIN style affine (s0, s1): dense(512 -> 2C) with gain 1.0, lr 1.0,
    linear activation (stylegan_generator_model.py:487-505)."""
    style = nn.dense(w_layer, p["style_weight"].astype(dtype), precision=prec)
    style = style * _wscale(W_DIM, gain=1.0) + p["style_bias"].astype(dtype)
    return style[:, :c], style[:, c:]


def _epilogue(p: Dict, x: jnp.ndarray, w_layer: jnp.ndarray, *,
              dtype, prec) -> jnp.ndarray:
    """noise -> bias -> lrelu -> instance-norm -> AdaIN style modulation
    (stylegan_generator_model.py:538-565)."""
    x = x + p["noise"].astype(dtype)[None] * p["noise_weight"].astype(dtype)
    x = x + p["bias"].astype(dtype)
    x = nn.lrelu(x)
    x = nn.instance_norm(x)
    c = x.shape[-1]
    s0, s1 = _style(p, w_layer, c, dtype=dtype, prec=prec)
    return x * (s0[:, None, None, :] + 1.0) + s1[:, None, None, :]


def _bc_first_block(resolution: int, dtype) -> int:
    """First synthesis block handled by the BC-layout Pallas tail, or
    n_blocks+1 when the tail is off. Block bi's output resolution is
    2^(bi+1); the cut point is CFR_TAIL_MIN_RES (default 512 — where the
    XLA epilogues dominate), floored at the first fused-upconv block
    (128^2). bf16 only; the f32 path stays pure-XLA for bit parity with
    the torch reference."""
    import os

    n_blocks = len(RESOLUTIONS_TO_CHANNELS[resolution]) - 1
    if os.environ.get("CFR_TAIL", "") != "bc" or dtype != jnp.bfloat16:
        return n_blocks + 1
    min_res = int(os.environ.get("CFR_TAIL_MIN_RES", "512"))
    return max(6, int(np.log2(min_res)) - 1)


def bc_tail_active(resolution: int, dtype) -> bool:
    """True when synthesis_apply will end in the Pallas chain tail — i.e.
    when the pipeline can consume the image in the chain's native
    [3, H, W, B] layout (cb_out=True) and skip the full-resolution
    layout conversion."""
    n_blocks = len(RESOLUTIONS_TO_CHANNELS[resolution]) - 1
    return _bc_first_block(resolution, dtype) <= n_blocks


def cb_out_active(resolution: int, dtype) -> bool:
    """True when the pipeline should request cb_out=True: the Pallas chain
    tail emits [3, H, W, B] natively, and the pure-XLA bf16 path can emit
    the same layout from its final ToRGB (CFR_XLA_CB_RGB, default OFF —
    a round-4 same-session A/B measured the channel-outer ToRGB einsum as
    a ~16% headline regression, 852 vs 1,016 samples/s; the round-3b
    '+16% certify' claim was a cross-session confound. See docs/PERF.md
    'Round 4: the CFR_XLA_CB_RGB reconciliation')."""
    import os

    if bc_tail_active(resolution, dtype):
        return True
    return dtype == jnp.bfloat16 and \
        os.environ.get("CFR_XLA_CB_RGB", "0") == "1"


def synthesis_apply(params: Dict, wp: jnp.ndarray, *, resolution: int,
                    dtype=jnp.float32, cb_out: bool = False) -> jnp.ndarray:
    """W+ [B,L,512] -> image [B,H,W,3] in [-1, 1] (value range of the
    trained model). Reference: stylegan_generator_model.py:331-395 (lod=0).

    cb_out=True returns the [3, H, W, B] channel-outer layout instead —
    natively from the Pallas chain tail when it is active, otherwise from
    the final ToRGB expressed as a channel-outer matmul. The NHWC
    transpose of a 3-channel 1024^2 image is pathological on TPU (3
    channels pad to 128 lanes); consumers should resize straight from this
    layout (ops/resize.transform_for_frs_cb). Gate on cb_out_active."""
    channels = RESOLUTIONS_TO_CHANNELS[resolution]
    syn = params["synthesis"]
    prec = nn.precision_for(dtype)
    wp = wp.astype(dtype)
    B = wp.shape[0]

    # The >=512^2 blocks can run as the BC-layout Pallas tail (one layout
    # end-to-end, ToRGB fused — ops/synthesis_tail_bc.py).
    n_blocks = len(channels) - 1
    bc_first = _bc_first_block(resolution, dtype)

    # layer0: learned constant + epilogue.
    p0 = syn["layer0"]
    x = jnp.broadcast_to(p0["const"].astype(dtype)[None],
                         (B,) + p0["const"].shape)
    x = _epilogue(p0, x, wp[:, 0], dtype=dtype, prec=prec)

    for block_idx in range(1, min(len(channels), bc_first)):
        # Each resolution block is rematerialised (jax.checkpoint): free on
        # the forward-only certify path, and it caps the attack backward's
        # peak memory at one block's activations instead of the whole
        # 1024^2 synthesis (which OOMs 16 GB HBM at batch 20 already).
        block_params = {
            k: syn[k] for k in (f"layer{2 * block_idx - 2}",
                                f"layer{2 * block_idx - 1}")
            if k in syn
        }
        x = jax.checkpoint(
            lambda x, bp, wp, bi=block_idx: _synthesis_block(
                bp, x, wp, block_idx=bi, dtype=dtype, prec=prec),
            static_argnums=())(x, block_params, wp)

    if bc_first <= n_blocks:
        return _synthesis_tail_bc(syn, x, wp, bc_first=bc_first,
                                  n_blocks=n_blocks, channels=channels,
                                  dtype=dtype, prec=prec, cb_out=cb_out)

    # Final ToRGB only (intermediate heads are dead work at lod=0).
    po = syn[f"output{len(channels) - 2}"]
    scale = 1.0 / math.sqrt(x.shape[-1])
    if cb_out:
        # Channel-outer output [3, H, W, B]: the 1x1 conv as a matmul whose
        # result lands directly in the layout transform_for_frs_cb consumes.
        # NHWC [B,H,W,3] at full resolution is the pathological layout (3
        # channels against 128 lanes); this branch never materialises it.
        w_rgb = po["conv_weight"].reshape(x.shape[-1], 3).astype(dtype)
        img = jnp.einsum("bhwc,cr->rhwb", x, w_rgb, precision=prec) * scale
        return img + po["bias"].astype(dtype)[:, None, None, None]
    img = nn.conv2d_frozen(x, po["conv_weight"].astype(dtype),
                           ((0, 0), (0, 0)), 1, prec) * scale
    img = img + po["bias"].astype(dtype)
    return img


def _synthesis_tail_bc(syn: Dict, x: jnp.ndarray, wp: jnp.ndarray, *,
                       bc_first: int, n_blocks: int, channels, dtype,
                       prec, cb_out: bool = False) -> jnp.ndarray:
    """Run blocks [bc_first..n_blocks] + the final ToRGB as the BC-layout
    Pallas tail (ops/synthesis_tail_bc.py): the activation enters
    [H, W, B, C] once and never changes layout until the RGB image."""
    from ..ops import synthesis_tail_bc as bc

    def nb_of(p):
        return (p["noise"] * p["noise_weight"] + p["bias"]
                ).astype(jnp.float32)

    def styles(p, w_layer, c):
        s0, s1 = _style(p, w_layer, c, dtype=dtype, prec=prec)
        return (s0.astype(jnp.float32) + 1.0), s1.astype(jnp.float32)

    blocks = []
    for bi in range(bc_first, n_blocks + 1):
        co = channels[bi]
        p_up = syn[f"layer{2 * bi - 2}"]
        p_c = syn[f"layer{2 * bi - 1}"]
        s0p1_u, s1_u = styles(p_up, wp[:, 2 * bi - 2], co)
        s0p1_c, s1_c = styles(p_c, wp[:, 2 * bi - 1], co)
        blk = {
            "k4": p_up["tconv_kernel"],
            "up_nb": nb_of(p_up), "up_s0p1": s0p1_u, "up_s1": s1_u,
            "k": (p_c["conv_weight"] * _wscale(co * 9)).astype(jnp.float32),
            "conv_nb": nb_of(p_c), "conv_s0p1": s0p1_c, "conv_s1": s1_c,
        }
        if bi == n_blocks:
            po = syn[f"output{len(channels) - 2}"]
            blk["w_rgb"] = (po["conv_weight"].reshape(co, 3)
                            * (1.0 / math.sqrt(co))).astype(jnp.float32)
            blk["b_rgb"] = po["bias"]
        blocks.append(blk)

    x_cb = jnp.transpose(x, (1, 2, 3, 0))              # -> [H, W, C, B]
    img = bc.tail_chain_bc(x_cb, tuple(blocks))
    if cb_out:
        return img                                     # [3, H, W, B]
    return jnp.transpose(img, (3, 1, 2, 0))            # [3,H,W,B]->[B,H,W,3]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _upconv(x: jnp.ndarray, k: jnp.ndarray, prec) -> jnp.ndarray:
    """Fused-scale transposed conv (lhs-dilated 4x4, = torch
    F.conv_transpose2d(stride=2, padding=1)) with a hand-written
    input-gradient: XLA's auto-derived backward conv materialises the
    cotangent in a batch-minor layout with a 12.8x padding expansion
    (~4 GB at batch 10 and 1024^2) — expressed as an explicit stride-2
    forward conv it keeps the standard layout.

    Weight gradients are intentionally ZERO (the generator is frozen in
    every workload of this framework; treat k as stop_gradient'ed).
    """
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding=((2, 2), (2, 2)),
        lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=prec)


def _upconv_fwd(x, k, prec):
    return _upconv(x, k, prec), k


def _upconv_bwd(prec, k, dy):
    # grad-input of a stride-2 deconv == stride-2 conv with the spatially
    # flipped, io-swapped kernel (verified exact vs jax.vjp).
    k_flip = jnp.transpose(k[::-1, ::-1], (0, 1, 3, 2))
    dx = jax.lax.conv_general_dilated(
        dy, k_flip, window_strides=(2, 2), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=prec)
    return dx, jnp.zeros_like(k)


_upconv.defvjp(_upconv_fwd, _upconv_bwd)


def _synthesis_block(syn: Dict, x: jnp.ndarray, wp: jnp.ndarray, *,
                     block_idx: int, dtype, prec) -> jnp.ndarray:
    """One resolution block: up-conv + blur + epilogue (absent for the
    first block, whose layer0 is the learned constant), then conv +
    epilogue (stylegan_generator_model.py:331-395)."""

    def up_half(x, p, w_layer):
        if is_fused_layer(2 * block_idx - 2):
            x = _upconv(x, p["tconv_kernel"].astype(dtype), prec)
        elif dtype == jnp.bfloat16:
            # bf16 fast path: upsample+conv3x3 rewritten as one 4-tap
            # stride-2 tconv (identical math incl. padding edges, 2.25x
            # fewer MACs, no materialised upsampled activation —
            # nn.nearest_up_conv3_as_tconv_kernel). Kernel folded in f32,
            # then cast. f32 keeps the literal op pair for bit parity.
            scale = _wscale(x.shape[-1] * 9)
            k4 = nn.nearest_up_conv3_as_tconv_kernel(
                p["conv_weight"] * scale)
            x = _upconv(x, k4.astype(dtype), prec)
        else:
            x = nn.upsample_nearest_2x(x)
            scale = _wscale(x.shape[-1] * 9)
            x = nn.conv2d_frozen(x, p["conv_weight"].astype(dtype),
                                 ((1, 1), (1, 1)), 1, prec) * scale
        x = nn.blur_3x3(x, precision=prec)
        return _epilogue(p, x, w_layer, dtype=dtype, prec=prec)

    def conv_half(x, p, w_layer):
        scale = _wscale(x.shape[-1] * 9)
        x = nn.conv2d_frozen(x, p["conv_weight"].astype(dtype),
                             ((1, 1), (1, 1)), 1, prec) * scale
        return _epilogue(p, x, w_layer, dtype=dtype, prec=prec)

    # At >= 512^2 the two half-layers are nested-rematted inside the
    # per-block checkpoint: the block backward otherwise holds ~4
    # simultaneous [B,1024,1024,16] temps (4 GB each once XLA pads the
    # batch into the 128-lane dim for these small-channel convs), which
    # OOMs 16 GB HBM at attack batch 32. Halving the live set costs one
    # extra half-forward recompute only on the attack (backward) path.
    big = x.shape[1] >= 256            # input res; output is 2x
    maybe_ckpt = jax.checkpoint if big else (lambda f: f)

    li = 2 * block_idx - 2
    if li > 0:  # up-conv layer
        x = maybe_ckpt(up_half)(x, syn[f"layer{li}"], wp[:, li])

    li = 2 * block_idx - 1  # plain conv layer
    return maybe_ckpt(conv_half)(x, syn[f"layer{li}"], wp[:, li])


def postprocess(images: jnp.ndarray, min_val: float = -1.0,
                max_val: float = 1.0) -> jnp.ndarray:
    """Differentiable map to [0, 1] floats, matching the project's modified
    postprocess (mod_stylegan_generator.py:294-309)."""
    images = (images - min_val) / (max_val - min_val)
    return jnp.clip(images + 0.5 / 255.0, 0.0, 1.0)


def synthesize_from_w(params: Dict, w: jnp.ndarray, *, resolution: int,
                      dtype=jnp.float32,
                      truncation_psi: Optional[float] = STYLEGAN_TRUNCATION_PSI,
                      truncation_layers: int = STYLEGAN_TRUNCATION_LAYERS,
                      cb_out: bool = False) -> jnp.ndarray:
    """W-space path used by the whole pipeline: truncation -> synthesis ->
    postprocess. Returns [B,H,W,3] in [0,1] (or the chain tail's
    [3,H,W,B] under cb_out=True — postprocess is elementwise, so it is
    layout-agnostic)."""
    wp = truncation_apply(params, w, resolution=resolution,
                          truncation_psi=truncation_psi,
                          truncation_layers=truncation_layers)
    img = synthesis_apply(params, wp, resolution=resolution, dtype=dtype,
                          cb_out=cb_out)
    return postprocess(img)


def synthesize_from_z(params: Dict, z: jnp.ndarray, *, resolution: int,
                      dtype=jnp.float32) -> jnp.ndarray:
    w = mapping_apply(params, z, dtype=dtype)
    return synthesize_from_w(params, w, resolution=resolution, dtype=dtype)


# ---------------------------------------------------------------------------
# Weight conversion
# ---------------------------------------------------------------------------

def _fused_tconv_kernel(raw_weight: np.ndarray, scale: float) -> np.ndarray:
    """Build the effective 4x4 deconv kernel from the raw [3,3,in,out] weight.

    Mirrors stylegan_generator_model.py:666-672 (pad + sum the four shifted
    copies), then folds in the wscale and converts to the HWIO kernel of the
    equivalent lhs-dilated forward conv (spatially flipped torch kernel).
    """
    k = np.asarray(raw_weight, np.float32) * scale          # [3,3,in,out]
    k = np.pad(k, ((1, 1), (1, 1), (0, 0), (0, 0)))          # [5,5,in,out]
    k = k[1:, 1:] + k[:-1, 1:] + k[1:, :-1] + k[:-1, :-1]    # [4,4,in,out]
    # torch conv_transpose kernel is k.transpose(2,3,0,1) ([in,out,4,4]);
    # the equivalent forward-conv HWIO kernel is its spatial flip.
    return k[::-1, ::-1, :, :].copy()


def convert_torch_state_dict(sd: Dict[str, np.ndarray], resolution: int
                             ) -> Dict:
    """Convert the reference's PyTorch state dict (key naming of
    models/stylegan_generator_model.py:36-188) into our parameter pytree."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    channels = RESOLUTIONS_TO_CHANNELS[resolution]
    params = {"mapping": {}, "truncation": {}, "synthesis": {}}

    for i in range(MAPPING_LAYERS):
        params["mapping"][f"dense{i}"] = {
            "weight": nn.torch_linear_to_io(sd[f"mapping.dense{i}.linear.weight"]),
            "bias": sd[f"mapping.dense{i}.wscale.bias"].astype(np.float32),
        }
    params["truncation"]["w_avg"] = jnp.asarray(
        sd["truncation.w_avg"], jnp.float32)

    syn = params["synthesis"]
    L = num_layers(resolution)
    for li in range(L):
        pre = f"synthesis.layer{li}"
        p = {
            "noise": np.transpose(
                sd[f"{pre}.epilogue.apply_noise.noise"][0], (1, 2, 0)),
            "noise_weight": sd[f"{pre}.epilogue.apply_noise.weight"],
            "bias": sd[f"{pre}.epilogue.bias"],
            "style_weight": nn.torch_linear_to_io(
                sd[f"{pre}.epilogue.style_mod.dense.linear.weight"]),
            "style_bias": sd[f"{pre}.epilogue.style_mod.dense.wscale.bias"],
        }
        if li == 0:
            p["const"] = np.transpose(sd[f"{pre}.first_layer"][0], (1, 2, 0))
        elif li % 2 == 0 and is_fused_layer(li):
            in_ch = channels[li // 2]
            scale = _wscale(in_ch * 9)
            p["tconv_kernel"] = _fused_tconv_kernel(sd[f"{pre}.weight"], scale)
        else:
            p["conv_weight"] = nn.torch_conv_to_hwio(sd[f"{pre}.conv.weight"])
        syn[f"layer{li}"] = jax.tree.map(
            lambda a: jnp.asarray(a, jnp.float32), p)

    for oi in range(len(channels) - 1):
        syn[f"output{oi}"] = {
            "conv_weight": jnp.asarray(nn.torch_conv_to_hwio(
                sd[f"synthesis.output{oi}.conv.weight"]), jnp.float32),
            "bias": jnp.asarray(sd[f"synthesis.output{oi}.bias"], jnp.float32),
        }

    params["mapping"] = jax.tree.map(
        lambda a: jnp.asarray(a, jnp.float32), params["mapping"])
    return params


# Blocks at or below this resolution keep full spectral randomness under
# spectral_gamma shaping; above it, high-frequency kernel content and
# noise amplitude decay per octave (see random_torch_style_state_dict).
SPECTRAL_BASE_RES = 32


def random_torch_style_state_dict(resolution: int, seed: int = 0,
                                  realistic: bool = False,
                                  spectral_gamma: float = 0.0
                                  ) -> Dict[str, np.ndarray]:
    """A randomly-initialised state dict with the reference's key naming and
    shapes — used for golden tests and weight-free benchmarks.

    spectral_gamma != 0 shapes the generator's output power spectrum (the
    PSD-matched proxy of docs/PERF.md "PSD-matched proxy weights") toward
    the natural-image ~1/f² law (radial slope ~−2). For a block with
    output resolution r, every 3×3 conv kernel is blended around its
    spatial DC, ``k ← mean(k) + β (k − mean(k))`` with
    ``β = (SPECTRAL_BASE_RES / r) ** spectral_gamma`` (capped to
    [1/8, 1] for γ>0 smoothing, [1, 8] for γ<0 whitening), and the
    per-layer noise amplitude is scaled by the same β. Positive γ damps
    the per-octave detail energy added above 32² (steeper spectrum);
    negative γ amplifies it (flatter). Direction is weight-regime
    dependent — measured at 1024² with realistic=True magnitudes the
    UNSHAPED output is already steeper than natural (slope ≈ −3.0), so
    matching −2 needs γ<0 (tools/spectral_study.py calibrates). The
    shaping transforms values AFTER drawing, so the RNG stream (and
    therefore spectral_gamma=0 output) is unchanged."""
    rng = np.random.default_rng(seed)

    def beta_for(res: int) -> float:
        if not spectral_gamma:
            return 1.0
        b = (SPECTRAL_BASE_RES / max(res, SPECTRAL_BASE_RES)
             ) ** spectral_gamma
        return float(np.clip(b, 1.0 / 8.0, 8.0))

    def shape_conv(w: np.ndarray, spatial_axes, res: int) -> np.ndarray:
        b = beta_for(res)
        if b == 1.0:
            return w
        m = w.mean(axis=spatial_axes, keepdims=True)
        return m + b * (w - m)
    channels = RESOLUTIONS_TO_CHANNELS[resolution]
    sd = {}
    for i in range(MAPPING_LAYERS):
        # realistic=True emulates *trained* equalised-lr magnitudes: the
        # official StyleGAN draws N(0, 1/lrmul) and multiplies by
        # he_std*lrmul at runtime; with the mapping's lrmul=0.01 that is
        # std 100. With plain N(0,1) every mapping layer shrinks ~70x and
        # all identities collapse onto one w — useless for behavioural
        # studies. Parity tests keep N(0,1): the larger magnitudes change
        # f32 rounding by ~1 ulp vs torch, breaking bit-parity goldens.
        mag = 1.0 / MAPPING_LR_MULT if realistic else 1.0
        sd[f"mapping.dense{i}.linear.weight"] = rng.standard_normal(
            (W_DIM, W_DIM)).astype(np.float32) * mag
        sd[f"mapping.dense{i}.wscale.bias"] = rng.standard_normal(
            W_DIM).astype(np.float32) * 0.1
    sd["truncation.w_avg"] = rng.standard_normal(W_DIM).astype(np.float32)

    L = num_layers(resolution)
    for li in range(L):
        res = 2 ** (li // 2 + 2)
        if li == 0:
            in_ch = out_ch = channels[0]
        elif li % 2 == 0:  # up-conv: channels[i-1] -> channels[i]
            in_ch, out_ch = channels[li // 2], channels[li // 2 + 1]
        else:  # plain conv within the block
            in_ch = out_ch = channels[(li + 1) // 2]
        pre = f"synthesis.layer{li}"
        sd[f"{pre}.epilogue.apply_noise.noise"] = rng.standard_normal(
            (1, 1, res, res)).astype(np.float32)
        sd[f"{pre}.epilogue.apply_noise.weight"] = rng.standard_normal(
            out_ch).astype(np.float32) * 0.1 * beta_for(res)
        sd[f"{pre}.epilogue.bias"] = rng.standard_normal(
            out_ch).astype(np.float32) * 0.1
        sd[f"{pre}.epilogue.style_mod.dense.linear.weight"] = \
            rng.standard_normal((2 * out_ch, W_DIM)).astype(np.float32)
        sd[f"{pre}.epilogue.style_mod.dense.wscale.bias"] = \
            rng.standard_normal(2 * out_ch).astype(np.float32) * 0.1
        if li == 0:
            sd[f"{pre}.first_layer"] = rng.standard_normal(
                (1, channels[0], 4, 4)).astype(np.float32)
        elif li % 2 == 0 and is_fused_layer(li):
            sd[f"{pre}.weight"] = shape_conv(rng.standard_normal(
                (3, 3, in_ch, out_ch)).astype(np.float32), (0, 1), res)
        else:
            sd[f"{pre}.conv.weight"] = shape_conv(rng.standard_normal(
                (out_ch, in_ch, 3, 3)).astype(np.float32), (2, 3), res)

    for oi in range(len(channels) - 1):
        ch = channels[oi + 1]
        sd[f"synthesis.output{oi}.conv.weight"] = rng.standard_normal(
            (3, ch, 1, 1)).astype(np.float32)
        sd[f"synthesis.output{oi}.bias"] = rng.standard_normal(
            3).astype(np.float32) * 0.1
    return sd


def random_params(resolution: int, seed: int = 0, realistic: bool = False,
                  spectral_gamma: float = 0.0) -> Dict:
    return convert_torch_state_dict(
        random_torch_style_state_dict(resolution, seed, realistic=realistic,
                                      spectral_gamma=spectral_gamma),
        resolution)
