"""ProgressiveGAN generator, TPU-native functional JAX (NHWC).

Re-design of /root/reference/models/pggan_generator_model.py (inference,
lod=0). Every block is pixel-norm -> (optional 2x upsample) -> conv ->
wscale (scale + bias) -> lrelu; the ToRGB head uses gain 1.0 and a linear
activation (pggan_generator_model.py:227-322). The Z-code is normalised onto
the sqrt(512)-radius sphere before synthesis (pggan_generator.py:104-111).
The default configuration uses fused_scale=False (model_settings.py:19-31),
i.e. no transposed convs.
"""

from __future__ import annotations

import math
from typing import Dict

import jax.numpy as jnp
import numpy as np

from . import nn

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

LATENT_DIM = 512


def num_layers(resolution: int) -> int:
    return int(np.log2(resolution)) * 2 - 2


def preprocess_z(z: jnp.ndarray) -> jnp.ndarray:
    """Normalise z onto the sqrt(512) sphere (pggan_generator.py:104-111)."""
    norm = jnp.linalg.norm(z, axis=1, keepdims=True)
    return z / norm * math.sqrt(LATENT_DIM)


def _conv_block(p: Dict, x: jnp.ndarray, *, kernel_size: int, padding: int,
                upsample: bool, gain: float, lrelu_act: bool, dtype, prec
                ) -> jnp.ndarray:
    x = nn.pixel_norm(x)
    k = p["conv_weight"]
    fan_in = k.shape[0] * k.shape[1] * k.shape[2]
    scale = gain / math.sqrt(fan_in)
    if upsample and kernel_size == 3 and padding == 1 \
            and dtype == jnp.bfloat16:
        # bf16 fast path: upsample+conv3x3 as one 4-tap stride-2 tconv
        # (identical math, 2.25x fewer MACs — see the StyleGAN up_half
        # and nn.nearest_up_conv3_as_tconv_kernel). Scale folded in f32.
        from .stylegan import _upconv

        k4 = nn.nearest_up_conv3_as_tconv_kernel(k * scale)
        x = _upconv(x, k4.astype(dtype), prec)
        x = x + p["bias"].astype(dtype)
        return nn.lrelu(x) if lrelu_act else x
    if upsample:
        x = nn.upsample_nearest_2x(x)
    x = nn.conv2d(x, k.astype(dtype),
                  padding=((padding, padding), (padding, padding)),
                  precision=prec)
    x = x * scale + p["bias"].astype(dtype)
    return nn.lrelu(x) if lrelu_act else x


def apply(params: Dict, z: jnp.ndarray, *, resolution: int,
          dtype=jnp.float32) -> jnp.ndarray:
    """z: [B, 512] (pre-normalised) -> image [B, H, W, 3] in [-1, 1]."""
    channels = RESOLUTIONS_TO_CHANNELS[resolution]
    prec = nn.precision_for(dtype)
    x = z.astype(dtype)[:, None, None, :]  # [B, 1, 1, 512]

    for block_idx in range(1, len(channels)):
        li = 2 * block_idx - 2
        if block_idx == 1:
            # 1x1 -> 4x4 "dense" conv: k4, pad 3.
            x = _conv_block(params[f"layer{li}"], x, kernel_size=4, padding=3,
                            upsample=False, gain=math.sqrt(2.0),
                            lrelu_act=True, dtype=dtype, prec=prec)
        else:
            x = _conv_block(params[f"layer{li}"], x, kernel_size=3, padding=1,
                            upsample=True, gain=math.sqrt(2.0),
                            lrelu_act=True, dtype=dtype, prec=prec)
        x = _conv_block(params[f"layer{li + 1}"], x, kernel_size=3, padding=1,
                        upsample=False, gain=math.sqrt(2.0), lrelu_act=True,
                        dtype=dtype, prec=prec)

    img = _conv_block(params[f"output{len(channels) - 2}"], x, kernel_size=1,
                      padding=0, upsample=False, gain=1.0, lrelu_act=False,
                      dtype=dtype, prec=prec)
    return img


def synthesize_from_z(params: Dict, z: jnp.ndarray, *, resolution: int,
                      dtype=jnp.float32) -> jnp.ndarray:
    """Full path incl. Z normalisation and [0,1] postprocess."""
    from .stylegan import postprocess

    img = apply(params, preprocess_z(z), resolution=resolution, dtype=dtype)
    return postprocess(img)


def convert_torch_state_dict(sd: Dict[str, np.ndarray], resolution: int
                             ) -> Dict:
    """Convert the reference PGGAN state dict (pggan_generator_model.py
    naming: layerN.conv.weight / layerN.wscale.bias) to our pytree."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: Dict = {}
    L = num_layers(resolution)
    for li in range(L):
        params[f"layer{li}"] = {
            "conv_weight": jnp.asarray(
                nn.torch_conv_to_hwio(sd[f"layer{li}.conv.weight"]),
                jnp.float32),
            "bias": jnp.asarray(sd[f"layer{li}.wscale.bias"], jnp.float32),
        }
    n_outputs = len(RESOLUTIONS_TO_CHANNELS[resolution]) - 1
    for oi in range(n_outputs):
        params[f"output{oi}"] = {
            "conv_weight": jnp.asarray(
                nn.torch_conv_to_hwio(sd[f"output{oi}.conv.weight"]),
                jnp.float32),
            "bias": jnp.asarray(sd[f"output{oi}.wscale.bias"], jnp.float32),
        }
    return params


def random_torch_style_state_dict(resolution: int, seed: int = 0
                                  ) -> Dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)
    channels = RESOLUTIONS_TO_CHANNELS[resolution]
    sd: Dict[str, np.ndarray] = {}
    for li in range(num_layers(resolution)):
        if li == 0:
            in_ch, out_ch, k = channels[0], channels[1], 4
        elif li % 2 == 0:
            in_ch, out_ch, k = channels[li // 2], channels[li // 2 + 1], 3
        else:
            in_ch = out_ch = channels[(li + 1) // 2]
            k = 3
        sd[f"layer{li}.conv.weight"] = (
            rng.standard_normal((out_ch, in_ch, k, k)) * 0.5
        ).astype(np.float32)
        sd[f"layer{li}.wscale.bias"] = (
            rng.standard_normal(out_ch) * 0.1).astype(np.float32)
    for oi in range(len(channels) - 1):
        ch = channels[oi + 1]
        sd[f"output{oi}.conv.weight"] = (
            rng.standard_normal((3, ch, 1, 1)) * 0.5).astype(np.float32)
        sd[f"output{oi}.wscale.bias"] = (
            rng.standard_normal(3) * 0.1).astype(np.float32)
    return sd
