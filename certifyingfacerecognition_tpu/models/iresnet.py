"""ArcFace iresnet backbone (inference), TPU-native functional JAX.

Re-design of /root/reference/models/iresnet.py for inference on TPU:

  * NHWC activations, HWIO kernels;
  * all BatchNorms are folded into per-channel affine (scale, shift) pairs at
    weight-conversion time (eval-mode running stats — exactly what the
    reference uses via ``net.eval()``, main_attack.py:121-131);
  * pure ``apply(params, x)``, jit/vmap/grad-safe, optional bfloat16 compute.

Block structure (iresnet.py:28-57): BN -> conv3x3 -> BN -> PReLU ->
conv3x3(stride) -> BN, plus a conv1x1+BN downsample on the residual path.
Stage layout for iresnet-50: [3, 4, 14, 3] (iresnet.py:174-176).
"""

from __future__ import annotations

import math

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from . import nn

LAYER_COUNTS = {
    "iresnet18": [2, 2, 2, 2],
    "iresnet34": [3, 4, 6, 3],
    "iresnet50": [3, 4, 14, 3],
    "iresnet100": [3, 13, 30, 3],
    "iresnet200": [6, 26, 60, 6],
}
STAGE_PLANES = [64, 128, 256, 512]
BN_EPS = 1e-5
FC_SCALE = 7 * 7  # 112x112 input, four stride-2 stages
NUM_FEATURES = 512


def _block_apply(p: Dict, x: jnp.ndarray, stride: int, *, dtype, prec
                 ) -> jnp.ndarray:
    identity = x
    out = nn.affine_channels(x, p["bn1"]["scale"].astype(dtype),
                             p["bn1"]["shift"].astype(dtype))
    # stride-1 convs use the frozen-weight VJP (explicit grad-input conv;
    # the FRM is never trained — see nn.conv2d_frozen).
    out = nn.conv2d_frozen(out, p["conv1"].astype(dtype), ((1, 1), (1, 1)),
                           1, prec)
    out = nn.affine_channels(out, p["bn2"]["scale"].astype(dtype),
                             p["bn2"]["shift"].astype(dtype))
    out = nn.prelu(out, p["prelu"].astype(dtype))
    out = nn.conv2d_frozen(out, p["conv2"].astype(dtype), ((1, 1), (1, 1)),
                           1, prec, stride)
    out = nn.affine_channels(out, p["bn3"]["scale"].astype(dtype),
                             p["bn3"]["shift"].astype(dtype))
    if "downsample" in p:
        identity = nn.conv2d_frozen(x, p["downsample"]["conv"].astype(dtype),
                                    ((0, 0), (0, 0)), 1, prec, stride)
        identity = nn.affine_channels(
            identity, p["downsample"]["bn"]["scale"].astype(dtype),
            p["downsample"]["bn"]["shift"].astype(dtype))
    return out + identity


def apply(params: Dict, x: jnp.ndarray, *, dtype=jnp.float32) -> jnp.ndarray:
    """x: [B, 112, 112, 3] normalised images -> [B, 512] embeddings."""
    prec = nn.precision_for(dtype)
    x = x.astype(dtype)
    x = nn.conv2d_frozen(x, params["conv1"].astype(dtype), ((1, 1), (1, 1)),
                         1, prec)
    x = nn.affine_channels(x, params["bn1"]["scale"].astype(dtype),
                           params["bn1"]["shift"].astype(dtype))
    x = nn.prelu(x, params["prelu"].astype(dtype))
    for si, blocks in enumerate(params["stages"]):
        for bi, bp in enumerate(blocks):
            x = _block_apply(bp, x, stride=2 if bi == 0 else 1,
                             dtype=dtype, prec=prec)
    x = nn.affine_channels(x, params["bn2"]["scale"].astype(dtype),
                           params["bn2"]["shift"].astype(dtype))
    # torch flattens NCHW (C-major); the fc weight is re-permuted at
    # conversion time to consume our NHWC flatten order directly.
    x = x.reshape(x.shape[0], -1).astype(jnp.float32)
    x = nn.dense(x, params["fc"]["weight"], params["fc"]["bias"],
                 precision=nn.precision_for(jnp.float32))
    x = nn.affine_channels(x, params["features"]["scale"],
                           params["features"]["shift"])
    return x


# ---------------------------------------------------------------------------
# Weight conversion
# ---------------------------------------------------------------------------

def _fold_bn(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, jnp.ndarray]:
    scale, shift = nn.fold_batchnorm(
        sd[f"{prefix}.weight"], sd[f"{prefix}.bias"],
        sd[f"{prefix}.running_mean"], sd[f"{prefix}.running_var"], BN_EPS)
    return {"scale": jnp.asarray(scale), "shift": jnp.asarray(shift)}


def convert_torch_state_dict(sd: Dict[str, np.ndarray],
                             arch: str = "iresnet50") -> Dict:
    """Convert the reference checkpoint (weights/ms1mv3_arcface_r50/
    backbone.pth naming) into the folded NHWC parameter pytree."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params = {
        "conv1": jnp.asarray(nn.torch_conv_to_hwio(sd["conv1.weight"])),
        "bn1": _fold_bn(sd, "bn1"),
        "prelu": jnp.asarray(sd["prelu.weight"], jnp.float32),
        "stages": [],
    }
    counts = LAYER_COUNTS[arch]
    for si, n_blocks in enumerate(counts):
        stage = []
        for bi in range(n_blocks):
            pre = f"layer{si + 1}.{bi}"
            p = {
                "bn1": _fold_bn(sd, f"{pre}.bn1"),
                "conv1": jnp.asarray(nn.torch_conv_to_hwio(
                    sd[f"{pre}.conv1.weight"])),
                "bn2": _fold_bn(sd, f"{pre}.bn2"),
                "prelu": jnp.asarray(sd[f"{pre}.prelu.weight"], jnp.float32),
                "conv2": jnp.asarray(nn.torch_conv_to_hwio(
                    sd[f"{pre}.conv2.weight"])),
                "bn3": _fold_bn(sd, f"{pre}.bn3"),
            }
            if f"{pre}.downsample.0.weight" in sd:
                p["downsample"] = {
                    "conv": jnp.asarray(nn.torch_conv_to_hwio(
                        sd[f"{pre}.downsample.0.weight"])),
                    "bn": _fold_bn(sd, f"{pre}.downsample.1"),
                }
            stage.append(p)
        params["stages"].append(stage)

    params["bn2"] = _fold_bn(sd, "bn2")
    # fc consumes the flattened feature map; torch flattens NCHW while we
    # flatten NHWC, so permute the weight accordingly: [out, C*H*W] ->
    # [out, C, H, W] -> [out, H, W, C] -> [H*W*C, out].
    fc_w = sd["fc.weight"].reshape(NUM_FEATURES, 512, 7, 7)
    fc_w = np.transpose(fc_w, (0, 2, 3, 1)).reshape(NUM_FEATURES, -1)
    params["fc"] = {
        "weight": jnp.asarray(fc_w.T, jnp.float32),
        "bias": jnp.asarray(sd["fc.bias"], jnp.float32),
    }
    params["features"] = _fold_bn(sd, "features")
    return params


def random_torch_style_state_dict(arch: str = "iresnet50", seed: int = 0,
                                  realistic: bool = False
                                  ) -> Dict[str, np.ndarray]:
    """Random state dict with the reference naming/shapes (for golden tests).

    ``realistic=True`` uses He-scaled conv weights and benign BN statistics
    so activations stay O(1) through all 50 layers and the resulting
    embeddings are *discriminative* — with the default test scaling (s=0.2,
    ~5x gain per conv) activations explode and every input collapses onto
    one gallery class, which is fine for numerical-parity tests but useless
    for behavioural studies (tools/resolution_study.py).
    """
    rng = np.random.default_rng(seed)

    def w(*shape, s=0.2):
        if realistic and len(shape) == 4:             # conv OIHW: He init
            s = math.sqrt(2.0 / (shape[1] * shape[2] * shape[3]))
        return (rng.standard_normal(shape) * s).astype(np.float32)

    def bn(prefix, c, sd):
        if realistic:
            sd[f"{prefix}.weight"] = w(c, s=0.1) + 1.0
            sd[f"{prefix}.bias"] = w(c, s=0.1)
            sd[f"{prefix}.running_mean"] = w(c, s=0.1)
            sd[f"{prefix}.running_var"] = np.abs(w(c, s=0.1)) + 1.0
            return
        sd[f"{prefix}.weight"] = w(c, s=0.3) + 1.0
        sd[f"{prefix}.bias"] = w(c)
        sd[f"{prefix}.running_mean"] = w(c)
        sd[f"{prefix}.running_var"] = np.abs(w(c)) + 0.5

    sd: Dict[str, np.ndarray] = {}
    sd["conv1.weight"] = w(64, 3, 3, 3)
    bn("bn1", 64, sd)
    sd["prelu.weight"] = np.abs(w(64)) + 0.1

    inplanes = 64
    for si, n_blocks in enumerate(LAYER_COUNTS[arch]):
        planes = STAGE_PLANES[si]
        for bi in range(n_blocks):
            pre = f"layer{si + 1}.{bi}"
            inp = inplanes if bi == 0 else planes
            bn(f"{pre}.bn1", inp, sd)
            sd[f"{pre}.conv1.weight"] = w(planes, inp, 3, 3)
            bn(f"{pre}.bn2", planes, sd)
            sd[f"{pre}.prelu.weight"] = np.abs(w(planes)) + 0.1
            sd[f"{pre}.conv2.weight"] = w(planes, planes, 3, 3)
            bn(f"{pre}.bn3", planes, sd)
            if bi == 0:  # stride-2 downsample (stride=2 on every stage)
                sd[f"{pre}.downsample.0.weight"] = w(planes, inp, 1, 1)
                bn(f"{pre}.downsample.1", planes, sd)
        inplanes = planes

    bn("bn2", 512, sd)
    sd["fc.weight"] = w(NUM_FEATURES, 512 * FC_SCALE,
                    s=math.sqrt(1.0 / (512 * FC_SCALE))
                    if realistic else 0.02)
    sd["fc.bias"] = w(NUM_FEATURES)
    bn("features", NUM_FEATURES, sd)
    return sd
