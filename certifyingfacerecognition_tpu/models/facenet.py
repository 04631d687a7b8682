"""FaceNet (InceptionResnetV1) embedding network, TPU-native functional JAX.

The reference consumes this model from the external ``facenet_pytorch``
package (/root/reference/main_attack.py:121-131: FaceNet^C = pretrained on
CASIA-webface, FaceNet^V = VGGFace2). It is not vendored there, so this is a
from-scratch JAX implementation of the public InceptionResnetV1 architecture
with a weight converter keyed by facenet_pytorch's state-dict naming
(conv2d_1a..conv2d_4b stem, repeat_1/mixed_6a/repeat_2/mixed_7a/repeat_3/
block8 inception-resnet blocks, last_linear + last_bn head, final
L2-normalised 512-d embedding).

TPU design: NHWC, BN folded into affine at conversion (BN eps = 1e-3),
pure apply(), optional bfloat16 compute.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import nn

BN_EPS = 1e-3


def _basic_conv(p: Dict, x, *, stride=1, padding=((0, 0), (0, 0)),
                dtype=jnp.float32, prec=None):
    """conv (no bias) -> folded BN -> relu."""
    x = nn.conv2d(x, p["kernel"].astype(dtype), stride=stride,
                  padding=padding, precision=prec)
    x = nn.affine_channels(x, p["bn"]["scale"].astype(dtype),
                           p["bn"]["shift"].astype(dtype))
    return jax.nn.relu(x)


def _max_pool_3x3_s2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1), padding="VALID")


def _block35(p: Dict, x, *, dtype, prec):
    b0 = _basic_conv(p["branch0"], x, dtype=dtype, prec=prec)
    b1 = _basic_conv(p["branch1"][0], x, dtype=dtype, prec=prec)
    b1 = _basic_conv(p["branch1"][1], b1, padding=((1, 1), (1, 1)),
                     dtype=dtype, prec=prec)
    b2 = _basic_conv(p["branch2"][0], x, dtype=dtype, prec=prec)
    b2 = _basic_conv(p["branch2"][1], b2, padding=((1, 1), (1, 1)),
                     dtype=dtype, prec=prec)
    b2 = _basic_conv(p["branch2"][2], b2, padding=((1, 1), (1, 1)),
                     dtype=dtype, prec=prec)
    up = jnp.concatenate([b0, b1, b2], axis=-1)
    up = nn.conv2d(up, p["conv2d"]["kernel"].astype(dtype),
                   padding=((0, 0), (0, 0)),
                   precision=prec) + p["conv2d"]["bias"].astype(dtype)
    return jax.nn.relu(x + 0.17 * up)


def _mixed_6a(p: Dict, x, *, dtype, prec):
    b0 = _basic_conv(p["branch0"], x, stride=2, dtype=dtype, prec=prec)
    b1 = _basic_conv(p["branch1"][0], x, dtype=dtype, prec=prec)
    b1 = _basic_conv(p["branch1"][1], b1, padding=((1, 1), (1, 1)),
                     dtype=dtype, prec=prec)
    b1 = _basic_conv(p["branch1"][2], b1, stride=2, dtype=dtype, prec=prec)
    b2 = _max_pool_3x3_s2(x)
    return jnp.concatenate([b0, b1, b2], axis=-1)


def _block17(p: Dict, x, *, dtype, prec):
    b0 = _basic_conv(p["branch0"], x, dtype=dtype, prec=prec)
    b1 = _basic_conv(p["branch1"][0], x, dtype=dtype, prec=prec)
    b1 = _basic_conv(p["branch1"][1], b1, padding=((0, 0), (3, 3)),
                     dtype=dtype, prec=prec)
    b1 = _basic_conv(p["branch1"][2], b1, padding=((3, 3), (0, 0)),
                     dtype=dtype, prec=prec)
    up = jnp.concatenate([b0, b1], axis=-1)
    up = nn.conv2d(up, p["conv2d"]["kernel"].astype(dtype),
                   padding=((0, 0), (0, 0)),
                   precision=prec) + p["conv2d"]["bias"].astype(dtype)
    return jax.nn.relu(x + 0.10 * up)


def _mixed_7a(p: Dict, x, *, dtype, prec):
    b0 = _basic_conv(p["branch0"][0], x, dtype=dtype, prec=prec)
    b0 = _basic_conv(p["branch0"][1], b0, stride=2, dtype=dtype, prec=prec)
    b1 = _basic_conv(p["branch1"][0], x, dtype=dtype, prec=prec)
    b1 = _basic_conv(p["branch1"][1], b1, stride=2, dtype=dtype, prec=prec)
    b2 = _basic_conv(p["branch2"][0], x, dtype=dtype, prec=prec)
    b2 = _basic_conv(p["branch2"][1], b2, padding=((1, 1), (1, 1)),
                     dtype=dtype, prec=prec)
    b2 = _basic_conv(p["branch2"][2], b2, stride=2, dtype=dtype, prec=prec)
    b3 = _max_pool_3x3_s2(x)
    return jnp.concatenate([b0, b1, b2, b3], axis=-1)


def _block8(p: Dict, x, *, scale, relu, dtype, prec):
    b0 = _basic_conv(p["branch0"], x, dtype=dtype, prec=prec)
    b1 = _basic_conv(p["branch1"][0], x, dtype=dtype, prec=prec)
    b1 = _basic_conv(p["branch1"][1], b1, padding=((0, 0), (1, 1)),
                     dtype=dtype, prec=prec)
    b1 = _basic_conv(p["branch1"][2], b1, padding=((1, 1), (0, 0)),
                     dtype=dtype, prec=prec)
    up = jnp.concatenate([b0, b1], axis=-1)
    up = nn.conv2d(up, p["conv2d"]["kernel"].astype(dtype),
                   padding=((0, 0), (0, 0)),
                   precision=prec) + p["conv2d"]["bias"].astype(dtype)
    out = x + scale * up
    return jax.nn.relu(out) if relu else out


def apply(params: Dict, x: jnp.ndarray, *, dtype=jnp.float32) -> jnp.ndarray:
    """x: [B, 160, 160, 3] normalised images -> [B, 512] L2-normalised
    embeddings (eval mode; dropout is identity)."""
    prec = nn.precision_for(dtype)
    x = x.astype(dtype)
    x = _basic_conv(params["conv2d_1a"], x, stride=2, dtype=dtype, prec=prec)
    x = _basic_conv(params["conv2d_2a"], x, dtype=dtype, prec=prec)
    x = _basic_conv(params["conv2d_2b"], x, padding=((1, 1), (1, 1)),
                    dtype=dtype, prec=prec)
    x = _max_pool_3x3_s2(x)
    x = _basic_conv(params["conv2d_3b"], x, dtype=dtype, prec=prec)
    x = _basic_conv(params["conv2d_4a"], x, dtype=dtype, prec=prec)
    x = _basic_conv(params["conv2d_4b"], x, stride=2, dtype=dtype, prec=prec)
    for p in params["repeat_1"]:
        x = _block35(p, x, dtype=dtype, prec=prec)
    x = _mixed_6a(params["mixed_6a"], x, dtype=dtype, prec=prec)
    for p in params["repeat_2"]:
        x = _block17(p, x, dtype=dtype, prec=prec)
    x = _mixed_7a(params["mixed_7a"], x, dtype=dtype, prec=prec)
    for p in params["repeat_3"]:
        x = _block8(p, x, scale=0.20, relu=True, dtype=dtype, prec=prec)
    x = _block8(params["block8"], x, scale=1.0, relu=False, dtype=dtype,
                prec=prec)
    x = jnp.mean(x, axis=(1, 2))  # AdaptiveAvgPool2d(1)
    x = x.astype(jnp.float32)
    x = nn.dense(x, params["last_linear"]["weight"],
                 precision=nn.precision_for(jnp.float32))
    x = nn.affine_channels(x, params["last_bn"]["scale"],
                           params["last_bn"]["shift"])
    # F.normalize(x, p=2, dim=1)
    return x / jnp.maximum(jnp.linalg.norm(x, axis=1, keepdims=True), 1e-12)


# ---------------------------------------------------------------------------
# Weight conversion (facenet_pytorch state-dict naming)
# ---------------------------------------------------------------------------

def _conv_bn(sd, prefix) -> Dict:
    scale, shift = nn.fold_batchnorm(
        sd[f"{prefix}.bn.weight"], sd[f"{prefix}.bn.bias"],
        sd[f"{prefix}.bn.running_mean"], sd[f"{prefix}.bn.running_var"],
        BN_EPS)
    return {
        "kernel": jnp.asarray(nn.torch_conv_to_hwio(sd[f"{prefix}.conv.weight"])),
        "bn": {"scale": jnp.asarray(scale), "shift": jnp.asarray(shift)},
    }


def _plain_conv(sd, prefix) -> Dict:
    return {
        "kernel": jnp.asarray(nn.torch_conv_to_hwio(sd[f"{prefix}.weight"])),
        "bias": jnp.asarray(np.asarray(sd[f"{prefix}.bias"], np.float32)),
    }


def _branch(sd, prefix, n) -> List[Dict]:
    if n == 1:
        return _conv_bn(sd, prefix)
    return [_conv_bn(sd, f"{prefix}.{i}") for i in range(n)]


def convert_torch_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: Dict = {}
    for name in ["conv2d_1a", "conv2d_2a", "conv2d_2b", "conv2d_3b",
                 "conv2d_4a", "conv2d_4b"]:
        params[name] = _conv_bn(sd, name)

    params["repeat_1"] = [
        {
            "branch0": _branch(sd, f"repeat_1.{i}.branch0", 1),
            "branch1": _branch(sd, f"repeat_1.{i}.branch1", 2),
            "branch2": _branch(sd, f"repeat_1.{i}.branch2", 3),
            "conv2d": _plain_conv(sd, f"repeat_1.{i}.conv2d"),
        }
        for i in range(5)
    ]
    params["mixed_6a"] = {
        "branch0": _branch(sd, "mixed_6a.branch0", 1),
        "branch1": _branch(sd, "mixed_6a.branch1", 3),
    }
    params["repeat_2"] = [
        {
            "branch0": _branch(sd, f"repeat_2.{i}.branch0", 1),
            "branch1": _branch(sd, f"repeat_2.{i}.branch1", 3),
            "conv2d": _plain_conv(sd, f"repeat_2.{i}.conv2d"),
        }
        for i in range(10)
    ]
    params["mixed_7a"] = {
        "branch0": _branch(sd, "mixed_7a.branch0", 2),
        "branch1": _branch(sd, "mixed_7a.branch1", 2),
        "branch2": _branch(sd, "mixed_7a.branch2", 3),
    }
    params["repeat_3"] = [
        {
            "branch0": _branch(sd, f"repeat_3.{i}.branch0", 1),
            "branch1": _branch(sd, f"repeat_3.{i}.branch1", 3),
            "conv2d": _plain_conv(sd, f"repeat_3.{i}.conv2d"),
        }
        for i in range(5)
    ]
    params["block8"] = {
        "branch0": _branch(sd, "block8.branch0", 1),
        "branch1": _branch(sd, "block8.branch1", 3),
        "conv2d": _plain_conv(sd, "block8.conv2d"),
    }
    params["last_linear"] = {
        "weight": jnp.asarray(nn.torch_linear_to_io(sd["last_linear.weight"])),
    }
    scale, shift = nn.fold_batchnorm(
        sd["last_bn.weight"], sd["last_bn.bias"], sd["last_bn.running_mean"],
        sd["last_bn.running_var"], BN_EPS)
    params["last_bn"] = {"scale": jnp.asarray(scale),
                         "shift": jnp.asarray(shift)}
    return params


# (out_ch, in_ch, kh, kw, layer path) spec used to synthesise random state
# dicts for tests/benchmarks without the facenet_pytorch package.
def random_torch_style_state_dict(seed: int = 0) -> Dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)
    sd: Dict[str, np.ndarray] = {}

    def conv_bn(prefix, cin, cout, kh, kw):
        sd[f"{prefix}.conv.weight"] = (
            rng.standard_normal((cout, cin, kh, kw)) * 0.08).astype(np.float32)
        sd[f"{prefix}.bn.weight"] = (
            rng.standard_normal(cout) * 0.2 + 1).astype(np.float32)
        sd[f"{prefix}.bn.bias"] = (
            rng.standard_normal(cout) * 0.1).astype(np.float32)
        sd[f"{prefix}.bn.running_mean"] = (
            rng.standard_normal(cout) * 0.1).astype(np.float32)
        sd[f"{prefix}.bn.running_var"] = (
            np.abs(rng.standard_normal(cout)) * 0.3 + 0.7).astype(np.float32)

    def plain(prefix, cin, cout):
        sd[f"{prefix}.weight"] = (
            rng.standard_normal((cout, cin, 1, 1)) * 0.08).astype(np.float32)
        sd[f"{prefix}.bias"] = (
            rng.standard_normal(cout) * 0.1).astype(np.float32)

    conv_bn("conv2d_1a", 3, 32, 3, 3)
    conv_bn("conv2d_2a", 32, 32, 3, 3)
    conv_bn("conv2d_2b", 32, 64, 3, 3)
    conv_bn("conv2d_3b", 64, 80, 1, 1)
    conv_bn("conv2d_4a", 80, 192, 3, 3)
    conv_bn("conv2d_4b", 192, 256, 3, 3)
    for i in range(5):
        conv_bn(f"repeat_1.{i}.branch0", 256, 32, 1, 1)
        conv_bn(f"repeat_1.{i}.branch1.0", 256, 32, 1, 1)
        conv_bn(f"repeat_1.{i}.branch1.1", 32, 32, 3, 3)
        conv_bn(f"repeat_1.{i}.branch2.0", 256, 32, 1, 1)
        conv_bn(f"repeat_1.{i}.branch2.1", 32, 32, 3, 3)
        conv_bn(f"repeat_1.{i}.branch2.2", 32, 32, 3, 3)
        plain(f"repeat_1.{i}.conv2d", 96, 256)
    conv_bn("mixed_6a.branch0", 256, 384, 3, 3)
    conv_bn("mixed_6a.branch1.0", 256, 192, 1, 1)
    conv_bn("mixed_6a.branch1.1", 192, 192, 3, 3)
    conv_bn("mixed_6a.branch1.2", 192, 256, 3, 3)
    for i in range(10):
        conv_bn(f"repeat_2.{i}.branch0", 896, 128, 1, 1)
        conv_bn(f"repeat_2.{i}.branch1.0", 896, 128, 1, 1)
        conv_bn(f"repeat_2.{i}.branch1.1", 128, 128, 1, 7)
        conv_bn(f"repeat_2.{i}.branch1.2", 128, 128, 7, 1)
        plain(f"repeat_2.{i}.conv2d", 256, 896)
    conv_bn("mixed_7a.branch0.0", 896, 256, 1, 1)
    conv_bn("mixed_7a.branch0.1", 256, 384, 3, 3)
    conv_bn("mixed_7a.branch1.0", 896, 256, 1, 1)
    conv_bn("mixed_7a.branch1.1", 256, 256, 3, 3)
    conv_bn("mixed_7a.branch2.0", 896, 256, 1, 1)
    conv_bn("mixed_7a.branch2.1", 256, 256, 3, 3)
    conv_bn("mixed_7a.branch2.2", 256, 256, 3, 3)
    for i in range(5):
        conv_bn(f"repeat_3.{i}.branch0", 1792, 192, 1, 1)
        conv_bn(f"repeat_3.{i}.branch1.0", 1792, 192, 1, 1)
        conv_bn(f"repeat_3.{i}.branch1.1", 192, 192, 1, 3)
        conv_bn(f"repeat_3.{i}.branch1.2", 192, 192, 3, 1)
        plain(f"repeat_3.{i}.conv2d", 384, 1792)
    conv_bn("block8.branch0", 1792, 192, 1, 1)
    conv_bn("block8.branch1.0", 1792, 192, 1, 1)
    conv_bn("block8.branch1.1", 192, 192, 1, 3)
    conv_bn("block8.branch1.2", 192, 192, 3, 1)
    plain("block8.conv2d", 384, 1792)
    sd["last_linear.weight"] = (
        rng.standard_normal((512, 1792)) * 0.03).astype(np.float32)
    for k, shape in [("weight", 512), ("bias", 512), ("running_mean", 512),
                     ("running_var", 512)]:
        v = rng.standard_normal(shape).astype(np.float32) * 0.2
        if k == "weight":
            v = v + 1
        if k == "running_var":
            v = np.abs(v) + 0.5
        sd[f"last_bn.{k}"] = v
    return sd


def random_params(seed: int = 0) -> Dict:
    return convert_torch_state_dict(random_torch_style_state_dict(seed))
