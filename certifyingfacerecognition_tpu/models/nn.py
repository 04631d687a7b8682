"""Shared functional NN primitives (NHWC, TPU-native).

All model code in this package is written as pure ``apply(params, x)``
functions over parameter pytrees (nested dicts of jnp arrays), with NHWC
activations and HWIO conv kernels — the layouts XLA tiles best onto the TPU
MXU. Weight converters map PyTorch state dicts (OIHW / [out,in] linear)
into this layout once, offline.

Precision policy: ``compute_dtype=float32`` implies Precision.HIGHEST on
matmul/conv (bit-accurate parity with the f32 PyTorch reference — this
environment's default matmul precision is bf16-like); ``bfloat16`` uses the
fast default path for throughput.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def precision_for(dtype) -> Optional[jax.lax.Precision]:
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None


def dense(x: jnp.ndarray, weight: jnp.ndarray, bias: Optional[jnp.ndarray] = None,
          *, precision=None) -> jnp.ndarray:
    """x [B, in] @ weight [in, out] (+ bias)."""
    y = jnp.dot(x, weight, precision=precision)
    if bias is not None:
        y = y + bias
    return y


def conv2d(x: jnp.ndarray, kernel: jnp.ndarray, *, stride: int = 1,
           padding=((1, 1), (1, 1)), feature_group_count: int = 1,
           precision=None) -> jnp.ndarray:
    """NHWC conv with HWIO kernel."""
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=feature_group_count, precision=precision)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def conv2d_frozen(x: jnp.ndarray, kernel: jnp.ndarray, padding=((1, 1), (1, 1)),
                  feature_group_count: int = 1, precision=None,
                  stride: int = 1) -> jnp.ndarray:
    """NHWC conv (any stride) whose weights are treated as frozen.

    XLA's auto-derived grad-input conv materialises its cotangent in a
    batch-minor layout with up to 12.8x padding expansion (gigabytes at
    1024^2 — docs/PERF.md); written explicitly as a forward conv with the
    spatially-flipped, io-swapped kernel (lhs-dilated by the stride for
    strided convs) it keeps the standard layout. Weight gradients are
    intentionally ZERO — every model in this framework is frozen (only
    latents/deltas are optimised).
    """
    return conv2d(x, kernel, stride=stride, padding=padding,
                  feature_group_count=feature_group_count,
                  precision=precision)


def _conv2d_frozen_fwd(x, kernel, padding, fgc, precision, stride):
    y = conv2d_frozen(x, kernel, padding, fgc, precision, stride)
    return y, (kernel, x.shape)


def _conv2d_frozen_bwd(padding, fgc, precision, stride, res, dy):
    kernel, x_shape = res
    kh, kw = kernel.shape[0], kernel.shape[1]
    h, w = x_shape[1], x_shape[2]
    oh, ow = dy.shape[1], dy.shape[2]
    if fgc == 1:
        k_adj = jnp.transpose(kernel[::-1, ::-1], (0, 1, 3, 2))
    else:  # depthwise (I == 1): the adjoint keeps the group structure
        k_adj = kernel[::-1, ::-1]
    # dx size must come back to h: with dy lhs-dilated by the stride
    # (effective size (o-1)*stride+1), low pad is the usual k-1-p_lo and
    # high pad closes the remainder (rows the strided forward never read).
    pad_adj = ((kh - 1 - padding[0][0],
                h + padding[0][0] - (oh - 1) * stride - 1),
               (kw - 1 - padding[1][0],
                w + padding[1][0] - (ow - 1) * stride - 1))
    dx = jax.lax.conv_general_dilated(
        dy, k_adj, window_strides=(1, 1), padding=pad_adj,
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=fgc, precision=precision)
    return dx, jnp.zeros_like(kernel)


conv2d_frozen.defvjp(_conv2d_frozen_fwd, _conv2d_frozen_bwd)


def conv2d_transpose(x: jnp.ndarray, kernel: jnp.ndarray, *, stride: int = 2,
                     padding: int = 1, precision=None) -> jnp.ndarray:
    """Matches torch.nn.functional.conv_transpose2d(stride, padding).

    kernel is in torch-transpose layout converted to HWIO-with-swapped-IO:
    we expect kernel [kh, kw, out, in] here (i.e. HW + (torch's in/out
    swapped)), and use ``transpose_kernel=True`` so lax mirrors torch's
    deconvolution exactly.
    """
    kh, kw = kernel.shape[0], kernel.shape[1]
    pad = ((kh - 1 - padding, kh - 1 - padding),
           (kw - 1 - padding, kw - 1 - padding))
    return jax.lax.conv_transpose(
        x, kernel, strides=(stride, stride), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True,
        precision=precision)


def lrelu(x: jnp.ndarray, slope: float = 0.2) -> jnp.ndarray:
    return jnp.where(x >= 0, x, slope * x)


def prelu(x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Per-channel PReLU; alpha broadcast over trailing channel dim."""
    return jnp.where(x >= 0, x, alpha * x)


def pixel_norm(x: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Normalise over the channel (last) axis. Reference:
    models/stylegan_generator_model.py:398-406 (channel dim=1 in NCHW)."""
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=-1, keepdims=True)
                             + eps)


def instance_norm(x: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Per-sample, per-channel spatial normalisation (NHWC).

    Reference: models/stylegan_generator_model.py:409-423. The f32 path is
    the exact two-pass formula (bit-parity with torch). The bf16 path uses
    one-pass f32-accumulated moments (E[x^2]-E[x]^2) and a bf16 apply —
    one less HBM traversal and half the VPU work on the largest tensors
    (~25% faster on the 1024^2 epilogues); the cancellation error is far
    below bf16 resolution for post-lrelu activation ranges.
    """
    if x.dtype == jnp.float32:
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=(1, 2), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + eps)
    m = jnp.mean(x, axis=(1, 2), keepdims=True, dtype=jnp.float32)
    m2 = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=(1, 2),
                  keepdims=True)
    var = jnp.maximum(m2 - jnp.square(m), 0.0)
    scale = jax.lax.rsqrt(var + eps).astype(x.dtype)
    return (x - m.astype(x.dtype)) * scale


def nearest_up_conv3_as_tconv_kernel(k3: jnp.ndarray) -> jnp.ndarray:
    """Rewrite `upsample_nearest_2x -> conv3x3(pad 1)` as ONE stride-2
    transposed conv: returns the 4x4 HWIO kernel T for stylegan._upconv
    (lhs-dilated conv, pad ((2,2),(2,2))) such that the two programs are
    mathematically identical, including the zero-padding edge rows/cols.

    Derivation (1-D, correlation convention, pad 1): with x_up[j] =
    x[j//2], output y[2i] = K[0]x[i-1] + (K[1]+K[2])x[i] and y[2i+1] =
    (K[0]+K[1])x[i] + K[2]x[i+1] — each output pixel reads at most 2
    input pixels per axis, so the 9-tap conv on the upsampled grid is a
    4-tap tconv on the original grid: T = M K M^T per (i,o) slice with
    M = [[1,0,0],[1,1,0],[0,1,1],[0,0,1]].

    2.25x fewer MACs and the 4x-larger nearest-upsampled activation is
    never materialised. Summation order differs from the reference's
    (taps are pre-summed in the kernel), so this is a bf16-path rewrite
    only — f32 keeps the literal upsample+conv for bit parity."""
    m = jnp.asarray([[1, 0, 0], [1, 1, 0], [0, 1, 1], [0, 0, 1]],
                    k3.dtype)
    return jnp.einsum("ap,bq,pqio->abio", m, m, k3)


@jax.custom_vjp
def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour 2x upsample, NHWC, via reshape/broadcast (no gather).

    The adjoint is written explicitly as a reshape + 2x2 window sum so the
    backward never routes through XLA's derived broadcast/reshape chain
    (which can pick a batch-minor cotangent layout at 1024^2 scale)."""
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


def _upsample2x_fwd(x):
    return upsample_nearest_2x(x), None


def _upsample2x_bwd(_, dy):
    b, h2, w2, c = dy.shape
    dx = dy.reshape(b, h2 // 2, 2, w2 // 2, 2, c).sum(axis=(2, 4))
    return (dx,)


upsample_nearest_2x.defvjp(_upsample2x_fwd, _upsample2x_bwd)


def blur_3x3(x: jnp.ndarray, *, precision=None, frozen: bool = True
             ) -> jnp.ndarray:
    """Depthwise binomial [1,2,1] x [1,2,1] / 16 blur (StyleGAN BlurLayer,
    models/stylegan_generator_model.py:441-463). The kernel is a constant,
    so the frozen-weights VJP applies (symmetric kernel: the adjoint is
    the blur itself).

    (A separable shifted-slice formulation was tried and is ~1.8x SLOWER:
    XLA materialises the pad/slice intermediates instead of fusing them,
    while the depthwise-conv emitter stays near the bandwidth roofline.)
    """
    c = x.shape[-1]
    k1 = jnp.array([1.0, 2.0, 1.0], x.dtype)
    k = jnp.outer(k1, k1) / 16.0
    kernel = jnp.tile(k[:, :, None, None], (1, 1, 1, c))  # HWIO, I=1 (dw)
    if frozen:
        return conv2d_frozen(x, kernel, ((1, 1), (1, 1)), c, precision)
    return conv2d(x, kernel, padding=((1, 1), (1, 1)),
                  feature_group_count=c, precision=precision)


def fold_batchnorm(gamma, beta, mean, var, eps):
    """Fold BN running stats into an affine (scale, shift) pair."""
    gamma = np.asarray(gamma, np.float64)
    beta = np.asarray(beta, np.float64)
    mean = np.asarray(mean, np.float64)
    var = np.asarray(var, np.float64)
    scale = gamma / np.sqrt(var + eps)
    shift = beta - mean * scale
    return scale.astype(np.float32), shift.astype(np.float32)


def affine_channels(x: jnp.ndarray, scale: jnp.ndarray, shift: jnp.ndarray
                    ) -> jnp.ndarray:
    """Per-channel affine over the last axis (folded BatchNorm)."""
    return x * scale + shift


def torch_conv_to_hwio(w: np.ndarray) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def torch_linear_to_io(w: np.ndarray) -> np.ndarray:
    """[out, in] -> [in, out]."""
    return np.transpose(np.asarray(w), (1, 0))
