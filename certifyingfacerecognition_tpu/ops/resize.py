"""Bilinear resize with exact PyTorch semantics, expressed as two matmuls.

The reference resizes generated 1024x1024 faces to the FRS input resolution
with ``F.interpolate(mode='bilinear', align_corners=False)``
(/root/reference/attack_utils/gen_utils.py:77-85). That operator (without
antialiasing) is a sparse separable linear map: each output pixel mixes at
most two input rows and two input columns. We materialise the two 1-D
interpolation matrices once and apply them as dense matmuls — bit-matching
torch's sampling (half-pixel centres, edge clamping) while running on the
TPU MXU instead of a gather pipeline.

Note: ``jax.image.resize`` is NOT equivalent here — it antialiases on
downsampling (scale-dilated triangle kernel), torch's interpolate does not.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=16)
def _interp_matrix(out_size: int, in_size: int) -> np.ndarray:
    """[out_size, in_size] row-stochastic bilinear sampling matrix with
    torch align_corners=False semantics."""
    M = np.zeros((out_size, in_size), np.float32)
    # torch computes the source index in float32 — match it exactly, or a
    # handful of output pixels pick the neighbouring input pixel.
    scale = np.float32(in_size / out_size)
    for o in range(out_size):
        src = (np.float32(o) + np.float32(0.5)) * scale - np.float32(0.5)
        src = float(max(src, np.float32(0.0)))
        i0 = min(int(np.floor(src)), in_size - 1)
        i1 = min(i0 + 1, in_size - 1)
        frac = src - i0
        M[o, i0] += 1.0 - frac
        M[o, i1] += frac
    return M


def resize_bilinear(x: jnp.ndarray, out_h: int, out_w: int,
                    *, precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """x: [B, H, W, C] -> [B, out_h, out_w, C], torch-bilinear-exact."""
    b, h, w, c = x.shape
    # Match the input dtype: f32 sampling matrices would silently promote
    # a bf16 pipeline (and its gradients) to f32 — the interpolation
    # weights are exact in bf16 up to its resolution either way.
    Mv = jnp.asarray(_interp_matrix(out_h, h), x.dtype)
    Mh = jnp.asarray(_interp_matrix(out_w, w), x.dtype)
    y = jnp.einsum("oh,bhwc->bowc", Mv, x, precision=precision)
    y = jnp.einsum("pw,bowc->bopc", Mh, y, precision=precision)
    return y


def transform_for_frs(images01: jnp.ndarray, img_size: int,
                      mean: float = 0.5, std: float = 0.5,
                      *, precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """Resize [0,1] images to the FRS input resolution and normalise.

    Matches get_transform (gen_utils.py:77-85): bilinear resize then
    Normalize((mean,)*3, (std,)*3).
    """
    x = resize_bilinear(images01, img_size, img_size, precision=precision)
    return (x - mean) / std


def transform_for_frs_cb(images01_cb: jnp.ndarray, img_size: int,
                         mean: float = 0.5, std: float = 0.5,
                         *, precision=jax.lax.Precision.HIGHEST
                         ) -> jnp.ndarray:
    """transform_for_frs for images in the Pallas chain tail's [3, H, W, B]
    layout (ops/synthesis_tail_bc.py). Returns standard NHWC [B, s, s, 3].

    Rationale: transposing the full-resolution image to NHWC first is not
    even representable on TPU — [B, 1024, 1024, 3] pads the 3 channels to
    128 lanes (a 32 GB allocation at batch 128) — so XLA fuses the
    transpose into the resize's operand reads, which costs tens of ms of
    scattered access. Resizing IN the chain layout instead keeps both
    matmul contractions on dense tiles (W is the sublane dim of the
    operand, H a cheap major dim of the 8x-smaller intermediate) and defers
    the layout change to the [3, s, s, B] output — ~0.6% the bytes.
    """
    c, h, w, b = images01_cb.shape
    Mv = jnp.asarray(_interp_matrix(img_size, h), images01_cb.dtype)
    Mh = jnp.asarray(_interp_matrix(img_size, w), images01_cb.dtype)
    y = jnp.einsum("pw,chwb->chpb", Mh, images01_cb, precision=precision)
    y = jnp.einsum("oh,chpb->copb", Mv, y, precision=precision)
    y = jnp.transpose(y, (3, 1, 2, 0))            # [B, s, s, 3] (tiny)
    return (y - mean) / std
