"""Tests for resize and distance ops (parity with torch semantics)."""

import numpy as np
import pytest
import jax.numpy as jnp

from certifyingfacerecognition_tpu.ops import distances as D
from certifyingfacerecognition_tpu.ops import resize as R

rng = np.random.default_rng(42)


@pytest.mark.parametrize("in_size,out_size", [(64, 112), (256, 112), (64, 160),
                                              (32, 32)])
def test_resize_matches_torch_bilinear(in_size, out_size):
    import torch
    import torch.nn.functional as F

    x = rng.standard_normal((2, 3, in_size, in_size)).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x), size=(out_size, out_size),
                         mode="bilinear", align_corners=False).numpy()
    got = np.asarray(R.resize_bilinear(
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))), out_size, out_size))
    got = np.transpose(got, (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_cdist_matches_torch_exact_mode():
    import torch

    x = rng.standard_normal((5, 512)).astype(np.float32)
    y = rng.standard_normal((20, 512)).astype(np.float32)
    want = torch.cdist(torch.from_numpy(x), torch.from_numpy(y),
                       compute_mode="donot_use_mm_for_euclid_dist").numpy()
    got = np.asarray(D.cdist(jnp.asarray(x), jnp.asarray(y), "insightface"))
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-4)


def test_cosine_distance():
    x = rng.standard_normal((4, 16)).astype(np.float32)
    y = rng.standard_normal((6, 16)).astype(np.float32)
    got = np.asarray(D.cdist(jnp.asarray(x), jnp.asarray(y), "facenet"))
    np.testing.assert_allclose(got, 1 - x @ y.T, atol=1e-5)


def test_argmin_refined_matches_exact_argmin_with_near_ties():
    # Construct a gallery with two nearly tied candidates per query.
    base = rng.standard_normal((64, 512)).astype(np.float32)
    x = base[:8] + 1e-3 * rng.standard_normal((8, 512)).astype(np.float32)
    # duplicate near-neighbours at a tiny offset
    gallery = np.concatenate([base, base[:8] + 2e-6], axis=0).astype(np.float32)

    import torch
    want = torch.cdist(torch.from_numpy(x), torch.from_numpy(gallery),
                       compute_mode="donot_use_mm_for_euclid_dist"
                       ).argmin(1).numpy()
    got = np.asarray(D.argmin_dist_refined(jnp.asarray(x),
                                           jnp.asarray(gallery)))
    np.testing.assert_array_equal(got, want)


def test_nearest_refined_large_gallery_and_tie_break():
    # Exact argmin (float64 ground truth) on a large gallery, plus an
    # exact-duplicate tie that must resolve to the lowest global index
    # (the explicit lexicographic (distance, index) re-rank tie-break,
    # matching torch.argmin).
    n = 136072
    x = rng.standard_normal((4, 512)).astype(np.float32)
    gallery = rng.standard_normal((n, 512)).astype(np.float32)
    dup = (x[0] + 1e-3 * rng.standard_normal(512)).astype(np.float32)
    gallery[54321] = dup
    gallery[123456] = dup
    x64, g64 = x.astype(np.float64), gallery.astype(np.float64)
    d2_64 = ((x64 ** 2).sum(1)[:, None] + (g64 ** 2).sum(1)[None, :]
             - 2.0 * x64 @ g64.T)
    want = d2_64.argmin(1)
    assert want[0] == 54321  # the tie resolved low in the ground truth too
    dist, idx = D.nearest_refined(jnp.asarray(x), jnp.asarray(gallery))
    np.testing.assert_array_equal(np.asarray(idx), want)
    np.testing.assert_allclose(np.asarray(dist), d2_64.min(1), rtol=1e-4)


def test_nearest_refined_nonfinite_query_stays_in_range():
    # A non-finite embedding row (e.g. a garbage-weight dryrun forward)
    # makes every exact re-rank comparison false; the returned index must
    # still be in range (argmin fallback), never an out-of-range sentinel
    # that a downstream bincount would silently drop.
    x = np.full((2, 512), np.nan, np.float32)
    x[1] = rng.standard_normal(512).astype(np.float32)
    g = rng.standard_normal((100, 512)).astype(np.float32)
    _, idx = D.nearest_refined(jnp.asarray(x), jnp.asarray(g))
    assert 0 <= int(idx[0]) < 100
    want = ((x[1:2, None, :] - g[None]) ** 2).sum(-1).argmin(1)[0]
    assert int(idx[1]) == want


def test_probs_from_dists():
    d = rng.uniform(10, 30, (3, 7)).astype(np.float32)
    p = np.asarray(D.probs_from_dists(jnp.asarray(d)))
    s = np.exp(-d / np.sqrt(512))
    np.testing.assert_allclose(p, s / s.sum(1, keepdims=True), rtol=1e-5)


def test_conv2d_frozen_grad_matches_autodiff():
    """The hand-written frozen-conv adjoints (stride 1/2, padded/unpadded,
    dense/depthwise, + nearest-upsample) must equal XLA's auto-derived
    input gradients exactly; weight grads are zero by design."""
    import jax
    import jax.numpy as jnp

    from certifyingfacerecognition_tpu.models import nn

    rng = np.random.default_rng(0)
    hi = jax.lax.Precision.HIGHEST
    cases = [
        # (h, w, cin, cout, kh, pad, fgc, stride)
        (12, 12, 8, 16, 3, 1, 1, 1),
        (12, 12, 8, 16, 3, 1, 1, 2),   # iresnet conv2 stride-2
        (13, 11, 8, 16, 3, 1, 1, 2),   # odd sizes
        (12, 12, 8, 16, 1, 0, 1, 2),   # downsample 1x1 stride-2
        (12, 12, 8, 8, 3, 1, 8, 1),    # depthwise blur shape
    ]
    for h, w, cin, cout, kh, pad, fgc, stride in cases:
        x = jnp.asarray(rng.standard_normal((2, h, w, cin)), jnp.float32)
        kshape = (kh, kh, cin // fgc, cout)
        k = jnp.asarray(rng.standard_normal(kshape), jnp.float32)
        padding = ((pad, pad), (pad, pad))

        ref = lambda x_, k_: nn.conv2d(x_, k_, stride=stride,
                                       padding=padding,
                                       feature_group_count=fgc, precision=hi)
        fro = lambda x_, k_: nn.conv2d_frozen(x_, k_, padding, fgc, hi,
                                              stride)
        y_ref = ref(x, k)
        y = fro(x, k)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=1e-6, atol=1e-6)
        dy = jnp.asarray(rng.standard_normal(y.shape), jnp.float32)
        dx_ref, _ = jax.vjp(ref, x, k)[1](dy)
        (dx, dk) = jax.vjp(fro, x, k)[1](dy)
        np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=str((h, w, kh, pad, fgc, stride)))
        assert not np.asarray(dk).any()

    # nearest-upsample adjoint == derived broadcast adjoint
    x = jnp.asarray(rng.standard_normal((2, 6, 5, 4)), jnp.float32)
    up_ref = lambda x_: jnp.repeat(jnp.repeat(x_, 2, axis=1), 2, axis=2)
    y = nn.upsample_nearest_2x(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(up_ref(x)))
    dy = jnp.asarray(rng.standard_normal(y.shape), jnp.float32)
    (dx,) = jax.vjp(nn.upsample_nearest_2x, x)[1](dy)
    (dx_ref,) = jax.vjp(up_ref, x)[1](dy)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                               rtol=1e-6, atol=1e-6)
