"""Golden-value parity tests: JAX StyleGAN vs the reference PyTorch model.

Strategy: build the reference torch model (CPU) at a small resolution, load a
randomly-initialised state dict, convert the same state dict with our
converter, and compare stage-by-stage outputs. This pins down the equalised-lr
conventions, truncation, fixed noise, blur, fused-transpose upscaling and
AdaIN semantics without needing the released FFHQ weights.
"""

import os
import sys

import numpy as np
import pytest
import jax.numpy as jnp

from certifyingfacerecognition_tpu.models import stylegan as sg

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")


def _torch_model(resolution, sd_np):
    import torch
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from models.stylegan_generator_model import StyleGANGeneratorModel

    model = StyleGANGeneratorModel(resolution=resolution, fused_scale="auto",
                                   truncation_psi=0.7, truncation_layers=8,
                                   randomize_noise=False)
    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in sd_np.items()}
    missing, unexpected = model.load_state_dict(sd, strict=False)
    assert not unexpected
    # Only derived/constant buffers may be missing from our random dict.
    allowed = ("truncation.truncation", "lod", "blur.kernel")
    assert all(any(a in m for a in allowed) for m in missing)
    return model.eval()


# 256 covers TWO fused-transpose blocks back to back (the >=512^2 tail
# structure at test scale)
@pytest.mark.parametrize("resolution", [32, 128, 256])
def test_full_generator_parity(resolution):
    import torch

    sd = sg.random_torch_style_state_dict(resolution, seed=3)
    model = _torch_model(resolution, sd)
    params = sg.convert_torch_state_dict(sd, resolution)

    rng = np.random.default_rng(7)
    L = sg.num_layers(resolution)
    wp = rng.standard_normal((2, L, 512)).astype(np.float32)

    with torch.no_grad():
        ref = model.synthesis(torch.from_numpy(wp)).numpy()  # NCHW

    got = np.asarray(sg.synthesis_apply(params, jnp.asarray(wp),
                                        resolution=resolution))
    got = np.transpose(got, (0, 3, 1, 2))
    scale = max(1.0, np.abs(ref).max())
    np.testing.assert_allclose(got / scale, ref / scale, atol=2e-5)


def test_nearest_up_conv_tconv_rewrite_exact():
    """The bf16 path's 4-tap tconv rewrite of upsample_nearest+conv3x3
    (nn.nearest_up_conv3_as_tconv_kernel) must match the literal op pair
    in f32 to rounding — including the zero-padding edge rows/cols."""
    import jax

    from certifyingfacerecognition_tpu.models import nn

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)), jnp.float32)
    k3 = jnp.asarray(rng.standard_normal((3, 3, 16, 12)), jnp.float32)

    want = nn.conv2d_frozen(nn.upsample_nearest_2x(x), k3,
                            ((1, 1), (1, 1)), 1, jax.lax.Precision.HIGHEST)
    k4 = nn.nearest_up_conv3_as_tconv_kernel(k3)
    got = sg._upconv(x, k4, jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_bf16_synthesis_close_to_f32_with_nonfused_rewrite():
    """Full synthesis at a resolution whose every up block is the
    NON-fused (upsample+conv) kind: the bf16 path (which takes the tconv
    rewrite) must track the f32 truth within bf16 tolerance."""
    resolution = 64  # all blocks < 128 -> all non-fused
    sd = sg.random_torch_style_state_dict(resolution, seed=5)
    params = sg.convert_torch_state_dict(sd, resolution)
    rng = np.random.default_rng(9)
    L = sg.num_layers(resolution)
    wp = jnp.asarray(rng.standard_normal((2, L, 512)), jnp.float32)

    f32 = np.asarray(sg.synthesis_apply(params, wp, resolution=resolution))
    bf16 = np.asarray(sg.synthesis_apply(params, wp, resolution=resolution,
                                         dtype=jnp.bfloat16)
                      .astype(jnp.float32))
    scale = max(1.0, np.abs(f32).max())
    np.testing.assert_allclose(bf16 / scale, f32 / scale, atol=0.05)


def test_mapping_parity():
    import torch

    resolution = 32
    sd = sg.random_torch_style_state_dict(resolution, seed=5)
    model = _torch_model(resolution, sd)
    params = sg.convert_torch_state_dict(sd, resolution)

    z = np.random.default_rng(11).standard_normal((4, 512)).astype(np.float32)
    with torch.no_grad():
        ref = model.mapping(torch.from_numpy(z)).numpy()
    got = np.asarray(sg.mapping_apply(params, jnp.asarray(z)))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=1e-30)


def test_truncation_parity():
    import torch

    resolution = 32
    sd = sg.random_torch_style_state_dict(resolution, seed=6)
    model = _torch_model(resolution, sd)
    params = sg.convert_torch_state_dict(sd, resolution)

    w = np.random.default_rng(13).standard_normal((3, 512)).astype(np.float32)
    with torch.no_grad():
        ref = model.truncation(torch.from_numpy(w)).numpy()
    got = np.asarray(sg.truncation_apply(params, jnp.asarray(w),
                                         resolution=resolution))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_postprocess_matches_reference_formula():
    x = np.linspace(-1.2, 1.2, 11).reshape(1, 1, 1, 11).astype(np.float32)
    got = np.asarray(sg.postprocess(jnp.asarray(x)))
    want = np.clip((x + 1.0) / 2.0 + 0.5 / 255.0, 0.0, 1.0)
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_truncated_synthesis_matches_native_params():
    """Reduced-resolution path (--synthesis-resolution): synthesizing at
    res r from a larger model's params must equal synthesizing from the
    r-native conversion of the same weights — the channel plans are
    prefixes of each other and heads are numbered from 4x4 upward, so the
    truncated program reuses the early layers + matching ToRGB head."""
    import jax.numpy as jnp

    from certifyingfacerecognition_tpu.models import stylegan

    sd = stylegan.random_torch_style_state_dict(128, seed=9)
    params_big = stylegan.convert_torch_state_dict(sd, 128)
    params_small = stylegan.convert_torch_state_dict(sd, 32)

    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.standard_normal((2, 512)), jnp.float32)
    img_trunc = stylegan.synthesize_from_w(params_big, w, resolution=32)
    img_native = stylegan.synthesize_from_w(params_small, w, resolution=32)
    assert img_trunc.shape == (2, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(img_trunc),
                               np.asarray(img_native), atol=1e-6)


def test_xla_cb_out_final_torgb_matches_nhwc():
    """The channel-outer final-ToRGB branch (cb_out=True on the pure-XLA
    path, models/stylegan.synthesis_apply) must equal the NHWC conv branch
    transposed — same math, different output layout."""
    resolution = 32
    params = sg.random_params(resolution, seed=11)
    rng = np.random.default_rng(12)
    L = sg.num_layers(resolution)
    wp = jnp.asarray(rng.standard_normal((4, L, 512)), jnp.float32)

    # The channel-outer matmul reassociates the C=512 reduction, so even
    # f32 is equal only to rounding (the branch is gated to the bf16 perf
    # path in cb_out_active; the f32 pipeline keeps the conv + its
    # bit-parity contract).
    for dtype, tol in ((jnp.float32, 1e-4), (jnp.bfloat16, 2e-2)):
        nhwc = np.asarray(sg.synthesis_apply(
            params, wp, resolution=resolution, dtype=dtype
        ).astype(jnp.float32))
        cb = np.asarray(sg.synthesis_apply(
            params, wp, resolution=resolution, dtype=dtype, cb_out=True
        ).astype(jnp.float32))
        assert cb.shape == (3, resolution, resolution, 4)
        np.testing.assert_allclose(
            cb.transpose(3, 1, 2, 0), nhwc, atol=tol,
            rtol=tol, err_msg=str(dtype))
