"""PSD-matched proxy weights (tools/spectral_study, VERDICT r3 #4).

CPU-sized checks that the spectral_gamma shaping does what the study
relies on: steepens the synthesized images' radial power-spectrum slope
toward the natural-image 1/f² law, without touching the gamma=0 path.
"""

import numpy as np
import jax.numpy as jnp

from certifyingfacerecognition_tpu.models import stylegan
from certifyingfacerecognition_tpu.tools.spectral_study import (
    measure_gamma, radial_psd_slope)

RES = 128


def test_gamma_zero_is_bitwise_unchanged():
    """Shaping transforms values after drawing, so gamma=0 must reproduce
    the exact historical weight stream (golden tests depend on it)."""
    a = stylegan.random_torch_style_state_dict(RES, seed=3)
    b = stylegan.random_torch_style_state_dict(RES, seed=3,
                                               spectral_gamma=0.0)
    assert a.keys() == b.keys()
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])


def test_gamma_shapes_only_values_not_shapes():
    a = stylegan.random_torch_style_state_dict(RES, seed=0)
    b = stylegan.random_torch_style_state_dict(RES, seed=0,
                                               spectral_gamma=1.5)
    for k in a:
        assert a[k].shape == b[k].shape
        if "apply_noise.noise" in k or "style_mod" in k or \
                "first_layer" in k or "mapping" in k:
            np.testing.assert_array_equal(a[k], b[k])  # untouched groups
    # High-res conv kernels are spatially smoothed: their spatial
    # variance around the per-(i,o) mean shrinks by beta^2.
    k = f"synthesis.layer{stylegan.num_layers(RES) - 1}.conv.weight"
    res = RES
    beta = (stylegan.SPECTRAL_BASE_RES / res) ** 1.5
    dev_a = a[k] - a[k].mean(axis=(2, 3), keepdims=True)
    dev_b = b[k] - b[k].mean(axis=(2, 3), keepdims=True)
    np.testing.assert_allclose(dev_b, beta * dev_a, rtol=1e-5, atol=1e-6)


def test_radial_psd_slope_known_signals():
    rng = np.random.default_rng(0)
    H = 128
    white = rng.standard_normal((4, H, H)).astype(np.float32)
    s_white, _ = radial_psd_slope(white)
    assert abs(s_white) < 0.4, s_white
    # Synthesize ~1/f² power: shape white noise by 1/f in amplitude.
    f = np.sqrt(np.fft.fftfreq(H)[:, None] ** 2 +
                np.fft.fftfreq(H)[None, :] ** 2)
    f[0, 0] = 1.0
    shaped = np.real(np.fft.ifft2(
        np.fft.fft2(white) / (f * H))).astype(np.float32)
    s_pink, _ = radial_psd_slope(shaped)
    assert abs(s_pink + 2.0) < 0.4, s_pink


def test_gamma_shapes_synthesized_spectrum_both_directions():
    """The shaping lever works end-to-end through the real synthesis:
    positive gamma steepens the PSD slope (smoothing), negative gamma
    flattens it (whitening — the direction the 1024² realistic-weight
    calibration actually needs, docs/PERF.md). CPU, 128², f32."""
    s0 = measure_gamma(0.0, RES, n_images=4, dtype=jnp.float32)
    s_smooth = measure_gamma(2.0, RES, n_images=4, dtype=jnp.float32)
    s_white = measure_gamma(-1.0, RES, n_images=4, dtype=jnp.float32)
    assert s_smooth < s0 - 0.7, (s0, s_smooth)
    assert s_white > s0 + 0.3, (s0, s_white)
