"""Fused blur+epilogue Pallas kernel vs the XLA reference implementation
(interpreter mode on CPU), including gradients through the custom_vjp."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from certifyingfacerecognition_tpu.ops import fused_blur_epilogue as F

rng = np.random.default_rng(5)


def _inputs(B=3, H=16, W=32, C=16, dtype=jnp.float32):
    y = jnp.asarray(rng.standard_normal((B, H, W, C)), dtype)
    noise = jnp.asarray(rng.standard_normal((H, W, C)) * 0.1, dtype)
    bias = jnp.asarray(rng.standard_normal(C) * 0.2, jnp.float32)
    s0p1 = jnp.asarray(1.0 + 0.3 * rng.standard_normal((B, C)), jnp.float32)
    s1 = jnp.asarray(0.1 * rng.standard_normal((B, C)), jnp.float32)
    return y, noise, bias, s0p1, s1


@pytest.mark.parametrize("shape", [(3, 16, 32, 16), (2, 8, 8, 32),
                                   (1, 24, 16, 64)])
def test_kernel_matches_xla_f32(shape):
    y, noise, bias, s0p1, s1 = _inputs(*shape)
    want = F._xla_impl(y, noise, bias, s0p1, s1, 1e-8)
    got = F.blur_epilogue(y, noise, bias, s0p1, s1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_kernel_bf16_error_no_worse_than_xla_bf16():
    """Both bf16 paths approximate the f32 truth; the kernel's error must
    be comparable to (not worse than) XLA's own bf16 rounding."""
    y, noise, bias, s0p1, s1 = _inputs(dtype=jnp.bfloat16)
    truth = np.asarray(F._xla_impl(y.astype(jnp.float32),
                                   noise.astype(jnp.float32),
                                   bias, s0p1, s1, 1e-8))
    xla16 = np.asarray(F._xla_impl(y, noise, bias, s0p1, s1, 1e-8),
                       np.float32)
    got = np.asarray(F.blur_epilogue(y, noise, bias, s0p1, s1), np.float32)
    err_xla = np.abs(xla16 - truth)
    err_ker = np.abs(got - truth)
    assert err_ker.mean() <= 1.5 * err_xla.mean() + 1e-4
    assert np.percentile(err_ker, 99.9) <= \
        1.5 * np.percentile(err_xla, 99.9) + 1e-3


def test_gradients_match_xla_path():
    y, noise, bias, s0p1, s1 = _inputs(B=2, H=8, W=16, C=16)

    def loss_pallas(y, s0p1):
        return jnp.sum(jnp.square(F.blur_epilogue(y, noise, bias, s0p1, s1)))

    def loss_xla(y, s0p1):
        return jnp.sum(jnp.square(F._xla_impl(y, noise, bias, s0p1, s1,
                                              1e-8)))

    gp = jax.grad(loss_pallas, argnums=(0, 1))(y, s0p1)
    gx = jax.grad(loss_xla, argnums=(0, 1))(y, s0p1)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)
