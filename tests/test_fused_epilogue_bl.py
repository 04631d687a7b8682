"""Batch-in-lanes fused blur+epilogue kernel vs the XLA reference
implementation (interpreter mode on CPU), including gradients through the
custom_vjp."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from certifyingfacerecognition_tpu.ops import fused_blur_epilogue as F
from certifyingfacerecognition_tpu.ops.fused_epilogue_bl import (
    blur_epilogue_bl)

rng = np.random.default_rng(6)


def _inputs(B=8, H=16, W=32, C=16, dtype=jnp.float32):
    y = jnp.asarray(rng.standard_normal((B, H, W, C)), dtype)
    noise = jnp.asarray(rng.standard_normal((H, W, C)) * 0.1, dtype)
    bias = jnp.asarray(rng.standard_normal(C) * 0.2, jnp.float32)
    s0p1 = jnp.asarray(1.0 + 0.3 * rng.standard_normal((B, C)), jnp.float32)
    s1 = jnp.asarray(0.1 * rng.standard_normal((B, C)), jnp.float32)
    return y, noise, bias, s0p1, s1


@pytest.mark.parametrize("shape", [(8, 16, 32, 16), (4, 8, 8, 32),
                                   (2, 24, 48, 64), (3, 32, 16, 16)])
def test_bl_kernel_matches_xla_f32(shape):
    y, noise, bias, s0p1, s1 = _inputs(*shape)
    want = F._xla_impl(y, noise, bias, s0p1, s1, 1e-8)
    y_t = jnp.transpose(y, (1, 2, 3, 0))
    got = blur_epilogue_bl(y_t, noise, bias, s0p1, s1)
    got = jnp.transpose(got, (3, 0, 1, 2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_bl_kernel_gradients_match_xla_path():
    y, noise, bias, s0p1, s1 = _inputs(B=2, H=8, W=16, C=16)
    y_t = jnp.transpose(y, (1, 2, 3, 0))

    def loss_pallas(y_t, s0p1):
        return jnp.sum(jnp.square(
            blur_epilogue_bl(y_t, noise, bias, s0p1, s1)))

    def loss_xla(y, s0p1):
        return jnp.sum(jnp.square(
            F._xla_impl(y, noise, bias, s0p1, s1, 1e-8)))

    gp = jax.grad(loss_pallas, argnums=(0, 1))(y_t, s0p1)
    gx = jax.grad(loss_xla, argnums=(0, 1))(y, s0p1)
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(gp[0], (3, 0, 1, 2))), np.asarray(gx[0]),
        atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gx[1]),
                               atol=1e-4, rtol=1e-4)
