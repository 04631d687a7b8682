"""Correctness of the [H, W, C, B]-layout Pallas synthesis-tail kernels
(ops/synthesis_tail_bc.py) against the XLA reference implementations, in
interpreter mode on the CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from certifyingfacerecognition_tpu.ops import synthesis_tail_bc as bc


def _mk(shape, key, dtype=jnp.float32, scale=1.0):
    return (jax.random.normal(jax.random.PRNGKey(key), shape) * scale
            ).astype(dtype)


def _conv_args(h, w, b, ci, co, dtype=jnp.float32):
    x = _mk((h, w, ci, b), 0, dtype)
    k = _mk((3, 3, ci, co), 1, jnp.float32, 0.2)
    nb = _mk((h, w, co), 2)
    s0p1 = _mk((b, co), 3) + 1.0
    s1 = _mk((b, co), 4)
    return x, k, nb, s0p1, s1


@pytest.mark.parametrize("h,w,b,ci,co", [(16, 16, 8, 16, 16),
                                         (8, 32, 16, 8, 8),
                                         (32, 8, 8, 8, 16),
                                         (16, 16, 8, 32, 32)])
def test_conv_epilogue_matches_ref(h, w, b, ci, co):
    x, k, nb, s0p1, s1 = _conv_args(h, w, b, ci, co)
    got = bc.conv_epilogue_bc(x, k, nb, s0p1, s1)
    want = bc._conv_ref(x, k, nb, s0p1, s1, 1e-8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_conv_epilogue_rgb_matches_ref():
    h, w, b, ci, co = 16, 16, 8, 16, 16
    x, k, nb, s0p1, s1 = _conv_args(h, w, b, ci, co)
    w_rgb = _mk((co, 3), 5, jnp.float32, 0.3)
    b_rgb = _mk((3,), 6)
    got = bc.conv_epilogue_rgb_bc(x, k, nb, s0p1, s1, w_rgb, b_rgb)
    want = bc._conv_rgb_ref(x, k, nb, s0p1, s1, w_rgb, b_rgb, 1e-8)
    assert got.shape == (3, h, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("h,w,b,ci,co", [(8, 8, 8, 16, 8),
                                         (16, 8, 8, 8, 16),
                                         (8, 16, 16, 8, 8),
                                         (8, 8, 8, 64, 32)])
def test_upconv_blur_epilogue_matches_ref(h, w, b, ci, co):
    x = _mk((h, w, ci, b), 0)
    k4 = _mk((4, 4, ci, co), 1, jnp.float32, 0.2)
    nb = _mk((2 * h, 2 * w, co), 2)
    s0p1 = _mk((b, co), 3) + 1.0
    s1 = _mk((b, co), 4)
    got = bc.upconv_blur_epilogue_bc(x, k4, nb, s0p1, s1)
    want = bc._upconv_ref(x, k4, nb, s0p1, s1, 1e-8)
    assert got.shape == (2 * h, 2 * w, co, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_single_tile_grid():
    """Tiny inputs exercise the nh == nw == 1 DMA edge case."""
    x, k, nb, s0p1, s1 = _conv_args(8, 8, 8, 8, 8)
    got = bc.conv_epilogue_bc(x, k, nb, s0p1, s1)
    want = bc._conv_ref(x, k, nb, s0p1, s1, 1e-8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_bf16_close_to_f32_truth():
    h, w, b, ci, co = 16, 16, 8, 16, 16
    x, k, nb, s0p1, s1 = _conv_args(h, w, b, ci, co)
    got = bc.conv_epilogue_bc(x.astype(jnp.bfloat16), k, nb, s0p1, s1)
    want = bc._conv_ref(x, k, nb, s0p1, s1, 1e-8)
    err = np.abs(np.asarray(got, np.float32) - np.asarray(want))
    assert np.median(err) < 0.05, np.median(err)


def test_gradients_route_through_reference():
    """custom_vjp backward == jax.vjp of the XLA reference (exactly)."""
    h, w, b, ci, co = 8, 8, 8, 8, 8
    x, k, nb, s0p1, s1 = _conv_args(h, w, b, ci, co)

    def loss_pallas(x, s0p1, s1):
        return jnp.sum(bc.conv_epilogue_bc(x, k, nb, s0p1, s1) ** 2)

    def loss_ref(x, s0p1, s1):
        return jnp.sum(bc._conv_ref(x, k, nb, s0p1, s1, 1e-8) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, s0p1, s1)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, s0p1, s1)
    for a, b_ in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=5e-4, atol=5e-4)


def test_upconv_gradient_matches_ref():
    h, w, b, ci, co = 8, 8, 8, 8, 8
    x = _mk((h, w, ci, b), 0)
    k4 = _mk((4, 4, ci, co), 1, jnp.float32, 0.2)
    nb = _mk((2 * h, 2 * w, co), 2)
    s0p1 = _mk((b, co), 3) + 1.0
    s1 = _mk((b, co), 4)

    gp = jax.grad(lambda x: jnp.sum(
        bc.upconv_blur_epilogue_bc(x, k4, nb, s0p1, s1) ** 2))(x)
    gr = jax.grad(lambda x: jnp.sum(
        bc._upconv_ref(x, k4, nb, s0p1, s1, 1e-8) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                               rtol=5e-4, atol=5e-4)


@pytest.mark.slow
def test_tail_chain_matches_ref():
    """Chain mode (deferred affines, one traversal per layer) must match
    the XLA reference chain."""
    b, ci, co = 8, 16, 8
    h = 8
    blocks = []
    for li, (cin, cout) in enumerate([(ci, co), (co, co)]):
        key = li * 10
        blk = {
            "k4": _mk((4, 4, cin, cout), key + 1, jnp.float32, 0.2),
            "up_nb": _mk((2 * h, 2 * h, cout), key + 2),
            "up_s0p1": _mk((b, cout), key + 3) + 1.0,
            "up_s1": _mk((b, cout), key + 4),
            "k": _mk((3, 3, cout, cout), key + 5, jnp.float32, 0.2),
            "conv_nb": _mk((2 * h, 2 * h, cout), key + 6),
            "conv_s0p1": _mk((b, cout), key + 7) + 1.0,
            "conv_s1": _mk((b, cout), key + 8),
        }
        blocks.append(blk)
        h *= 2
    blocks[-1]["w_rgb"] = _mk((co, 3), 90, jnp.float32, 0.3)
    blocks[-1]["b_rgb"] = _mk((3,), 91)
    x = _mk((8, 8, ci, b), 0)
    got = bc.tail_chain_bc(x, tuple(blocks))
    want = bc._chain_ref(x, tuple(blocks), 1e-8)
    assert got.shape == (3, 32, 32, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-4)


def test_tail_chain_three_blocks_matches_ref():
    """A >=3-block chain has a TRUE middle block (receives a deferred
    affine AND defers its own) — the structure CFR_TAIL_MIN_RES=256/128
    runs; the 2-block test above never exercises it."""
    b = 8
    h = 8
    ladder = [(32, 16), (16, 8), (8, 8)]
    blocks = []
    for li, (cin, cout) in enumerate(ladder):
        key = 100 + li * 10
        blocks.append({
            "k4": _mk((4, 4, cin, cout), key + 1, jnp.float32, 0.2),
            "up_nb": _mk((2 * h, 2 * h, cout), key + 2),
            "up_s0p1": _mk((b, cout), key + 3) + 1.0,
            "up_s1": _mk((b, cout), key + 4),
            "k": _mk((3, 3, cout, cout), key + 5, jnp.float32, 0.2),
            "conv_nb": _mk((2 * h, 2 * h, cout), key + 6),
            "conv_s0p1": _mk((b, cout), key + 7) + 1.0,
            "conv_s1": _mk((b, cout), key + 8),
        })
        h *= 2
    blocks[-1]["w_rgb"] = _mk((8, 3), 190, jnp.float32, 0.3)
    blocks[-1]["b_rgb"] = _mk((3,), 191)
    x = _mk((8, 8, 32, b), 0)
    got = bc.tail_chain_bc(x, tuple(blocks))
    want = bc._chain_ref(x, tuple(blocks), 1e-8)
    assert got.shape == (3, 64, 64, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-4)


@pytest.mark.slow
def test_tail_chain_gradient_matches_ref():
    b, ci, co = 8, 8, 8
    blk = {
        "k4": _mk((4, 4, ci, co), 1, jnp.float32, 0.2),
        "up_nb": _mk((16, 16, co), 2),
        "up_s0p1": _mk((b, co), 3) + 1.0,
        "up_s1": _mk((b, co), 4),
        "k": _mk((3, 3, co, co), 5, jnp.float32, 0.2),
        "conv_nb": _mk((16, 16, co), 6),
        "conv_s0p1": _mk((b, co), 7) + 1.0,
        "conv_s1": _mk((b, co), 8),
        "w_rgb": _mk((co, 3), 9, jnp.float32, 0.3),
        "b_rgb": _mk((3,), 10),
    }
    x = _mk((8, 8, ci, b), 0)
    gp = jax.grad(lambda x: jnp.sum(
        bc.tail_chain_bc(x, (blk,)) ** 2))(x)
    gr = jax.grad(lambda x: jnp.sum(
        bc._chain_ref(x, (blk,), 1e-8) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                               rtol=5e-4, atol=5e-4)
