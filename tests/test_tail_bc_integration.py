"""End-to-end synthesis with the BC-layout Pallas tail (CFR_TAIL=bc) must
track the f32 truth as well as the plain bf16 XLA path does (interpreter
mode on CPU). Bit-parity between the two bf16 paths is not expected — the
tail keeps conv/blur/instnorm intermediates in f32 inside each kernel
while the XLA chain rounds every op to bf16."""

import numpy as np
import pytest
import jax.numpy as jnp


@pytest.mark.slow
def test_bc_tail_synthesis_error_no_worse_than_xla_bf16(monkeypatch):
    from certifyingfacerecognition_tpu.models import stylegan

    sd = stylegan.random_torch_style_state_dict(256, seed=1)
    params = stylegan.convert_torch_state_dict(sd, 256)
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((2, 512)), jnp.float32)

    monkeypatch.delenv("CFR_TAIL", raising=False)
    truth = np.asarray(stylegan.synthesize_from_w(params, w, resolution=256),
                       np.float32)
    plain16 = np.asarray(stylegan.synthesize_from_w(
        params, w, resolution=256, dtype=jnp.bfloat16), np.float32)

    monkeypatch.setenv("CFR_TAIL", "bc")
    monkeypatch.setenv("CFR_TAIL_MIN_RES", "128")
    bc16 = np.asarray(stylegan.synthesize_from_w(
        params, w, resolution=256, dtype=jnp.bfloat16), np.float32)

    err_plain = np.abs(plain16 - truth)
    err_bc = np.abs(bc16 - truth)
    assert err_bc.mean() <= 1.5 * err_plain.mean() + 1e-4, \
        (err_bc.mean(), err_plain.mean())
    assert np.percentile(err_bc, 99.9) <= \
        1.5 * np.percentile(err_plain, 99.9) + 1e-3


def test_bc_tail_f32_dtype_ignores_env(monkeypatch):
    """The f32 path must stay pure-XLA (bit parity with torch) even with
    CFR_TAIL=bc set."""
    from certifyingfacerecognition_tpu.models import stylegan

    sd = stylegan.random_torch_style_state_dict(128, seed=2)
    params = stylegan.convert_torch_state_dict(sd, 128)
    w = jnp.asarray(np.random.default_rng(1).standard_normal((2, 512)),
                    jnp.float32)

    monkeypatch.delenv("CFR_TAIL", raising=False)
    a = np.asarray(stylegan.synthesize_from_w(params, w, resolution=128))
    monkeypatch.setenv("CFR_TAIL", "bc")
    monkeypatch.setenv("CFR_TAIL_MIN_RES", "128")
    b = np.asarray(stylegan.synthesize_from_w(params, w, resolution=128))
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_bc_tail_gradient_close_to_plain_path(monkeypatch):
    """Attack gradients through the BC tail (custom_vjp -> XLA reference
    backward) must agree with the plain path's gradients."""
    import jax
    from certifyingfacerecognition_tpu.models import stylegan

    sd = stylegan.random_torch_style_state_dict(128, seed=3)
    params = stylegan.convert_torch_state_dict(sd, 128)
    w = jnp.asarray(np.random.default_rng(2).standard_normal((2, 512)),
                    jnp.float32)

    def loss(w, dtype):
        img = stylegan.synthesize_from_w(params, w, resolution=128,
                                         dtype=dtype)
        return jnp.sum(img.astype(jnp.float32) ** 2)

    monkeypatch.delenv("CFR_TAIL", raising=False)
    g_plain = np.asarray(jax.grad(loss)(w, jnp.bfloat16), np.float32)
    g_truth = np.asarray(jax.grad(loss)(w, jnp.float32), np.float32)

    monkeypatch.setenv("CFR_TAIL", "bc")
    monkeypatch.setenv("CFR_TAIL_MIN_RES", "128")
    g_bc = np.asarray(jax.grad(loss)(w, jnp.bfloat16), np.float32)

    scale = np.abs(g_truth).mean()
    err_plain = np.abs(g_plain - g_truth).mean() / scale
    err_bc = np.abs(g_bc - g_truth).mean() / scale
    assert err_bc <= 1.5 * err_plain + 0.02, (err_bc, err_plain)
