"""End-to-end synthesis with the batch-in-lanes fused epilogue enabled
must track the f32 truth as well as the plain bf16 XLA path does
(interpreter mode on CPU). Bit-parity between the two bf16 paths is not
expected — the kernel accumulates blur/instnorm in f32 while the XLA
chain rounds each elementwise op to bf16, and the difference amplifies
through later blocks."""

import numpy as np
import pytest
import jax.numpy as jnp


@pytest.mark.slow
def test_bl_mode_synthesis_error_no_worse_than_xla_bf16(monkeypatch):
    from certifyingfacerecognition_tpu.models import stylegan

    sd = stylegan.random_torch_style_state_dict(256, seed=1)
    params = stylegan.convert_torch_state_dict(sd, 256)
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((2, 512)), jnp.float32)

    monkeypatch.delenv("CFR_FUSED_EPILOGUE", raising=False)
    truth = np.asarray(stylegan.synthesize_from_w(params, w, resolution=256),
                       np.float32)
    plain16 = np.asarray(stylegan.synthesize_from_w(
        params, w, resolution=256, dtype=jnp.bfloat16), np.float32)

    monkeypatch.setenv("CFR_FUSED_EPILOGUE", "bl")
    monkeypatch.setenv("CFR_FUSED_EPILOGUE_MIN_RES", "128")
    fused16 = np.asarray(stylegan.synthesize_from_w(
        params, w, resolution=256, dtype=jnp.bfloat16), np.float32)

    err_plain = np.abs(plain16 - truth)
    err_fused = np.abs(fused16 - truth)
    assert err_fused.mean() <= 1.5 * err_plain.mean() + 1e-4, \
        (err_fused.mean(), err_plain.mean())
    assert np.percentile(err_fused, 99.9) <= \
        1.5 * np.percentile(err_plain, 99.9) + 1e-3
