"""Golden parity: JAX PGGAN generator vs the reference PyTorch model."""

import os
import sys

import numpy as np
import pytest
import jax.numpy as jnp

from certifyingfacerecognition_tpu.models import pggan as pg

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")


def test_pggan_parity_res32():
    import torch
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from models.pggan_generator_model import PGGANGeneratorModel

    resolution = 32
    sd_np = pg.random_torch_style_state_dict(resolution, seed=17)
    model = PGGANGeneratorModel(resolution=resolution, fused_scale=False)
    missing, unexpected = model.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd_np.items()}, strict=False)
    assert not unexpected
    assert all("lod" in m for m in missing)
    model.eval()

    params = pg.convert_torch_state_dict(sd_np, resolution)

    z = np.random.default_rng(3).standard_normal((2, 512)).astype(np.float32)
    z = np.asarray(pg.preprocess_z(jnp.asarray(z)))
    with torch.no_grad():
        ref = model(torch.from_numpy(z)).numpy()
    got = np.transpose(
        np.asarray(pg.apply(params, jnp.asarray(z), resolution=resolution)),
        (0, 3, 1, 2))
    scale = max(1.0, np.abs(ref).max())
    np.testing.assert_allclose(got / scale, ref / scale, atol=2e-5)


def test_pggan_bf16_close_to_f32_with_tconv_rewrite():
    """The bf16 path rewrites every upsample+conv3x3 block as a 4-tap
    tconv (models/pggan._conv_block); it must track the f32 truth."""
    resolution = 32
    sd_np = pg.random_torch_style_state_dict(resolution, seed=17)
    params = pg.convert_torch_state_dict(sd_np, resolution)
    z = np.random.default_rng(3).standard_normal((2, 512)).astype(np.float32)
    z = jnp.asarray(np.asarray(pg.preprocess_z(jnp.asarray(z))))

    f32 = np.asarray(pg.apply(params, z, resolution=resolution))
    bf16 = np.asarray(pg.apply(params, z, resolution=resolution,
                               dtype=jnp.bfloat16).astype(jnp.float32))
    scale = max(1.0, np.abs(f32).max())
    np.testing.assert_allclose(bf16 / scale, f32 / scale, atol=0.05)
