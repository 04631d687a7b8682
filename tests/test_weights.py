"""Weight IO: flatten/unflatten round-trip, npz persistence, and the
torch-checkpoint ingestion + conversion-cache path end-to-end."""

import os.path as osp

import numpy as np
import jax.numpy as jnp
import pytest

from certifyingfacerecognition_tpu.models import iresnet, stylegan
from certifyingfacerecognition_tpu.utils import weights as W

rng = np.random.default_rng(9)


def test_flatten_unflatten_roundtrip():
    f32 = lambda *shape: rng.standard_normal(shape).astype(np.float32)
    tree = {
        "a": {"w": f32(3, 4), "b": f32(4)},
        "blocks": [{"k": f32(2, 2)}, {"k": f32(2, 2)}],
        "scalar": np.float32(1.5),
    }
    flat = W.flatten_params(tree)
    back = W.unflatten_params(flat)
    assert isinstance(back["blocks"], list) and len(back["blocks"]) == 2
    np.testing.assert_array_equal(np.asarray(back["a"]["w"]), tree["a"]["w"])
    np.testing.assert_array_equal(np.asarray(back["blocks"][1]["k"]),
                                  tree["blocks"][1]["k"])


def test_save_load_params_npz(tmp_path):
    params = stylegan.random_params(16, seed=1)
    path = str(tmp_path / "gen.npz")
    W.save_params(path, params)
    loaded = W.load_params(path)
    z = jnp.asarray(rng.standard_normal((2, 512)), jnp.float32)
    a = stylegan.synthesize_from_z(params, z, resolution=16)
    b = stylegan.synthesize_from_z(loaded, z, resolution=16)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_torch_checkpoint_ingestion_and_cache(tmp_path):
    torch = pytest.importorskip("torch")
    sd = iresnet.random_torch_style_state_dict("iresnet50", seed=2)
    pth = str(tmp_path / "backbone.pth")
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               pth)

    params = W.load_frm_params(pth, "insightface")
    want = iresnet.convert_torch_state_dict(sd)
    x = jnp.asarray(rng.standard_normal((1, 112, 112, 3)), jnp.float32)
    np.testing.assert_allclose(np.asarray(iresnet.apply(params, x)),
                               np.asarray(iresnet.apply(want, x)), atol=1e-5)
    # conversion cached next to the checkpoint (keyed by model + source
    # mtime); second load skips torch
    import glob
    assert glob.glob(pth + ".cfr-iresnet50-*.npz")
    again = W.load_frm_params(pth, "insightface")
    np.testing.assert_allclose(np.asarray(iresnet.apply(again, x)),
                               np.asarray(iresnet.apply(want, x)), atol=1e-5)


def test_random_spec_with_seed():
    a = W.load_generator_params("random:7", resolution=16)
    b = W.load_generator_params("random:7", resolution=16)
    z = jnp.asarray(rng.standard_normal((1, 512)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(stylegan.synthesize_from_z(a, z, resolution=16)),
        np.asarray(stylegan.synthesize_from_z(b, z, resolution=16)))
