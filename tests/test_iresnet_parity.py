"""Golden parity: JAX iresnet-50 (BN-folded, NHWC) vs the reference torch model."""

import os
import sys

import numpy as np
import pytest
import jax.numpy as jnp

from certifyingfacerecognition_tpu.models import iresnet as ir

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")


def test_iresnet50_parity():
    import torch
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from models.iresnet import iresnet50

    sd_np = ir.random_torch_style_state_dict("iresnet50", seed=9)
    model = iresnet50(False, fp16=False, dropout=0)
    missing, unexpected = model.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd_np.items()}, strict=False)
    assert not unexpected
    assert all("num_batches_tracked" in m for m in missing)
    model.eval()

    params = ir.convert_torch_state_dict(sd_np, "iresnet50")

    x = np.random.default_rng(2).standard_normal((2, 3, 112, 112)) * 0.5
    x = x.astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x)).numpy()

    got = np.asarray(ir.apply(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))))
    scale = max(1.0, np.abs(ref).max())
    np.testing.assert_allclose(got / scale, ref / scale, atol=3e-5)
