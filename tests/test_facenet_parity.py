"""Parity of the JAX InceptionResnetV1 against the torch oracle (same
state-dict naming as facenet_pytorch)."""

import numpy as np
import jax.numpy as jnp

from certifyingfacerecognition_tpu.models import facenet as fn
from torch_facenet_oracle import InceptionResnetV1Oracle


def test_facenet_parity():
    import torch

    sd_np = fn.random_torch_style_state_dict(seed=21)
    model = InceptionResnetV1Oracle()
    missing, unexpected = model.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd_np.items()}, strict=False)
    assert not unexpected
    assert all("num_batches_tracked" in m for m in missing)
    model.eval()

    params = fn.convert_torch_state_dict(sd_np)

    x = (np.random.default_rng(5).standard_normal((2, 3, 160, 160)) * 0.5
         ).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x)).numpy()
    got = np.asarray(fn.apply(params,
                              jnp.asarray(np.transpose(x, (0, 2, 3, 1)))))
    np.testing.assert_allclose(got, ref, atol=2e-4)
    # embeddings are L2-normalised
    np.testing.assert_allclose(np.linalg.norm(got, axis=1), 1.0, atol=1e-5)
