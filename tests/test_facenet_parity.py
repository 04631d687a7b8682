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


def test_validate_facenet_fixture_mechanics(tmp_path, capsys):
    """The external-truth runbook's step-2 validator (tools/
    validate_conversion.validate_facenet_fixture): checksum gate + parity
    compare. The fixture here is oracle-generated (facenet_pytorch is not
    installed — the REAL provenance comes from running step 1 elsewhere,
    see the runbook in the tool docstring); this pins the mechanics so a
    genuine fixture drops in without code changes."""
    import json

    import torch

    from certifyingfacerecognition_tpu.tools import validate_conversion as VC

    sd_np = fn.random_torch_style_state_dict(seed=33)
    weights = str(tmp_path / "facenet.pth")
    torch.save({k: torch.from_numpy(v) for k, v in sd_np.items()}, weights)

    model = InceptionResnetV1Oracle()
    model.load_state_dict({k: torch.from_numpy(v) for k, v in sd_np.items()},
                          strict=False)
    model.eval()
    x = np.random.default_rng(6).uniform(
        -1.0, 1.0, (3, 3, 160, 160)).astype(np.float32)
    with torch.no_grad():
        embs = model(torch.from_numpy(x)).numpy()
    fixture = str(tmp_path / "fixture.npz")
    np.savez(fixture, inputs=x, embs=embs,
             weights_sha256=VC.sha256_file(weights),
             package_version="oracle")

    rc = VC.main(["--facenet-weights", weights, "--fixture", fixture,
                  "--atol", "2e-4"])
    verdict = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and verdict["status"] == "OK"

    # A weights file that doesn't match the fixture's checksum is refused.
    other = str(tmp_path / "other.pth")
    torch.save({k: torch.from_numpy(v)
                for k, v in fn.random_torch_style_state_dict(
                    seed=34).items()}, other)
    rc = VC.main(["--facenet-weights", other, "--fixture", fixture])
    verdict = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 2 and verdict["status"] == "WEIGHTS_MISMATCH"
