"""Boundary-tooling tests (train_boundary / project_boundary /
linear_interpolate) incl. parity with the reference implementation."""

import os

import numpy as np
import pytest

from certifyingfacerecognition_tpu.ops import manipulator as M

REF = "/root/reference"
rng = np.random.default_rng(7)


def _load_reference_manipulator():
    """Import the reference's utils.manipulator as a package submodule
    (it uses a relative import of utils.logger)."""
    import sys

    if REF not in sys.path:
        sys.path.insert(0, REF)
    import utils.manipulator as ref  # noqa: WPS433 (reference import)

    return ref


def _toy_attribute_data(n=400, d=32):
    """Latents whose attribute score is a noisy linear function."""
    true_dir = rng.standard_normal(d)
    true_dir /= np.linalg.norm(true_dir)
    lat = rng.standard_normal((n, d)).astype(np.float32)
    scores = (lat @ true_dir + 0.05 * rng.standard_normal(n)).astype(
        np.float32)[:, None]
    return lat, scores, true_dir


def test_train_boundary_recovers_direction():
    lat, scores, true_dir = _toy_attribute_data()
    b = M.train_boundary(lat, scores, chosen_num_or_ratio=0.25, seed=0)
    assert b.shape == (1, lat.shape[1])
    np.testing.assert_allclose(np.linalg.norm(b), 1.0, rtol=1e-5)
    assert abs(float(b[0] @ true_dir)) > 0.95


def test_train_boundary_validates_inputs():
    lat, scores, _ = _toy_attribute_data(50)
    with pytest.raises(ValueError):
        M.train_boundary(lat[0], scores, seed=0)
    with pytest.raises(ValueError):
        M.train_boundary(lat, scores[:, 0], seed=0)
    with pytest.raises(ValueError):
        M.train_boundary(lat, scores, chosen_num_or_ratio=0.0, seed=0)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_project_boundary_parity_with_reference():
    ref = _load_reference_manipulator()

    d = 64
    primal = rng.standard_normal((1, d))
    primal /= np.linalg.norm(primal)
    conds = []
    for _ in range(3):
        c = rng.standard_normal((1, d))
        conds.append(c / np.linalg.norm(c))

    for k in (1, 2, 3):
        want = ref.project_boundary(primal, *conds[:k])
        got = M.project_boundary(primal, *conds[:k])
        np.testing.assert_allclose(got, want, atol=2e-4)
        # orthogonality to every condition
        for c in conds[:k]:
            assert abs((got @ c.T).item()) < 1e-4


def test_project_boundary_no_conditions_is_identity():
    primal = rng.standard_normal((1, 16))
    primal /= np.linalg.norm(primal)
    np.testing.assert_allclose(M.project_boundary(primal), primal, atol=1e-6)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_linear_interpolate_parity_with_reference():
    ref = _load_reference_manipulator()

    d = 24
    b = rng.standard_normal((1, d)).astype(np.float32)
    b /= np.linalg.norm(b)
    lat2 = rng.standard_normal((1, d)).astype(np.float32)
    lat3 = rng.standard_normal((1, 14, d)).astype(np.float32)
    for lat in (lat2, lat3):
        want = ref.linear_interpolate(lat, b, -2.0, 2.0, 7)
        got = M.linear_interpolate(lat, b, -2.0, 2.0, 7)
        np.testing.assert_allclose(got, want, atol=1e-6)
