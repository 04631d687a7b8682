"""Unit tests for the semantic-geometry core (ops/geometry.py).

The ellipsoid-projection oracle is an independent scipy root-find (the same
math the reference uses host-side); parity tests against the reference's own
NumPy implementation run when /root/reference is mounted.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.optimize import root_scalar

from certifyingfacerecognition_tpu.ops import geometry as G

rng = np.random.default_rng(0)


def _oracle_project_diag(y, a, c=1.0):
    """Reference-grade projection via scipy bisection (per vector)."""
    a = a / c
    out = []
    for row in y:
        def f(t):
            inv = 1.0 / (1.0 + t * a)
            return float(np.sum(a * inv**2 * row**2) - 1.0)
        lo, hi = np.finfo(float).eps, 1e3
        if f(lo) * f(hi) < 0:
            t = root_scalar(f, method="bisect", bracket=[lo, hi]).root
            out.append(row / (1.0 + t * a))
        else:
            out.append(row)
    return np.stack(out)


def test_sq_distance_matches_numpy():
    A = rng.standard_normal((6, 6))
    A = A @ A.T + np.eye(6)
    x = rng.standard_normal((4, 6))
    got = np.asarray(G.sq_distance(jnp.asarray(A, jnp.float32),
                                   jnp.asarray(x, jnp.float32)))
    want = np.einsum("bi,ij,bj->b", x, A, x)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_sq_distance_diag_matches_numpy():
    a = rng.uniform(0.5, 3.0, size=5)
    x = rng.standard_normal((7, 5))
    got = np.asarray(G.sq_distance_diag(jnp.asarray(a, jnp.float32),
                                        jnp.asarray(x, jnp.float32)))
    np.testing.assert_allclose(got, (x**2) @ a, rtol=1e-5)


def test_diag_projection_matches_scipy_oracle():
    a = 1.0 / np.array([0.5, 0.5, 0.2, 0.5, 0.8]) ** 2
    y = rng.standard_normal((32, 5)) * 0.6  # mix of inside and outside
    ell = G.Ellipsoid.from_diag(a)
    got = np.asarray(G.proj_ellipse(jnp.asarray(y, jnp.float32), ell))
    want = _oracle_project_diag(y, a)
    np.testing.assert_allclose(got, want, atol=2e-5)
    # Membership (within the reference's tolerance)
    d = np.asarray(ell.sq_dist(jnp.asarray(got)))
    assert np.all(d <= 1.0 + 1e-4)


def test_dense_projection_matches_scipy_oracle():
    B = rng.standard_normal((6, 6))
    A = B @ B.T / 6 + 0.5 * np.eye(6)
    y = rng.standard_normal((16, 6)) * 1.5
    ell = G.Ellipsoid.from_dense(A)
    got = np.asarray(G.proj_ellipse(jnp.asarray(y, jnp.float32), ell))

    # Oracle: rotate into the eigenbasis and use the diagonal oracle.
    lam, V = np.linalg.eigh(A)
    want = _oracle_project_diag(y @ V, lam) @ V.T
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_inside_points_are_untouched():
    a = np.array([4.0, 1.0, 0.25])
    y = rng.standard_normal((8, 3)) * 0.05  # well inside
    ell = G.Ellipsoid.from_diag(a)
    got = np.asarray(G.proj_ellipse(jnp.asarray(y, jnp.float32), ell))
    np.testing.assert_allclose(got, y.astype(np.float32), atol=0)


def test_projection_is_jittable_and_differentiable():
    a = jnp.array([4.0, 1.0, 0.25])
    ell = G.Ellipsoid.from_diag(a)

    @jax.jit
    def f(y):
        return jnp.sum(G.proj_ellipse(y, ell) ** 2)

    y = jnp.asarray(rng.standard_normal((4, 3)), jnp.float32)
    g = jax.grad(f)(y)
    assert np.all(np.isfinite(np.asarray(g)))


def test_sample_ellipsoid_inside_and_spread():
    a = 1.0 / np.array([0.5, 0.5, 0.2, 0.5, 0.8]) ** 2
    ell = G.Ellipsoid.from_diag(a)
    x = G.sample_ellipsoid(jax.random.PRNGKey(0), ell, n_vecs=2000)
    d = np.asarray(ell.sq_dist(x))
    assert np.all(d <= 1.0 + 1e-5)
    # Uniform-in-ball radius^2 should have mean n/(n+2) ~ 0.714 for n=5
    assert 0.6 < d.mean() < 0.8


def test_proj2region_subspace_and_ellipse():
    d, k = 32, 5
    dirs = rng.standard_normal((d, k))
    dirs /= np.linalg.norm(dirs, axis=0, keepdims=True)
    proj_mat = G.get_proj_mat(dirs)
    A = G.get_ellipse_mat(dirs)
    ell = G.Ellipsoid.from_dense(A)
    vs = jnp.asarray(rng.standard_normal((10, d)) * 2, jnp.float32)
    out = G.proj2region(vs, jnp.asarray(proj_mat, jnp.float32), ell)
    assert G.in_ellps(out, ell, atol=1e-3)
    assert G.in_subs(out, jnp.asarray(proj_mat, jnp.float32), atol=1e-3)


def test_init_deltas_on_surface():
    a = 1.0 / np.array(list({"age": .5, "eyeglasses": .5, "gender": .2,
                             "pose": .5, "smile": .8}.values())) ** 2
    ell = G.Ellipsoid.from_diag(a)
    deltas = G.init_deltas(jax.random.PRNGKey(1), 64, ell, lin_comb=True,
                           on_surface=True)
    d = np.asarray(ell.sq_dist(deltas))
    np.testing.assert_allclose(d, 1.0, atol=2e-3)


def test_mvee_contains_points():
    pts = rng.standard_normal((40, 4))
    A, c = G.mvee(pts, tol=1e-4)
    dist = np.einsum("bi,ij,bj->b", pts - c, A, pts - c)
    assert np.all(dist <= 1.0 + 1e-2)


def test_vendored_boundaries_self_sufficient(tmp_path, monkeypatch):
    """A fresh checkout resolves boundaries without any reference mount:
    default_boundaries_dir falls back to the repo's vendored set (39 files,
    incl. the 5 the default pipeline consumes) from any CWD."""
    monkeypatch.chdir(tmp_path)            # no ./boundaries here
    monkeypatch.delenv("CFR_BOUNDARIES_DIR", raising=False)
    d = G.default_boundaries_dir()
    assert os.path.isdir(d) and "reference" not in d
    for attr in ("age", "eyeglasses", "gender", "pose", "smile"):
        assert os.path.isfile(
            os.path.join(d, f"stylegan_ffhq_{attr}_w_boundary.npy"))
    if os.path.isdir("/root/reference/boundaries"):
        for f in sorted(os.listdir(d)):
            if f.endswith(".npy"):
                ours = np.load(os.path.join(d, f))
                theirs = np.load(os.path.join(
                    "/root/reference/boundaries", f))
                np.testing.assert_array_equal(ours, theirs)


@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference repo not mounted")
def test_projection_matrices_parity_with_reference():
    import sys
    sys.path.insert(0, "/root/reference")
    cwd = os.getcwd()
    try:
        os.chdir("/root/reference")
        from attack_utils import proj_utils as ref

        ref_proj, ref_ell, ref_dirs, ref_red, _ = ref.get_projection_matrices()
    finally:
        os.chdir(cwd)
        sys.path.remove("/root/reference")

    # Built from the VENDORED boundaries — also proves the vendored data
    # artifacts are equivalent to the reference's.
    proj, ell, dirs, red, _ = G.get_projection_matrices()
    np.testing.assert_allclose(proj, ref_proj, atol=1e-8)
    np.testing.assert_allclose(dirs, ref_dirs, atol=0)
    np.testing.assert_allclose(red, ref_red, rtol=1e-6)
    # MVEE is iterative with a loose tolerance; compare ellipsoids loosely.
    np.testing.assert_allclose(ell, ref_ell, rtol=0.05, atol=1e-3)
