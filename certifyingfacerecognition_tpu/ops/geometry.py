"""Semantic-geometry core: Sigma-norms, ellipsoid sampling and projection.

TPU-native re-design of the reference's geometry layer
(/root/reference/attack_utils/proj_utils.py). The reference projects points
onto a hyper-ellipsoid with a *host-side serial loop* calling
``scipy.optimize.root_scalar`` per vector (proj_utils.py:134-285). Here the
scalar root-find is a *batched, fixed-iteration bisection* that runs entirely
on device and is jit/vmap/grad-safe. The general (non-diagonal) ellipsoid case
is reduced to the diagonal case through a one-time eigendecomposition, so the
hot path is always the closed-form diagonal kernel plus two matmuls (MXU).

Math: projecting y onto {x : x^T A x <= c} solves (I + t*A) x = y with the
unique t >= 0 such that x^T A x = c. With A = V diag(lam) V^T this becomes,
in the rotated basis y' = V^T y:  f(t) = sum_i lam_i y'_i^2 / (1 + t lam_i)^2 - 1
(monotonically decreasing in t), solved by bisection on [t_lo, t_hi].

Host-side, run-once helpers (MVEE/Khachiyan, boundary loading, projection
matrices) stay in NumPy float64, mirroring proj_utils.py:431-459,661-728.
"""

from __future__ import annotations

import os
import os.path as osp
from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import ATTRS

# Bisection bracket mirrors the reference (proj_utils.py:83,153,234):
# [float eps, 1e3]. 64 halvings give far more precision than the reference's
# membership tolerance (1e-4).
_T_LO = 1e-12
_T_HI = 1.0e3
_BISECT_ITERS = 64


# ---------------------------------------------------------------------------
# Sigma-norms (bilinear forms)
# ---------------------------------------------------------------------------

def sq_distance(A: jnp.ndarray, x: jnp.ndarray, y: Optional[jnp.ndarray] = None
                ) -> jnp.ndarray:
    """Batched bilinear form x^T A y (y defaults to x).

    x, y: [B, d]; A: [d, d]. Returns [B].
    Reference semantics: proj_utils.py:36-48 (there x is [B, d, 1]).
    """
    if y is None:
        y = x
    return jnp.einsum("bi,ij,bj->b", x, A, y,
                      precision=jax.lax.Precision.HIGHEST)


def sq_distance_diag(a: jnp.ndarray, x: jnp.ndarray,
                     y: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Diagonal-matrix bilinear form sum_i a_i x_i y_i. x, y: [B, d]; a: [d].

    Reference: proj_utils.py:51-62.
    """
    prod = x * x if y is None else x * y
    return prod @ a


# ---------------------------------------------------------------------------
# Ellipsoid container
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class Ellipsoid:
    """An origin-centred hyper-ellipsoid {x : x^T A x <= 1}.

    Holds the (optional) eigendecomposition so that projection reduces to the
    diagonal kernel. For diagonal A only ``diag`` is set.
    """

    diag: Optional[jnp.ndarray] = None       # [d] if A is diagonal
    eigvals: Optional[jnp.ndarray] = None    # [d] if A is dense
    eigvecs: Optional[jnp.ndarray] = None    # [d, d]; A = V diag(lam) V^T
    # inv(chol(A)^T) for dense A — precomputed at construction; computing
    # it lazily would call host linalg on traced arrays under jit.
    chol_inv_t_dense: Optional[jnp.ndarray] = None

    def tree_flatten(self):
        return (self.diag, self.eigvals, self.eigvecs,
                self.chol_inv_t_dense), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def is_diag(self) -> bool:
        return self.diag is not None

    @property
    def dim(self) -> int:
        v = self.diag if self.is_diag else self.eigvals
        return v.shape[0]

    @classmethod
    def from_diag(cls, a) -> "Ellipsoid":
        return cls(diag=jnp.asarray(a, jnp.float32))

    @classmethod
    def from_dense(cls, A) -> "Ellipsoid":
        A = np.asarray(A, np.float64)
        lam, V = np.linalg.eigh((A + A.T) / 2.0)
        chol = np.linalg.cholesky((A + A.T) / 2.0)
        return cls(eigvals=jnp.asarray(lam, jnp.float32),
                   eigvecs=jnp.asarray(V, jnp.float32),
                   chol_inv_t_dense=jnp.asarray(np.linalg.inv(chol.T),
                                                jnp.float32))

    def mat(self) -> jnp.ndarray:
        if self.is_diag:
            return jnp.diag(self.diag)
        return (self.eigvecs * self.eigvals) @ self.eigvecs.T

    def sq_dist(self, x: jnp.ndarray) -> jnp.ndarray:
        """x^T A x for x: [B, d] -> [B]."""
        if self.is_diag:
            return sq_distance_diag(self.diag, x)
        xr = jnp.dot(x, self.eigvecs, precision=jax.lax.Precision.HIGHEST)
        return sq_distance_diag(self.eigvals, xr)

    def cholesky_inv_t(self) -> jnp.ndarray:
        """inv(chol(A)^T), the map from the unit ball to the ellipsoid.

        Reference: proj_utils.py:413-425.
        """
        if self.is_diag:
            return jnp.diag(1.0 / jnp.sqrt(self.diag))
        assert self.chol_inv_t_dense is not None, \
            "dense Ellipsoid must be built with from_dense"
        return self.chol_inv_t_dense


# ---------------------------------------------------------------------------
# Batched in-graph ellipsoid projection
# ---------------------------------------------------------------------------

def _bisect_project_diag(y: jnp.ndarray, a: jnp.ndarray, c: float = 1.0
                         ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Project rows of y [B, d] onto {x: sum_i a_i x_i^2 <= c}.

    Vectorised replacement for the reference's per-vector scipy bisection
    (proj_utils.py:212-285). Points already inside (or where the bracket does
    not straddle the root, matching the reference's opposing-signs gate at
    proj_utils.py:238-244) are returned unchanged.

    Returns (projections [B, d], t [B], which_out [B] bool).
    """
    a = a / c
    y2 = y * y

    def f(t):  # [B] -> [B]; monotonically decreasing in t
        inv = 1.0 / (1.0 + t[:, None] * a[None, :])
        return jnp.sum(a[None, :] * inv * inv * y2, axis=-1) - 1.0

    lo = jnp.full(y.shape[:1], _T_LO, y.dtype)
    hi = jnp.full(y.shape[:1], _T_HI, y.dtype)
    f_lo, f_hi = f(lo), f(hi)
    which_out = (f_lo * f_hi) < 0.0

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        f_mid = f(mid)
        go_right = f_mid > 0.0  # root is to the right
        return jnp.where(go_right, mid, lo), jnp.where(go_right, hi, mid)

    lo, hi = jax.lax.fori_loop(0, _BISECT_ITERS, body, (lo, hi))
    t = 0.5 * (lo + hi)
    proj = y / (1.0 + t[:, None] * a[None, :])
    out = jnp.where(which_out[:, None], proj, y)
    return out, t, which_out


def proj_ellipse(y: jnp.ndarray, ell: Ellipsoid, c: float = 1.0
                 ) -> jnp.ndarray:
    """Project rows of y [B, d] into the ellipsoid (identity if inside)."""
    if ell.is_diag:
        out, _, _ = _bisect_project_diag(y, ell.diag, c)
        return out
    # NOTE: this environment's default matmul precision is bf16-like even on
    # CPU; the rotation must be exact f32 for the projection to be accurate.
    hi = jax.lax.Precision.HIGHEST
    yr = jnp.dot(y, ell.eigvecs, precision=hi)
    outr, _, _ = _bisect_project_diag(yr, ell.eigvals, c)
    return jnp.dot(outr, ell.eigvecs.T, precision=hi)


def proj_to_surface(v: jnp.ndarray, ell: Ellipsoid) -> jnp.ndarray:
    """Scale rows of v [B, d] onto the ellipsoid surface.

    Matches proj2surf in proj_utils.py:526-529 including the +1e-4 guard
    (which leaves the result marginally inside the ellipsoid).
    """
    d = jnp.sqrt(ell.sq_dist(v))
    return v / (d[:, None] + 1e-4)


def proj2region(vs: jnp.ndarray, proj_mat: Optional[jnp.ndarray],
                ell: Ellipsoid, to_subs: bool = True,
                on_surface: bool = False, max_iters: int = 5) -> jnp.ndarray:
    """Project rows of vs [B, d] into (subspace intersect ellipsoid).

    In-graph, fixed-shape equivalent of proj_utils.py:513-581: subspace
    projection, optional surface placement, ellipsoid projection, a fixed
    number of alternating refinement iterations (the per-point projections
    are no-ops for points already inside, so iterating unconditionally is
    safe), and the final surface-renormalisation fallback for any point
    still outside.
    """
    hi = jax.lax.Precision.HIGHEST
    x = vs
    if to_subs:
        x = jnp.dot(x, proj_mat.T, precision=hi)
    if on_surface:
        x = proj_to_surface(x, ell)
    x = proj_ellipse(x, ell)
    for _ in range(max_iters):
        x = proj_ellipse(x, ell)
        if to_subs:
            x = jnp.dot(x, proj_mat.T, precision=hi)
    # Final guarantee: renormalise any point still outside onto the surface.
    d = ell.sq_dist(x)
    x = jnp.where((d > 1.0)[:, None], proj_to_surface(x, ell), x)
    return x


# ---------------------------------------------------------------------------
# Uniform sampling inside an ellipsoid
# ---------------------------------------------------------------------------

def sample_ellipsoid(key: jax.Array, ell: Ellipsoid, n_vecs: int = 1
                     ) -> jnp.ndarray:
    """Sample uniformly from the ellipsoid interior. Returns [n_vecs, d].

    Same construction as proj_utils.py:396-428: uniform direction on the
    (d-1)-sphere, radius ~ U^(1/d), then map the unit ball through
    inv(chol(A)^T).
    """
    n = ell.dim
    k1, k2 = jax.random.split(key)
    vec = jax.random.normal(k1, (n, n_vecs), jnp.float32)
    vec = vec / jnp.linalg.norm(vec, axis=0, keepdims=True)
    rad = jax.random.uniform(k2, (n_vecs,), jnp.float32) ** (1.0 / n)
    vec = vec * rad[None, :]
    transform = ell.cholesky_inv_t()
    return jnp.dot(transform, vec, precision=jax.lax.Precision.HIGHEST).T


def init_deltas(key: jax.Array, n_vecs: int, ell: Ellipsoid,
                proj_mat: Optional[jnp.ndarray] = None,
                random_init: bool = True, lin_comb: bool = True,
                on_surface: bool = True, emb_size: int = 512) -> jnp.ndarray:
    """Random attack initialisation inside/on the feasible region.

    Mirrors attack_utils/gen_utils.py:226-245. With ``lin_comb`` the deltas
    live in the reduced attribute space (dim = ell.dim); otherwise in the
    full latent space with a subspace projection.
    """
    if not random_init:
        dim = ell.dim if lin_comb else emb_size
        return jnp.zeros((n_vecs, dim), jnp.float32)
    deltas = sample_ellipsoid(key, ell, n_vecs)
    if lin_comb:
        if on_surface:
            deltas = proj2region(deltas, None, ell, to_subs=False,
                                 on_surface=True)
    else:
        deltas = proj2region(deltas, proj_mat, ell, to_subs=True,
                             on_surface=on_surface)
    return deltas


def in_subs(v: jnp.ndarray, proj_mat: jnp.ndarray, atol: float = 1e-4) -> bool:
    """Check rows of v [B, d] lie in the subspace. proj_utils.py:501-504."""
    dists = jnp.linalg.norm(
        jnp.dot(v, proj_mat.T, precision=jax.lax.Precision.HIGHEST) - v,
        axis=-1)
    return bool(jnp.all(dists <= atol))


def in_ellps(v: jnp.ndarray, ell: Ellipsoid, atol: float = 1e-4) -> bool:
    """Check rows of v [B, d] lie inside the ellipsoid. proj_utils.py:507-510."""
    d = ell.sq_dist(v)
    return bool(jnp.all(d <= 1.0 + atol))


# ---------------------------------------------------------------------------
# Host-side, run-once matrix construction (NumPy, float64)
# ---------------------------------------------------------------------------

def mvee(points: np.ndarray, tol: float = 1e-3) -> Tuple[np.ndarray, np.ndarray]:
    """Khachiyan minimum-volume enclosing ellipsoid of row-stacked points.

    Returns (A, c) with (x-c)^T A (x-c) = 1. Same iteration as
    proj_utils.py:431-459 (run once at startup; host NumPy is fine).
    """
    points = np.asarray(points, np.float64)
    N, d = points.shape
    Q = np.column_stack((points, np.ones(N))).T  # [d+1, N]
    u = np.ones(N) / N
    err = tol + 1.0
    while err > tol:
        X = (Q * u) @ Q.T
        M = np.einsum("ij,ji->i", Q.T, np.linalg.solve(X, Q))
        jdx = int(np.argmax(M))
        step = (M[jdx] - d - 1.0) / ((d + 1) * (M[jdx] - 1.0))
        new_u = (1 - step) * u
        new_u[jdx] += step
        err = np.linalg.norm(new_u - u)
        u = new_u
    c = u @ points
    A = np.linalg.inv((points.T * u) @ points - np.outer(c, c)) / d
    return A, c


def get_full_points(points: np.ndarray, fill_with_null: bool = False
                    ) -> np.ndarray:
    """Augment direction columns with (optionally) a nullspace basis and the
    mirrored points. points: [d, k] -> [d, 2k'] (proj_utils.py:317-338)."""
    import scipy.linalg

    if fill_with_null:
        null = scipy.linalg.null_space(points.T)
        points = np.concatenate([points, null], axis=1)
        assert points.shape[0] == points.shape[1]
    return np.concatenate((points, -points), axis=1)


def get_proj_mat(dirs: np.ndarray) -> np.ndarray:
    """Orthogonal projector onto span(columns of dirs). proj_utils.py:624-627."""
    return dirs @ np.linalg.pinv(dirs)


def get_ellipse_mat(dirs: np.ndarray) -> np.ndarray:
    """MVEE matrix of +-dirs plus a nullspace fill. proj_utils.py:721-728."""
    expanded = get_full_points(dirs, fill_with_null=True)
    A, c = mvee(expanded.T)
    assert np.allclose(c, 0, atol=1e-6), "ellipsoid centre should be origin"
    return A


def default_boundaries_dir() -> str:
    """Locate the InterFaceGAN boundary vectors (data artifacts, not code).

    The 39 precomputed boundary files ship with this repo (boundaries/ at
    the repo root — see boundaries/README.md for provenance), so a fresh
    checkout is self-sufficient. Resolution order: CFR_BOUNDARIES_DIR env
    override, ./boundaries relative to the CWD (a deployment's own set),
    then the vendored set. Fails loudly otherwise — no silent fallback."""
    vendored = osp.join(osp.dirname(osp.dirname(osp.dirname(
        osp.abspath(__file__)))), "boundaries")
    cands = [
        os.environ.get("CFR_BOUNDARIES_DIR", ""),
        "boundaries",
        vendored,
    ]
    for c in cands:
        if c and osp.isdir(c):
            return c
    raise FileNotFoundError(
        "No boundaries directory found; set CFR_BOUNDARIES_DIR or create "
        "./boundaries with {gan}_{dataset}_{attr}_w_boundary.npy files "
        "(the vendored copies should be at " + vendored + " — see "
        "boundaries/README.md; train new ones with ops/manipulator.py)")


def get_projection_matrices(dataset: str = "ffhq", gan_name: str = "stylegan",
                            attrs2drop: Sequence[str] = (),
                            scale_factor: float = 1.0,
                            boundaries_dir: Optional[str] = None):
    """Memoised wrapper; see _get_projection_matrices_impl below.

    The 512-dim MVEE takes ~1 min on host; the reference recomputes it on
    every chunk (gen_utils.py:634-638) — we compute it once per process.
    """
    return _get_projection_matrices_impl(
        dataset, gan_name, tuple(attrs2drop), float(scale_factor),
        boundaries_dir or default_boundaries_dir())


from functools import lru_cache  # noqa: E402  (placed near its single use)


@lru_cache(maxsize=8)
def _get_projection_matrices_impl(dataset: str, gan_name: str,
                                  attrs2drop: Tuple[str, ...],
                                  scale_factor: float,
                                  boundaries_dir: str):
    """Build the projection/ellipsoid matrix stack from boundary vectors.

    Returns (proj_mat [512,512], ellipse_mat [512,512], dirs [512,k],
    red_ellipse_diag [k], files). Mirrors proj_utils.py:661-718 — including
    the reduced (diagonal) ellipsoid built from the per-attribute budgets.
    """
    attrs = dict(ATTRS)
    for attr in attrs2drop:
        assert attr in attrs, f"Attribute {attr} is NOT valid"
        attrs.pop(attr)

    dirs, files, magns = [], [], []
    for att_name, magn in attrs.items():
        fname = osp.join(boundaries_dir,
                         f"{gan_name}_{dataset}_{att_name}_w_boundary.npy")
        assert osp.isfile(fname), f'Boundary for attr "{att_name}" not found!'
        dirs.append(np.load(fname))
        magns.append(magn)
        files.append(fname)

    dirs = np.concatenate(dirs, axis=0).T  # [d, k]
    assert dirs.shape[1] == len(attrs)

    proj_mat = get_proj_mat(dirs)
    ellipse_mat = scale_factor * get_ellipse_mat(dirs)

    magns = np.array(magns)
    red_ellipse_mat = scale_factor * get_ellipse_mat(np.diag(magns))
    assert np.allclose(red_ellipse_mat,
                       np.diag(np.diagonal(red_ellipse_mat)), atol=1e-10), \
        "Reduced ellipse matrix should be diagonal"
    red_ellipse_diag = np.diagonal(red_ellipse_mat).copy()

    return proj_mat, ellipse_mat, dirs, red_ellipse_diag, files


@dataclass(frozen=True)
class RegionMatrices:
    """Device-ready bundle of all region matrices (gen_utils.py:607-631)."""

    proj_mat: jnp.ndarray          # [512, 512]
    ellipse: Ellipsoid             # dense, 512-dim
    dirs: jnp.ndarray              # [512, k]
    dirs_inv: jnp.ndarray          # pinv(dirs) [k, 512]
    red_ellipse: Ellipsoid         # diagonal, k-dim
    red_ellipse_diag: jnp.ndarray  # [k]
    red_ellipse_diag_inv: jnp.ndarray  # [k]


def get_all_matrices(attrs2drop: Sequence[str] = (), scale_factor: float = 1.0,
                     boundaries_dir: Optional[str] = None) -> RegionMatrices:
    proj_mat, ellipse_mat, dirs, red_diag, _ = get_projection_matrices(
        attrs2drop=attrs2drop, scale_factor=scale_factor,
        boundaries_dir=boundaries_dir)
    dirs_inv = np.linalg.pinv(dirs)
    return RegionMatrices(
        proj_mat=jnp.asarray(proj_mat, jnp.float32),
        ellipse=Ellipsoid.from_dense(ellipse_mat),
        dirs=jnp.asarray(dirs, jnp.float32),
        dirs_inv=jnp.asarray(dirs_inv, jnp.float32),
        red_ellipse=Ellipsoid.from_diag(red_diag),
        red_ellipse_diag=jnp.asarray(red_diag, jnp.float32),
        red_ellipse_diag_inv=jnp.asarray(1.0 / red_diag, jnp.float32),
    )
