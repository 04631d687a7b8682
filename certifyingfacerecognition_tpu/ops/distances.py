"""Embedding-space distances and the gallery classifier head.

The reference computes identity logits as negative distances between a query
embedding and the gallery of all identity embeddings:

  * ArcFace ('insightface'): exact Euclidean distance, torch.cdist with
    compute_mode='donot_use_mm_for_euclid_dist' (gen_utils.py:99-105) —
    chosen there for numerical stability near argmin ties;
  * FaceNet: cosine distance 1 - e1 @ e2^T.

TPU-native design: the O(B*N*512) distance matrix is computed on the MXU via
the ||x||^2 + ||y||^2 - 2xy expansion; where the *decision* (argmin) must be
exact, we re-rank a small top-k candidate set with the exact elementwise
formula — giving donot_use_mm-grade argmin parity at matmul speed even for a
1M-identity gallery.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import EMB_SIZE

_HI = jax.lax.Precision.HIGHEST


def sq_euclidean_matmul(x: jnp.ndarray, y: jnp.ndarray,
                        *, precision=_HI) -> jnp.ndarray:
    """Squared Euclidean distances [B, N] via the matmul expansion."""
    xx = jnp.sum(x * x, axis=-1, keepdims=True)          # [B, 1]
    yy = jnp.sum(y * y, axis=-1)[None, :]                # [1, N]
    xy = jnp.dot(x, y.T, precision=precision)            # [B, N]
    return jnp.maximum(xx + yy - 2.0 * xy, 0.0)


def euclidean_exact(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Exact elementwise Euclidean distances [B, N] (memory O(B*N*d);
    only for small candidate sets)."""
    diff = x[:, None, :] - y[None, :, :]
    return jnp.sqrt(jnp.sum(diff * diff, axis=-1))


@jax.custom_jvp
def _safe_sqrt(d2: jnp.ndarray) -> jnp.ndarray:
    """sqrt with subgradient 0 at 0, matching torch.cdist's backward —
    jnp.sqrt's gradient at a sample's own gallery entry (distance exactly
    0, e.g. PGD with random_init=False) is inf/NaN and silently poisons
    the whole attack."""
    return jnp.sqrt(d2)


@_safe_sqrt.defjvp
def _safe_sqrt_jvp(primals, tangents):
    (d2,), (d2_dot,) = primals, tangents
    d = jnp.sqrt(d2)
    grad = jnp.where(d2 > 0, 0.5 / jnp.where(d2 > 0, d, 1.0), 0.0)
    return d, grad * d2_dot


def cdist(x: jnp.ndarray, y: jnp.ndarray, method: str = "insightface",
          *, precision=_HI) -> jnp.ndarray:
    """Distance matrix [B, N] with the reference's metric per FRS
    (gen_utils.py:99-105)."""
    if method == "insightface":
        return _safe_sqrt(sq_euclidean_matmul(x, y, precision=precision))
    return 1.0 - jnp.dot(x, y.T, precision=precision)


def pairwise_dists(x: jnp.ndarray, y: jnp.ndarray, method: str = "insightface"
                   ) -> jnp.ndarray:
    """Row-wise distances [B] (gen_utils.py:49-55)."""
    if method == "insightface":
        return jnp.linalg.norm(x - y, axis=-1)
    return 1.0 - jnp.sum(x * y, axis=-1)


def _topk_candidates(d2: jnp.ndarray, k: int) -> jnp.ndarray:
    """Indices [B, k] of the k smallest entries per row of d2 [B, N].

    A single global lax.top_k, deliberately: a chunked two-stage
    selection (per-2048-chunk top-k, then top-k over the chunk winners)
    was measured 10x SLOWER on the chip at N = 10^6 (+43.7 ms vs +4.4 ms
    on a 125 ms batch — XLA's TopK over one long row beats many short
    rows; docs/PERF.md "The 1M-gallery head", round 5).
    """
    return jax.lax.top_k(-d2, k)[1]


def nearest_refined(x: jnp.ndarray, gallery: jnp.ndarray,
                    method: str = "insightface", k: int = 8,
                    *, precision=_HI) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact nearest neighbour: (distance [B], index [B]).

    For 'insightface', candidates are pre-selected with the fast matmul
    distance and re-ranked with the exact elementwise distance, so the
    prediction matches the reference's exact-mode cdist argmin even when
    two gallery entries are close (squared distances returned). Cosine
    distances are exact already. Ties resolve to the lowest index, like
    torch.argmin (explicit lexicographic (distance, index) tie-break on
    the re-ranked candidates).
    """
    if method != "insightface":
        d = cdist(x, gallery, method)
        idx = jnp.argmin(d, axis=1)
        return jnp.take_along_axis(d, idx[:, None], axis=1)[:, 0], idx
    d2 = sq_euclidean_matmul(x, gallery, precision=precision)
    k = min(k, gallery.shape[0])
    idx = _topk_candidates(d2, k)                      # [B, k] candidates
    cand = gallery[idx]                                # [B, k, 512]
    diff = x[:, None, :] - cand
    d_exact = jnp.sum(diff * diff, axis=-1)            # [B, k]
    best = jnp.argmin(d_exact, axis=1)[:, None]
    d_best = jnp.take_along_axis(d_exact, best, axis=1)        # [B, 1]
    # lowest-index winner among exact ties; NaN rows (all comparisons
    # false — e.g. a non-finite embedding) keep argmin's candidate so the
    # returned index is always in range
    tie = jnp.min(jnp.where(d_exact == d_best, idx, gallery.shape[0]),
                  axis=1)
    win = jnp.where(tie == gallery.shape[0],
                    jnp.take_along_axis(idx, best, axis=1)[:, 0], tie)
    return d_best[:, 0], win


def argmin_dist_refined(x: jnp.ndarray, gallery: jnp.ndarray,
                        method: str = "insightface", k: int = 8,
                        *, precision=_HI) -> jnp.ndarray:
    """Exact argmin-distance identity prediction [B] (see nearest_refined)."""
    return nearest_refined(x, gallery, method, k, precision=precision)[1]


def probs_from_dists(dists: jnp.ndarray, scale_dists: bool = True
                     ) -> jnp.ndarray:
    """softmax(-d / sqrt(512)) over the gallery axis
    (models/smoothing_model.py:56-61, gen_utils.py:160-166)."""
    if scale_dists:
        dists = dists / np.sqrt(EMB_SIZE)
    return jax.nn.softmax(-dists, axis=1)
