"""InterFaceGAN boundary tooling: train / condition / interpolate.

Capability mirror of /root/reference/utils/manipulator.py — the pipeline
consumes precomputed ``boundaries/*.npy`` files, but this module defines how
they are made (linear-SVM attribute boundaries in W space), how conditioned
variants (``*_c_*``) are derived, and the latent-interpolation helper used
for qualitative sweeps. Host-side numpy/sklearn: boundary training is a
one-off offline step, not a device workload.
"""

from __future__ import annotations

import logging
from typing import Optional, Tuple

import numpy as np


def train_boundary(latent_codes: np.ndarray, scores: np.ndarray,
                   chosen_num_or_ratio: float = 0.02,
                   split_ratio: float = 0.7,
                   invalid_value: Optional[float] = None,
                   seed: Optional[int] = None,
                   logger: Optional[logging.Logger] = None) -> np.ndarray:
    """Fit a unit-norm linear attribute boundary (manipulator.py:12-138).

    The top/bottom ``chosen_num`` samples by score become the positive/
    negative classes of a linear SVM; the returned boundary is the
    normalised weight vector, shape [1, latent_dim].

    Differences from the reference: an explicit ``seed`` controls the
    train/val shuffle (the reference uses global np.random state), and
    validation/remaining accuracies are returned via logging only.
    """
    from sklearn import svm

    log = logger or logging.getLogger("train_boundary")
    lat = np.asarray(latent_codes)
    sc = np.asarray(scores)
    if lat.ndim != 2:
        raise ValueError("latent_codes must be [num_samples, latent_dim]")
    if sc.ndim != 2 or sc.shape != (lat.shape[0], 1):
        raise ValueError("scores must be [num_samples, 1]")
    if chosen_num_or_ratio <= 0:
        raise ValueError("chosen_num_or_ratio must be positive")

    if invalid_value is not None:
        keep = sc[:, 0] != invalid_value
        lat, sc = lat[keep], sc[keep]

    order = np.argsort(sc[:, 0])[::-1]
    lat, sc = lat[order], sc[order]
    n = lat.shape[0]
    chosen = (int(n * chosen_num_or_ratio) if 0 < chosen_num_or_ratio <= 1
              else int(chosen_num_or_ratio))
    chosen = min(chosen, n // 2)
    n_train = int(chosen * split_ratio)
    n_val = chosen - n_train

    rng = np.random.default_rng(seed)
    pos_idx = rng.permutation(chosen)
    neg_idx = rng.permutation(chosen)
    pos, neg = lat[:chosen], lat[-chosen:]
    train_x = np.concatenate([pos[pos_idx[:n_train]],
                              neg[neg_idx[:n_train]]])
    train_y = np.concatenate([np.ones(n_train, np.int64),
                              np.zeros(n_train, np.int64)])
    log.info(f"Training boundary: {n_train} positive, {n_train} negative")

    clf = svm.SVC(kernel="linear").fit(train_x, train_y)

    if n_val:
        val_x = np.concatenate([pos[pos_idx[n_train:]],
                                neg[neg_idx[n_train:]]])
        val_y = np.concatenate([np.ones(n_val, np.int64),
                                np.zeros(n_val, np.int64)])
        acc = float((clf.predict(val_x) == val_y).mean())
        log.info(f"Validation accuracy: {acc:.6f}")
    rest = lat[chosen:n - chosen]
    if len(rest):
        decision = (sc[0, 0] + sc[-1, 0]) / 2
        rest_y = (sc[chosen:n - chosen, 0] >= decision).astype(np.int64)
        acc = float((clf.predict(rest) == rest_y).mean())
        log.info(f"Remaining-set accuracy: {acc:.6f}")

    a = clf.coef_.reshape(1, lat.shape[1]).astype(np.float32)
    return a / np.linalg.norm(a)


def project_boundary(primal: np.ndarray, *conds: np.ndarray) -> np.ndarray:
    """Orthogonalise ``primal`` against condition boundaries
    (manipulator.py:141-196); all inputs/outputs unit-norm [1, d].

    Implemented uniformly via the normal-equations solve (the reference
    special-cases 1 and 2 conditions with algebra that reduces to the same
    projection).
    """
    primal = np.asarray(primal, np.float64)
    assert primal.ndim == 2 and primal.shape[0] == 1
    if not conds:
        return primal.astype(np.float32)
    C = np.concatenate([np.asarray(c, np.float64) for c in conds], axis=0)
    assert C.shape[1] == primal.shape[1]
    # Least-squares coefficients of primal in span(conds); ridge eps matches
    # the reference's 1e-8 stabiliser for near-parallel condition pairs.
    A = C @ C.T + 1e-8 * np.eye(C.shape[0])
    x = np.linalg.solve(A, C @ primal.T)
    new = primal - x.T @ C
    return (new / np.linalg.norm(new)).astype(np.float32)


def linear_interpolate(latent_code: np.ndarray, boundary: np.ndarray,
                       start_distance: float = -3.0,
                       end_distance: float = 3.0,
                       steps: int = 10) -> np.ndarray:
    """Sweep a latent code along a boundary direction
    (manipulator.py:199-248). Supports [1, d] (W/Z) and [1, L, d] (W+)."""
    lat = np.asarray(latent_code, np.float32)
    b = np.asarray(boundary, np.float32)
    assert b.ndim == 2 and b.shape[0] == 1 and b.shape[1] == lat.shape[-1]
    assert lat.shape[0] == 1
    lin = np.linspace(start_distance, end_distance, steps).astype(np.float32)
    if lat.ndim == 2:
        return lat + lin[:, None] * b
    if lat.ndim == 3:
        return lat + lin[:, None, None] * b[None]
    raise ValueError("latent_code must be [1, d] or [1, L, d]")
