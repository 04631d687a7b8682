"""Sharded identity gallery: distributed distances + exact global argmin.

At paper scale the gallery is 1M x 512 embeddings (certify.py:64-65,
README.md:66) — 2 GB in f32, too large to replicate per chip once the MC
batch is also resident. Here the gallery rows are sharded over the ``id``
mesh axis; each device computes exact-refined nearest neighbours against
its shard and a single all_gather of per-shard (distance, index) winners
resolves the global argmin. Ties resolve to the lowest global index, like
the reference's torch.argmin over the full distance row.

These helpers run INSIDE shard_map (they use axis collectives); see
smoothing.smooth.make_counts_fn(param_specs=...) for the outer plumbing.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..ops import distances as D
from .mesh import ID_AXIS


def sharded_argmin_dist(x: jnp.ndarray, gallery_shard: jnp.ndarray,
                        method: str = "insightface", k: int = 8,
                        axis_name: str = ID_AXIS) -> jnp.ndarray:
    """Global argmin identity over a gallery sharded on ``axis_name``.

    Must run inside shard_map. Returns global indices [B]."""
    shard_size = gallery_shard.shape[0]
    my = jax.lax.axis_index(axis_name)
    dist, local_idx = D.nearest_refined(x, gallery_shard, method, k)
    global_idx = local_idx + my * shard_size
    all_dist = jax.lax.all_gather(dist, axis_name)       # [n_id, B]
    all_idx = jax.lax.all_gather(global_idx, axis_name)  # [n_id, B]
    # argmin over shards; on exact ties the lowest shard (= lowest global
    # index) wins, matching single-device argmin order.
    win = jnp.argmin(all_dist, axis=0)                   # [B]
    return jnp.take_along_axis(all_idx, win[None, :], axis=0)[0]


def make_sharded_gallery_predict_fn(embed_fn: Callable, dirs: jnp.ndarray,
                                    method: str = "insightface",
                                    axis_name: str = ID_AXIS) -> Callable:
    """predict_fn(params, z, p) -> global ids, for use inside shard_map
    with params['gallery'] sharded on ``axis_name``.

    params = {gen, frm, gallery_shard-as-'gallery'}; dirs [k, 512] rows.
    """

    def fn(params, z, p):
        w = z[None, :] + jnp.dot(p, dirs,
                                 precision=jax.lax.Precision.HIGHEST)
        embs = embed_fn(params["gen"], params["frm"], w).astype(jnp.float32)
        return sharded_argmin_dist(embs, params["gallery"], method,
                                   axis_name=axis_name)

    return fn
