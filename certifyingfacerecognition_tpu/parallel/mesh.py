"""Device-mesh helpers.

The reference scales out with SLURM job arrays only (README.md:17-18, no
distributed backend at all — SURVEY.md §2.7). The TPU-native equivalents:

  * ``mc`` axis — Monte-Carlo smoothing samples sharded across chips, class
    counts combined with a single psum (the only collective the certification
    workload needs);
  * ``id`` axis — identities / gallery rows sharded across chips for the
    1M-identity regime (distances + distributed argmin).

Multi-host pods initialise via ``jax.distributed`` before building the mesh.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MC_AXIS = "mc"
ID_AXIS = "id"


def get_mesh(axis_name: str = MC_AXIS, n_devices: Optional[int] = None,
             devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over all (or the first n) local devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def get_2d_mesh(n_mc: int, n_id: int, devices: Optional[Sequence] = None
                ) -> Mesh:
    """(mc, id) mesh: sample-parallel x gallery-parallel."""
    if devices is None:
        devices = jax.devices()
    assert len(devices) >= n_mc * n_id
    grid = np.array(devices[: n_mc * n_id]).reshape(n_mc, n_id)
    return Mesh(grid, (MC_AXIS, ID_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_leading(mesh: Mesh, axis_name: str) -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialise multi-host JAX (one process per host of a pod slice).

    Replaces the reference's SLURM job-array sharding (README.md:17-18)
    with a real distributed runtime: after this, jax.devices() spans the
    whole slice and meshes built from it shard over ICI+DCN. On TPU pods
    the arguments auto-detect from the environment; they only need to be
    passed for CPU/GPU fleets or tests.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def get_pod_mesh(n_id: int = 1) -> Mesh:
    """(mc, id) mesh over the full (possibly multi-host) device set,
    laid out so the larger mc axis maps onto contiguous devices (ICI
    neighbours on a TPU slice) and collectives avoid DCN where possible."""
    devices = jax.devices()
    n = len(devices)
    assert n % n_id == 0, f"{n} devices not divisible by id={n_id}"
    return get_2d_mesh(n // n_id, n_id, devices=devices)
