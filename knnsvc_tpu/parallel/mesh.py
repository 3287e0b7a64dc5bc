"""Device-mesh helpers.

The reference's entire distributed story is single-node DDP over NCCL
(ref hifigan/ddsp_train.py:30-32, config dist_config) — gradient all-reduce
plus a DistributedSampler. The TPU-native equivalent is a
jax.sharding.Mesh with two logical axes:

  'data'  — data parallelism for vocoder training (batch sharded; XLA inserts
            the psum over ICI for gradients, replacing DDP all-reduce)
  'pool'  — the new axis the reference doesn't have: the kNN matching pool
            (hours of target audio = 1e5-1e6 frames) sharded across chips,
            with a local top-k per shard and a gathered merge (SURVEY.md §2.7)

Multi-host (DCN) falls out of the same mesh via jax.distributed.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_pool: int = 1,
              devices=None) -> Mesh:
    """Mesh over (data, pool). Defaults to all devices on the data axis."""
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_pool
    assert n_data * n_pool <= len(devices), (n_data, n_pool, len(devices))
    grid = np.asarray(devices[: n_data * n_pool]).reshape(n_data, n_pool)
    return Mesh(grid, axis_names=("data", "pool"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharded over 'data'."""
    return NamedSharding(mesh, P("data"))


def pool_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (frame) dim sharded over 'pool'."""
    return NamedSharding(mesh, P("pool"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multi-host bring-up: jax.distributed.initialize (the mesh then spans
    hosts transparently; DCN handled by the same axis names). The reference's
    analogue is torch.distributed.init_process_group over TCP
    (ref hifigan/ddsp_train.py:30-32, config_v1_wavlm.json:48-52). No-op when
    already initialized or single-process."""
    import jax

    if coordinator_address is None and (num_processes is None or num_processes <= 1):
        return  # single-process: nothing to do
    try:
        jax.distributed.initialize(coordinator_address, num_processes, process_id)
    except (RuntimeError, ValueError) as e:
        if "already" not in str(e).lower():
            raise
