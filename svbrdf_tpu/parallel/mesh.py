"""Device mesh + sharding helpers for data-parallel SPMD training.

The reference is strictly single-device (SURVEY.md §2.3: no torch.distributed,
batch 8 on one GPU — reference main.py:33-35,63). The TPU-native replacement
is a 1-D `data` mesh: batches shard over ICI, parameters replicate, and XLA
inserts the gradient all-reduce automatically from the sharding annotations
(no NCCL-style explicit collectives).

The model here is ~100 MB of params, so data parallelism is the only axis
worth sharding (SURVEY.md §2.3); the helpers still accept an arbitrary
device list so larger meshes (e.g. v5e-8, multi-host) work unchanged.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence] = None,
              n_devices: Optional[int] = None) -> Mesh:
    """A 1-D data-parallel mesh over the given (or all) devices.

    When `n_devices` is given it is a hard requirement: asking for more
    devices than exist raises instead of silently truncating (a truncated
    mesh would make an "8-way" run secretly single-device).
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} device(s) are available "
                f"({jax.default_backend()} backend)")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host-side batch dict on device, sharded on axis 0."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
