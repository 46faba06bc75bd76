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


def stacked_batch_sharding(mesh: Mesh) -> NamedSharding:
    """(K, B, ...) stacked batches (the K-step scan program's input):
    replicate the step axis, shard the batch axis."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def local_batch_size(global_batch_size: int) -> int:
    """This process's share of the global batch (multi-host SPMD: each
    host feeds only its own devices)."""
    pc = jax.process_count()
    if global_batch_size % pc:
        raise ValueError(
            f"global batch size {global_batch_size} must be divisible by "
            f"the process count {pc}")
    return global_batch_size // pc


def replicate_tree(tree, mesh: Mesh):
    """Replicate host-local values (params/opt state) over the mesh.

    Single-process: a sharded device_put. Multi-host: every process holds
    the same host-local value (deterministic init / restored checkpoint)
    and the global replicated array is assembled without data movement
    (host_local_array_to_global_array; a plain device_put would trip
    jax's cross-process value equality check, which cannot fetch
    non-addressable arrays)."""
    repl = replicated_sharding(mesh)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return multihost_utils.host_local_array_to_global_array(
            tree, mesh, P())
    return jax.device_put(tree, repl)


def fetch_local_tree(tree):
    """Host-local numpy copy of a fully-replicated global tree (e.g. for
    per-host local evaluation in multi-host runs)."""
    return jax.tree.map(
        lambda x: np.asarray(x.addressable_data(0))
        if hasattr(x, "addressable_data") else np.asarray(x), tree)


def sync_hosts(tag: str, timeout_ms: int = 1_200_000) -> None:
    """Coordination-service barrier across processes (no-op single-host).

    Unlike collective-based barriers, this never touches the device
    runtime, so it is safe to call between compilation and first
    execution — which is exactly when it is needed: collective context
    setup (Gloo on CPU) has a short timeout, and per-host compile-time
    skew of a large program can exceed it unless hosts sync after
    compiling."""
    if jax.process_count() <= 1:
        return
    from jax._src import distributed

    client = distributed.global_state.client
    if client is not None:
        client.wait_at_barrier(tag, timeout_ms)


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host-side batch dict on device, sharded on axis 0.

    Single-process: a plain sharded device_put of the global batch.
    Multi-host: `batch` is this PROCESS's slice (global_batch /
    process_count samples) and the global array is assembled from the
    per-process shards without any cross-host data movement
    (jax.make_array_from_process_local_data)."""
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sh, x), batch)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
