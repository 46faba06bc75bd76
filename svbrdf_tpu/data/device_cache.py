"""HBM-resident dataset cache: decode once, train at device speed.

TPU-native replacement for per-step host->device input transfer when the
corpus fits device memory — the reference's multi-view corpus is ~1 GB
(reference README.md:42, docs/index.html:346) against 16 GB of v5e HBM, so
the ENTIRE decoded dataset can live on device as uint8 and every batch is
an on-device gather instead of a PCIe/host round-trip. The host's role
shrinks to drawing index orders (shuffle, mixing partners); all math stays
in the jitted step (data/pipeline.prepare_batch already decodes uint8 on
device).

This composes with, not replaces, the host pipeline: samples are decoded
through the same SvbrdfDataset uint8 fast path (native libpng pool + RAM
cache) exactly once at cache-build time, then epochs never touch the host
again. scripts/input_throughput.py measures the host path's own
steady-state rate separately.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

_CHUNK = 32  # samples per upload chunk (bounds host+device staging memory)


class DeviceDataCache:
    """Upload a dataset's decoded uint8 samples to HBM once; serve batches
    as on-device gathers.

    Requires the dataset's uint8 fast path (scale_mode='crop', SVBRDF maps
    present) and deterministic per-sample content (random_crop would be
    frozen at cache-build time, so it is rejected). Mixing partners are
    still drawn per step by the host RNG — only the *indices* cross the
    host boundary.
    """

    def __init__(self, dataset, mesh=None, max_bytes: int = 12 << 30,
                 planes: bool = True):
        if not dataset._transfer_u8:
            raise ValueError(
                "DeviceDataCache needs the uint8 fast path "
                "(scale_mode='crop' with SVBRDF maps present)")
        if dataset.random_crop:
            raise ValueError(
                "DeviceDataCache would freeze random crops at build time; "
                "use the host pipeline for random_crop datasets")
        self._dataset = dataset
        n = len(dataset)
        x0, s0 = dataset.load_scaled_u8(0)
        shapes = {"inputs": (n,) + x0.shape, "svbrdf": (n,) + s0.shape}
        # Planes store: the SVBRDF additionally kept in the fused loss
        # kernel's phase-planes layout (4*12, H/2, W/2), transposed ONCE at
        # cache build — training steps then do no spatial -> planes
        # relayout at all (~0.8 ms/step of uint8 copies at 256^2 batch 8).
        h, w, c = s0.shape
        self._planes = planes and h % 2 == 0 and w % 2 == 0
        base_bytes = sum(int(np.prod(s)) for s in shapes.values())
        if self._planes:
            planes_shape = (n, 4 * c, h // 2, w // 2)
            # The planes store is an OPTIMIZATION (+~50% of svbrdf bytes);
            # when it alone would blow the budget, drop it with a note
            # instead of failing a corpus that fits without it — the
            # training step falls back to per-step transposes.
            if base_bytes + int(np.prod(planes_shape)) > max_bytes:
                print(f"DeviceDataCache: dropping the planes store "
                      f"({int(np.prod(planes_shape)) / 1e9:.1f} GB) to fit "
                      f"the {max_bytes / 1e9:.1f} GB budget; targets will "
                      f"be transposed per step")
                self._planes = False
            else:
                shapes["svbrdf_planes"] = planes_shape
        self.nbytes = sum(int(np.prod(s)) for s in shapes.values())
        if self.nbytes > max_bytes:
            raise ValueError(
                f"dataset needs {self.nbytes / 1e9:.1f} GB on device, over "
                f"the {max_bytes / 1e9:.1f} GB budget — stream from host "
                f"instead")

        repl = None
        batch_sh = None
        if mesh is not None:
            from svbrdf_tpu.parallel import mesh as mesh_lib

            # Replicate the store: every device can gather any sample, so
            # arbitrary per-device batch slices work.
            repl = mesh_lib.replicated_sharding(mesh)
            batch_sh = mesh_lib.batch_sharding(mesh)

        def put(a):
            return jnp.asarray(a) if repl is None else jax.device_put(a,
                                                                      repl)

        insert = jax.jit(
            lambda st, ch, lo: jax.tree.map(
                lambda s, c: jax.lax.dynamic_update_slice(
                    s, c, (lo,) + (0,) * (s.ndim - 1)), st, ch),
            donate_argnums=0,
            **({} if repl is None else {"out_shardings": repl}))

        if self._planes:
            from svbrdf_tpu.data.pipeline import _to_phase_planes_any

            to_planes = jax.jit(
                _to_phase_planes_any,
                **({} if repl is None else {"out_shardings": repl}))

        store = {k: put(np.zeros(s, np.uint8))
                 for k, s in shapes.items()}
        for lo in range(0, n, _CHUNK):
            hi = min(n, lo + _CHUNK)
            dataset.prefetch(range(lo, hi))
            xs, ss = zip(*(dataset.load_scaled_u8(i)
                           for i in range(lo, hi)))
            chunk = {"inputs": put(np.stack(xs)), "svbrdf": put(np.stack(ss))}
            if self._planes:
                # Transposed ON DEVICE from the uploaded chunk: no extra
                # host transfer, and the relayout runs once, not per step.
                chunk["svbrdf_planes"] = to_planes(chunk["svbrdf"])
            # The tail chunk compiles its own insert (different shape).
            store = insert(store, chunk, lo)
        self._store = store
        self._gather = jax.jit(
            lambda st, idx: jax.tree.map(
                lambda a: jnp.take(a, idx, axis=0), st),
            **({} if batch_sh is None else {"out_shardings": batch_sh}))
        stacked_sh = (None if mesh is None
                      else mesh_lib.stacked_batch_sharding(mesh))
        self._gather_many = jax.jit(
            lambda st, idx2: jax.tree.map(
                lambda a: jnp.take(
                    a, idx2.reshape(-1), axis=0).reshape(
                        idx2.shape + a.shape[1:]), st),
            **({} if stacked_sh is None else {"out_shardings": stacked_sh}))

    def __len__(self) -> int:
        return len(self._dataset)

    def raw_batch(self, indices) -> Dict[str, jnp.ndarray]:
        """On-device uint8 batch (+ mixing partners when the dataset mixes),
        shaped exactly like SvbrdfDataset.raw_batch's host arrays."""
        idx = jnp.asarray(np.asarray(indices, np.int32))
        batch = dict(self._gather(self._store, idx))
        if self._dataset.mix_materials:
            # Same host-RNG consumption pattern as SvbrdfDataset.raw_batch
            # (one draw per sample), so cached and host pipelines produce
            # identical partner sequences for the same seed.
            partners = np.asarray(
                [self._dataset._host_rng.integers(0, len(self))
                 for _ in range(len(indices))], np.int32)
            pg = self._gather(self._store, jnp.asarray(partners))
            batch["partner_svbrdf"] = pg["svbrdf"]
            if self._planes:
                batch["partner_svbrdf_planes"] = pg["svbrdf_planes"]
        return batch

    def raw_batch_many(self, index_matrix) -> Dict[str, jnp.ndarray]:
        """K stacked on-device batches for the K-step scan program: leaves
        are (K, B, ...). One flat gather serves all K batches; the mixing
        partner stream consumes the host RNG in the same flat order as K
        sequential raw_batch calls (parity with --steps-per-call 1)."""
        idx = np.asarray(index_matrix, np.int32)
        k, b = idx.shape
        batch = dict(self._gather_many(self._store, jnp.asarray(idx)))
        if self._dataset.mix_materials:
            partners = np.asarray(
                [self._dataset._host_rng.integers(0, len(self))
                 for _ in range(k * b)], np.int32).reshape(k, b)
            pg = self._gather_many(self._store, jnp.asarray(partners))
            batch["partner_svbrdf"] = pg["svbrdf"]
            if self._planes:
                batch["partner_svbrdf_planes"] = pg["svbrdf_planes"]
        return batch
