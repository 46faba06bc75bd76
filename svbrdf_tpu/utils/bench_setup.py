"""Shared setup for the headline benchmark configuration.

One place builds the EXACT program + inputs the trainer runs for the
headline number (mixed rendering loss, 256^2, batch 8, K=16 scan over the
device data cache), so bench.py, scripts/dump_hlo.py and
scripts/profile_step.py can never drift apart (ADVICE r4: the setup was
copy-pasted three times, and the phase-planes layout was re-implemented
by hand in two of them).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class BenchProgram:
    """A ready-to-run headline train-step program and its inputs."""

    step: Any
    params: Any
    opt_state: Any
    raw: Any
    key: Any
    scan_k: int
    model: Any
    mesh: Any
    batch: int
    size: int
    meta: dict = field(default_factory=dict)

    def call(self, i: int):
        """One dispatch with the trainer's key/batch interface (scan
        programs take (key, step_base); single-step takes a plain key)."""
        if self.scan_k > 1:
            return self.step(self.params, self.opt_state, self.raw,
                             (jax.random.fold_in(self.key, i),
                              jnp.int32(i * self.scan_k)))
        return self.step(self.params, self.opt_state, self.raw,
                         jax.random.fold_in(self.key, i))

    def run(self, i: int):
        """Dispatch and carry the donated state."""
        self.params, self.opt_state, loss = self.call(i)
        return loss


def synthetic_raw_batch(batch: int, size: int, n_views: int = 0,
                        seed: int = 0) -> dict:
    """A raw uint8 batch exactly as the trainer's device data cache feeds
    the step (data/device_cache.py): u8 strip bytes, pre-transposed
    phase-planes copies included."""
    from svbrdf_tpu.data.pipeline import _to_phase_planes_any

    rng = np.random.default_rng(seed)
    n = rng.uniform(-1, 1, (batch, size, size, 3)).astype(np.float32)
    n[..., 2] = np.abs(n[..., 2]) + 0.5
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    maps = rng.uniform(0.05, 0.95, (batch, size, size, 9)).astype(np.float32)
    svbrdf = np.concatenate(
        [np.round((n * 0.5 + 0.5) * 255.0), np.round(maps * 255.0)],
        axis=-1).astype(np.uint8)

    def planes_u8(sv):
        # The canonical layout helper is shape-math only (reshape +
        # transpose), so it runs on the numpy arrays directly — feeding it
        # jnp arrays would round-trip ~25 MB through the tunneled chip's
        # slow host link (measured: ~7 min of bench 'build' time).
        return np.ascontiguousarray(_to_phase_planes_any(sv))

    return {
        "inputs": np.zeros((batch, n_views, size, size, 3), np.uint8),
        "svbrdf": svbrdf,
        "partner_svbrdf": svbrdf[::-1].copy(),
        "svbrdf_planes": planes_u8(svbrdf),
        "partner_svbrdf_planes": planes_u8(svbrdf[::-1].copy()),
    }


def build_headline_program(batch: int = 8, size: int = 256,
                           dtype=jnp.bfloat16, variant: str = "local",
                           model_kind: str = "single",
                           scan_k: int = 16, seed: int = 0) -> BenchProgram:
    """Build the headline train-step program + inputs (config 2 default:
    mixed loss, local renderer, bf16, K=16 scan)."""
    from svbrdf_tpu import losses
    from svbrdf_tpu.models import MultiViewModel, SingleViewModel
    from svbrdf_tpu.parallel import make_mesh, mesh as mesh_lib
    from svbrdf_tpu.parallel.step import (PrepConfig, make_optimizer,
                                          make_train_step, master_cast)

    n_views = 3 if model_kind == "multi" else 1
    mesh = make_mesh()
    model = (MultiViewModel(use_coords=False, dtype=dtype)
             if model_kind == "multi"
             else SingleViewModel(use_coords=False, dtype=dtype))
    optimizer = make_optimizer(1e-5, dtype)
    loss_fn = losses.make_loss_fn("mixed", variant)
    prep = PrepConfig(used_input_image_count=n_views, use_augmentation=True,
                      is_linear=False, mix_materials=True)
    step = make_train_step(model, optimizer, loss_fn, prep, mesh,
                           donate=True, scan_steps=scan_k)

    raw = synthetic_raw_batch(batch, size, n_views=0, seed=seed)
    if scan_k > 1:
        # Ship the single ~4 MB batch once and broadcast it to the K-step
        # stack ON DEVICE: materializing the (K, ...) stack on host and
        # device_put-ing it moved ~400 MB of uint8 through the tunneled
        # chip's ~MB/s host link (measured: ~4 min of bench 'build' time).
        stacked = mesh_lib.stacked_batch_sharding(mesh)
        stack_fn = jax.jit(
            lambda t: jax.tree.map(
                lambda x: jnp.broadcast_to(x[None], (scan_k,) + x.shape), t),
            out_shardings=stacked)
        raw = stack_fn(jax.tree.map(jnp.asarray, raw))
    else:
        raw = mesh_lib.shard_batch(raw, mesh)

    key = jax.random.key(seed)
    repl = mesh_lib.replicated_sharding(mesh)

    # ONE jitted program builds the whole training state (init +
    # master-dtype cast + optimizer init): built eagerly, each of the
    # ~30 small ops is a separate remote compile at ~10 s fixed latency
    # through the tunnel (measured: ~300 s of bench 'build' time with the
    # persistent cache off — and the cache is unsafe on TPU, see bench.py).
    @partial(jax.jit, out_shardings=repl)
    def build_state(k):
        params = model.init(k, jnp.zeros((1, n_views, size, size, 3),
                                         jnp.float32))["params"]
        params = master_cast(params, dtype)
        return params, optimizer.init(params)

    params, opt_state = build_state(jax.random.fold_in(key, 1))

    return BenchProgram(step=step, params=params, opt_state=opt_state,
                        raw=raw, key=key, scan_k=scan_k, model=model,
                        mesh=mesh, batch=batch, size=size,
                        meta={"variant": variant, "model_kind": model_kind,
                              "n_views": n_views,
                              "dtype": jnp.dtype(dtype).name,
                              "optimizer": optimizer, "loss_fn": loss_fn,
                              "prep": prep})
