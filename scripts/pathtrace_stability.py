"""Path-tracing (config 4) stability run on the real TPU.

The reference documents its Redner-loss training destabilizing (NaN /
plateau) after ~75k steps (reference docs/index.html:1255-1259) and never
benchmarks it beyond ~155 s/step (docs/index.html:1002). This script runs a
few hundred full mixed-pathtracing train steps at 256^2, batch 8, on
synthetic-but-structured SVBRDFs and reports:

  - step time (same fetch-barrier protocol as bench.py),
  - loss trajectory (finite? decreasing?),
  - grad health via the Adam state (any non-finite second moments).

Usage:  python scripts/pathtrace_stability.py [n_steps] [spp_fwd spp_bwd]
Writes a JSON summary to stdout.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, ".")

from svbrdf_tpu import losses  # noqa: E402
from svbrdf_tpu.models import SingleViewModel  # noqa: E402
from svbrdf_tpu.parallel import make_mesh, mesh as mesh_lib  # noqa: E402
from svbrdf_tpu.parallel.step import PrepConfig, make_train_step  # noqa: E402


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    spp = ((int(sys.argv[2]), int(sys.argv[3]))
           if len(sys.argv) > 3 else (16, 8))
    batch, size = 8, 256

    mesh = make_mesh()
    model = SingleViewModel(use_coords=False, dtype=jnp.bfloat16)
    optimizer = optax.adam(1e-5)

    from functools import partial

    from svbrdf_tpu.ops import pathtrace

    render_fn = pathtrace.make_render_fn(spp=spp)
    loss_fn = partial(losses.mixed_loss, render_fn=render_fn)
    prep = PrepConfig(used_input_image_count=1, use_augmentation=True,
                      is_linear=False, mix_materials=True)
    step = make_train_step(model, optimizer, loss_fn, prep, mesh)

    # Structured SVBRDF batch: smooth normal field + banded maps, more
    # renderer-stressing than uniform noise (grazing highlights).
    rng = np.random.default_rng(7)
    ys, xs = np.meshgrid(np.linspace(-1, 1, size), np.linspace(-1, 1, size),
                         indexing="ij")
    nx = 0.4 * np.sin(3 * np.pi * xs)
    ny = 0.4 * np.cos(2 * np.pi * ys)
    nz = np.sqrt(np.clip(1 - nx ** 2 - ny ** 2, 0.1, None))
    normals = np.stack([nx, ny, nz], -1)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    base = np.stack([0.2 + 0.6 * (np.sin(5 * xs + i) * 0.5 + 0.5)
                     for i in range(9)], -1)
    sv = np.concatenate([normals, base], -1).astype(np.float32)
    svbrdf = np.stack([np.roll(sv, 13 * i, axis=1) for i in range(batch)])
    raw = {"inputs": np.zeros((batch, 0, size, size, 3), np.float32),
           "svbrdf": svbrdf, "partner_svbrdf": svbrdf[::-1].copy()}
    raw = mesh_lib.shard_batch(raw, mesh)

    key = jax.random.key(0)
    params = model.init(jax.random.fold_in(key, 1),
                        jnp.zeros((1, 1, size, size, 3)))["params"]
    opt_state = optimizer.init(params)
    repl = mesh_lib.replicated_sharding(mesh)
    params = jax.device_put(params, repl)
    opt_state = jax.device_put(opt_state, repl)

    assert n_steps > 3, "need >3 steps (3 warmup before the timer starts)"
    losses_seen = []
    t0 = None
    timed_steps = 0
    for i in range(n_steps):
        params, opt_state, loss = step(params, opt_state, raw,
                                       jax.random.fold_in(key, i))
        if i == 2:
            float(loss)  # sync after warmup/compile
            t0 = time.perf_counter()
        elif i > 2:
            timed_steps += 1
        if (i + 1) % max(50, n_steps // 20) == 0 or i == n_steps - 1:
            l = float(loss)  # fetch barrier
            losses_seen.append((i, l))
            print(f"step {i}: loss {l:.5f}", flush=True)
            if not np.isfinite(l):
                break  # timed_steps reflects the steps actually run
    elapsed = time.perf_counter() - t0
    step_ms = elapsed / max(1, timed_steps) * 1e3

    nu_finite = all(bool(jnp.all(jnp.isfinite(x)))
                    for x in jax.tree.leaves(opt_state[0].nu))
    summary = {
        "metric": "pathtracing_stability",
        "n_steps": n_steps,
        "spp": list(spp),
        "step_ms": round(step_ms, 2),
        "vs_reference_155s": round(155000.0 / step_ms, 1),
        "losses": [[i, round(l, 5)] for i, l in losses_seen],
        "all_finite": all(np.isfinite(l) for _, l in losses_seen),
        "adam_nu_finite": nu_finite,
        "loss_decreased": losses_seen[-1][1] < losses_seen[0][1],
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
