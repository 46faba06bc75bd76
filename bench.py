"""Headline benchmark: full rendering-loss train step at 256^2, batch 8.

Measures the COMPLETE per-step work of config 2 (mixed loss, local
renderer) including on-device input synthesis, model fwd+bwd and Adam —
the same program the trainer runs. Baseline: the reference takes ~18 s
per step for this configuration on its 1-GPU setup incl. CPU-side data
synthesis (BASELINE.md; reference docs/index.html:1002).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_STEP_MS = 18000.0  # reference: ~1 h/epoch at ~197 steps/epoch


def main():
    import os

    import optax

    from svbrdf_tpu import losses
    from svbrdf_tpu.models import SingleViewModel
    from svbrdf_tpu.parallel import make_mesh, mesh as mesh_lib
    from svbrdf_tpu.parallel.step import PrepConfig, make_train_step

    batch, size = 8, 256
    dtype = jnp.bfloat16 if os.environ.get(
        "BENCH_DTYPE", "bfloat16") == "bfloat16" else jnp.float32
    mesh = make_mesh()
    model = SingleViewModel(use_coords=False, dtype=dtype)
    optimizer = optax.adam(1e-5)
    loss_fn = losses.make_loss_fn("mixed", "local")
    prep = PrepConfig(used_input_image_count=1, use_augmentation=True,
                      is_linear=False, mix_materials=True)
    step = make_train_step(model, optimizer, loss_fn, prep, mesh,
                           donate=True)

    rng = np.random.default_rng(0)
    n = rng.uniform(-1, 1, (batch, size, size, 3)).astype(np.float32)
    n[..., 2] = np.abs(n[..., 2]) + 0.5
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    maps = rng.uniform(0.05, 0.95, (batch, size, size, 9)).astype(np.float32)
    svbrdf = np.concatenate([n, maps], axis=-1)
    raw = {
        "inputs": np.zeros((batch, 0, size, size, 3), np.float32),
        "svbrdf": svbrdf,
        "partner_svbrdf": svbrdf[::-1].copy(),
    }
    raw = mesh_lib.shard_batch(raw, mesh)

    key = jax.random.key(0)
    params = model.init(jax.random.fold_in(key, 1),
                        jnp.zeros((1, 1, size, size, 3)))["params"]
    opt_state = optimizer.init(params)
    repl = mesh_lib.replicated_sharding(mesh)
    params = jax.device_put(params, repl)
    opt_state = jax.device_put(opt_state, repl)

    # Warm-up (compile), then time a 50-step chain ended by a HOST FETCH of
    # the final loss: the fetch transitively forces every step (the remote
    # execution layer's block_until_ready returns early, so per-step
    # blocking under-measures by orders of magnitude).
    for i in range(3):
        params, opt_state, loss = step(params, opt_state, raw,
                                       jax.random.fold_in(key, i))
    float(loss)

    n_steps = 50
    t0 = time.perf_counter()
    for i in range(n_steps):
        params, opt_state, loss = step(params, opt_state, raw,
                                       jax.random.fold_in(key, 100 + i))
    final_loss = float(loss)  # barrier
    elapsed = time.perf_counter() - t0
    assert np.isfinite(final_loss)

    step_ms = float(elapsed / n_steps * 1e3)
    print(json.dumps({
        "metric": "mixed_rendering_loss_train_step_b8_256",
        "value": round(step_ms, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_STEP_MS / step_ms, 1),
    }))


if __name__ == "__main__":
    main()
