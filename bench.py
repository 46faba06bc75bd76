"""Headline benchmark: full rendering-loss train step at 256^2, batch 8.

Measures the COMPLETE per-step work of config 2 (mixed loss, local
renderer) including on-device input synthesis, model fwd+bwd and Adam —
the same program the trainer runs. Baseline: the reference takes ~18 s
per step for this configuration on its 1-GPU setup incl. CPU-side data
synthesis (BASELINE.md; reference docs/index.html:1002).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline", "mfu_pct"}.
mfu_pct = model FLOPs (conv/dense fwd+bwd, svbrdf_tpu/utils/flops.py) per
second vs the 197 TFLOP/s bf16 peak of one v5e chip.

BENCH_VARIANT=pathtracing benches config 4 instead (mixed loss through the
JAX path tracer; reference baseline ~155 s/step, docs/index.html:1002).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_STEP_MS = 18000.0  # reference: ~1 h/epoch at ~197 steps/epoch
BASELINE_PATHTRACE_MS = 155000.0  # reference: ~8.5 h/epoch (docs:1002)


def bench_predict(model, model_kind, n_views, batch, size, mesh):
    """Inference throughput: images -> SVBRDF maps (the serving path the
    estimator API uses). No reference baseline exists (the reference's
    test mode is matplotlib-interactive); reported as samples/s."""
    import time as _time

    from svbrdf_tpu.parallel import mesh as mesh_lib
    from svbrdf_tpu.parallel.step import make_predict_fn

    predict = make_predict_fn(model, mesh)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(
        0, 1, (batch, n_views, size, size, 3)).astype(np.float32))
    images = jax.device_put(images, mesh_lib.batch_sharding(mesh))
    params = model.init(jax.random.key(1),
                        jnp.zeros((1, n_views, size, size, 3)))["params"]
    params = jax.device_put(params, mesh_lib.replicated_sharding(mesh))

    out = predict(params, images)
    float(jnp.mean(out))  # compile + sync
    n_steps = 100
    t0 = _time.perf_counter()
    for _ in range(n_steps):
        out = predict(params, images)
    float(jnp.mean(out))  # barrier
    elapsed = _time.perf_counter() - t0
    step_ms = elapsed / n_steps * 1e3
    tag = "" if model_kind == "single" else f"_{model_kind}view{n_views}"
    print(json.dumps({
        "metric": f"predict_b{batch}_{size}{tag}",
        "value": round(step_ms, 3),
        "unit": "ms",
        "samples_per_s": round(batch / (step_ms / 1e3), 1),
    }))


def main():
    import os

    import optax

    from svbrdf_tpu import losses
    from svbrdf_tpu.models import MultiViewModel, SingleViewModel
    from svbrdf_tpu.parallel import make_mesh, mesh as mesh_lib
    from svbrdf_tpu.parallel.step import PrepConfig, make_train_step

    batch = int(os.environ.get("BENCH_BATCH", "8"))
    size = int(os.environ.get("BENCH_SIZE", "256"))
    dtype_name = os.environ.get("BENCH_DTYPE", "bfloat16")
    if dtype_name not in ("bfloat16", "float32"):
        raise SystemExit(f"BENCH_DTYPE must be 'bfloat16' or 'float32', "
                         f"got '{dtype_name}'")
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    variant = os.environ.get("BENCH_VARIANT", "local")
    model_kind = os.environ.get("BENCH_MODEL", "single")
    n_views = 3 if model_kind == "multi" else 1
    mesh = make_mesh()
    model = (MultiViewModel(use_coords=False, dtype=dtype)
             if model_kind == "multi"
             else SingleViewModel(use_coords=False, dtype=dtype))
    if variant == "predict":
        return bench_predict(model, model_kind, n_views, batch, size, mesh)
    from svbrdf_tpu.parallel.step import make_optimizer

    optimizer = make_optimizer(1e-5, dtype)
    loss_fn = losses.make_loss_fn("mixed", variant)
    prep = PrepConfig(used_input_image_count=n_views, use_augmentation=True,
                      is_linear=False, mix_materials=True)
    # BENCH_SCAN=K benches the trainer's device-cache multi-step program
    # (--steps-per-call K: K optimizer steps per dispatch via lax.scan).
    # DEFAULT 16 — the program the TPU trainer actually runs
    # (--device-data-cache auto-selects K=16), traced gap-free on device
    # (profiling: 'XLA Modules' busy == span). BENCH_SCAN=1 measures the
    # single-step program, whose wall time through a tunneled chip adds
    # ~1 ms/step of host dispatch that real training does not pay.
    scan_k = int(os.environ.get("BENCH_SCAN", "16"))
    step = make_train_step(model, optimizer, loss_fn, prep, mesh,
                           donate=True, scan_steps=scan_k)

    rng = np.random.default_rng(0)
    n = rng.uniform(-1, 1, (batch, size, size, 3)).astype(np.float32)
    n[..., 2] = np.abs(n[..., 2]) + 0.5
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    maps = rng.uniform(0.05, 0.95, (batch, size, size, 9)).astype(np.float32)
    # Raw batches enter the step as uint8 strip bytes — EXACTLY what the
    # trainer feeds (host uint8 fast path / device data cache); the step
    # program decodes on device (data/pipeline.prepare_batch).
    svbrdf = np.concatenate(
        [np.round((n * 0.5 + 0.5) * 255.0), np.round(maps * 255.0)],
        axis=-1).astype(np.uint8)

    def planes_u8(sv):
        b, hh, ww, c = sv.shape
        p = sv.reshape(b, hh // 2, 2, ww // 2, 2, c)
        return p.transpose(0, 2, 4, 5, 1, 3).reshape(
            b, 4 * c, hh // 2, ww // 2)

    raw = {
        "inputs": np.zeros((batch, 0, size, size, 3), np.uint8),
        "svbrdf": svbrdf,
        "partner_svbrdf": svbrdf[::-1].copy(),
        # The device data cache also serves a pre-transposed phase-planes
        # store (data/device_cache.py) — feed it like the trainer does.
        "svbrdf_planes": planes_u8(svbrdf),
        "partner_svbrdf_planes": planes_u8(svbrdf[::-1]),
    }
    if scan_k > 1:
        raw = jax.tree.map(
            lambda x: jax.device_put(
                np.broadcast_to(x, (scan_k,) + x.shape).copy(),
                mesh_lib.stacked_batch_sharding(mesh)), raw)
    else:
        raw = mesh_lib.shard_batch(raw, mesh)

    key = jax.random.key(0)
    params = model.init(jax.random.fold_in(key, 1),
                        jnp.zeros((1, n_views, size, size, 3)))["params"]
    from svbrdf_tpu.parallel.step import master_cast

    params = master_cast(params, dtype)  # bf16-SR masters when enabled
    opt_state = optimizer.init(params)
    repl = mesh_lib.replicated_sharding(mesh)
    params = jax.device_put(params, repl)
    opt_state = jax.device_put(opt_state, repl)

    # Warm-up (compile), then time a long step chain ended by a HOST FETCH
    # of the final loss: the fetch transitively forces every step (the
    # remote execution layer's block_until_ready returns early, so
    # per-step blocking under-measures by orders of magnitude).
    def call(i):
        if scan_k > 1:
            return step(params, opt_state, raw,
                        (jax.random.fold_in(key, i), jnp.int32(i * scan_k)))
        return step(params, opt_state, raw, jax.random.fold_in(key, i))

    for i in range(3):
        params, opt_state, loss = call(i)
    float(jnp.sum(loss))

    # Window sizing: enough steps that the ONE host fetch closing the
    # chain (the only trustworthy barrier through the tunnel, ~tens of ms)
    # amortizes below ~0.1 ms/step.
    if variant != "local":
        n_calls = 20
    elif scan_k > 1:
        n_calls = max(3, 512 // scan_k)
    else:
        n_calls = 48
    t0 = time.perf_counter()
    for i in range(n_calls):
        params, opt_state, loss = call(100 + i)
    final_loss = float(jnp.sum(loss) / scan_k)  # barrier
    elapsed = time.perf_counter() - t0
    assert np.isfinite(final_loss)

    step_ms = float(elapsed / (n_calls * scan_k) * 1e3)
    from svbrdf_tpu.utils import flops as flops_lib

    model_tag = "" if model_kind == "single" else f"_{model_kind}view{n_views}"
    record = {
        "metric":
            f"mixed_rendering_loss_train_step_b{batch}_{size}{model_tag}",
        "value": round(step_ms, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_STEP_MS / step_ms, 1),
        # Model-FLOPs utilization (conv/dense fwd+bwd + shading estimate)
        # against the 197 TFLOP/s bf16 peak of one v5e chip.
        "mfu_pct": round(100 * flops_lib.mfu(
            step_ms * 1e-3, batch=batch, image_size=size,
            dtype=dtype_name), 1),
    }
    if variant != "local":
        # The MC path tracer's sampling FLOPs aren't in the model-FLOPs
        # basis; MFU would be meaningless here.
        record["metric"] = (
            f"mixed_pathtracing_loss_train_step_b{batch}_{size}{model_tag}")
        record["vs_baseline"] = round(BASELINE_PATHTRACE_MS / step_ms, 1)
        record.pop("mfu_pct", None)
    if model_kind != "single":
        record.pop("mfu_pct", None)  # flops model covers the 1-view net
    print(json.dumps(record))


if __name__ == "__main__":
    main()
