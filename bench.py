"""Headline benchmark: full rendering-loss train step at 256^2, batch 8.

Measures the COMPLETE per-step work of config 2 (mixed loss, local
renderer) including on-device input synthesis, model fwd+bwd and Adam —
the same program the trainer runs. Baseline: the reference takes ~18 s
per step for this configuration on its 1-GPU setup incl. CPU-side data
synthesis (BASELINE.md; reference docs/index.html:1002).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline", "mfu_pct"}.
mfu_pct = model FLOPs (conv/dense fwd+bwd, svbrdf_tpu/utils/flops.py) per
second vs the 197 TFLOP/s bf16 peak of one v5e chip.

Robustness against the driver's timeout window (VERDICT r4 #2): stage
progress goes to stderr, a persistent compile cache is enabled so a
prewarmed round leaves the driver run cache-hits only, and a PRELIMINARY
single-measurement JSON line is printed before the long chain — if the
run is killed mid-chain (rc=124), the last JSON line on stdout is still a
real measurement (marked "preliminary": true).

BENCH_VARIANT=pathtracing benches config 4 instead (mixed loss through the
JAX path tracer; reference baseline ~155 s/step, docs/index.html:1002).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# The persistent compile cache is UNSAFE for TPU programs on this
# backend: restoring entries poisons later custom-layout compiles and
# executions (measured: every bench run against a warm /tmp/jax_cache
# failed — layout-check mismatches or InvalidArgument at execution —
# while the identical code against an empty cache passes; four morning
# successes turned into consistent failures purely as the cache filled).
# Enable it only off-TPU; on TPU every program compiles fresh, and the
# build cost is held down by fusing state construction into one program
# (utils/bench_setup.py).
if jax.default_backend() != "tpu":
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

BASELINE_STEP_MS = 18000.0  # reference: ~1 h/epoch at ~197 steps/epoch
BASELINE_PATHTRACE_MS = 155000.0  # reference: ~8.5 h/epoch (docs:1002)


def _progress(msg: str) -> None:
    print(f"bench: {msg}", file=sys.stderr, flush=True)


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
    _progress("predict compile+warmup done")
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
    }), flush=True)


def _record(variant, model_kind, n_views, batch, size, dtype_name, step_ms,
            preliminary=False):
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
    if preliminary:
        record["preliminary"] = True
    return record


def main():
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

    from svbrdf_tpu.utils import bench_setup

    if variant == "predict":
        from svbrdf_tpu.models import MultiViewModel, SingleViewModel
        from svbrdf_tpu.parallel import make_mesh

        model = (MultiViewModel(use_coords=False, dtype=dtype)
                 if model_kind == "multi"
                 else SingleViewModel(use_coords=False, dtype=dtype))
        return bench_predict(model, model_kind, n_views, batch, size,
                             make_mesh())

    # BENCH_SCAN=K benches the trainer's device-cache multi-step program
    # (--steps-per-call K: K optimizer steps per dispatch via lax.scan).
    # DEFAULT 16 — the program the TPU trainer actually runs
    # (--device-data-cache auto-selects K=16), traced gap-free on device
    # (profiling: 'XLA Modules' busy == span). BENCH_SCAN=1 measures the
    # single-step program, whose wall time through a tunneled chip adds
    # ~1 ms/step of host dispatch that real training does not pay.
    scan_k = int(os.environ.get("BENCH_SCAN", "16"))
    t_build = time.perf_counter()
    prog = bench_setup.build_headline_program(
        batch=batch, size=size, dtype=dtype, variant=variant,
        model_kind=model_kind, scan_k=scan_k)
    _progress(f"program built ({time.perf_counter() - t_build:.1f}s)")

    # Warm-up (compile), then time a long step chain ended by a HOST FETCH
    # of the final loss: the fetch transitively forces every step (the
    # remote execution layer's block_until_ready returns early, so
    # per-step blocking under-measures by orders of magnitude).
    t_compile = time.perf_counter()
    loss = prog.run(0)
    float(jnp.sum(loss))
    _progress(f"compile done ({time.perf_counter() - t_compile:.1f}s)")
    for i in range(1, 3):
        loss = prog.run(i)
    float(jnp.sum(loss))
    _progress("warmup done")

    # PRELIMINARY measurement over a short chain: a real (noisier) number
    # that survives a timeout kill of the long chain below.
    pre_calls = 3
    t0 = time.perf_counter()
    for i in range(pre_calls):
        loss = prog.run(50 + i)
    float(jnp.sum(loss))
    pre_ms = (time.perf_counter() - t0) / (pre_calls * scan_k) * 1e3
    print(json.dumps(_record(variant, model_kind, n_views, batch, size,
                             dtype_name, pre_ms, preliminary=True)),
          flush=True)
    _progress(f"preliminary estimate {pre_ms:.2f} ms/step; "
              "starting the long chain")

    # Window sizing: enough steps that the ONE host fetch closing the
    # chain (the only trustworthy barrier through the tunnel, ~tens of ms)
    # amortizes below ~0.1 ms/step.
    if variant != "local":
        n_calls = 20
    elif scan_k > 1:
        n_calls = max(3, 512 // scan_k)
    else:
        n_calls = 48
    n_calls = int(os.environ.get("BENCH_CALLS", str(n_calls)))
    t0 = time.perf_counter()
    for i in range(n_calls):
        loss = prog.run(100 + i)
    final_loss = float(jnp.sum(loss) / scan_k)  # barrier
    elapsed = time.perf_counter() - t0
    assert np.isfinite(final_loss)

    step_ms = float(elapsed / (n_calls * scan_k) * 1e3)
    print(json.dumps(_record(variant, model_kind, n_views, batch, size,
                             dtype_name, step_ms)), flush=True)


if __name__ == "__main__":
    main()
