"""Multi-chip dry run: jit the FULL training step over an n-device mesh.

Real multi-chip hardware is not always available; this module validates
the sharded program (data-sharded batch, replicated params, XLA-derived
gradient all-reduce) on a *virtual* CPU mesh created with
``--xla_force_host_platform_device_count``. Run it as a module::

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python -m svbrdf_tpu.parallel.dryrun 8

or, platform-agnostically, through ``__graft_entry__.dryrun_multichip``,
which spawns this module in a subprocess with the environment forced to
the virtual CPU backend (the surrounding shell may preset a remote-TPU
platform that a fresh in-process config update cannot always override).

The mesh size is asserted, so a silently-truncated mesh can never fake an
8-way pass as a 1-device run.
"""

from __future__ import annotations

import os
import sys


def virtual_cpu_env(n_devices: int, base_env=None) -> dict:
    """Environment dict that forces a fresh process onto a virtual
    n-device CPU backend (the single source of the recipe — used both by
    this module's in-process setup and __graft_entry__'s subprocess)."""
    env = dict(os.environ if base_env is None else base_env)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append(f"--xla_force_host_platform_device_count={n_devices}")
    env["XLA_FLAGS"] = " ".join(flags)
    env["PYTHONPATH"] = ":".join(
        p for p in env.get("PYTHONPATH", "").split(":")
        if p and ".axon_site" not in p)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    return env


def force_virtual_cpu(n_devices: int) -> None:
    """Force JAX onto a virtual n-device CPU backend.

    Must run before any JAX backend initializes. Strips the `.axon_site`
    remote-TPU path hook (it intercepts XLA compilation and would slow or
    break pure-CPU runs), forces the host platform, and requests
    `n_devices` virtual CPU devices.
    """
    sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
    for mod in [m for m in list(sys.modules) if "axon" in m.lower()]:
        del sys.modules[mod]
    os.environ.update(virtual_cpu_env(n_devices))

    import jax

    # A pytest plugin or the caller may have imported jax already; the env
    # var is then too late, but the config route works until backends
    # actually initialize.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def _dryrun_batch(batch, size):
    import jax.numpy as jnp

    images = jnp.zeros((batch, 0, size, size, 3), jnp.float32)
    svbrdf = jnp.concatenate(
        [jnp.zeros((batch, size, size, 2)),
         jnp.ones((batch, size, size, 1)),
         jnp.full((batch, size, size, 9), 0.5)], axis=-1).astype(jnp.float32)
    return {"inputs": images, "svbrdf": svbrdf,
            "partner_svbrdf": svbrdf[::-1]}


def run(n_devices: int) -> float:
    """The REAL sharded training programs on an n-device mesh.

    Tiny shapes (depth-5 U-Net at 32x32, ngf=8) but the program structures
    users actually run (VERDICT r3 #5):

    1. the single-step batch-DP program — on-device data prep (mix +
       synthesis + augmentation), model fwd/bwd, mixed rendering loss,
       Adam, batch sharded over the `data` axis with replicated params;
    2. the K-step `lax.scan` train program (the --device-data-cache /
       --steps-per-call dispatch the corpus-scale runs use), same mesh;
    3. one spatially-sharded (H-axis shard_map) train step with the FUSED
       Pallas mixed loss (interpret mode off-TPU) — the --shard-spatial
       program.

    Returns the single-step loss.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from svbrdf_tpu import losses
    from svbrdf_tpu.models import SingleViewModel
    from svbrdf_tpu.parallel import make_mesh, mesh as mesh_lib
    from svbrdf_tpu.parallel.step import PrepConfig, make_train_step

    mesh = make_mesh(n_devices=n_devices)
    # make_mesh already refuses to truncate; keep the explicit guarantee
    # anyway — a pass on fewer devices than requested proves nothing.
    assert mesh.devices.size == n_devices, (
        f"mesh has {mesh.devices.size} devices, expected {n_devices}")

    model = SingleViewModel(use_coords=False, num_filters=8, depth=5)
    optimizer = optax.adam(1e-5)
    loss_fn = lambda p, t, k: losses.mixed_loss(p, t, k, n_random=1,
                                                n_specular=2)
    prep = PrepConfig(used_input_image_count=1, use_augmentation=True,
                      is_linear=False, mix_materials=True)

    step = make_train_step(model, optimizer, loss_fn, prep, mesh,
                           donate=False)

    batch = max(n_devices, 2)
    size = 32
    key = jax.random.key(0)
    raw = mesh_lib.shard_batch(_dryrun_batch(batch, size), mesh)

    params = model.init(jax.random.fold_in(key, 1),
                        jnp.zeros((1, 1, size, size, 3)))["params"]
    opt_state = optimizer.init(params)
    repl = mesh_lib.replicated_sharding(mesh)
    params = jax.device_put(params, repl)
    opt_state = jax.device_put(opt_state, repl)

    # --- program 1: single-step batch-DP ---
    params1, opt_state1, loss = step(params, opt_state, raw, key)
    loss = float(loss)
    assert jnp.isfinite(loss), f"non-finite dryrun loss: {loss}"
    print(f"dryrun_multichip({n_devices}): batch-DP single-step program "
          f"OK, loss={loss:.4f}")

    # --- program 2: K-step lax.scan train program ---
    k_steps = 3
    scan_step = make_train_step(model, optimizer, loss_fn, prep, mesh,
                                donate=False, scan_steps=k_steps)
    stacked = jax.device_put(
        jax.tree.map(lambda x: jnp.stack([x] * k_steps),
                     _dryrun_batch(batch, size)),
        mesh_lib.stacked_batch_sharding(mesh))
    _, _, losses_k = scan_step(params, opt_state, stacked,
                               (key, jnp.int32(0)))
    import numpy as np

    losses_k = np.asarray(jax.device_get(losses_k))
    assert losses_k.shape == (k_steps,)
    assert np.isfinite(losses_k).all(), losses_k
    print(f"dryrun_multichip({n_devices}): {k_steps}-step scan program "
          f"OK, losses={[round(float(l), 4) for l in losses_k]}")

    run_spatial(n_devices)
    return loss


def run_spatial(n_devices: int) -> float:
    """One H-sharded (shard_map) train step with the fused Pallas mixed
    loss on a `space` mesh — the --shard-spatial program."""
    import jax
    import jax.numpy as jnp
    import optax

    from svbrdf_tpu.models import SingleViewModel
    from svbrdf_tpu.parallel import spatial as spatial_lib

    mesh = spatial_lib.make_spatial_mesh(n_devices=n_devices)
    assert mesh.devices.size == n_devices

    size = 32
    model = SingleViewModel(use_coords=False, num_filters=8, depth=5,
                            upconv="fold")
    optimizer = optax.adam(1e-5)
    step = spatial_lib.make_spatial_train_step(model, optimizer, mesh,
                                               n_random=1, n_specular=2)
    key = jax.random.key(2)
    params = model.init(jax.random.fold_in(key, 1),
                        jnp.zeros((1, 1, size, size, 3)))["params"]
    batch = {
        "inputs": jnp.full((2, 1, size, size, 3), 0.5, jnp.float32),
        "svbrdf": jnp.concatenate(
            [jnp.zeros((2, size, size, 2)),
             jnp.ones((2, size, size, 1)),
             jnp.full((2, size, size, 9), 0.5)], axis=-1).astype(
                 jnp.float32),
    }
    _, _, loss = step(params, optimizer.init(params), batch, key)
    loss = float(loss)
    assert jnp.isfinite(loss), f"non-finite spatial dryrun loss: {loss}"
    print(f"dryrun_multichip({n_devices}): spatial (H-sharded shard_map + "
          f"fused Pallas loss) train step OK, loss={loss:.4f}")
    return loss


def main(argv=None) -> None:
    argv = sys.argv[1:] if argv is None else argv
    n_devices = int(argv[0]) if argv else 8
    force_virtual_cpu(n_devices)
    run(n_devices)


if __name__ == "__main__":
    main()
