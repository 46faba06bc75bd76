"""Drivable spatial (H-axis) SPMD training: `--shard-spatial N`.

parallel/spatial.py provides the library pieces (mesh, fold guard,
shard_mapped fused loss, exact H-sharded train step); this module wires
them into the CLI so a user can actually run an H-sharded training job
with `python -m svbrdf_tpu.main --shard-spatial N ...` — checkpoints,
TensorBoard logging, validation, resume and the NaN guard included
(VERDICT r3 #5; use case: inputs too large for one chip's activation
memory, SURVEY.md §5 "long-context spatial").

Differences from the batch-DP loop (training/loop.py), by design:
- activations are sharded over H (params replicate); the batch is NOT
  split across devices, so any batch size works on any mesh;
- sample preparation (decode, mixing, synthesis, augmentation) runs
  replicated on device per batch, then the prepared batch is resharded
  over H — prep is per-sample math at input resolution, cheap relative
  to the sharded fwd/bwd it feeds at the >1k^2 sizes this mode targets;
- no device data cache / multi-step scan (those optimize dispatch
  latency for small images; spatial mode is for big ones).
"""

from __future__ import annotations

import pathlib
import shutil

import jax
import jax.numpy as jnp
import numpy as np

from svbrdf_tpu import losses as losses_lib
from svbrdf_tpu.data import pipeline
from svbrdf_tpu.data.dataset import split_train_validation
from svbrdf_tpu.training.checkpoint import Checkpoint
from svbrdf_tpu.training.tensorboard import SummaryWriter


def run_training_spatial(args) -> float:
    """Spatially-sharded training driver; returns the last training loss."""
    from svbrdf_tpu.parallel import step as _step_lib

    # This driver forces master_dtype='f32' (below) which setup() installs
    # process-wide; scope it to the run (see loop.run_training).
    with _step_lib.master_dtype_scope():
        return _run_training_spatial(args)


def _run_training_spatial(args) -> float:
    from jax.sharding import NamedSharding, PartitionSpec as P

    from svbrdf_tpu.models import layers as layers_mod
    from svbrdf_tpu.parallel import spatial as spatial_lib
    from svbrdf_tpu.parallel import step as step_lib
    from svbrdf_tpu.training import loop as loop_mod

    n = int(args.shard_spatial)
    if args.image_size % n:
        raise ValueError(
            f"--shard-spatial {n} must divide --image-size "
            f"{args.image_size} (H is split into equal shards)")
    if args.renderer != "local":
        raise ValueError("--shard-spatial supports the local renderer "
                         "(the shard_mapped fused loss); the path tracer "
                         "is unsharded")
    l1_weight = {"mixed": 0.1, "render": 0.0}.get(args.loss)
    if l1_weight is None:
        raise ValueError("--shard-spatial needs a rendering-based loss "
                         "(--loss mixed|render); plain --loss l1 does not "
                         "need spatial sharding")
    # The lhs-dilated decoder conv is mispartitioned by XLA under H
    # sharding (parallel/spatial.py guard); 'auto' resolves to the exact
    # fold rewrite here.
    if getattr(args, "upconv", "auto") in ("auto", None, ""):
        args.upconv = "fold"
        print("Spatial sharding: using upconv='fold' (required under "
              "H-axis SPMD)")
    # The spatial step applies plain optax updates; bf16-SR master params
    # need the batch-DP loop's fused stochastic-rounding update (plain
    # round-to-nearest bf16 masters would freeze at lr=1e-5), so this mode
    # trains f32 masters. Recorded in the checkpoint meta as usual.
    if getattr(args, "master_dtype", "auto") != "f32":
        args.master_dtype = "f32"
        print("Spatial sharding: training f32 master params (bf16-SR "
              "masters are a batch-DP step optimization)")

    mesh = spatial_lib.make_spatial_mesh(n_devices=n)
    assert mesh.devices.size == n
    print(f"Using spatial mesh {mesh} on {jax.default_backend()}")

    (args, model, params, optimizer, opt_state, epoch_start,
     root_key) = loop_mod.setup(args, mesh=None)

    repl = NamedSharding(mesh, P())
    in_sp = NamedSharding(mesh, P(None, None, spatial_lib.SPACE_AXIS))
    sv_sp = NamedSharding(mesh, P(None, spatial_lib.SPACE_AXIS))
    params = jax.device_put(params, repl)
    opt_state = jax.device_put(opt_state, repl)

    data = loop_mod._build_dataset(args, "train")
    train_idx, val_idx = split_train_validation(len(data), 0.01, args.seed)
    print(f"Training samples: {len(train_idx)}.")
    print(f"Validation samples: {len(val_idx)}.")

    prep = loop_mod._prep_config(args, data)
    step = spatial_lib.make_spatial_train_step(
        model, optimizer, mesh, l1_weight=l1_weight)

    def eval_loss(p, batch, key):
        pred = model.apply({"params": p}, batch["inputs"],
                           deterministic=True)
        return (l1_weight * losses_lib.svbrdf_l1_loss(pred, batch["svbrdf"])
                + spatial_lib.spatial_rendering_loss(
                    pred, batch["svbrdf"], key, mesh))

    eval_fn = jax.jit(eval_loss,
                      in_shardings=(repl,
                                    {"inputs": in_sp, "svbrdf": sv_sp},
                                    repl),
                      out_shardings=repl)

    def prepared_batch(idx, key):
        raw = data.raw_batch(np.asarray(idx))
        out = pipeline.prepare_batch(
            key, raw["inputs"], raw["svbrdf"],
            raw.get("partner_svbrdf") if prep.mix_materials else None,
            used_input_image_count=prep.used_input_image_count,
            use_augmentation=prep.use_augmentation,
            is_linear=prep.is_linear)
        return {"inputs": jax.device_put(out["inputs"], in_sp),
                "svbrdf": jax.device_put(out["svbrdf"], sv_sp)}

    checkpoint_dir = pathlib.Path(args.model_dir)
    stats_dir = checkpoint_dir / "logs"
    if args.retrain and stats_dir.exists():
        shutil.rmtree(stats_dir)
    writer = SummaryWriter(str(stats_dir))

    batch_size = args.batch_size
    batch_count = max(1, int(np.ceil(len(train_idx) / batch_size)))
    last_loss = float("nan")

    def save(epoch):
        Checkpoint.save(checkpoint_dir, params, opt_state, epoch,
                        args.model_type, args.use_coords,
                        args.omit_optimizer_state_save,
                        extra_meta={
                            "model_depth": getattr(args, "model_depth", 8),
                            "num_filters": getattr(args, "num_filters", 64),
                            "master_dtype": step_lib.master_dtype_policy(),
                            "upconv": (model.upconv
                                       or layers_mod.UPCONV_IMPL),
                        })

    print(f"Training from epoch {epoch_start} to {args.epochs}")
    for epoch in range(epoch_start, args.epochs):
        order = np.array(train_idx)
        data._host_rng.shuffle(order)
        for i in range(batch_count):
            idx = order[i * batch_size:(i + 1) * batch_size]
            if len(idx) == 0:
                continue
            if len(idx) < batch_size:  # static shapes: wrap-pad
                idx = np.resize(idx, batch_size)
            base = epoch * batch_count + i
            # Same per-step key derivation as the batch-DP loop; prep
            # consumes a disjoint fold of it (prep runs outside the step
            # here, so it draws from its own slot).
            key = jax.random.fold_in(root_key, base + 1)
            batch = prepared_batch(idx, jax.random.fold_in(key, 7))
            params, opt_state, loss = step(params, opt_state, batch, key)
            loss = float(loss)
            if not np.isfinite(loss):
                save(epoch)
                writer.close()
                raise FloatingPointError(
                    f"non-finite loss at epoch {epoch}, batch {i + 1}")
            writer.add_scalar("loss", loss, base)
            print(f"Epoch {epoch}, Batch {i + 1}, loss: {loss:f}")
            last_loss = loss
        if epoch % args.save_frequency == 0:
            save(epoch)
        if epoch % args.validation_frequency == 0 and len(val_idx) > 0:
            val_key = jax.random.fold_in(root_key, 1_000_000_007 + epoch)
            total, count = 0.0, 0
            for lo in range(0, len(val_idx), batch_size):
                vidx = np.resize(np.asarray(val_idx[lo:lo + batch_size]),
                                 batch_size)
                true_n = min(batch_size, len(val_idx) - lo)
                vb = prepared_batch(vidx, jax.random.fold_in(val_key, lo))
                # wrap-padded tail batches weight by their true size (the
                # padded duplicates shift the batch mean only within the
                # duplicated samples' own contribution; documented
                # deviation from loop.py's exact remainder program).
                total += float(eval_fn(params, vb,
                                       jax.random.fold_in(val_key,
                                                          lo + 1))) * true_n
                count += true_n
            val_loss = total / count
            print(f"Epoch {epoch}, validation loss: {val_loss:f}")
            writer.add_scalar("val_loss", val_loss, epoch * batch_count)
    save(max(epoch_start, args.epochs - 1))
    writer.close()
    return last_loss
