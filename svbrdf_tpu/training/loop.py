"""Train / test driver.

Orchestration contract = reference main.py:15-223: checkpoint-first arg
restore, deterministic seeding, model build + restore, dataset with 1%
validation split, Adam, mixed loss with selectable renderer, per-step
`loss` scalars + periodic `val_loss`, checkpoint cadence, final save, and
a test-time visualization of input + GT maps vs predicted maps.

TPU-native differences: the hot path is ONE jitted SPMD program (see
parallel/step.py) over a data mesh; data synthesis runs on device; RNG is
an explicit key tree derived from the seed (reference relies on global
torch/numpy seeding, utils.py:7-13).
"""

from __future__ import annotations

import math
import pathlib
import shutil
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from svbrdf_tpu import losses as losses_lib
from svbrdf_tpu.data.dataset import SvbrdfDataset, split_train_validation
from svbrdf_tpu.models import build_model
from svbrdf_tpu.models import layers as layers_mod
from svbrdf_tpu.parallel import make_mesh, mesh as mesh_lib
from svbrdf_tpu.parallel import step as step_lib
from svbrdf_tpu.parallel.step import (PrepConfig, make_eval_step,
                                      make_predict_fn, make_train_step)
from svbrdf_tpu.training.checkpoint import Checkpoint
from svbrdf_tpu.training.tensorboard import SummaryWriter

DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


def resolve_dtype(name: str) -> jnp.dtype:
    """'auto' = bf16 on TPU (the benched configuration; toy-run loss parity
    with f32 validated in STATUS.md), f32 elsewhere (CPU bf16 is emulated
    and slow, and the parity test oracle is f32)."""
    if name == "auto":
        name = ("bfloat16" if jax.default_backend() == "tpu"
                else "float32")
    return DTYPES[name]


def _build_dataset(args, mode: str) -> SvbrdfDataset:
    return SvbrdfDataset(
        data_directory=args.input_dir,
        image_size=args.image_size,
        scale_mode=args.scale_mode,
        input_image_count=args.image_count,
        used_input_image_count=args.used_image_count,
        use_augmentation=True,
        mix_materials=(mode == "train"),
        no_svbrdf=args.no_svbrdf_input,
        is_linear=args.linear_input,
        seed=args.seed,
        # Multi-host training: each process reads only its file shard.
        shard_across_hosts=(mode == "train"),
    )


def _prep_config(args, dataset: SvbrdfDataset) -> PrepConfig:
    return PrepConfig(
        used_input_image_count=args.used_image_count,
        use_augmentation=True,
        is_linear=args.linear_input,
        mix_materials=dataset.mix_materials,
    )


def _loss_kind(name: str) -> str:
    return {"mixed": "mixed", "l1": "l1", "render": "rendering"}[name]


def _init_params(model, args, key):
    n_views = max(1, min(args.image_count, args.used_image_count),
                  args.used_image_count)
    sample = jnp.zeros((1, n_views, args.image_size, args.image_size, 3),
                       jnp.float32)
    return model.init(key, sample)["params"]


def setup(args, mesh=None):
    """Shared build: checkpoint -> args override -> model/params/opt."""
    checkpoint_dir = pathlib.Path(args.model_dir)
    clean_training = args.mode == "train" and args.retrain

    checkpoint = Checkpoint(None)
    import_path = getattr(args, "import_torch_checkpoint", None)
    if import_path:
        checkpoint = Checkpoint.load_torch(import_path)
        if not checkpoint.is_valid():
            raise SystemExit(
                f"No torch checkpoint found at '{import_path}'")
    elif not clean_training:
        checkpoint = Checkpoint.load(checkpoint_dir)
    if checkpoint.is_valid() or checkpoint._meta:
        args = checkpoint.restore_args(args)

    # Promoted config knobs (VERDICT r3 #7): the CLI flags (or the values
    # restored from the checkpoint meta) take precedence over the
    # SVBRDF_MASTER_DTYPE / SVBRDF_UPCONV env vars.
    master_dtype = getattr(args, "master_dtype", "auto")
    # 'auto' RESETS to env-var control so back-to-back runs in one process
    # (tests, notebooks) don't inherit a previous run's explicit policy.
    step_lib.set_master_dtype_policy(
        None if master_dtype in ("auto", None) else master_dtype)
    upconv = getattr(args, "upconv", "auto")

    model = build_model(args.model_type, use_coords=args.use_coords,
                        dtype=resolve_dtype(args.dtype),
                        depth=getattr(args, "model_depth", 8),
                        num_filters=getattr(args, "num_filters", 64),
                        upconv="" if upconv in ("auto", None) else upconv)

    root_key = jax.random.key(args.seed)
    params = _init_params(model, args, jax.random.fold_in(root_key, 0))
    if checkpoint.is_valid():
        params = checkpoint.restore_params(params)
    elif args.mode == "test":
        raise SystemExit("No model found in the model directory but it is "
                         "required for testing.")
    if args.mode == "train":
        # Under the bf16-SR master policy the TRAINED tree stores >=2-D
        # leaves in bf16 (step_lib.master_dtype_policy); checkpoints of
        # either dtype restore cleanly (f32 template -> cast here).
        params = step_lib.master_cast(params, getattr(model, "dtype", None))

    optimizer = step_lib.make_optimizer(args.learning_rate,
                                        getattr(model, "dtype", None))
    opt_state = optimizer.init(params)
    if checkpoint.is_valid():
        opt_state = checkpoint.restore_opt_state(opt_state)

    epoch_start = checkpoint.restore_epoch(0) if checkpoint.is_valid() else 0
    checkpoint.purge()

    if mesh is not None:
        params = mesh_lib.replicate_tree(params, mesh)
        opt_state = mesh_lib.replicate_tree(opt_state, mesh)

    return args, model, params, optimizer, opt_state, epoch_start, root_key


from contextlib import nullcontext as _nullcontext


class _NullWriter:
    """No-op SummaryWriter for non-main hosts (one writer per run)."""

    def add_scalar(self, *a, **k):
        pass

    def close(self):
        pass


def _mesh_size_for_batch(batch_size: int, n_available: int) -> int:
    """Largest divisor of batch_size that fits the available devices
    (batches shard evenly across the data axis)."""
    return max(d for d in range(1, n_available + 1) if batch_size % d == 0)


def _validation_sums(eval_steps: dict, params, data, val_idx, batch_size,
                     root_key, epoch):
    """Sample-weighted (loss_sum, sample_count) over the validation split.

    Full batches run through the sharded eval step; a trailing partial
    batch runs at its TRUE size through a single-device step built on
    demand (keyed by its length), so no sample is ever duplicated into
    the statistic (reference protocol: plain mean over the split,
    main.py:129-147). Each batch gets its own scene key. Returning the
    sums (not the mean) lets multi-host runs allreduce them into a GLOBAL
    validation loss across unequal per-host shards.
    """
    # A validation key stream disjoint from training's fold_in(root, step+1)
    # (steps stay far below 1e9; fold_in rejects negative values).
    val_key = jax.random.fold_in(root_key, 1_000_000_007 + epoch)
    total, count = 0.0, 0
    for lo in range(0, len(val_idx), batch_size):
        vidx = np.asarray(val_idx[lo:lo + batch_size])
        raw = data.raw_batch(vidx)
        key = jax.random.fold_in(val_key, lo)
        step = eval_steps[batch_size if len(vidx) == batch_size
                          else "remainder"]
        total += float(step(params, raw, key)) * len(vidx)
        count += len(vidx)
    return total, count


def _make_training_mesh(batch_size: int, n_avail: int):
    """Data mesh sized to the largest batch divisor; warns loudly when
    that idles devices (an invisible throughput loss on a paid slice)."""
    mesh_size = _mesh_size_for_batch(batch_size, n_avail)
    if mesh_size < n_avail:
        import warnings

        warnings.warn(
            f"batch size {batch_size} is not divisible by {n_avail} "
            f"devices; using a {mesh_size}-device mesh and IDLING "
            f"{n_avail - mesh_size} device(s). Pick a batch size "
            f"divisible by the device count to use the full slice.",
            stacklevel=2)
    return make_mesh(n_devices=mesh_size)


def run_training(args) -> float:
    # setup() installs the run's master-dtype policy process-wide (the jit
    # programs and trees built below depend on it); the scope restores the
    # previous override when the run ends so the policy never leaks into a
    # later run in the same process.
    with step_lib.master_dtype_scope():
        return _run_training(args)


def _run_training(args) -> float:
    if int(getattr(args, "shard_spatial", 0) or 0) > 0:
        # H-axis SPMD driver (inputs too large for one chip's activation
        # memory) — training/spatial_loop.py, VERDICT r3 #5.
        from svbrdf_tpu.training.spatial_loop import run_training_spatial

        return run_training_spatial(args)
    n_avail = (args.num_devices if args.num_devices > 0
               else len(jax.devices()))
    mesh = _make_training_mesh(args.batch_size, n_avail)
    pc = jax.process_count()
    is_main = jax.process_index() == 0
    if pc > 1 and mesh.devices.size != len(jax.devices()):
        raise ValueError(
            f"multi-host training needs a batch size divisible across ALL "
            f"{len(jax.devices())} devices (got {args.batch_size}); a "
            f"partial mesh would exclude some process's devices")
    print(f"Using mesh {mesh} on {jax.default_backend()}"
          + (f" ({pc} processes)" if pc > 1 else ""))

    (args, model, params, optimizer, opt_state, epoch_start,
     root_key) = setup(args, mesh)

    data = _build_dataset(args, "train")
    device_cache = None
    if getattr(args, "device_data_cache", False):
        if pc > 1:
            raise ValueError("--device-data-cache is single-process only "
                             "(each host would need the full corpus)")
        from svbrdf_tpu.data.device_cache import DeviceDataCache

        device_cache = DeviceDataCache(data, mesh)
        print(f"Device data cache: {len(device_cache)} samples, "
              f"{device_cache.nbytes / 1e9:.2f} GB in HBM")
    # Multi-host: each process splits/shuffles ITS file shard; the local
    # per-step slice is global_batch / process_count samples, assembled
    # into the global sharded batch by mesh_lib.shard_batch.
    local_batch = mesh_lib.local_batch_size(args.batch_size)
    train_idx, val_idx = split_train_validation(len(data), 0.01, args.seed)
    print(f"Training samples: {len(train_idx)}.")
    print(f"Validation samples: {len(val_idx)}.")

    prep = _prep_config(args, data)
    loss_fn = losses_lib.make_loss_fn(_loss_kind(args.loss), args.renderer,
                                      fused=getattr(args, "fused_loss",
                                                    None))
    scan_k = int(getattr(args, "steps_per_call", 0) or 0)
    if scan_k == 0:
        scan_k = 16 if device_cache is not None else 1
    elif scan_k > 1 and device_cache is None:
        raise ValueError("--steps-per-call > 1 needs --device-data-cache "
                         "(batches must already be on device)")
    train_step = make_train_step(model, optimizer, loss_fn, prep, mesh,
                                 scan_steps=scan_k)
    # The final sub-K chunk of each epoch runs through a sibling program
    # compiled lazily at its first use, with its state boundary pinned to
    # the main program's layouts (no relayout between programs) and the
    # shared carried compute tree.
    chunk_steps = {scan_k: train_step}

    def get_chunk_step(k):
        if k not in chunk_steps:
            chunk_steps[k] = make_train_step(
                model, optimizer, loss_fn, prep, mesh, scan_steps=k,
                state_formats=(train_step.state_formats
                               if train_step._compiled is not None
                               else None),
                share_compute_with=train_step)
        return chunk_steps[k]
    eval_steps = {
        batch_size_key: make_eval_step(model, loss_fn, prep, m)
        for batch_size_key, m in
        ((args.batch_size, mesh), ("remainder", None))
    }
    print(f"Using renderer '{args.renderer}'")

    checkpoint_dir = pathlib.Path(args.model_dir)
    stats_dir = checkpoint_dir / "logs"
    if is_main and args.retrain and stats_dir.exists():
        shutil.rmtree(stats_dir)  # reference main.py:93-95
    writer = (SummaryWriter(str(stats_dir)) if is_main
              else _NullWriter())

    batch_size = args.batch_size
    if pc > 1:
        # Step count must be IDENTICAL across hosts (the train step is a
        # collective program): derive it from global quantities every
        # host knows, and wrap each host's local order to fill it.
        global_train_len = int(math.ceil(data.global_file_count * 0.99))
        batch_count = max(1, int(math.ceil(global_train_len / batch_size)))
    else:
        batch_count = max(1, int(math.ceil(len(train_idx) / batch_size)))
    last_loss = float("nan")

    def save(epoch):
        # Multi-host: every process participates (Orbax coordinates the
        # distributed write; only the main host writes the meta sidecar).
        Checkpoint.save(checkpoint_dir, params, opt_state, epoch,
                        args.model_type, args.use_coords,
                        args.omit_optimizer_state_save,
                        extra_meta={
                            "model_depth": getattr(args, "model_depth", 8),
                            "num_filters": getattr(args, "num_filters", 64),
                            # Reproducibility-critical knobs (VERDICT r3
                            # #7): the EFFECTIVE policies this run trained
                            # with — restored by restore_args on resume
                            # when the CLI leaves them at 'auto'.
                            "master_dtype": step_lib.master_dtype_policy(),
                            "upconv": (model.upconv or layers_mod.UPCONV_IMPL),
                        })

    print(f"Training from epoch {epoch_start} to {args.epochs}")
    from svbrdf_tpu.utils.profiling import StepTimer

    timer = StepTimer(warmup=1)
    log_every = max(1, getattr(args, "log_every", 1))
    profile_dir = getattr(args, "profile_dir", None)
    profiling = False
    compiled_step = None
    for epoch in range(epoch_start, args.epochs):
        order = np.array(train_idx)
        data._host_rng.shuffle(order)
        if pc > 1:
            # Wrap the local order so every host contributes a full local
            # slice on every one of the batch_count collective steps.
            order = np.resize(order, batch_count * local_batch)
        step_size = local_batch if pc > 1 else batch_size
        data.prefetch(order[:step_size])
        if scan_k > 1:
            # Device-cache chunked path (single process): K optimizer
            # steps per dispatch through the scan program; the per-step
            # key stream and losses are identical to scan_k == 1.
            i = 0
            while i < batch_count:
                k = min(scan_k, batch_count - i)
                rows = np.empty((k, step_size), np.int64)
                for j in range(k):
                    rows[j] = np.resize(
                        order[(i + j) * step_size:(i + j + 1) * step_size],
                        step_size)
                raw = device_cache.raw_batch_many(rows)
                base = epoch * batch_count + i
                step_k = get_chunk_step(k)

                if profile_dir and base > 0 and not profiling:
                    jax.profiler.start_trace(profile_dir)
                    profiling = True

                fetch = (any((i + j) % log_every == 0 for j in range(k))
                         or i + k >= batch_count)
                with timer.measure() if fetch else _nullcontext():
                    if k == 1:
                        # The k=1 remainder program IS the single-step
                        # program: plain key, unstacked batch, scalar
                        # loss. fold_in(root_key, base + 1) is exactly
                        # the scan body's key for j=0, so the key stream
                        # stays identical to k sequential steps.
                        params, opt_state, losses = step_k(
                            params, opt_state,
                            jax.tree.map(lambda x: x[0], raw),
                            jax.random.fold_in(root_key, base + 1))
                    else:
                        params, opt_state, losses = step_k(
                            params, opt_state, raw,
                            (root_key, jnp.int32(base)))
                    if fetch:
                        losses = np.asarray(
                            jax.device_get(losses), np.float64).reshape(-1)

                if profiling and base > 0:
                    jax.profiler.stop_trace()
                    profiling = False
                    profile_dir = None

                if fetch:
                    if not np.isfinite(losses).all():
                        save(epoch)
                        writer.close()
                        raise FloatingPointError(
                            f"non-finite loss at epoch {epoch}, "
                            f"batches {i + 1}..{i + k}")
                    for j in range(k):
                        writer.add_scalar("loss", float(losses[j]),
                                          base + j)
                        if ((i + j) % log_every == 0
                                or i + j == batch_count - 1):
                            print(f"Epoch {epoch}, Batch {i + j + 1}, "
                                  f"loss: {losses[j]:f}")
                    last_loss = float(losses[-1])
                i += k
            if epoch % args.save_frequency == 0:
                save(epoch)
            if (epoch % args.validation_frequency == 0
                    and len(val_idx) > 0):
                total, count = _validation_sums(eval_steps, params, data,
                                                val_idx, batch_size,
                                                root_key, epoch)
                if count > 0:
                    val_loss = total / count
                    print(f"Epoch {epoch}, validation loss: {val_loss:f}")
                    writer.add_scalar("val_loss", val_loss,
                                      epoch * batch_count)
            continue
        for i in range(batch_count):
            idx = order[i * step_size:(i + 1) * step_size]
            if len(idx) == 0:
                continue
            if len(idx) < step_size:
                # Pad the final batch to a full, evenly-shardable batch
                # (static shapes; wraps around).
                idx = np.resize(idx, step_size)
            if device_cache is not None:
                raw = device_cache.raw_batch(idx)
            else:
                # Decode the NEXT batch on background threads while the
                # device runs this step.
                data.prefetch(
                    order[(i + 1) * step_size:(i + 2) * step_size])
                raw = data.raw_batch(idx)
            if pc > 1:
                raw = mesh_lib.shard_batch(raw, mesh)
                if compiled_step is None:
                    # AOT-compile, then sync hosts BEFORE first execution:
                    # per-host compile skew can exceed the collective
                    # context-init timeout (Gloo's 30 s KV wait on CPU).
                    key0 = jax.random.fold_in(root_key, 1)
                    train_step.aot_compile(params, opt_state, raw, key0)
                    compiled_step = train_step
                    mesh_lib.sync_hosts("train_step_compiled")
            batch_index = epoch * batch_count + i
            key = jax.random.fold_in(root_key, batch_index + 1)

            # Profile a small window of steady-state steps (post-compile).
            if profile_dir and batch_index == 1 and not profiling:
                jax.profiler.start_trace(profile_dir)
                profiling = True

            fetch = (i % log_every == 0 or i == batch_count - 1)
            with timer.measure() if fetch else _nullcontext():
                params, opt_state, loss = train_step(params, opt_state, raw,
                                                     key)
                if fetch:
                    # Each float() is a blocking host sync (~30 ms through
                    # a tunneled chip); --log-every thins it out.
                    loss = float(loss)

            if profiling and batch_index >= 4:
                jax.profiler.stop_trace()
                profiling = False
                profile_dir = None

            if not fetch:
                continue

            if not math.isfinite(loss):
                # NaN guard: the reference documents rendering-loss NaN
                # collapses (docs/index.html:1255-1259) but does not handle
                # them; we stop the run with a clear message.
                save(epoch)
                writer.close()
                raise FloatingPointError(
                    f"non-finite loss at epoch {epoch}, batch {i}")

            print(f"Epoch {epoch}, Batch {i + 1}, loss: {loss:f}")
            writer.add_scalar("loss", loss, batch_index)
            last_loss = loss

        if epoch % args.save_frequency == 0:
            save(epoch)

        if (epoch % args.validation_frequency == 0
                and (len(val_idx) > 0 or pc > 1)):
            if pc > 1:
                # Per-host local evaluation (single-device step, no
                # collectives — host shards may have unequal validation
                # counts, which would deadlock a collective eval program)
                # over a host-local param copy, then a GLOBAL (sum, count)
                # all-gather so the logged val_loss is the mean over ALL
                # hosts' shards — identical on every host, same meaning as
                # in single-host runs. Every process must reach the
                # all-gather, even with an empty local split.
                local_params = mesh_lib.fetch_local_tree(params)
                local_steps = {local_batch: eval_steps["remainder"],
                               "remainder": eval_steps["remainder"]}
                total, count = _validation_sums(local_steps, local_params,
                                                data, val_idx, local_batch,
                                                root_key, epoch)
                from jax.experimental import multihost_utils

                sums = multihost_utils.process_allgather(
                    np.array([total, float(count)], np.float32))
                total = float(sums[:, 0].sum())
                count = float(sums[:, 1].sum())
            else:
                total, count = _validation_sums(eval_steps, params, data,
                                                val_idx, batch_size,
                                                root_key, epoch)
            if count > 0:  # multi-host: no host may hold val samples
                val_loss = total / count
                print(f"Epoch {epoch}, validation loss: {val_loss:f}")
                writer.add_scalar("val_loss", val_loss, epoch * batch_count)

    save(args.epochs - 1 if args.epochs > epoch_start else epoch_start)
    if profiling:
        jax.profiler.stop_trace()
    writer.close()

    if timer.count:
        print(timer.summary())
    return last_loss


def run_test(args, out_dir: Optional[str] = None,
             validation_split_only: bool = False) -> list:
    with step_lib.master_dtype_scope():
        return _run_test(args, out_dir, validation_split_only)


def _run_test(args, out_dir: Optional[str] = None,
              validation_split_only: bool = False) -> list:
    """Predict SVBRDFs and save comparison grids.

    Reference main.py:167-223 shows a matplotlib figure; headless here:
    grids are written to <model_dir>/test_outputs (or out_dir). With
    `validation_split_only` only the held-out 1% validation samples are
    visualized — the post-training behavior of reference main.py:156-165
    (falls back to all samples when the split is empty, e.g. toy data).
    """
    (args, model, params, _optimizer, _opt_state, _epoch,
     root_key) = setup(args, None)
    if jax.process_index() != 0:
        # Multi-host: setup()'s checkpoint restore is coordinated across
        # processes (all must participate), but one host writes outputs.
        return []

    export_path = getattr(args, "export_torch_checkpoint", None)
    if export_path:
        # Round-trip interop: write the restored model as a reference-
        # format checkpoint.tar (reference persistence.py:59-69 layout),
        # loadable by the PyTorch reference's Checkpoint.load.
        import torch

        from svbrdf_tpu.interop import export_torch_state_dict

        state = {k: torch.from_numpy(np.ascontiguousarray(v))
                 for k, v in export_torch_state_dict(params).items()}
        torch.save({"model_type": args.model_type,
                    "use_coords": args.use_coords,
                    "epoch": _epoch,
                    "model_state_dict": state}, export_path)
        print(f"wrote torch checkpoint {export_path}")

    data = _build_dataset(args, "test")
    predict = make_predict_fn(model)

    out = pathlib.Path(out_dir or (pathlib.Path(args.model_dir)
                                   / "test_outputs"))
    out.mkdir(parents=True, exist_ok=True)

    from svbrdf_tpu import metrics as metrics_lib
    from svbrdf_tpu import viz

    indices = range(len(data))
    if validation_split_only:
        pc = jax.process_count()
        if pc > 1:
            # Multi-host training held out 1% of EACH host's file shard
            # (data/dataset.shard_files_for_host: sorted files, round-robin
            # by index). Recompute every host's local split and map the
            # local validation indices back to global dataset indices —
            # the global 1% split would mostly name samples some host
            # trained on.
            val_global = []
            for p in range(pc):
                local_len = len(range(p, len(data), pc))
                _tr, val = split_train_validation(local_len, 0.01,
                                                 args.seed)
                val_global += [int(v) * pc + p for v in val]
            val_idx = np.asarray(sorted(val_global))
        else:
            _train_idx, val_idx = split_train_validation(len(data), 0.01,
                                                         args.seed)
        if len(val_idx) > 0:
            indices = [int(i) for i in val_idx]

    written = []
    per_sample = []
    for i in indices:
        sample = data[i]
        inputs = jnp.asarray(sample["inputs"])[None]
        pred = np.asarray(predict(params, inputs))[0]
        path = out / f"sample_{i:04d}.png"
        viz.save_comparison_grid(str(path), np.asarray(sample["inputs"][0]),
                                 sample["svbrdf"], pred)
        written.append(str(path))
        if not args.no_svbrdf_input:
            # Quantitative quality next to the visual grid (the reference
            # is qualitative-only, SURVEY §6); dummy GT maps in no-svbrdf
            # mode would make the numbers meaningless.
            m = metrics_lib.to_python(metrics_lib.svbrdf_metrics(
                jnp.asarray(pred), jnp.asarray(sample["svbrdf"])))
            per_sample.append({"sample": int(i), "grid": str(path),
                               "metrics": m})
        print(f"wrote {path}")

    if per_sample:
        summary = metrics_lib.summarize(per_sample)
        metrics_path = out / "metrics.json"
        metrics_lib.write_metrics(metrics_path, summary)
        mean = summary["mean"]
        print("Test metrics (mean over "
              f"{len(per_sample)} samples): "
              + ", ".join(f"{k}={v:.4f}" for k, v in mean.items()))
        print(f"wrote {metrics_path}")
    return written
