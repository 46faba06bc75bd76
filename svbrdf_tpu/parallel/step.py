"""Jitted, sharded train / eval steps.

One fused program per step: on-device batch preparation (mix, gamma,
input synthesis) -> model fwd -> loss (incl. batched rendering loss) ->
bwd -> Adam update. The reference splits this across CPU DataLoader
workers and a Python autograd loop (reference main.py:104-124,
dataset.py:45-103); fusing it is what the <10 ms step target needs.

Sharding: batch axis over the `data` mesh axis; params/opt state
replicated; XLA derives the gradient all-reduce over ICI from the
annotations. Buffers are donated so params/opt update in place.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from svbrdf_tpu.data import pipeline
from svbrdf_tpu.parallel import mesh as mesh_lib


class PrepConfig(NamedTuple):
    """Static batch-preparation switches (see data/pipeline.prepare_batch)."""

    used_input_image_count: int = 1
    use_augmentation: bool = True
    is_linear: bool = False
    mix_materials: bool = False


def _prepare(key, raw_batch, prep: PrepConfig):
    return pipeline.prepare_batch(
        key,
        raw_batch["inputs"],
        raw_batch["svbrdf"],
        raw_batch.get("partner_svbrdf") if prep.mix_materials else None,
        used_input_image_count=prep.used_input_image_count,
        use_augmentation=prep.use_augmentation,
        is_linear=prep.is_linear,
    )


def make_train_step(model, optimizer: optax.GradientTransformation,
                    loss_fn: Callable, prep: PrepConfig,
                    mesh=None, donate: bool = True):
    """Build the jitted train step.

    step(params, opt_state, raw_batch, key) -> (params, opt_state, loss).
    raw_batch: {'inputs': (B, N, H, W, 3), 'svbrdf': (B, H, W, 12)
                [, 'partner_svbrdf': (B, H, W, 12)]} host-decoded strips.
    """

    def step(params, opt_state, raw_batch, key):
        k_prep, k_drop, k_loss = jax.random.split(key, 3)
        batch = _prepare(k_prep, raw_batch, prep)

        def loss_of(p):
            pred = model.apply({"params": p}, batch["inputs"],
                               deterministic=False,
                               rngs={"dropout": k_drop})
            return loss_fn(pred, batch["svbrdf"], k_loss)

        loss, grads = jax.value_and_grad(loss_of)(params)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt_state, loss

    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 1) if donate else ())

    repl = mesh_lib.replicated_sharding(mesh)
    data = mesh_lib.batch_sharding(mesh)
    return jax.jit(
        step,
        in_shardings=(repl, repl, data, repl),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1) if donate else (),
    )


def make_eval_step(model, loss_fn: Callable, prep: PrepConfig, mesh=None):
    """Validation step: deterministic model, same loss. Reference main.py:129-147."""

    def step(params, raw_batch, key):
        k_prep, k_loss = jax.random.split(key)
        batch = _prepare(k_prep, raw_batch, prep)
        pred = model.apply({"params": params}, batch["inputs"],
                           deterministic=True)
        return loss_fn(pred, batch["svbrdf"], k_loss)

    if mesh is None:
        return jax.jit(step)
    repl = mesh_lib.replicated_sharding(mesh)
    data = mesh_lib.batch_sharding(mesh)
    return jax.jit(step, in_shardings=(repl, data, repl),
                   out_shardings=repl)


def make_predict_fn(model, mesh=None):
    """Inference: images -> SVBRDF maps (deterministic)."""

    def predict(params, images):
        return model.apply({"params": params}, images, deterministic=True)

    if mesh is None:
        return jax.jit(predict)
    repl = mesh_lib.replicated_sharding(mesh)
    data = mesh_lib.batch_sharding(mesh)
    return jax.jit(predict, in_shardings=(repl, data), out_shardings=data)
