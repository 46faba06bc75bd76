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


class AutoLayoutStep:
    """Train step compiled with AUTO layouts for the donated state args.

    By default XLA assigns the jit-boundary layout to params/opt_state,
    then inserts per-step relayout copies for every conv kernel whose
    compute layout differs (~2.4 ms/step for the 256^2 U-Net on v5e).
    Compiling with `Format(Layout.AUTO)` on the state arguments lets the
    compiler pick ONE layout used both at the boundary and in compute; the
    state is re-laid-out once, on the first call, and the in/out layouts
    match so donation stays copy-free.
    """

    def __init__(self, jitted):
        self._jit = jitted
        self._compiled = None

    def lower(self, *args):
        return self._jit.lower(*args)

    def __call__(self, params, opt_state, raw_batch, key):
        if self._compiled is None:
            # AUTO-layout lowering needs abstract args (concrete arrays
            # carry a committed layout, which would conflict).
            abstract = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(jnp.shape(x), x.dtype),
                (params, opt_state, raw_batch, key))
            self._compiled = self._jit.lower(*abstract).compile()
            fmts = self._compiled.input_formats[0]
            params = jax.device_put(params, fmts[0])
            opt_state = jax.device_put(opt_state, fmts[1])
        return self._compiled(params, opt_state, raw_batch, key)


def make_train_step(model, optimizer: optax.GradientTransformation,
                    loss_fn: Callable, prep: PrepConfig,
                    mesh=None, donate: bool = True,
                    auto_layout: bool = None):
    """Build the jitted train step.

    step(params, opt_state, raw_batch, key) -> (params, opt_state, loss).
    raw_batch: {'inputs': (B, N, H, W, 3), 'svbrdf': (B, H, W, 12)
                [, 'partner_svbrdf': (B, H, W, 12)]} host-decoded strips.
    auto_layout (None = on for single-process TPU runs) wraps the step in
    AutoLayoutStep, which removes XLA's per-step conv-kernel relayout
    copies. The wrapper AOT-compiles on first call; multi-host runs manage
    compilation themselves (loop.py) and keep the plain jit.
    """

    # Phase-direct loss path: when the model can emit phase-major maps and
    # the loss consumes them (fused local rendering loss), the spatial
    # 12-channel prediction never materializes — one transpose straight to
    # the kernel's plane layout instead of unpack + re-transpose.
    phase_kwargs = (
        {"output_layout": "phase"}
        if (getattr(model, "supports_phase_output", False)
            and getattr(loss_fn, "accepts_phase", False)) else {})

    def step(params, opt_state, raw_batch, key):
        k_prep, k_drop, k_loss = jax.random.split(key, 3)
        batch = _prepare(k_prep, raw_batch, prep)

        def loss_of(p):
            pred = model.apply({"params": p}, batch["inputs"],
                               deterministic=False,
                               rngs={"dropout": k_drop}, **phase_kwargs)
            return loss_fn(pred, batch["svbrdf"], k_loss)

        loss, grads = jax.value_and_grad(loss_of)(params)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt_state, loss

    donate_args = (0, 1) if donate else ()
    if auto_layout is None:
        auto_layout = (jax.default_backend() == "tpu"
                       and jax.process_count() == 1)

    if mesh is None:
        if auto_layout:
            from jax.experimental.layout import Format, Layout

            auto = Format(Layout.AUTO)
            return AutoLayoutStep(jax.jit(
                step, in_shardings=(auto, auto, None, None),
                out_shardings=(auto, auto, None),
                donate_argnums=donate_args))
        return jax.jit(step, donate_argnums=donate_args)

    repl = mesh_lib.replicated_sharding(mesh)
    data = mesh_lib.batch_sharding(mesh)
    if auto_layout:
        from jax.experimental.layout import Format, Layout

        auto = Format(Layout.AUTO, repl)
        jitted = jax.jit(step,
                         in_shardings=(auto, auto, data, repl),
                         out_shardings=(auto, auto, repl),
                         donate_argnums=donate_args)
        return AutoLayoutStep(jitted)
    return jax.jit(
        step,
        in_shardings=(repl, repl, data, repl),
        out_shardings=(repl, repl, repl),
        donate_argnums=donate_args,
    )


def make_eval_step(model, loss_fn: Callable, prep: PrepConfig, mesh=None):
    """Validation step: deterministic model, same loss. Reference main.py:129-147."""

    phase_kwargs = (
        {"output_layout": "phase"}
        if (getattr(model, "supports_phase_output", False)
            and getattr(loss_fn, "accepts_phase", False)) else {})

    def step(params, raw_batch, key):
        k_prep, k_loss = jax.random.split(key)
        batch = _prepare(k_prep, raw_batch, prep)
        pred = model.apply({"params": params}, batch["inputs"],
                           deterministic=True, **phase_kwargs)
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
