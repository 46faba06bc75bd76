"""Map-recovery-by-rendering-loss experiments (differentiability validation).

The reference validates its differentiable renderers by optimizing
individual SVBRDF maps to match renderings of a target material —
fixed-scene and flexible-scene variants, run manually in notebooks
(development/notebooks/website.ipynb cell 15; presentations/final/
final-viz.ipynb cells 10-15; docs §"Differentiability of the Rendering
Operation"). Here the experiment is a library function (and an automated
convergence test, tests/test_map_recovery.py): optimize the SVBRDF
directly — no network — through the rendering loss.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import optax

from svbrdf_tpu import losses
from svbrdf_tpu.ops import codecs, render, sampling
from svbrdf_tpu.scene import Scene


def fixed_scene_rendering_loss(pred: jnp.ndarray, target: jnp.ndarray,
                               scenes: Scene,
                               render_fn=None, key=None) -> jnp.ndarray:
    """log-L1 rendering loss under a FIXED scene batch (no sampling).

    Equivalent of the notebook FixedSceneLoss (website.ipynb): scenes have
    (S, 3) fields, svbrdfs are single samples (H, W, 12). A `key` gives a
    stochastic renderer fresh per-call MC samples (shared between pred and
    target — common random numbers); key=None keeps the renderer's fixed
    default pattern.
    """
    render_fn = render_fn or render.render
    if key is not None and losses._render_fn_accepts_key(render_fn):
        pred_r = render_fn(scenes, pred[None], key=key)
        target_r = render_fn(scenes, target[None], key=key)
    else:
        pred_r = render_fn(scenes, pred[None])
        target_r = render_fn(scenes, target[None])
    return losses.l1_loss(jnp.log(pred_r + losses.EPSILON_RENDER),
                          jnp.log(target_r + losses.EPSILON_RENDER))


class RecoveryResult(NamedTuple):
    svbrdf: jnp.ndarray
    losses: jnp.ndarray  # per-step loss trace


def recover_maps(key, target_svbrdf: jnp.ndarray,
                 optimize: Sequence[str] = ("diffuse",),
                 steps: int = 200, learning_rate: float = 2e-2,
                 scenes: Optional[Scene] = None,
                 n_scenes: int = 6,
                 render_fn: Optional[Callable] = None) -> RecoveryResult:
    """Optimize chosen maps of an initially-flat SVBRDF to match renders of
    `target_svbrdf`.

    optimize: subset of {"normals", "diffuse", "roughness", "specular"};
    non-optimized maps are fixed to the target's (the notebook experiments
    recover one map at a time). scenes=None re-samples fresh random scenes
    every step (flexible-scene variant); passing a Scene batch gives the
    fixed-scene variant.
    """
    target = codecs.unpack_svbrdf(target_svbrdf)

    init = {}
    if "normals" in optimize:
        flat_n = jnp.concatenate(
            [jnp.zeros(target_svbrdf.shape[:-1] + (2,)),
             jnp.ones(target_svbrdf.shape[:-1] + (1,))], axis=-1)
        init["normals"] = flat_n
    if "diffuse" in optimize:
        init["diffuse"] = jnp.full_like(target.diffuse, 0.5)
    if "roughness" in optimize:
        init["roughness"] = jnp.full_like(target.roughness, 0.5)
    if "specular" in optimize:
        init["specular"] = jnp.full_like(target.specular, 0.5)

    def assemble(free):
        maps = {
            "normals": free.get("normals", target.normals),
            "diffuse": free.get("diffuse", target.diffuse),
            "roughness": free.get("roughness", target.roughness),
            "specular": free.get("specular", target.specular),
        }
        n = maps["normals"]
        n = n / jnp.sqrt(jnp.sum(n * n, axis=-1, keepdims=True) + 1e-8)
        clip = lambda x: jnp.clip(x, 0.0, 1.0)
        return codecs.pack_svbrdf(n, clip(maps["diffuse"]),
                                  clip(maps["roughness"]),
                                  clip(maps["specular"]))

    optimizer = optax.adam(learning_rate)
    opt_state = optimizer.init(init)

    def loss_of(free, step_key):
        pred = assemble(free)
        # A stochastic renderer gets fresh MC samples each step (derived
        # from step_key without perturbing the scene stream).
        render_key = jax.random.fold_in(step_key, losses._RENDER_KEY_TAG)
        if scenes is not None:
            return fixed_scene_rendering_loss(pred, target_svbrdf, scenes,
                                              render_fn, key=render_key)
        step_scenes = sampling.generate_loss_scenes(
            step_key, 1, n_random=n_scenes // 2,
            n_specular=n_scenes - n_scenes // 2)
        flat = Scene(camera_pos=step_scenes.camera_pos[0],
                     light_pos=step_scenes.light_pos[0],
                     light_color=step_scenes.light_color[0])
        return fixed_scene_rendering_loss(pred, target_svbrdf, flat,
                                          render_fn, key=render_key)

    @jax.jit
    def step(free, opt_state, step_key):
        loss, grads = jax.value_and_grad(loss_of)(free, step_key)
        updates, opt_state = optimizer.update(grads, opt_state, free)
        return optax.apply_updates(free, updates), opt_state, loss

    free = init
    trace = []
    for i in range(steps):
        free, opt_state, loss = step(free, opt_state,
                                     jax.random.fold_in(key, i))
        trace.append(loss)

    return RecoveryResult(svbrdf=assemble(free),
                          losses=jnp.stack(trace))
