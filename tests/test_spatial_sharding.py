"""Spatial (height-axis) sharding of the rendering loss — the SP analogue
for giant material scans (SURVEY.md §2.3/§5: keep memory O(tile) and shard
H x W for >1k^2 inputs). Shading is per-pixel, so XLA partitions the loss
over a spatial mesh axis with no halo exchange; values must match the
replicated result."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from svbrdf_tpu import losses
from svbrdf_tpu.ops import render, sampling
from tests.test_render import random_svbrdf


def _loss(pred, target, scenes):
    pr = render.render_scene_set(scenes, pred)
    tr = render.render_scene_set(scenes, target)
    return losses.l1_loss(jnp.log(pr + 0.1), jnp.log(tr + 0.1))


def test_height_sharded_loss_matches_replicated():
    assert len(jax.devices()) >= 8
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("sp",))
    spatial = NamedSharding(mesh, P(None, "sp"))

    rng = np.random.default_rng(0)
    pred = jnp.asarray(random_svbrdf(rng, 64, 64, batch=(2,)))
    target = jnp.asarray(random_svbrdf(rng, 64, 64, batch=(2,)))
    scenes = sampling.generate_loss_scenes(jax.random.key(0), 2, 2, 2)

    baseline = float(jax.jit(_loss)(pred, target, scenes))

    pred_s = jax.device_put(pred, spatial)
    target_s = jax.device_put(target, spatial)
    sharded = float(jax.jit(_loss)(pred_s, target_s, scenes))

    np.testing.assert_allclose(sharded, baseline, rtol=1e-6)


def test_height_sharded_gradients_match():
    assert len(jax.devices()) >= 8
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("sp",))
    spatial = NamedSharding(mesh, P(None, "sp"))

    rng = np.random.default_rng(1)
    pred = jnp.asarray(random_svbrdf(rng, 32, 32, batch=(1,)))
    target = jnp.asarray(random_svbrdf(rng, 32, 32, batch=(1,)))
    scenes = sampling.generate_loss_scenes(jax.random.key(1), 1, 1, 1)

    grad_fn = jax.jit(jax.grad(lambda p: _loss(p, target, scenes)))
    g_base = np.asarray(grad_fn(pred))
    g_shard = np.asarray(grad_fn(jax.device_put(pred, spatial)))
    np.testing.assert_allclose(g_shard, g_base, atol=1e-6)
