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


def test_model_inference_height_sharded():
    """The FULL model partitions over a spatial mesh axis too: XLA's SPMD
    partitioner inserts the conv halo exchanges automatically, so huge
    material scans can be predicted without fitting the whole activation
    set on one chip. Values must match the replicated run.

    upconv='fold' is REQUIRED here: the default lhs-dilated decoder conv
    is mispartitioned by XLA when H is sharded (measured 5e-2 output
    error) — see layers.UPCONV_IMPL."""
    from svbrdf_tpu.models import SingleViewModel

    assert len(jax.devices()) >= 4
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("sp",))
    assert mesh.devices.size == 4
    repl = NamedSharding(mesh, P())
    in_spatial = NamedSharding(mesh, P(None, None, "sp"))   # (B,N,H,W,3)
    out_spatial = NamedSharding(mesh, P(None, "sp"))        # (B,H,W,12)

    model = SingleViewModel(num_filters=4, depth=4, upconv="fold")
    rng = np.random.default_rng(2)
    images = jnp.asarray(rng.uniform(0, 1, (2, 1, 16, 16, 3)).astype(
        np.float32))
    params = model.init(jax.random.key(0), images)["params"]

    def fwd(p, x):
        # Default conv precision is bf16-grade; different partitionings
        # then accumulate differently (amplified through instance norms on
        # a random-init net). HIGHEST makes the comparison exact.
        with jax.default_matmul_precision("highest"):
            return model.apply({"params": p}, x, deterministic=True)

    baseline = np.asarray(jax.jit(fwd)(params, images))
    sharded_fn = jax.jit(fwd, in_shardings=(repl, in_spatial),
                         out_shardings=out_spatial)
    sharded = np.asarray(sharded_fn(jax.device_put(params, repl),
                                    jax.device_put(images, in_spatial)))
    np.testing.assert_allclose(sharded, baseline, atol=2e-6)


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
