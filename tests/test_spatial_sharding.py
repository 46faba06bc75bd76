"""Spatial (height-axis) sharding of the rendering loss — the SP analogue
for giant material scans (SURVEY.md §2.3/§5: keep memory O(tile) and shard
H x W for >1k^2 inputs). Shading is per-pixel, so XLA partitions the loss
over a spatial mesh axis with no halo exchange; values must match the
replicated result."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
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


class TestSpatialModule:
    """parallel/spatial.py: first-class spatial-SPMD entry points with the
    upconv='fold' guard and the shard_mapped fused loss."""

    def test_fold_guard_rejects_dilated_model(self):
        from svbrdf_tpu.models import SingleViewModel
        from svbrdf_tpu.parallel import spatial

        mesh = spatial.make_spatial_mesh(n_devices=2)
        model = SingleViewModel(num_filters=4, depth=4)  # default dilated
        with pytest.raises(ValueError, match="upconv='fold'"):
            spatial.make_spatial_predict_fn(model, mesh)
        with pytest.raises(ValueError, match="upconv='fold'"):
            spatial.make_spatial_train_step(model, optax.adam(1e-4), mesh)

    def test_sharded_fused_loss_matches_replicated(self):
        from svbrdf_tpu.parallel import spatial

        mesh = spatial.make_spatial_mesh(n_devices=8)
        assert mesh.devices.size == 8
        rng = np.random.default_rng(3)
        pred = jnp.asarray(random_svbrdf(rng, 64, 64, batch=(2,)))
        target = jnp.asarray(random_svbrdf(rng, 64, 64, batch=(2,)))
        key = jax.random.key(4)

        base = losses.rendering_loss_fused(pred, target, key,
                                           n_random=2, n_specular=2)
        with mesh:
            sharded = jax.jit(lambda p, t: spatial.spatial_rendering_loss(
                p, t, key, mesh, n_random=2, n_specular=2))(pred, target)
        # Reassociation-level: 8 psum'd partial sums vs one device's
        # reduction order.
        np.testing.assert_allclose(float(sharded), float(base), rtol=5e-5)

        g_base = jax.grad(lambda p: losses.rendering_loss_fused(
            p, target, key, n_random=2, n_specular=2))(pred)
        with mesh:
            g_sh = jax.jit(jax.grad(
                lambda p: spatial.spatial_rendering_loss(
                    p, target, key, mesh, n_random=2, n_specular=2)))(pred)
        np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_base),
                                   atol=2e-5)

    def test_sharded_mixed_planes_full_res_units(self):
        """mixed_loss_fused_planes under H-split shard_map: row_offset and
        global_height are FULL-RES pixel units for BOTH the planes and the
        phase-planes pred layouts (ADVICE r3: the half-res 'pp' convention
        was undocumented and unexercised); psum(local) == replicated, and
        the sharded kernels shade with GLOBAL coordinates."""
        try:
            from jax import shard_map
        except ImportError:
            from jax.experimental.shard_map import shard_map
        from svbrdf_tpu.ops import render_pallas
        from svbrdf_tpu.parallel import spatial

        n = 4
        mesh = spatial.make_spatial_mesh(n_devices=n)
        assert mesh.devices.size == n
        rng = np.random.default_rng(7)
        H = 32
        pred = jnp.asarray(random_svbrdf(rng, H, H, batch=(2,)))
        target = jnp.asarray(random_svbrdf(rng, H, H, batch=(2,)))
        scenes = sampling.generate_loss_scenes(jax.random.key(8), 2, 2, 2)

        cases = {
            "planes": (jnp.transpose(pred, (0, 3, 1, 2)),
                       jnp.transpose(target, (0, 3, 1, 2))),
            "pp": (render_pallas.svbrdf_to_phase_planes(pred),
                   render_pallas.svbrdf_to_phase_planes(target)),
        }
        for name, (pred_t, gt_t) in cases.items():
            base = render_pallas.mixed_loss_fused_planes(
                pred_t, gt_t, scenes, 0.1)

            def local(p_l, g_l, sc):
                # full-res row offset regardless of layout
                row0 = jax.lax.axis_index(spatial.SPACE_AXIS) * (H // n)
                val = render_pallas.mixed_loss_fused_planes(
                    p_l, g_l, sc, 0.1, row_offset=row0, global_height=H)
                return jax.lax.psum(val, spatial.SPACE_AXIS)

            sp = P(None, None, spatial.SPACE_AXIS)
            sharded = jax.jit(shard_map(
                local, mesh=mesh, in_specs=(sp, sp, P()), out_specs=P(),
                check_vma=False))(pred_t, gt_t, scenes)
            np.testing.assert_allclose(float(sharded), float(base),
                                       rtol=5e-5, err_msg=name)

    def test_spatial_train_step_matches_replicated(self):
        """The FULL H-sharded train step (fold upconv + shard_mapped fused
        loss + Adam) produces the same params as an identically-seeded
        replicated step (VERDICT r2 #6)."""
        from svbrdf_tpu.models import SingleViewModel
        from svbrdf_tpu.parallel import spatial

        mesh = spatial.make_spatial_mesh(n_devices=4)
        assert mesh.devices.size == 4
        model = SingleViewModel(num_filters=4, depth=4, upconv="fold")
        optimizer = optax.adam(1e-4)

        rng = np.random.default_rng(5)
        batch = {
            "inputs": jnp.asarray(rng.uniform(
                0, 1, (2, 1, 32, 32, 3)).astype(np.float32)),
            "svbrdf": jnp.asarray(random_svbrdf(rng, 32, 32, batch=(2,))),
        }
        key = jax.random.key(6)
        params = model.init(jax.random.key(0),
                            jnp.zeros((1, 1, 32, 32, 3)))["params"]
        opt_state = optimizer.init(params)

        # Replicated reference: the same math without the mesh.
        def ref_step(p, s, b, k):
            k_drop, k_loss = jax.random.split(k)

            def loss_of(pp):
                pred = model.apply({"params": pp}, b["inputs"],
                                   deterministic=False,
                                   rngs={"dropout": k_drop})
                return (0.1 * losses.svbrdf_l1_loss(pred, b["svbrdf"])
                        + losses.rendering_loss_fused(
                            pred, b["svbrdf"], k_loss,
                            n_random=2, n_specular=2))

            loss, grads = jax.value_and_grad(loss_of)(p)
            updates, s = optimizer.update(grads, s, p)
            return optax.apply_updates(p, updates), s, loss

        with jax.default_matmul_precision("highest"):
            p_ref, _s, loss_ref = jax.jit(ref_step)(params, opt_state,
                                                    batch, key)

            step = spatial.make_spatial_train_step(
                model, optimizer, mesh, n_random=2, n_specular=2)
            p_sh, _s2, loss_sh = step(
                jax.device_put(params,
                               jax.sharding.NamedSharding(mesh, P())),
                optimizer.init(params), batch, key)

        np.testing.assert_allclose(float(loss_sh), float(loss_ref),
                                   rtol=5e-5)
        for a, b in zip(jax.tree.leaves(p_sh), jax.tree.leaves(p_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5)


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
