"""Fused Pallas rendering-loss kernel vs the jnp composition: identical
values and gradients (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svbrdf_tpu import losses
from svbrdf_tpu.ops import render, render_pallas, sampling
from tests.test_render import random_svbrdf


def _jnp_loss(pred, target, scenes):
    pred_r = render.render_scene_set(scenes, pred)
    target_r = render.render_scene_set(scenes, target)
    return losses.l1_loss(jnp.log(pred_r + 0.1), jnp.log(target_r + 0.1))


@pytest.fixture(scope="module")
def case():
    rng = np.random.default_rng(0)
    pred = jnp.asarray(random_svbrdf(rng, 16, 16, batch=(2,)))
    target = jnp.asarray(random_svbrdf(rng, 16, 16, batch=(2,)))
    scenes = sampling.generate_loss_scenes(jax.random.key(0), 2, 2, 2)
    return pred, target, scenes


def test_forward_matches_jnp(case):
    pred, target, scenes = case
    fused = render_pallas.rendering_loss_fused(pred, target, scenes,
                                               tile_h=8)
    reference = _jnp_loss(pred, target, scenes)
    np.testing.assert_allclose(float(fused), float(reference), rtol=1e-5)


def test_gradients_match_jnp(case):
    pred, target, scenes = case
    g_fused = jax.grad(
        lambda p: render_pallas.rendering_loss_fused(p, target, scenes,
                                                     tile_h=8))(pred)
    g_ref = jax.grad(lambda p: _jnp_loss(p, target, scenes))(pred)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=2e-4, atol=1e-6)


def test_gradient_wrt_target_too(case):
    pred, target, scenes = case
    g_fused = jax.grad(
        lambda t: render_pallas.rendering_loss_fused(
            pred, t, scenes, tile_h=8, want_target_grad=True))(target)
    g_ref = jax.grad(lambda t: _jnp_loss(pred, t, scenes))(target)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=2e-4, atol=1e-6)


def test_target_grad_zero_by_default(case):
    """Default mode stop-gradients the target: grads wrt it are zero (the
    training semantics — targets are data), never silently wrong values."""
    pred, target, scenes = case
    g = jax.grad(
        lambda t: render_pallas.rendering_loss_fused(pred, t, scenes,
                                                     tile_h=8))(target)
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_phase_direct_loss_matches_spatial(case):
    """The phase-direct path (model emits (B, h, w, 4, 12); one transpose
    to planes) gives the same mixed-loss VALUE and pred-gradients as the
    spatial path."""
    from svbrdf_tpu import losses
    from svbrdf_tpu.models import layers as L

    pred, target, scenes = case
    key = jax.random.key(5)
    loss_fn = losses.make_loss_fn("mixed", "local", fused=True)
    assert getattr(loss_fn, "accepts_phase", False)

    b, h, w, _ = pred.shape
    pred_phase = L.space_to_phase(pred).reshape(b, h // 2, w // 2, 4, 12)

    v_spatial = float(loss_fn(pred, target, key))
    v_phase = float(loss_fn(pred_phase, target, key))
    np.testing.assert_allclose(v_phase, v_spatial, rtol=1e-6)

    g_spatial = jax.grad(lambda p: loss_fn(p, target, key))(pred)
    g_phase = jax.grad(
        lambda p: loss_fn(L.space_to_phase(p).reshape(
            b, h // 2, w // 2, 4, 12), target, key))(pred)
    np.testing.assert_allclose(np.asarray(g_phase), np.asarray(g_spatial),
                               rtol=1e-5, atol=1e-7)


def test_bf16_planes_match_f32(case):
    """bf16 planes (the TPU hot path: half the transpose + kernel IO)
    give the same loss/grads as f32 up to bf16 input quantization, and the
    pred gradient comes back in bf16."""
    pred, target, scenes = case
    pred_t = jnp.transpose(pred, (0, 3, 1, 2))
    gt_t = jnp.transpose(target, (0, 3, 1, 2))

    f32 = render_pallas.rendering_loss_fused_planes(pred_t, gt_t, scenes,
                                                    16)
    bf16 = render_pallas.rendering_loss_fused_planes(
        pred_t.astype(jnp.bfloat16), gt_t.astype(jnp.bfloat16), scenes, 16)
    np.testing.assert_allclose(float(bf16), float(f32), rtol=2e-2)

    g = jax.grad(lambda p: render_pallas.rendering_loss_fused_planes(
        p, gt_t.astype(jnp.bfloat16), scenes, 16))(
            pred_t.astype(jnp.bfloat16))
    assert g.dtype == jnp.bfloat16
    # Oracle: the f32 path on the SAME quantized inputs — |.| sign flips
    # where rp ~ rt then agree exactly; the remaining difference is the
    # bf16 rounding of the gradient itself.
    pq = pred_t.astype(jnp.bfloat16).astype(jnp.float32)
    gq = gt_t.astype(jnp.bfloat16).astype(jnp.float32)
    g32 = jax.grad(lambda p: render_pallas.rendering_loss_fused_planes(
        p, gq, scenes, 16))(pq)
    np.testing.assert_allclose(np.asarray(g, np.float32),
                               np.asarray(g32), rtol=1e-2, atol=1e-5)


def test_loss_fn_fused_variant(case):
    pred, target, _ = case
    fn = losses.make_loss_fn("mixed", "local", fused=True)
    ref = losses.make_loss_fn("mixed", "local", fused=False)
    key = jax.random.key(3)
    np.testing.assert_allclose(float(fn(pred, target, key)),
                               float(ref(pred, target, key)), rtol=1e-5)


def test_phase_planes_loss_matches_spatial(case):
    """The phase-planes path ((B, 48, h, w); phase cell as a kernel grid
    dim, no interleave anywhere) gives the same mixed-loss value and
    pred-gradients as the spatial path."""
    pred, target, scenes = case
    key = jax.random.key(11)
    loss_fn = losses.make_loss_fn("mixed", "local", fused=True)
    assert getattr(loss_fn, "accepts_phase_planes", False)

    to_pp = render_pallas.svbrdf_to_phase_planes
    # The value's tile sums partition per phase cell, so the f32 summation
    # ORDER differs from the spatial tiling (reassociation-level ~1e-5);
    # the per-pixel gradients are bit-identical.
    v_spatial = float(loss_fn(pred, target, key))
    v_pp = float(loss_fn(to_pp(pred), target, key))
    np.testing.assert_allclose(v_pp, v_spatial, rtol=1e-4)

    g_spatial = jax.grad(lambda p: loss_fn(p, target, key))(pred)
    g_pp = jax.grad(lambda p: loss_fn(to_pp(p), target, key))(pred)
    np.testing.assert_allclose(np.asarray(g_pp), np.asarray(g_spatial),
                               rtol=1e-5, atol=1e-7)


def test_model_phase_planes_output_matches_spatial():
    """SingleViewModel(output_layout='phase_planes') is a pure relayout of
    its spatial output (the planes-variant head decode is exact)."""
    from svbrdf_tpu.models import SingleViewModel

    model = SingleViewModel(use_coords=False, depth=5)
    imgs = jnp.asarray(np.random.default_rng(3).uniform(
        0, 1, (1, 1, 32, 32, 3)).astype(np.float32))
    params = model.init(jax.random.key(0), jnp.zeros((1, 1, 32, 32, 3)))
    spatial = model.apply(params, imgs, deterministic=True)
    pp = model.apply(params, imgs, deterministic=True,
                     output_layout="phase_planes")
    np.testing.assert_allclose(
        np.asarray(pp),
        np.asarray(render_pallas.svbrdf_to_phase_planes(spatial)),
        rtol=1e-6, atol=1e-6)


def test_multiview_phase_planes_output_matches_spatial():
    """MultiViewModel(output_layout='phase_planes') is a pure relayout of
    its spatial output (VERDICT r3 #4: the multi-view model gets the same
    fused-loss fast path as the single-view model)."""
    from svbrdf_tpu.models import MultiViewModel

    model = MultiViewModel(use_coords=False, depth=4, num_filters=8,
                           generator_output_channels=16)
    imgs = jnp.asarray(np.random.default_rng(5).uniform(
        0, 1, (1, 3, 16, 16, 3)).astype(np.float32))
    params = model.init(jax.random.key(0), jnp.zeros((1, 3, 16, 16, 3)))
    spatial = model.apply(params, imgs, deterministic=True)
    pp = model.apply(params, imgs, deterministic=True,
                     output_layout="phase_planes")
    assert pp.shape == (1, 48, 8, 8)
    np.testing.assert_allclose(
        np.asarray(pp),
        np.asarray(render_pallas.svbrdf_to_phase_planes(spatial)),
        rtol=1e-6, atol=1e-6)


def test_mixed_fused_gradients_match_unfused(case):
    """The single-kernel mixed loss (L1 folded in, combined gradient)
    matches the unfused l1 + rendering composition's pred gradients."""
    pred, target, _ = case
    fn = losses.make_loss_fn("mixed", "local", fused=True)
    ref = losses.make_loss_fn("mixed", "local", fused=False)
    key = jax.random.key(7)
    g_fused = jax.grad(lambda p: fn(p, target, key))(pred)
    g_ref = jax.grad(lambda p: ref(p, target, key))(pred)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=2e-4, atol=1e-6)
    # Target gradients are stop-gradient'ed in the fused path.
    gt = jax.grad(lambda t: fn(pred, t, key))(target)
    np.testing.assert_array_equal(np.asarray(gt), 0.0)


def test_non_dividing_tile_rejected(case):
    # A tile that does not divide the image would silently drop rows from
    # the loss (grid covers n_h*tile_h rows; normalizer uses full H).
    pred, target, scenes = case
    with pytest.raises(ValueError, match="divide"):
        render_pallas.rendering_loss_fused(pred, target, scenes, tile_h=5)
    with pytest.raises(ValueError, match="divide"):
        render_pallas.rendering_loss_fused(pred, target, scenes,
                                           tile_h=8, tile_w=7)


def test_zero_on_identical(case):
    pred, _, scenes = case
    fused = render_pallas.rendering_loss_fused(pred, pred, scenes, tile_h=8)
    # not exactly 0.0: the partial-sum tile spreads total/1024 across an
    # (8, 128) output tile, which rounds in f32
    assert abs(float(fused)) < 1e-6
