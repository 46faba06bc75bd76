"""Renderer golden tests: our jnp Cook-Torrance renderer vs the PyTorch
reference LocalRenderer (imported read-only as oracle), plus gradient and
vectorization checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svbrdf_tpu.ops import codecs, render, sampling
from svbrdf_tpu.scene import Scene


def random_svbrdf(rng, h=16, w=16, batch=()):
    """A plausible SVBRDF: unit normals (upper hemisphere), maps in [0,1]."""
    n = rng.uniform(-1, 1, batch + (h, w, 3)).astype(np.float32)
    n[..., 2] = np.abs(n[..., 2]) + 0.3
    n = n / np.linalg.norm(n, axis=-1, keepdims=True)
    d = rng.uniform(0, 1, batch + (h, w, 3)).astype(np.float32)
    r = np.broadcast_to(
        rng.uniform(0.05, 1, batch + (h, w, 1)).astype(np.float32),
        batch + (h, w, 3)).copy()
    s = rng.uniform(0, 1, batch + (h, w, 3)).astype(np.float32)
    return np.concatenate([n, d, r, s], axis=-1)


SCENES = [
    ([0.0, -1.0, 2.0], [0.0, 0.0, 2.0], [50.0, 50.0, 50.0]),
    ([0.5, 0.5, 1.0], [-0.3, 0.4, 1.5], [20.0, 20.0, 20.0]),
    ([0.0, 0.0, 3.0], [1.2, -0.7, 0.8], [30.0, 25.0, 20.0]),
]


@pytest.mark.parametrize("cam,light,color", SCENES)
def test_matches_reference_renderer(reference_modules, cam, light, color):
    import torch
    ref_renderers = reference_modules["renderers"]

    class _Obj:  # tiny stand-ins for reference environment.Camera/Light/Scene
        pass

    scene_ref = _Obj()
    scene_ref.camera = _Obj()
    scene_ref.camera.pos = cam
    scene_ref.light = _Obj()
    scene_ref.light.pos = light
    scene_ref.light.color = color

    rng = np.random.default_rng(42)
    sv = random_svbrdf(rng, 32, 32)

    theirs = ref_renderers.LocalRenderer().render(
        scene_ref, torch.from_numpy(sv).permute(2, 0, 1).unsqueeze(0))
    theirs = theirs.squeeze(0).permute(1, 2, 0).numpy()

    ours = np.asarray(render.render(
        Scene.make(cam, light, color), jnp.asarray(sv)))

    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=1e-5)


def test_scene_batch_matches_loop():
    """One batched render over (S,) scenes == S single renders."""
    rng = np.random.default_rng(0)
    sv = jnp.asarray(random_svbrdf(rng, 8, 8))
    cams = np.array([s[0] for s in SCENES], np.float32)
    lights = np.array([s[1] for s in SCENES], np.float32)
    colors = np.array([s[2] for s in SCENES], np.float32)

    batched = render.render(
        Scene.make(cams, lights, colors), sv[None])  # (S, H, W, 3)
    for i, (cam, light, color) in enumerate(SCENES):
        single = render.render(Scene.make(cam, light, color), sv)
        np.testing.assert_allclose(batched[i], single, atol=1e-6)


def test_render_scene_set_shape():
    rng = np.random.default_rng(1)
    sv = jnp.asarray(random_svbrdf(rng, 8, 8, batch=(2,)))
    scenes = sampling.generate_loss_scenes(jax.random.key(0), 2)
    out = render.render_scene_set(scenes, sv)
    assert out.shape == (2, 9, 8, 8, 3)
    assert bool(jnp.all(jnp.isfinite(out)))
    assert bool(jnp.all(out >= 0.0))


def test_gradients_finite_and_nonzero():
    rng = np.random.default_rng(3)
    sv = jnp.asarray(random_svbrdf(rng, 8, 8))
    scene = Scene.make(*SCENES[0])

    def loss(svbrdf):
        return jnp.mean(render.render(scene, svbrdf))

    g = jax.grad(loss)(sv)
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.max(jnp.abs(g))) > 0.0


def test_gradient_vs_finite_difference():
    """Directional finite-difference check through the full shading chain."""
    rng = np.random.default_rng(5)
    sv = jnp.asarray(random_svbrdf(rng, 4, 4).astype(np.float64))
    scene = Scene.make(*SCENES[1])

    def loss(svbrdf):
        return jnp.mean(render.render(scene, svbrdf))

    g = jax.grad(loss)(sv)
    direction = jnp.asarray(
        rng.standard_normal(sv.shape), sv.dtype) * 1e-4
    fd = (loss(sv + direction) - loss(sv - direction)) / 2.0
    analytic = jnp.sum(g * direction)
    np.testing.assert_allclose(float(analytic), float(fd), rtol=5e-3)


def test_patch_coords_convention():
    c = render.patch_coords(4, 4)
    # row 0 is y=+1 (top), col 0 is x=-1 (left), z=0 everywhere
    np.testing.assert_allclose(c[0, 0], [-1.0, 1.0, 0.0])
    np.testing.assert_allclose(c[3, 3], [1.0, -1.0, 0.0])
    np.testing.assert_allclose(c[..., 2], 0.0)


class TestSamplers:
    def test_hemisphere_direction_distribution(self):
        d = sampling.cosine_hemisphere_direction(jax.random.key(0), 4096)
        norms = jnp.linalg.norm(d, axis=-1)
        np.testing.assert_allclose(np.asarray(norms), 1.0, atol=1e-5)
        assert float(jnp.min(d[:, 2])) > 0.0  # upper hemisphere
        # z = sqrt(1-r1), r1 ~ U(0.001, 0.95)  =>  E[z] ~= 0.6935
        assert abs(float(jnp.mean(d[:, 2])) - 0.6935) < 0.015

    def test_specular_scenes_mirror_configuration(self):
        s = sampling.generate_specular_scenes(jax.random.key(1), 64)
        assert s.camera_pos.shape == (64, 3)
        np.testing.assert_allclose(np.asarray(s.light_color), 50.0)

    def test_random_scenes_color(self):
        s = sampling.generate_random_scenes(jax.random.key(2), 8)
        np.testing.assert_allclose(np.asarray(s.light_color), 20.0)

    def test_loss_scenes_deterministic_by_key(self):
        a = sampling.generate_loss_scenes(jax.random.key(3), 2)
        b = sampling.generate_loss_scenes(jax.random.key(3), 2)
        np.testing.assert_array_equal(
            np.asarray(a.camera_pos), np.asarray(b.camera_pos))
