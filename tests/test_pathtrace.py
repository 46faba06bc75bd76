"""Path tracer tests: small-light limit vs the analytic point-light
renderer, gradients, occlusion, determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svbrdf_tpu.ops import pathtrace, render
from svbrdf_tpu.scene import Scene
from tests.test_render import random_svbrdf


def diffuse_only_svbrdf(rng, h=8, w=8):
    sv = random_svbrdf(rng, h, w)
    sv[..., 9:12] = 0.0  # no specular => BRDF models agree exactly
    return sv


def test_shapes_finite_nonnegative():
    rng = np.random.default_rng(0)
    sv = jnp.asarray(random_svbrdf(rng, 16, 16))
    scene = Scene.make([0.0, -1.0, 2.0], [0.0, 0.5, 2.0], [50.0] * 3)
    out = pathtrace.render(scene, sv)
    assert out.shape == (16, 16, 3)
    assert bool(jnp.all(jnp.isfinite(out)))
    assert float(out.min()) >= 0.0


def test_small_light_matches_point_light():
    """As the quad light shrinks, MC shading -> analytic point light with an
    extra emitter-cosine factor."""
    rng = np.random.default_rng(1)
    sv = jnp.asarray(diffuse_only_svbrdf(rng, 8, 8))
    cam, light = [0.3, -0.4, 2.0], [0.2, 0.1, 1.8]
    scene = Scene.make(cam, light, [30.0] * 3)

    tiny = pathtrace.LIGHT_SIZE
    try:
        pathtrace.LIGHT_SIZE = (1e-3, 1e-3)
        ours = pathtrace.render(scene, sv, spp=(16, 8))
    finally:
        pathtrace.LIGHT_SIZE = tiny

    analytic = render.render(scene, sv)
    # emitter cosine: dot(-wi, light_normal), light aimed at origin
    coords = render.patch_coords(8, 8)
    n_l = -np.asarray(light) / np.linalg.norm(light)
    wi = np.asarray(light) - np.asarray(coords)
    wi = wi / np.linalg.norm(wi, axis=-1, keepdims=True)
    cos_l = np.clip((-wi * n_l).sum(-1, keepdims=True), 0, None)
    expected = np.asarray(analytic) * cos_l

    np.testing.assert_allclose(np.asarray(ours), expected, rtol=0.08,
                               atol=1e-4)


def test_gradients_finite_nonzero():
    rng = np.random.default_rng(2)
    sv = jnp.asarray(random_svbrdf(rng, 8, 8))
    scene = Scene.make([0.0, 0.0, 2.0], [0.5, 0.5, 1.5], [30.0] * 3)

    def loss(svbrdf):
        return jnp.mean(pathtrace.render(scene, svbrdf))

    g = jax.grad(loss)(sv)
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.max(jnp.abs(g))) > 0.0


def test_camera_occluded_by_light_quad():
    """Camera behind the light quad: blocked pixels see the quad's back
    face (black), like the occluding-quad behavior the reference documents
    for its Redner renders."""
    rng = np.random.default_rng(3)
    sv = jnp.asarray(random_svbrdf(rng, 8, 8))
    # light between camera and patch, both on the z axis; the emitting
    # face aims at the origin so the camera sees its back.
    scene = Scene.make([0.0, 0.0, 4.0], [0.0, 0.0, 1.0], [50.0] * 3)
    out = np.asarray(pathtrace.render(scene, sv))
    # center pixel's view ray passes through the quad -> black back face
    np.testing.assert_allclose(out[4, 4], 0.0, atol=1e-6)
    # corner pixels see the lit patch around the quad
    assert float(out[0, 0].max()) > 0.0


def test_deterministic_sampling():
    rng = np.random.default_rng(4)
    sv = jnp.asarray(random_svbrdf(rng, 8, 8))
    scene = Scene.make([0.0, -1.0, 2.0], [0.0, 0.0, 2.0], [50.0] * 3)
    fn = pathtrace.make_render_fn()
    a, b = fn(scene, sv), fn(scene, sv)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_scene_batching():
    rng = np.random.default_rng(5)
    sv = jnp.asarray(random_svbrdf(rng, 8, 8, batch=(2,)))
    scenes = Scene(
        camera_pos=jnp.asarray(rng.uniform(-1, 1, (2, 3, 3)) +
                               np.array([0, 0, 2.0]), jnp.float32),
        light_pos=jnp.asarray(rng.uniform(-1, 1, (2, 3, 3)) +
                              np.array([0, 0, 2.0]), jnp.float32),
        light_color=jnp.full((2, 3, 3), 30.0),
    )
    out = pathtrace.render(scenes, sv[:, None])
    assert out.shape == (2, 3, 8, 8, 3)


def test_plugs_into_rendering_loss():
    from svbrdf_tpu import losses

    rng = np.random.default_rng(6)
    a = jnp.asarray(random_svbrdf(rng, 8, 8, batch=(1,)))
    b = jnp.asarray(random_svbrdf(rng, 8, 8, batch=(1,)))
    fn = losses.make_loss_fn("rendering", "pathtracing")
    loss = fn(a, b, jax.random.key(0))
    assert np.isfinite(float(loss)) and float(loss) > 0.0
