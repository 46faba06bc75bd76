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


class TestBrdfFidelity:
    """BRDF-level agreement with the local GGX renderer under the
    reference's roughness conversion (VERDICT r2 #4) — not just limits."""

    def _flat_specular_svbrdf(self, h, w, rough, spec=0.5):
        from svbrdf_tpu.ops import codecs

        flat_n = jnp.concatenate(
            [jnp.zeros((h, w, 2)), jnp.ones((h, w, 1))], axis=-1)
        return codecs.pack_svbrdf(flat_n, jnp.zeros((h, w, 3)),
                                  jnp.full((h, w, 3), rough),
                                  jnp.full((h, w, 3), spec))

    @pytest.mark.parametrize("rough", [0.3, 0.5, 0.8])
    def test_specular_peak_matches_local_ggx(self, rough):
        """Under the reference's GGX->Blinn conversion (mean ** 4,
        renderers.py:225) the two NDFs peak at exactly the same value:
        D_blinn(n) = (e+2)/(2 pi) = 1/(pi r_blinn) = 1/(pi alpha_ggx^2)
        = D_ggx(n). With camera and light colocated on the normal axis the
        center pixel is retro-reflective (h = n, G = 1 on both sides), so
        the small-light tracer must match the analytic GGX renderer there
        to MC precision; total lobe energy agrees to the Blinn-vs-GGX tail
        difference (<25%)."""
        h = w = 17  # odd: exact center pixel at the patch origin
        sv = self._flat_specular_svbrdf(h, w, rough)
        scene = Scene.make([0.0, 0.0, 2.0], [0.0, 0.0, 2.0], [30.0] * 3)

        old = pathtrace.LIGHT_SIZE
        try:
            pathtrace.LIGHT_SIZE = (1e-3, 1e-3)
            ours = np.asarray(pathtrace.render(scene, sv, spp=(256, 8)))
        finally:
            pathtrace.LIGHT_SIZE = old

        analytic = np.asarray(render.render(scene, sv))
        coords = np.asarray(render.patch_coords(h, w))
        light = np.array([0.0, 0.0, 2.0])
        n_l = -light / np.linalg.norm(light)
        wi = light - coords
        wi /= np.linalg.norm(wi, axis=-1, keepdims=True)
        cos_l = np.clip((-wi * n_l).sum(-1, keepdims=True), 0, None)
        expected = analytic * cos_l

        np.testing.assert_allclose(ours[8, 8], expected[8, 8], rtol=5e-3)
        assert ours.sum() == pytest.approx(expected.sum(), rel=0.25)

    def test_smith_g1_matches_exact_beckmann(self):
        """The rational Smith-Blinn G1 (Walter et al. 2007 §5.3, the same
        fit Redner uses) must track the EXACT Smith-Beckmann G1 of the
        equivalent width to <1% over incidence angles and roughness."""
        from scipy.special import erf  # noqa: F401  (fallback below)

        for r in (0.05, 0.2, 0.6):
            exponent = 2.0 / r - 2.0
            cos_t = jnp.linspace(0.05, 0.999, 64)
            ours = np.asarray(pathtrace._blinn_smith_g1(cos_t, exponent))
            sin_t = np.sqrt(1.0 - np.asarray(cos_t) ** 2)
            a = np.sqrt(0.5 * exponent + 1.0) * np.asarray(cos_t) / sin_t
            lam = (erf(a) - 1.0) / 2.0 + np.exp(-a * a) / (
                2.0 * a * np.sqrt(np.pi))
            exact = 1.0 / (1.0 + lam)
            np.testing.assert_allclose(ours, exact, atol=0.01)

    def test_diffuse_term_matches_local_renderer(self):
        """For specular=0 the two BRDF models share the exact same
        (1-F) Lambert diffuse term — full-image agreement at high spp."""
        rng = np.random.default_rng(21)
        sv = jnp.asarray(diffuse_only_svbrdf(rng, 8, 8))
        scene = Scene.make([0.4, -0.3, 1.8], [0.3, 0.2, 2.2], [30.0] * 3)
        old = pathtrace.LIGHT_SIZE
        try:
            pathtrace.LIGHT_SIZE = (1e-3, 1e-3)
            ours = np.asarray(pathtrace.render(scene, sv, spp=(64, 8)))
        finally:
            pathtrace.LIGHT_SIZE = old
        analytic = np.asarray(render.render(scene, sv))
        coords = np.asarray(render.patch_coords(8, 8))
        light = np.array([0.3, 0.2, 2.2])
        n_l = -light / np.linalg.norm(light)
        wi = light - coords
        wi /= np.linalg.norm(wi, axis=-1, keepdims=True)
        cos_l = np.clip((-wi * n_l).sum(-1, keepdims=True), 0, None)
        np.testing.assert_allclose(ours, analytic * cos_l, rtol=0.02,
                                   atol=1e-5)


@pytest.mark.slow
def test_map_recovery_converges_through_tracer():
    """Differentiability validation THROUGH the tracer (the reference's
    notebook experiment for its Redner loss): recovering the diffuse map
    from path-traced renders converges."""
    from svbrdf_tpu.experiments import map_recovery
    from tests.test_render import random_svbrdf as _rs

    rng = np.random.default_rng(30)
    target = jnp.asarray(_rs(rng, 16, 16))
    result = map_recovery.recover_maps(
        jax.random.key(31), target, optimize=("diffuse",), steps=80,
        learning_rate=5e-2,
        render_fn=pathtrace.make_render_fn(spp=(8, 4), seed=7))
    first, last = float(result.losses[0]), float(result.losses[-1])
    assert last < first * 0.4, (first, last)
    d_err = float(jnp.mean(jnp.abs(result.svbrdf[..., 3:6]
                                   - target[..., 3:6])))
    assert d_err < 0.15, d_err


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


class TestSampleDecorrelation:
    """VERDICT r3 #3: the MC estimator draws fresh samples per call when a
    key is threaded through the renderer protocol, independently per scene
    and per pixel, while staying reproducible under a fixed seed."""

    def _setup(self):
        rng = np.random.default_rng(7)
        sv = jnp.asarray(random_svbrdf(rng, 8, 8))
        scene = Scene.make([0.0, -1.0, 2.0], [0.2, 0.3, 2.0], [50.0] * 3)
        return scene, sv

    def test_fresh_samples_per_key(self):
        scene, sv = self._setup()
        fn = pathtrace.make_render_fn(spp=(4, 2))
        a = fn(scene, sv, key=jax.random.key(1))
        b = fn(scene, sv, key=jax.random.key(2))
        assert float(jnp.max(jnp.abs(a - b))) > 0.0

    def test_same_key_bitwise_reproducible(self):
        scene, sv = self._setup()
        fn = pathtrace.make_render_fn(spp=(4, 2))
        a = fn(scene, sv, key=jax.random.key(5))
        b = fn(scene, sv, key=jax.random.key(5))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_offsets_decorrelated_across_scene_batch(self):
        offs = pathtrace._stratified_offsets(jax.random.key(0), 4, (3,))
        assert offs.shape == (4, 3, 2)
        # independent jitter per scene/batch element
        assert not np.allclose(np.asarray(offs[:, 0]),
                               np.asarray(offs[:, 1]))
        # stratification preserved: all samples stay in [-0.5, 0.5]^2
        assert float(jnp.max(jnp.abs(offs))) <= 0.5 + 1e-6

    def test_identical_scenes_in_batch_get_independent_noise(self):
        _, sv = self._setup()
        pos = jnp.broadcast_to(jnp.array([0.0, -1.0, 2.0]), (2, 3))
        scenes = Scene(camera_pos=pos, light_pos=pos,
                       light_color=jnp.full((2, 3), 50.0))
        out = pathtrace.render(scenes, sv[None], key=jax.random.key(6),
                               spp=(2, 2))
        # two IDENTICAL scenes: values differ only through per-scene
        # sample decorrelation
        assert float(jnp.max(jnp.abs(out[0] - out[1]))) > 0.0

    def test_per_pixel_decorrelation(self):
        """The spp=1 residual against a high-spp estimate must be
        spatially white (per-pixel Cranley-Patterson rotation), not the
        smooth bias field a pattern shared by all pixels produces."""
        from svbrdf_tpu.ops import codecs

        h = w = 16
        flat_n = jnp.concatenate(
            [jnp.zeros((h, w, 2)), jnp.ones((h, w, 1))], axis=-1)
        sv = codecs.pack_svbrdf(flat_n, jnp.full((h, w, 3), 0.8),
                                jnp.full((h, w, 3), 0.5),
                                jnp.zeros((h, w, 3)))
        scene = Scene.make([0.0, 0.0, 2.0], [0.0, 0.0, 1.0], [30.0] * 3)
        noisy = np.asarray(pathtrace.render(scene, sv,
                                            key=jax.random.key(3),
                                            spp=(1, 1)))
        clean = np.asarray(pathtrace.render(scene, sv,
                                            key=jax.random.key(4),
                                            spp=(1024, 1)))
        resid = (noisy - clean)[..., 0]
        assert resid.std() > 0.0
        a = resid[:, :-1].ravel() - resid[:, :-1].mean()
        b = resid[:, 1:].ravel() - resid[:, 1:].mean()
        lag1 = float((a * b).mean() / (a.std() * b.std() + 1e-12))
        # shared-sample noise would correlate ~0.99 between neighbors
        assert abs(lag1) < 0.5, lag1

    def test_rendering_loss_threads_render_key(self):
        """The per-step loss key must reach the MC sampler: the keyed
        tracer gives a different loss than a key-blind wrapper of the SAME
        tracer under the SAME loss key (identical scene stream)."""
        from svbrdf_tpu import losses

        rng = np.random.default_rng(8)
        a = jnp.asarray(random_svbrdf(rng, 8, 8, batch=(1,)))
        b = jnp.asarray(random_svbrdf(rng, 8, 8, batch=(1,)))
        base = pathtrace.make_render_fn(spp=(4, 2))

        def key_blind(scene, svbrdf):
            return base(scene, svbrdf)

        k = jax.random.key(9)
        keyed = losses.rendering_loss(a, b, k, render_fn=base)
        fixed = losses.rendering_loss(a, b, k, render_fn=key_blind)
        assert float(keyed) != float(fixed)
        # determinism: same step key -> bitwise same loss
        again = losses.rendering_loss(a, b, k, render_fn=base)
        assert float(keyed) == float(again)
