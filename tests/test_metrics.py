"""Quantitative quality metrics: identity, sensitivity, serialization."""

import json

import jax.numpy as jnp
import numpy as np

from svbrdf_tpu import metrics
from tests.test_render import random_svbrdf


def _sv(seed=0, size=16):
    return jnp.asarray(random_svbrdf(np.random.default_rng(seed),
                                     size, size))


class TestSvbrdfMetrics:
    def test_identity_is_zero(self):
        sv = _sv()
        m = metrics.to_python(metrics.svbrdf_metrics(sv, sv))
        for k, v in m.items():
            if k.startswith("ssim_"):
                assert abs(v - 1.0) < 1e-5, (k, v)  # SSIM identity is 1
            else:
                assert abs(v) < 1e-6, (k, v)

    def test_map_perturbation_hits_only_its_rmse(self):
        sv = _sv(1)
        pert = sv.at[..., 3:6].add(0.1)  # diffuse only
        m = metrics.to_python(metrics.svbrdf_metrics(pert, sv))
        assert m["rmse_diffuse"] > 0.09
        assert m["log_rmse_diffuse"] > 0.0
        assert m["rmse_normals"] == 0.0
        assert m["rmse_roughness"] == 0.0
        assert m["rmse_specular"] == 0.0
        # Diffuse feeds the renders too.
        assert m["rendering_rmse"] > 0.0

    def test_fixed_scene_set_is_deterministic(self):
        a = metrics.to_python(metrics.svbrdf_metrics(_sv(2), _sv(3)))
        b = metrics.to_python(metrics.svbrdf_metrics(_sv(2), _sv(3)))
        assert a == b

    def test_batched_input(self):
        pred = jnp.stack([_sv(4), _sv(5)])
        tgt = jnp.stack([_sv(6), _sv(7)])
        m = metrics.to_python(metrics.svbrdf_metrics(pred, tgt))
        assert all(np.isfinite(v) for v in m.values())

    def test_ssim_degrades_with_noise(self):
        sv = _sv(8)
        rng = np.random.default_rng(9)
        small = sv.at[..., 3:6].add(
            jnp.asarray(rng.normal(0, 0.02, sv[..., 3:6].shape),
                        jnp.float32))
        big = sv.at[..., 3:6].add(
            jnp.asarray(rng.normal(0, 0.2, sv[..., 3:6].shape),
                        jnp.float32))
        m_small = metrics.to_python(metrics.svbrdf_metrics(small, sv))
        m_big = metrics.to_python(metrics.svbrdf_metrics(big, sv))
        assert 1.0 > m_small["ssim_diffuse"] > m_big["ssim_diffuse"]
        # normals untouched -> their SSIM stays 1
        assert abs(m_small["ssim_normals"] - 1.0) < 1e-5

    def test_ssim_matches_independent_reference(self):
        """Pin the JAX SSIM against a direct numpy/scipy transcription of
        Wang et al. 2004 (11x11 Gaussian sigma 1.5, K1/K2 = 0.01/0.03,
        valid windows)."""
        from scipy.signal import convolve2d

        rng = np.random.default_rng(10)
        a = rng.uniform(0, 1, (24, 24, 3)).astype(np.float32)
        b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(
            np.float32)

        x = np.arange(11) - 5.0
        g = np.exp(-(x * x) / (2 * 1.5 ** 2))
        g /= g.sum()
        win = np.outer(g, g)

        def f(img):
            return np.stack([convolve2d(img[..., c], win, mode="valid")
                             for c in range(3)], axis=-1)

        mu_a, mu_b = f(a), f(b)
        s_aa, s_bb = f(a * a) - mu_a ** 2, f(b * b) - mu_b ** 2
        s_ab = f(a * b) - mu_a * mu_b
        c1, c2 = 0.01 ** 2, 0.03 ** 2
        expected = np.mean((2 * mu_a * mu_b + c1) * (2 * s_ab + c2)
                           / ((mu_a ** 2 + mu_b ** 2 + c1)
                              * (s_aa + s_bb + c2)))
        ours = float(metrics.ssim(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(ours, expected, rtol=1e-5)

    def test_summary_and_io(self, tmp_path):
        per_sample = [
            {"sample": 0, "grid": "a.png", "metrics": {"rmse_normals": 1.0}},
            {"sample": 1, "grid": "b.png", "metrics": {"rmse_normals": 3.0}},
        ]
        s = metrics.summarize(per_sample)
        assert s["mean"]["rmse_normals"] == 2.0
        metrics.write_metrics(tmp_path / "m.json", s)
        assert json.loads(
            (tmp_path / "m.json").read_text())["mean"]["rmse_normals"] == 2.0

    def test_empty_summary(self):
        assert metrics.summarize([]) == {"mean": {}, "samples": []}
