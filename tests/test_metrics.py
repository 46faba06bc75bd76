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
