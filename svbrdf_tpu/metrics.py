"""Quantitative SVBRDF quality metrics.

The reference evaluates test-time quality purely visually (matplotlib
grids, reference main.py:171-223; SURVEY.md §6: "qualitative only"). This
module exceeds that: per-map RMSE (plus log-space RMSE for diffuse /
specular, the spaces the L1 loss compares in — reference losses.py:13),
and a rendering error under a FIXED deterministic scene set so numbers
are comparable across runs and checkpoints. `--mode test` writes them to
metrics.json next to the PNG grids.
"""

from __future__ import annotations

import json
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from svbrdf_tpu import losses
from svbrdf_tpu.ops import codecs, render, sampling

# Fixed key for the evaluation scene set: metrics are a measurement, not
# an augmentation — every run scores under the same lights/views.
METRIC_SCENE_KEY = 313
N_RANDOM_SCENES = 3
N_SPECULAR_SCENES = 6


def _rmse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.mean(jnp.square(a - b)))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x * x) / (2.0 * sigma * sigma))
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


def ssim(a: jnp.ndarray, b: jnp.ndarray,
         data_range: float = 1.0) -> jnp.ndarray:
    """Mean structural similarity (Wang et al. 2004) of (..., H, W, C)
    images: 11x11 Gaussian window (sigma 1.5), K1=0.01, K2=0.03, 'VALID'
    windows (no border inflation), channels treated independently and
    averaged — the standard single-scale SSIM definition."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    h, w, c = a.shape[-3:]
    win = _gaussian_window()[..., None, None]  # (11, 11, 1, 1)

    def filt(img):
        # depthwise: fold channels (and any leading batch) into N.
        flat = jnp.moveaxis(img.reshape((-1, h, w, c)), -1, 1)
        flat = flat.reshape((-1, h, w, 1))
        out = jax.lax.conv_general_dilated(
            flat, win, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST)
        return out

    mu_a, mu_b = filt(a), filt(b)
    s_aa = filt(a * a) - mu_a * mu_a
    s_bb = filt(b * b) - mu_b * mu_b
    s_ab = filt(a * b) - mu_a * mu_b
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    num = (2.0 * mu_a * mu_b + c1) * (2.0 * s_ab + c2)
    den = (mu_a * mu_a + mu_b * mu_b + c1) * (s_aa + s_bb + c2)
    return jnp.mean(num / den)


@jax.jit
def svbrdf_metrics(pred: jnp.ndarray, target: jnp.ndarray
                   ) -> Dict[str, jnp.ndarray]:
    """Per-map + rendering metrics for one sample or a batch (..., H, W, 12).

    Returns scalars: rmse per map, log-space rmse for diffuse/specular
    (log(x + 0.01), the loss's comparison space), and rendering_rmse — the
    RMSE between log-tonemapped renders (log(render + 0.1)) of pred and
    target under 9 fixed scenes (3 random + 6 specular, the loss's scene
    mix at a constant key).
    """
    p = codecs.unpack_svbrdf(pred)
    t = codecs.unpack_svbrdf(target)
    out = {
        "rmse_normals": _rmse(p.normals, t.normals),
        "rmse_diffuse": _rmse(p.diffuse, t.diffuse),
        "rmse_roughness": _rmse(p.roughness, t.roughness),
        "rmse_specular": _rmse(p.specular, t.specular),
        "log_rmse_diffuse": _rmse(jnp.log(p.diffuse + losses.EPSILON_L1),
                                  jnp.log(t.diffuse + losses.EPSILON_L1)),
        "log_rmse_specular": _rmse(jnp.log(p.specular + losses.EPSILON_L1),
                                   jnp.log(t.specular + losses.EPSILON_L1)),
        # Structural similarity per map (VERDICT r3 #6): normals live in
        # [-1, 1] (range 2), the other maps in [0, 1].
        "ssim_normals": ssim(p.normals, t.normals, data_range=2.0),
        "ssim_diffuse": ssim(p.diffuse, t.diffuse),
        "ssim_roughness": ssim(p.roughness, t.roughness),
        "ssim_specular": ssim(p.specular, t.specular),
    }

    batched = pred.reshape((-1,) + pred.shape[-3:])
    tgt = target.reshape((-1,) + target.shape[-3:])
    scenes = sampling.generate_loss_scenes(
        jax.random.key(METRIC_SCENE_KEY), batched.shape[0],
        N_RANDOM_SCENES, N_SPECULAR_SCENES)
    pred_r = render.render(scenes, batched[:, None])
    tgt_r = render.render(scenes, tgt[:, None])
    out["rendering_rmse"] = _rmse(
        jnp.log(pred_r + losses.EPSILON_RENDER),
        jnp.log(tgt_r + losses.EPSILON_RENDER))
    return out


def to_python(metric_tree: Dict) -> Dict[str, float]:
    return {k: float(v) for k, v in metric_tree.items()}


def summarize(per_sample: list) -> Dict:
    """Mean over per-sample metric dicts + the samples themselves."""
    if not per_sample:
        return {"mean": {}, "samples": []}
    keys = per_sample[0]["metrics"].keys()
    mean = {k: float(np.mean([s["metrics"][k] for s in per_sample]))
            for k in keys}
    return {"mean": mean, "samples": per_sample}


def write_metrics(path, summary: Dict) -> None:
    with open(path, "w") as f:
        json.dump(summary, f, indent=2)
