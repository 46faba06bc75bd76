"""In-network differentiable Cook-Torrance patch renderer (pure jax.numpy).

Physics contract matches reference renderers.py:14-104 (LocalRenderer):
orthographic "patch sampling" of a 2x2 quad at z=0, per-pixel wo/wi from
point camera/light, GGX microfacet distribution with chi+ and clamped
denominator, Schlick Fresnel, Smith-style G1 product, kd=(1-F) Lambert
diffuse, radiance = f * color / d^2 * max(L.N, 0).

TPU-native design: channels-last, fully broadcast over arbitrary leading
scene/batch axes — the reference's per-scene Python loop (losses.py:40-42)
becomes a single batched call of shape (B, S, H, W, 3). All math is f32
elementwise (VPU); XLA fuses the whole shading chain into one loop.
A Pallas-fused rendering-loss kernel lives in ops/render_pallas.py.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from svbrdf_tpu.ops import codecs
from svbrdf_tpu.scene import Scene

_PI = math.pi
_EPS_DOT = 0.001       # dot-product clamp, reference renderers.py:48-52
_EPS_ROUGHNESS = 0.001  # roughness clamp, reference renderers.py:87
_EPS_DENOM = 0.001     # GGX denominator clamp, reference renderers.py:26


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Channel-axis dot product, keepdims. Reference renderers.py:8-9 (dim=-3)."""
    return jnp.sum(a * b, axis=-1, keepdims=True)


def normalize(a: jnp.ndarray) -> jnp.ndarray:
    return a / jnp.sqrt(dot(a, a))


def xi(x: jnp.ndarray) -> jnp.ndarray:
    """Heaviside chi+ (positive characteristic). Reference renderers.py:15-16."""
    return (x > 0.0).astype(x.dtype)


def patch_coords(height: int, width: int, dtype=jnp.float32) -> jnp.ndarray:
    """World coordinates of the material patch pixels, (H, W, 3).

    Patch spans (-1,-1,0)..(1,1,0); x grows with the width axis, y decreases
    with the height axis (image row 0 is y=+1). Reference renderers.py:73-76.
    """
    xs = jnp.linspace(-1.0, 1.0, width, dtype=dtype)
    ys = -jnp.linspace(-1.0, 1.0, height, dtype=dtype)
    xg = jnp.broadcast_to(xs[None, :], (height, width))
    yg = jnp.broadcast_to(ys[:, None], (height, width))
    zg = jnp.zeros((height, width), dtype)
    return jnp.stack([xg, yg, zg], axis=-1)


def _diffuse_term(diffuse, ks):
    """kd = (1 - F); Lambert. Reference renderers.py:18-20."""
    return (1.0 - ks) * diffuse / _PI


def _microfacet_distribution(roughness, NH):
    """GGX D with chi+ and clamped denominator. Reference renderers.py:22-27."""
    alpha = roughness ** 2
    alpha_sq = alpha ** 2
    NH_sq = NH ** 2
    denom = jnp.maximum(NH_sq * (alpha_sq + (1.0 - NH_sq) / NH_sq), _EPS_DENOM)
    return (alpha_sq * xi(NH)) / (_PI * denom ** 2)


def _fresnel(specular, VH):
    """Schlick approximation. Reference renderers.py:29-32."""
    return specular + (1.0 - specular) * (1.0 - VH) ** 5


def _g1(roughness, XH, XN):
    """Smith-style masking term. Reference renderers.py:34-38."""
    alpha = roughness ** 2
    alpha_sq = alpha ** 2
    XN_sq = XN ** 2
    return 2.0 * xi(XH / XN) / (
        1.0 + jnp.sqrt(1.0 + alpha_sq * (1.0 - XN_sq) / XN_sq))


def _geometry(roughness, VH, LH, VN, LN):
    """G = G1(V) * G1(L). Reference renderers.py:40-41."""
    return _g1(roughness, VH, VN) * _g1(roughness, LH, LN)


def _specular_term(wi, wo, normals, roughness, specular):
    """Cook-Torrance specular; returns (term, F). Reference renderers.py:43-60."""
    H = normalize((wi + wo) / 2.0)

    NH = jnp.maximum(dot(normals, H), _EPS_DOT)
    VH = jnp.maximum(dot(wo, H), _EPS_DOT)
    LH = jnp.maximum(dot(wi, H), _EPS_DOT)
    VN = jnp.maximum(dot(wo, normals), _EPS_DOT)
    LN = jnp.maximum(dot(wi, normals), _EPS_DOT)

    F = _fresnel(specular, VH)
    G = _geometry(roughness, VH, LH, VN, LN)
    D = _microfacet_distribution(roughness, NH)
    return F * G * D / (4.0 * VN * LN), F


def evaluate_brdf(wi, wo, normals, diffuse, roughness, specular):
    """Full Cook-Torrance BRDF. Reference renderers.py:62-65."""
    spec_term, F = _specular_term(wi, wo, normals, roughness, specular)
    return _diffuse_term(diffuse, F) + spec_term


def render(scene: Scene, svbrdf: jnp.ndarray, key=None) -> jnp.ndarray:
    """Render the patch under a (batch of) point-light scene(s).

    Args:
      scene: fields of shape (..., 3), broadcastable against svbrdf's
        leading axes (e.g. scene (B, S, 3) with svbrdf (B, 1, H, W, 12)).
      svbrdf: (..., H, W, 12) channels-last packed SVBRDF.
      key: ignored — the analytic point-light renderer is deterministic.
        Present so every renderer shares the uniform protocol
        `render_fn(scene, svbrdf, key=None)` (the path tracer consumes it
        for per-call MC sample decorrelation).

    Returns:
      Linear radiance, (..., H, W, 3). Reference renderers.py:67-104.
    """
    height, width = svbrdf.shape[-3], svbrdf.shape[-2]
    coords = patch_coords(height, width, svbrdf.dtype)

    cam = scene.camera_pos[..., None, None, :]
    light = scene.light_pos[..., None, None, :]
    color = scene.light_color[..., None, None, :]

    wo = normalize(cam - coords)

    maps = codecs.unpack_svbrdf(svbrdf)
    roughness = jnp.maximum(maps.roughness, _EPS_ROUGHNESS)

    rel_light = light - coords
    wi = normalize(rel_light)

    f = evaluate_brdf(wi, wo, maps.normals, maps.diffuse, roughness,
                      maps.specular)
    LN = jnp.maximum(dot(wi, maps.normals), 0.0)  # upper hemisphere only
    falloff = 1.0 / dot(rel_light, rel_light)     # 1/d^2 radial falloff
    return f * (color * falloff) * LN


# Renderer-protocol declaration (losses._render_fn_accepts_key): the key
# kwarg is accepted (and ignored — the analytic renderer is deterministic).
render.accepts_key = True


def render_scene_set(scenes: Scene, svbrdf: jnp.ndarray) -> jnp.ndarray:
    """Render one SVBRDF batch under per-item scene sets.

    scenes fields (B, S, 3); svbrdf (B, H, W, 12) -> radiance (B, S, H, W, 3).
    This is the vectorized replacement for the reference's double Python
    loop over batch items and scenes (losses.py:34-44).
    """
    return render(scenes, svbrdf[:, None])


class LocalRenderer:
    """Protocol-compatible wrapper (`render(scene, svbrdf)`).

    Mirrors the reference renderer protocol (renderers.py:14) for code that
    selects a renderer by name; the pure function `render` is the real API.
    """

    def render(self, scene: Scene, svbrdf: jnp.ndarray,
               key=None) -> jnp.ndarray:
        return render(scene, svbrdf)
