"""On-device sample preparation: mixing, crop/resize, gamma, input synthesis.

The reference does ALL of this on CPU DataLoader workers per item
(dataset.py:45-220) — including running the renderer on the host — which
is why its local-renderer pipeline costs ~18 s/step. Here every math stage
is a jit-able JAX function over batches, so input synthesis runs on the
TPU with the same fused renderer used by the loss, and the host only
decodes PNGs.

All functions take explicit PRNG keys and static shape params.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from svbrdf_tpu.ops import codecs, render, sampling
from svbrdf_tpu.scene import Scene

# Constants from reference dataset.py:162-167.
MIN_EPS = 0.001
MAX_EPS = 0.02
FIXED_LIGHT_DISTANCE = 2.197
FIXED_VIEW_DISTANCE = 2.75


from functools import partial


@partial(jax.jit, static_argnames=())
def mix_materials(key, svbrdf_a: jnp.ndarray, svbrdf_b: jnp.ndarray,
                  alpha=None) -> jnp.ndarray:
    """Blend two SVBRDFs; normals mixed in projected x/y-derivative space.

    alpha ~ U(0.1, 0.9) when not given. Reference dataset.py:142-160.
    Works on single samples (H, W, 12) or batches (..., H, W, 12) with a
    broadcastable alpha.
    """
    if alpha is None:
        alpha = jax.random.uniform(key, (), minval=0.1, maxval=0.9)
    a = codecs.unpack_svbrdf(svbrdf_a)
    b = codecs.unpack_svbrdf(svbrdf_b)

    # Project normals to slope space (divide by clamped z) before blending.
    na = a.normals / jnp.maximum(0.01, a.normals[..., 2:3])
    nb = b.normals / jnp.maximum(0.01, b.normals[..., 2:3])
    n = alpha * na + (1.0 - alpha) * nb
    n = n / jnp.sqrt(jnp.sum(n * n, axis=-1, keepdims=True))

    lerp = lambda x, y: alpha * x + (1.0 - alpha) * y
    return codecs.pack_svbrdf(n, lerp(a.diffuse, b.diffuse),
                              lerp(a.roughness, b.roughness),
                              lerp(a.specular, b.specular))


class SynthesisConfig(NamedTuple):
    """Photometric augmentation switches (reference dataset.py:178-204)."""

    use_augmentation: bool = True


def generate_input_scenes(key, count: int,
                          use_augmentation: bool = True) -> Scene:
    """Camera/light configurations for input-photo synthesis, (count, 3).

    Scene 0: light xy ~ U(-0.75, 0.75), z = 2.197; view xy ~ U(-0.25, 0.25),
    z = view_distance[0]. Scenes 1..n-1: cosine-hemisphere directions
    scaled by the fixed light distance / sampled view distance. Photometric
    augmentation: flash intensity |N(20, exp(N(-2, 0.5)))|, white balance
    |N(1, 0.03)|, view distance U(0.25, 2.75) (fixed 2.75 and intensity 30
    without augmentation). Reference dataset.py:169-204.
    """
    keys = jax.random.split(key, 8)

    # --- Light positions ---
    first_light_xy = jax.random.uniform(keys[0], (1, 2),
                                        minval=-0.75, maxval=0.75)
    first_light = jnp.concatenate(
        [first_light_xy,
         jnp.full((1, 1), FIXED_LIGHT_DISTANCE)], axis=-1)
    if count > 1:
        rest = sampling.cosine_hemisphere_direction(
            keys[1], count - 1, MIN_EPS, MAX_EPS) * FIXED_LIGHT_DISTANCE
        light_pos = jnp.concatenate([first_light, rest], axis=0)
    else:
        light_pos = first_light

    # --- Light colors ---
    if use_augmentation:
        std = jnp.exp(-2.0 + 0.5 * jax.random.normal(keys[2], ()))
        intensity = jnp.abs(
            20.0 + std * jax.random.normal(keys[3], (count, 1)))
        white_balance = jnp.abs(
            1.0 + 0.03 * jax.random.normal(keys[4], (count, 3)))
        light_color = intensity * white_balance
    else:
        light_color = jnp.full((count, 3), 30.0)

    # --- View positions ---
    if use_augmentation:
        view_distance = jax.random.uniform(keys[5], (count,),
                                           minval=0.25, maxval=2.75)
    else:
        view_distance = jnp.full((count,), FIXED_VIEW_DISTANCE)

    first_view_xy = jax.random.uniform(keys[6], (1, 2),
                                       minval=-0.25, maxval=0.25)
    first_view = jnp.concatenate([first_view_xy, view_distance[:1, None]],
                                 axis=-1)
    if count > 1:
        rest = sampling.cosine_hemisphere_direction(
            keys[7], count - 1, MIN_EPS, MAX_EPS) * view_distance[1:, None]
        view_pos = jnp.concatenate([first_view, rest], axis=0)
    else:
        view_pos = first_view

    return Scene(camera_pos=view_pos, light_pos=light_pos,
                 light_color=light_color)


@partial(jax.jit, static_argnames=("count", "use_augmentation"))
def synthesize_inputs(key, svbrdf: jnp.ndarray, count: int,
                      use_augmentation: bool = True) -> jnp.ndarray:
    """Render `count` flash-lit input photos of one SVBRDF, (count, H, W, 3).

    One batched render over the scene axis + log-normal Gaussian noise
    (std = exp(N(ln 0.005, 0.3))), clamped to [0, 1]. Replaces the per-image
    host render loop of reference dataset.py:206-220.
    """
    k_scene, k_std, k_noise = jax.random.split(key, 3)
    scenes = generate_input_scenes(k_scene, count, use_augmentation)
    renders = render.render(scenes, svbrdf[None])  # (count, H, W, 3)

    # Fresh std per synthesized photo (reference draws one per rendering,
    # dataset.py:215) — a shared std would correlate the augmentation
    # noise across a sample's input photos.
    noise_std = jnp.exp(
        math.log(0.005) + 0.3 * jax.random.normal(k_std, (count, 1, 1, 1)))
    noise = noise_std * jax.random.normal(k_noise, renders.shape)
    return jnp.clip(renders + noise, 0.0, 1.0)


def center_crop_to_square(images: jnp.ndarray) -> jnp.ndarray:
    """Static center crop of (..., H, W, C) to the short side."""
    h, w = images.shape[-3], images.shape[-2]
    side = min(h, w)
    r0 = (h - side) // 2
    c0 = (w - side) // 2
    return images[..., r0:r0 + side, c0:c0 + side, :]


def _resize_axis_bilinear(x: jnp.ndarray, axis: int,
                          out_size: int) -> jnp.ndarray:
    """Separable bilinear resample along one axis, half-pixel centers,
    edge-replicated — bit-matching torch interpolate(align_corners=False)
    WITHOUT antialiasing (jax.image.resize antialiases on downsample)."""
    in_size = x.shape[axis]
    scale = in_size / out_size
    src = jnp.clip((jnp.arange(out_size) + 0.5) * scale - 0.5, 0.0, None)
    i0 = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, in_size - 1)
    i1 = jnp.clip(i0 + 1, 0, in_size - 1)
    frac = (src - i0).astype(x.dtype)
    shape = [1] * x.ndim
    shape[axis] = out_size
    frac = frac.reshape(shape)
    a = jnp.take(x, i0, axis=axis)
    b = jnp.take(x, i1, axis=axis)
    return a * (1.0 - frac) + b * frac


@partial(jax.jit, static_argnames=("size",))
def resize_bilinear(images: jnp.ndarray, size: int) -> jnp.ndarray:
    """Bilinear resize of (..., H, W, C) to size x size (half-pixel centers,
    matching torch interpolate align_corners=False; reference dataset.py:71-72)."""
    return _resize_axis_bilinear(
        _resize_axis_bilinear(images, images.ndim - 3, size),
        images.ndim - 2, size)


def scale_sample(images: jnp.ndarray, svbrdf: jnp.ndarray, image_size: int,
                 scale_mode: str, crop_anchor=(0, 0)):
    """Fit a sample to image_size by 'crop' or 'resize'.

    'resize': center-crop to square then bilinear down (reference
    dataset.py:57-72). 'crop': window at crop_anchor (dataset.py:73-86).
    """
    if scale_mode == "resize":
        return (resize_bilinear(center_crop_to_square(images),
                                size=image_size),
                resize_bilinear(center_crop_to_square(svbrdf),
                                size=image_size))
    if scale_mode == "crop":
        return (codecs.crop_square(images, crop_anchor, image_size),
                codecs.crop_square(svbrdf, crop_anchor, image_size))
    raise ValueError(f"unknown scale mode '{scale_mode}'")


@partial(jax.jit, static_argnames=("used_input_image_count",
                                   "use_augmentation", "is_linear"))
def prepare_sample(key, images: jnp.ndarray, svbrdf: jnp.ndarray,
                   used_input_image_count: int,
                   use_augmentation: bool = True,
                   is_linear: bool = False) -> tuple:
    """Gamma-decode real photos + synthesize the missing ones on device.

    images: (N_read, H, W, 3) already scaled; svbrdf: (H, W, 12).
    Returns (inputs (used_count, H, W, 3) linear RGB, svbrdf).
    Reference dataset.py:90-103.
    """
    if not is_linear and images.shape[0] > 0:
        images = codecs.gamma_decode(images)
    n_missing = used_input_image_count - images.shape[0]
    if n_missing > 0:
        synth = synthesize_inputs(key, svbrdf, count=n_missing,
                                  use_augmentation=use_augmentation)
        images = (jnp.concatenate([images, synth], axis=0)
                  if images.shape[0] > 0 else synth)
    return images, svbrdf


def _decode_u8_svbrdf(sv):
    """Raw strip bytes (..., 12) uint8 -> packed SVBRDF float32: /255 and
    normals remapped to [-1, 1]. (Host keeps bytes; see strips.decode_strip_u8.)"""
    f = sv.astype(jnp.float32) / 255.0
    return jnp.concatenate([f[..., :3] * 2.0 - 1.0, f[..., 3:]], axis=-1)


# --- Phase-planes target path (fused-loss fast path) ------------------------
#
# The fused mixed loss consumes targets in the Pallas kernel's phase-planes
# layout, (B, 4*12, H/2, W/2) with plane index = phase*12 + channel
# (ops/render_pallas.svbrdf_to_phase_planes). Converting the NHWC mixed
# SVBRDF after the fact costs ~0.5 ms/step on v5e (XLA splits it into eight
# narrow-channel strided copies around the 4-piece pack concat); mixing IN
# planes layout instead makes the whole target path one cheap uint8
# transpose + one fully-fused elementwise decode+mix. The math is
# op-for-op identical to mix_materials (same alpha draw, same order), so
# the loss value is unchanged.


def _to_phase_planes_any(sv: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) of any dtype -> (B, 4C, H/2, W/2) phase planes,
    out[b, (a*2+d)*C + c, v, u] = sv[b, 2v+a, 2u+d, c]."""
    b, hh, ww, c = sv.shape
    h, w = hh // 2, ww // 2
    p = sv.reshape(b, h, 2, w, 2, c).transpose(0, 2, 4, 5, 1, 3)
    return p.reshape(b, 4 * c, h, w)


def _decode_planes(planes: jnp.ndarray) -> jnp.ndarray:
    """uint8 (B, 4, 12, h, w) grouped planes -> decoded float32 (same
    semantics as _decode_u8_svbrdf, channel axis 2)."""
    f = planes.astype(jnp.float32) / 255.0
    return jnp.concatenate([f[:, :, :3] * 2.0 - 1.0, f[:, :, 3:]], axis=2)


def _mix_planes(alpha: jnp.ndarray, a: jnp.ndarray,
                b: jnp.ndarray) -> jnp.ndarray:
    """mix_materials on (B, 4, 12, h, w) grouped phase planes; alpha (B,).
    Identical per-element arithmetic (slope-space normal blend + renorm,
    lerp elsewhere), so values match the NHWC mix bit-for-bit."""
    al = alpha.reshape(-1, 1, 1, 1, 1)
    na = a[:, :, :3] / jnp.maximum(0.01, a[:, :, 2:3])
    nb = b[:, :, :3] / jnp.maximum(0.01, b[:, :, 2:3])
    n = al * na + (1.0 - al) * nb
    n = n / jnp.sqrt(jnp.sum(n * n, axis=2, keepdims=True))
    rest = al * a[:, :, 3:] + (1.0 - al) * b[:, :, 3:]
    return jnp.concatenate([n, rest], axis=2)


def _planes_target(raw_svbrdfs, partner_svbrdfs, alphas):
    """Phase-planes (B, 48, h, w) f32 target straight from the RAW batch
    arrays (uint8 fast path or float), bypassing the NHWC mixed tensor.

    Inputs may be spatial (B, H, W, 12) — transposed here — or ALREADY
    planes (B, 48, h, w), e.g. gathered from the device data cache's
    planes store (data/device_cache.py), where the transpose happened
    once at cache build instead of every step."""
    def grouped(sv):
        if codecs.is_phase_planes(sv):  # raises on the ambiguous shape
            pl = sv  # already phase planes
        else:
            pl = _to_phase_planes_any(sv)
        b, pc, h, w = pl.shape
        g = pl.reshape(b, 4, pc // 4, h, w)
        if sv.dtype != jnp.uint8:
            return g.astype(jnp.float32)
        # Pin the transpose-then-decode order: XLA canonicalizes the u8
        # convert ahead of the transpose, turning a 6 MB uint8 relayout
        # into 25 MB f32 copies (measured 1.5 ms/step at 256^2 batch 8).
        g = jax.lax.optimization_barrier(g)
        return _decode_planes(g)

    a = grouped(raw_svbrdfs)
    if partner_svbrdfs is None:
        out = a
    else:
        out = _mix_planes(alphas, a, grouped(partner_svbrdfs))
    b, _, c, h, w = out.shape
    return out.reshape(b, 4 * c, h, w)


@partial(jax.jit, static_argnames=("used_input_image_count",
                                   "use_augmentation", "is_linear",
                                   "planes_target"))
def prepare_batch(key, raw_inputs: jnp.ndarray, raw_svbrdfs: jnp.ndarray,
                  partner_svbrdfs=None,
                  used_input_image_count: int = 1,
                  use_augmentation: bool = True,
                  is_linear: bool = False,
                  planes_target: bool = False,
                  raw_svbrdf_planes=None,
                  partner_svbrdf_planes=None):
    """Vectorized per-batch preparation (jit this; it runs on device).

    raw_inputs: (B, N_read, H, W, 3); raw_svbrdfs: (B, H, W, 12);
    partner_svbrdfs: (B, H, W, 12) mixing partners or None (host picks the
    random partner FILE, device does the math — reference dataset.py:51-55).
    planes_target=True adds 'svbrdf_planes' — the (mixed) target in the
    fused loss kernel's phase-planes layout, computed directly from the
    raw arrays (see _planes_target; the spatial 'svbrdf' is still returned
    for input synthesis and non-fused consumers).
    """
    raw_u8_svbrdfs, raw_u8_partners = raw_svbrdfs, partner_svbrdfs
    if raw_inputs.dtype == jnp.uint8:
        raw_inputs = raw_inputs.astype(jnp.float32) / 255.0
    if raw_svbrdfs.dtype == jnp.uint8:
        raw_svbrdfs = _decode_u8_svbrdf(raw_svbrdfs)
    if partner_svbrdfs is not None and partner_svbrdfs.dtype == jnp.uint8:
        partner_svbrdfs = _decode_u8_svbrdf(partner_svbrdfs)

    b = raw_svbrdfs.shape[0]
    keys = jax.random.split(key, b)

    alphas = None
    if partner_svbrdfs is not None:
        mix_keys = jax.random.split(jax.random.fold_in(key, 1), b)
        # One alpha draw shared by the NHWC mix and the planes-layout mix
        # (identical to the draw mix_materials would make internally).
        alphas = jax.vmap(
            lambda k: jax.random.uniform(k, (), minval=0.1, maxval=0.9))(
                mix_keys)
        raw_svbrdfs = jax.vmap(mix_materials)(mix_keys, raw_svbrdfs,
                                              partner_svbrdfs, alphas)

    def per_item(k, imgs, sv):
        return prepare_sample(k, imgs, sv, used_input_image_count,
                              use_augmentation, is_linear)

    inputs, svbrdfs = jax.vmap(per_item)(keys, raw_inputs, raw_svbrdfs)
    out = {"inputs": inputs, "svbrdf": svbrdfs}
    if planes_target:
        # Prefer pre-transposed planes stores (device cache) — the
        # spatial -> planes relayout then never runs per step.
        src = (raw_svbrdf_planes if raw_svbrdf_planes is not None
               else raw_u8_svbrdfs)
        psrc = (partner_svbrdf_planes if partner_svbrdf_planes is not None
                else raw_u8_partners)
        if raw_u8_partners is None:
            psrc = None
        out["svbrdf_planes"] = _planes_target(src, psrc, alphas)
    return out
