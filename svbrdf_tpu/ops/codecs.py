"""Gamma / SVBRDF / unit-interval codecs (pure jax.numpy, channels-last).

Functional contracts match reference utils.py:30-98 but the layout is
TPU-native NHWC: an SVBRDF is a (..., H, W, 12) array with channels
[normals(3) | diffuse(3) | roughness(3) | specular(3)] on the LAST axis
(the reference packs on dim=-3, i.e. NCHW; utils.py:36-58). Channels-last
keeps the channel axis on the TPU lane dimension so XLA tiles convs and
elementwise chains onto the MXU/VPU without transposes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

GAMMA = 2.2

# Channel slices of a packed 12-channel SVBRDF (last axis).
NORMALS = slice(0, 3)
DIFFUSE = slice(3, 6)
ROUGHNESS = slice(6, 9)
SPECULAR = slice(9, 12)


class SvbrdfMaps(NamedTuple):
    """Unpacked SVBRDF maps; each (..., H, W, 3)."""

    normals: jnp.ndarray
    diffuse: jnp.ndarray
    roughness: jnp.ndarray
    specular: jnp.ndarray


def gamma_decode(images: jnp.ndarray) -> jnp.ndarray:
    """sRGB-ish -> linear. Reference utils.py:30-31."""
    return jnp.power(images, GAMMA)


def gamma_encode(images: jnp.ndarray) -> jnp.ndarray:
    """Linear -> sRGB-ish. Reference utils.py:33-34."""
    return jnp.power(images, 1.0 / GAMMA)


def pack_svbrdf(normals, diffuse, roughness, specular) -> jnp.ndarray:
    """Concatenate maps on the channel (last) axis. Reference utils.py:36-38."""
    return jnp.concatenate([normals, diffuse, roughness, specular], axis=-1)


def unpack_svbrdf(svbrdf: jnp.ndarray, is_encoded: bool = False) -> SvbrdfMaps:
    """Split a packed SVBRDF into maps. Reference utils.py:40-58.

    is_encoded=False: 12 channels -> (3, 3, 3, 3).
    is_encoded=True : 9 channels [nx ny | d(3) | r(1) | s(3)] ->
                      normals has 2 channels, roughness has 1.
    """
    if not is_encoded:
        return SvbrdfMaps(
            normals=svbrdf[..., NORMALS],
            diffuse=svbrdf[..., DIFFUSE],
            roughness=svbrdf[..., ROUGHNESS],
            specular=svbrdf[..., SPECULAR],
        )
    return SvbrdfMaps(
        normals=svbrdf[..., 0:2],
        diffuse=svbrdf[..., 2:5],
        roughness=svbrdf[..., 5:6],
        specular=svbrdf[..., 6:9],
    )


def decode_svbrdf(svbrdf9: jnp.ndarray) -> jnp.ndarray:
    """9-channel network output -> 12-channel SVBRDF. Reference utils.py:73-88.

    normals: (nx, ny) scaled by 3, z = 1, renormalized; roughness replicated
    to 3 channels. Channels assumed in [-1, 1].
    """
    nxy, diffuse, roughness, specular = unpack_svbrdf(svbrdf9, is_encoded=True)

    roughness = jnp.repeat(roughness, 3, axis=-1)

    nxy = nxy * 3.0
    nz = jnp.ones_like(nxy[..., :1])
    normals = jnp.concatenate([nxy, nz], axis=-1)
    norm = jnp.sqrt(jnp.sum(jnp.square(normals), axis=-1, keepdims=True))
    normals = normals / norm

    return pack_svbrdf(normals, diffuse, roughness, specular)


def encode_svbrdf(svbrdf12: jnp.ndarray) -> jnp.ndarray:
    """12-channel SVBRDF -> 9-channel encoded form (inverse of decode_svbrdf).

    The reference left this unimplemented with a noted normal-encoding bug
    (reference utils.py:62-63); here it is the exact inverse: unit normal
    (nx, ny, nz) -> (nx/nz, ny/nz) / 3, roughness collapsed to one channel
    (mean). decode_svbrdf(encode_svbrdf(x)) == x for valid inputs with
    replicated roughness.
    """
    maps = unpack_svbrdf(svbrdf12)
    nz = jnp.maximum(maps.normals[..., 2:3], 1e-6)
    nxy = maps.normals[..., 0:2] / nz / 3.0
    roughness = jnp.mean(maps.roughness, axis=-1, keepdims=True)
    return jnp.concatenate([nxy, maps.diffuse, roughness, maps.specular],
                           axis=-1)


def encode_as_unit_interval(x: jnp.ndarray) -> jnp.ndarray:
    """[-1, 1] -> [0, 1]. Reference utils.py:92-93."""
    return (x + 1.0) / 2.0


def decode_from_unit_interval(x: jnp.ndarray) -> jnp.ndarray:
    """[0, 1] -> [-1, 1]. Reference utils.py:97-98."""
    return x * 2.0 - 1.0


def crop_square(images: jnp.ndarray, anchor, size: int) -> jnp.ndarray:
    """Crop a size×size window at (row, col) anchor from (..., H, W, C).

    Reference utils.py:15-28 (NCHW there). `size` must be static; anchor may
    be traced (uses lax.dynamic_slice semantics via jnp.take-free slicing).
    """
    import jax.lax as lax

    row, col = anchor[0], anchor[1]
    ndim = images.ndim
    starts = [0] * ndim
    sizes = list(images.shape)
    starts[-3], starts[-2] = row, col
    sizes[-3], sizes[-2] = size, size
    return lax.dynamic_slice(images, starts, sizes)


def is_phase_planes(t) -> bool:
    """True if t is a phase-planes (B, 48, h, w) SVBRDF tensor rather than
    spatial NHWC (B, H, W, 12).

    The two layouts are shape-distinguishable except for one corner:
    (B, 48, x, 12) reads as BOTH NHWC with H=48 and planes of a 24-px-wide
    input. That shape raises instead of silently guessing — a wrong guess
    computes a wrong loss (the producers — parallel/step, data/pipeline —
    always know the real layout and avoid the corner by construction).
    """
    if t.ndim != 4:
        return False
    planes_like = t.shape[1] == 48
    nhwc_like = t.shape[-1] == 12
    if planes_like and nhwc_like:
        raise ValueError(
            f"ambiguous SVBRDF layout for shape {tuple(t.shape)}: both "
            "NHWC (H=48, C=12) and phase-planes (48 planes of a 24-px-wide "
            "input) fit. Use an unambiguous spatial size or convert "
            "explicitly (ops.render_pallas.svbrdf_to_phase_planes).")
    return planes_like
