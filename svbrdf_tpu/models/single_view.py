"""Single-view SVBRDF estimation model.

Reference models.py:322-346 (SingleViewModel): Generator(9 channels) ->
tanh -> decode to 12-channel SVBRDF (normal z reconstruction, roughness
replication) -> diffuse/roughness/specular remapped [-1,1]->[0,1], normals
kept in [-1,1]. Given (B, N, H, W, 3) inputs, only view 0 is used.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from svbrdf_tpu.models.generator import Generator
from svbrdf_tpu.ops import codecs


def head_to_svbrdf(sv9: jnp.ndarray) -> jnp.ndarray:
    """tanh 9-channel head output -> packed 12-channel SVBRDF in output ranges."""
    svbrdf = codecs.decode_svbrdf(jnp.tanh(sv9.astype(jnp.float32)))
    maps = codecs.unpack_svbrdf(svbrdf)
    return codecs.pack_svbrdf(
        maps.normals,
        codecs.encode_as_unit_interval(maps.diffuse),
        codecs.encode_as_unit_interval(maps.roughness),
        codecs.encode_as_unit_interval(maps.specular),
    )


class SingleViewModel(nn.Module):
    use_coords: bool = False
    num_filters: int = 64
    depth: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, deterministic: bool = True):
        if images.ndim == 5:  # (B, N, H, W, 3) -> first view only
            images = images[:, 0]
        # phase_tail keeps the 9-channel full-res tensors in a space-to-
        # depth layout through the last decoder level AND the head (tanh +
        # decode are pixel-wise, so they commute with the layout); the
        # spatial unpack happens exactly once, on the final 12-channel maps.
        phase_tail = self.depth > 3
        sv9, _ = Generator(9, num_filters=self.num_filters,
                           use_coords=self.use_coords, depth=self.depth,
                           dtype=self.dtype, phase_tail=phase_tail,
                           name="generator")(images, deterministic)
        if not phase_tail:
            return head_to_svbrdf(sv9)
        b, h, w, _ = sv9.shape
        svbrdf_phase = head_to_svbrdf(sv9.reshape(b, h, w, 4, 9))
        from svbrdf_tpu.models import layers as L
        return L.phase_to_space(svbrdf_phase.reshape(b, h, w, 48), 12)
