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


def head_to_svbrdf(sv9: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """tanh 9-channel head output -> packed 12-channel SVBRDF in output
    ranges. The decode runs in f32; `dtype` casts each map BEFORE the pack
    so the cast fuses into the decode's elementwise chain (a post-pack
    astype materializes a separate full-tensor copy — measured 0.76 ms at
    256^2 batch 8)."""
    svbrdf = codecs.decode_svbrdf(jnp.tanh(sv9.astype(jnp.float32)))
    maps = codecs.unpack_svbrdf(svbrdf)
    cast = (lambda x: x.astype(dtype)) if dtype is not None else (lambda x: x)
    return codecs.pack_svbrdf(
        cast(maps.normals),
        cast(codecs.encode_as_unit_interval(maps.diffuse)),
        cast(codecs.encode_as_unit_interval(maps.roughness)),
        cast(codecs.encode_as_unit_interval(maps.specular)),
    )


def head_to_svbrdf_planes(t9: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """head_to_svbrdf on (B, 4, 9, h, w) phase-plane stacks -> (B, 4, 12,
    h, w). Same decode (reference models.py:322-346 head + utils.py:73-88),
    channel axis at dim 2: running tanh+decode AFTER the layout transpose
    keeps every elementwise op at full lane width (the image axis is on
    lanes), instead of 36/128-wide NHWC lanes."""
    t = jnp.tanh(t9.astype(jnp.float32))
    nxy = t[:, :, 0:2] * 3.0
    nz = jnp.ones_like(t[:, :, :1])
    n = jnp.concatenate([nxy, nz], axis=2)
    n = n / jnp.sqrt(jnp.sum(n * n, axis=2, keepdims=True))
    unit = codecs.encode_as_unit_interval
    diffuse = unit(t[:, :, 2:5])
    roughness = unit(jnp.repeat(t[:, :, 5:6], 3, axis=2))
    specular = unit(t[:, :, 6:9])
    cast = (lambda x: x.astype(dtype)) if dtype is not None else (lambda x: x)
    return jnp.concatenate(
        [cast(n), cast(diffuse), cast(roughness), cast(specular)], axis=2)


class SingleViewModel(nn.Module):
    use_coords: bool = False
    num_filters: int = 64
    depth: int = 8
    dtype: Any = jnp.float32
    # Set upconv='fold' for spatially-sharded (H/W across devices) use;
    # see layers.UPCONV_IMPL.
    upconv: str = ""

    # The train/eval steps may request output_layout="phase"/"phase_planes"
    # to keep the maps in a space-to-depth layout (see __call__).
    supports_phase_output = True
    supports_phase_planes_output = True

    @nn.compact
    def __call__(self, images, deterministic: bool = True,
                 output_layout: str = "spatial"):
        """output_layout: 'spatial' -> (B, H, W, 12) maps (the public
        contract); 'phase' -> (B, H/2, W/2, 4, 12) phase-major maps;
        'phase_planes' -> (B, 48, H/2, W/2) phase-PLANE maps (plane
        (a*2+d)*12 + c = map c of phase cell (a, d)) — identical values,
        different data layouts. The fused mixed loss consumes phase_planes
        directly (ops/render_pallas.mixed_loss_fused_planes): the single
        lane-crossing transpose happens on the 36-channel head tensor,
        tanh+decode run at full lane width on planes, and the narrow
        12-channel full-resolution tensor never materializes in the
        training hot path."""
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
                           upconv=self.upconv,
                           name="generator")(images, deterministic)
        from svbrdf_tpu.models import layers as L

        if not phase_tail:
            spatial = head_to_svbrdf(sv9)
            if output_layout == "phase":
                b2, h2, w2, _ = spatial.shape
                return L.space_to_phase(spatial).reshape(
                    b2, h2 // 2, w2 // 2, 4, 12)
            if output_layout == "phase_planes":
                from svbrdf_tpu.ops import render_pallas
                return render_pallas.svbrdf_to_phase_planes(
                    spatial.astype(self.dtype))
            return spatial
        b, h, w, _ = sv9.shape
        if output_layout == "phase_planes":
            # Transpose FIRST (one lane-crossing copy on the 36-channel
            # tensor), then decode on planes at full lane width; the loss
            # kernel grid-indexes the phase cell, so no interleave is ever
            # materialized on the forward OR backward path. The barrier
            # pins that order: XLA otherwise hoists the f32 tanh ahead of
            # the transpose, materializing an f32 36-channel tensor + an
            # f32 relayout instead of one bf16 copy (~0.3 ms/step).
            import jax

            t = sv9.reshape(b, h, w, 4, 9).transpose(0, 3, 4, 1, 2)
            t = jax.lax.optimization_barrier(t)
            return head_to_svbrdf_planes(t, dtype=self.dtype).reshape(
                b, 48, h, w)
        if output_layout == "phase":
            # Training hot path: hand the maps to the fused loss in the
            # COMPUTE dtype — at bf16 the phase->planes transpose and the
            # loss kernel's IO move half the bytes. The decode runs in
            # f32 (cast fused pre-pack); the public spatial output stays
            # f32.
            return head_to_svbrdf(sv9.reshape(b, h, w, 4, 9),
                                  dtype=self.dtype)
        svbrdf_phase = head_to_svbrdf(sv9.reshape(b, h, w, 4, 9))
        return L.phase_to_space(svbrdf_phase.reshape(b, h, w, 48), 12)
