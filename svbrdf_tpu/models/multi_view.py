"""Multi-view SVBRDF estimation model.

Reference models.py:348-411 (MultiViewModel): a shared Generator(64) runs
per view, spatial & global outputs are max-pooled over views, then a fusion
head (Merge + 3 ConvFeature layers 64->64->32->9 interleaved with 3
GlobalTrack layers) produces the 9-channel SVBRDF head.

TPU-native: the reference's Python loop over torch.split views
(models.py:373-381) becomes nn.vmap of the shared Generator over the view
axis — one traced program, batched weights reuse, no per-view dispatch.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from svbrdf_tpu.models import layers as L
from svbrdf_tpu.models.generator import Generator
from svbrdf_tpu.models.single_view import (head_to_svbrdf,
                                           head_to_svbrdf_planes)


class MultiViewModel(nn.Module):
    use_coords: bool = False
    num_filters: int = 64
    generator_output_channels: int = 64
    depth: int = 8
    dtype: Any = jnp.float32
    # Set upconv='fold' for spatially-sharded use; see layers.UPCONV_IMPL.
    upconv: str = ""

    supports_phase_output = True
    supports_phase_planes_output = True

    @nn.compact
    def __call__(self, images, deterministic: bool = True,
                 output_layout: str = "spatial"):
        if images.ndim == 4:  # single view (B, H, W, 3) -> add view axis
            images = images[:, None]

        # Shared-parameter Generator vmapped over the view axis (axis 1).
        VGen = nn.vmap(
            Generator,
            in_axes=(1, None), out_axes=1,
            variable_axes={"params": None},
            split_rngs={"params": False, "dropout": True},
        )
        spatial, global_vec = VGen(
            self.generator_output_channels, num_filters=self.num_filters,
            use_coords=self.use_coords, depth=self.depth, dtype=self.dtype,
            upconv=self.upconv,
            name="generator")(images, deterministic)

        # Max-pool across views (reference models.py:388-389).
        pooled_spatial = jnp.max(spatial, axis=1)     # (B, H, W, C)
        pooled_global = jnp.max(global_vec, axis=1)   # (B, C)

        # Fusion head (reference models.py:359-367, 391-398), computed in
        # phase space: its 32- and 9-channel full-resolution tensors would
        # lane-pad 4x/14x in spatial form; the phase form of a 3x3 conv is
        # MAC-dense, so this is a pure layout win. One space_to_phase on
        # the pooled features; one unpack at the very end (or none, with
        # output_layout='phase').
        c0 = self.generator_output_channels
        head = [64, 32, 9]

        xp = L.space_to_phase(pooled_spatial)  # (B, H/2, W/2, 4*C)
        x = L.Merge(c0, dtype=self.dtype, phases=4, name="merge")(
            xp, pooled_global)
        mean = jnp.mean(pooled_spatial.astype(jnp.float32), axis=(-3, -2))
        g = L.GlobalTrack(head[0], dtype=self.dtype, name="gt1")(
            mean, pooled_global)
        x, mean = L.PhaseConvFeatureBlock(head[0], True, False,
                                          dtype=self.dtype,
                                          name="conv1")(x, g)
        g = L.GlobalTrack(head[1], dtype=self.dtype, name="gt2")(mean, g)
        x, mean = L.PhaseConvFeatureBlock(head[1], True, True,
                                          dtype=self.dtype,
                                          name="conv2")(x, g)
        g = L.GlobalTrack(head[2], dtype=self.dtype, name="gt3")(mean, g)
        x, _ = L.PhaseConvFeatureBlock(head[2], False, True,
                                       dtype=self.dtype,
                                       name="conv3")(x, g)

        b, h, w, _ = x.shape
        if output_layout == "phase_planes":
            # Training hot path (mirrors SingleViewModel's phase-tail
            # branch): ONE lane-crossing transpose on the 36-channel head
            # tensor, then tanh+decode at full lane width on planes; the
            # fused mixed loss grid-indexes the phase cell, so no
            # interleave is materialized forward or backward. The barrier
            # pins the transpose-then-decode order against XLA hoisting
            # the f32 tanh ahead of the transpose.
            import jax

            t = x.reshape(b, h, w, 4, 9).transpose(0, 3, 4, 1, 2)
            t = jax.lax.optimization_barrier(t)
            return head_to_svbrdf_planes(t, dtype=self.dtype).reshape(
                b, 48, h, w)
        if output_layout == "phase":
            # Compute-dtype maps for the fused loss (see SingleViewModel):
            # halves the phase->planes transpose + kernel IO at bf16; the
            # cast fuses into the decode pre-pack.
            return head_to_svbrdf(x.reshape(b, h, w, 4, 9),
                                  dtype=self.dtype)
        svbrdf_phase = head_to_svbrdf(x.reshape(b, h, w, 4, 9))
        return L.phase_to_space(svbrdf_phase.reshape(b, h, w, 48), 12)
