"""The SVBRDF U-Net generator with parallel global track.

Architecture contract = reference models.py:208-320 (Generator): 8 stride-2
encoder blocks (64,128,256,512x5), 8 decoder blocks (nearest-up + double
4x4 conv) with skip concats, InstanceNorm everywhere except enc1/enc8/dec1,
dropout 0.5 on dec8-dec6, and a 16-stage FC+SELU global track fed by
pre-norm channel means and merged back via broadcast-add.

`depth` generalizes the fixed 8-level plan (needed for 2^depth-sized
inputs); depth=8 reproduces the reference layer-for-layer.

Returns (spatial map (B, H, W, out_channels), global vector (B, out_channels)).
"""

from __future__ import annotations

import os
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from svbrdf_tpu.models import layers as L


def encoder_features(ngf: int, depth: int):
    """ngf * min(2^i, 8): 64,128,256,512,512,... (reference models.py:232-239)."""
    return [ngf * min(2 ** i, 8) for i in range(depth)]


class Generator(nn.Module):
    output_channels: int
    num_filters: int = 64        # "ngf"
    use_coords: bool = False
    use_global_track: bool = True
    depth: int = 8
    dtype: Any = jnp.float32
    # phase_tail: compute the LAST decoder block in a space-to-depth phase
    # layout (layers.PhaseDecodingBlock) — same math and parameter tree, but
    # the narrow-channel full-resolution tensors never materialize (a 14x
    # lane-padding saving on TPU for 9-channel outputs). The spatial output
    # is then (B, H/2, W/2, 4 * output_channels), phase-major; unpack with
    # layers.phase_to_space.
    phase_tail: bool = False
    # upconv: decoder upsample+conv implementation override. MUST be
    # 'fold' when inputs are spatially sharded across devices (see
    # layers.UPCONV_IMPL for the measured XLA partitioner issue with the
    # default 'dilated' form).
    upconv: str = ""

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        d = self.depth
        dt = self.dtype
        enc_feats = encoder_features(self.num_filters, d)

        if self.use_coords:
            x = L.append_coords(x)
        x = x.astype(dt)

        input_mean = (jnp.mean(x.astype(jnp.float32), axis=(-3, -2))
                      if self.use_global_track else None)

        # Plans (reference models.py:232-248 for depth=8):
        #   encoder i: no norm on first & last, no activation on first;
        #   decoder i (dec{d}..dec1): features mirror the encoder, final
        #   block emits output_channels without norm; dropout on the first
        #   three decoder blocks.
        dec_feats = [self.output_channels if i == d - 1 else enc_feats[d - 2 - i]
                     for i in range(d)]
        gte_out = [enc_feats[i + 1] for i in range(d - 1)] + [dec_feats[0]]
        gtd_out = dec_feats[1:] + [self.output_channels]

        use_gt = self.use_global_track

        # --- Encoder + global track (reference models.py:284-300) ---
        skips = []
        g = None
        if use_gt:
            g = L.GlobalTrack(gte_out[0], dtype=dt, name="gte1")(
                input_mean, None)
        h, _ = L.EncodingBlock(enc_feats[0], False, False, dtype=dt,
                               name="enc1")(x, None)
        skips.append(h)
        for i in range(1, d):
            use_norm = i != d - 1
            h, mean = L.EncodingBlock(enc_feats[i], use_norm, True, dtype=dt,
                                      name=f"enc{i + 1}")(h, g)
            skips.append(h)
            if use_gt:
                g = L.GlobalTrack(gte_out[i], dtype=dt,
                                  name=f"gte{i + 1}")(mean, g)

        # --- Decoder + global track (reference models.py:303-318) ---
        # phase_tail: the last decoder level runs in phase space (it must be
        # dropout-free, i.e. i >= 3; reference models.py:241-243). Two-level
        # phase (SVBRDF_PHASE_LEVELS=2, depth >= 5) also phases the
        # second-to-last level — measured SLOWER on v5e at 64 channels (the
        # phase-space conv2 carries a structural 2.25x MAC overhead that
        # only narrow-channel levels amortize), kept for experimentation.
        if self.phase_tail and d <= 3:
            raise ValueError("phase_tail requires depth > 3 (the last "
                             "decoder block must be dropout-free)")
        two_level = (os.environ.get("SVBRDF_PHASE_LEVELS", "1") == "2"
                     and d >= 5)
        phase_from = (d - 2 if two_level else d - 1) if self.phase_tail else d
        for i in range(d):
            use_norm = i != d - 1
            use_dropout = i < 3
            skip = None if i == 0 else skips[d - 1 - i]
            if i >= phase_from:
                h, mean = L.PhaseDecodingBlock(
                    dec_feats[i], use_norm=use_norm,
                    phase_input=(i > phase_from), dtype=dt,
                    name=f"dec{d - i}")(h, skip, g)
            else:
                h, mean = L.DecodingBlock(
                    dec_feats[i], use_norm, use_dropout, True, dtype=dt,
                    upconv=self.upconv,
                    name=f"dec{d - i}")(h, skip, g,
                                        deterministic=deterministic)
            if use_gt:
                g = L.GlobalTrack(gtd_out[i], dtype=dt,
                                  name=f"gtd{d - i}")(mean, g)

        return h, g
