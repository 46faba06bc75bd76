"""Analytic FLOP accounting for the train step, for MFU reporting.

Counts the MXU work (conv + dense MACs) of the Generator U-Net plus an
estimate of the VPU shading work of the rendering loss. Convention:
1 MAC = 2 FLOPs; a backward pass costs 2x the forward conv FLOPs (input
gradient + weight gradient), so fwd+bwd = 3x fwd. This is the standard
"model FLOPs" basis for MFU (achieved FLOP/s divided by peak), i.e. a
lower bound that excludes elementwise/norm/optimizer work.

The layer plan mirrors models/generator.py (reference models.py:232-276);
the folded decoder conv1 (models/layers.py FoldedUpConv) is counted at its
actual cost: a 3x3 conv at LOW resolution with 4x output channels
(= 9/16 of the naive upsampled 4x4 conv).
"""

from __future__ import annotations

# TPU v5e (v5litepod) peak: 197 TFLOP/s bf16, 99 TFLOP/s fp32.
PEAK_FLOPS = {"bfloat16": 197e12, "float32": 99e12}


def generator_forward_flops(image_size: int = 256, in_channels: int = 3,
                            out_channels: int = 9, ngf: int = 64,
                            depth: int = 8, folded_decoder: bool = True,
                            use_global_track: bool = True) -> int:
    """Conv + dense MAC FLOPs (2*MACs) of one Generator forward, batch 1."""
    enc_feats = [ngf * min(2 ** i, 8) for i in range(depth)]
    dec_feats = [out_channels if i == depth - 1 else enc_feats[depth - 2 - i]
                 for i in range(depth)]
    flops = 0

    # Encoder: stride-2 4x4 convs; enc i outputs at size / 2^(i+1).
    cin = in_channels
    for i, cout in enumerate(enc_feats):
        res = image_size >> (i + 1)
        flops += 2 * res * res * 16 * cin * cout
        cin = cout

    # Decoder block i: input = prev features (+ skip concat for i > 0),
    # conv1 (upsample-aware) then conv2 (4x4 stride 1) at output res.
    prev = enc_feats[-1]
    for i, cout in enumerate(dec_feats):
        res_out = image_size >> (depth - 1 - i)
        cin = prev + (enc_feats[depth - 1 - i] if i > 0 else 0)
        if folded_decoder:
            # 3x3 conv at res_out/2 with 4*cout outputs.
            flops += 2 * (res_out // 2) ** 2 * 9 * cin * (4 * cout)
        else:
            flops += 2 * res_out * res_out * 16 * cin * cout
        flops += 2 * res_out * res_out * 16 * cout * cout
        prev = cout

    if use_global_track:
        # gte/gtd dense layers: in = mean-channels (+ prev global), tiny.
        gte_out = [enc_feats[i + 1] for i in range(depth - 1)] + [dec_feats[0]]
        gtd_out = dec_feats[1:] + [out_channels]
        g_in = in_channels  # gte1 consumes the input image's channel means
        for i in range(depth):
            mean_ch = enc_feats[i] if i > 0 else 0
            flops += 2 * (g_in + mean_ch) * gte_out[i]
            g_in = gte_out[i]
        for i in range(depth):
            flops += 2 * (g_in + dec_feats[i]) * gtd_out[i]
            g_in = gtd_out[i]
        # Merge layers: Dense(global -> features) per block, negligible.
        for f in enc_feats[1:] + dec_feats:
            flops += 2 * g_in * f  # upper-bound-ish; < 0.01% of total

    return flops


def shading_flops(image_size: int, n_scenes: int = 9,
                  flops_per_pixel_scene: int = 400) -> int:
    """Rendering-loss shading estimate, batch 1: pred+gt under n_scenes.

    ~400 VPU flops per pixel per scene per SVBRDF covers the Cook-Torrance
    chain incl. rsqrt/log (ops/render_pallas.py:_shade_planes).
    """
    return 2 * n_scenes * image_size * image_size * flops_per_pixel_scene


def train_step_flops(batch: int = 8, image_size: int = 256,
                     folded_decoder: bool = True) -> int:
    """Model FLOPs of one mixed-loss train step (fwd + bwd = 3x fwd)."""
    fwd = generator_forward_flops(image_size, folded_decoder=folded_decoder)
    fwd += shading_flops(image_size)
    return 3 * fwd * batch


def mfu(step_seconds: float, batch: int = 8, image_size: int = 256,
        dtype: str = "bfloat16", folded_decoder: bool = True) -> float:
    """Model FLOPs utilization in [0, 1] against the v5e per-chip peak."""
    flops = train_step_flops(batch, image_size, folded_decoder)
    return flops / step_seconds / PEAK_FLOPS[dtype]
