"""Building-block layers for the SVBRDF U-Net, in Flax linen (NHWC).

Functional re-design of reference models.py:5-206. Differences from the
PyTorch original are layout (channels-last for TPU lane tiling) and
framework idiom (linen modules, explicit dropout RNG); the math — layer
plan, init distributions, pre-activation ordering, pre-norm channel-mean
taps into the global track — is contract-identical.

Init contract (reference models.py:10-26 LayerBootstrapping):
  conv kernels  ~ N(0, 0.02); no conv bias anywhere.
  enc/dec Dense ~ N(0, 0.01 * sqrt(1/fan_in)), no bias.
  global-track  ~ N(0, 1.00 * sqrt(1/fan_in)), with zero-init bias.

A `dtype` attribute selects the compute dtype (bf16 on TPU); params and
normalization statistics stay f32.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def conv_kernel_init(scale: float = 0.02):
    """N(0, scale) conv kernel init. Reference models.py:23-24."""
    return nn.initializers.normal(stddev=scale)


def fanin_linear_init(scale: float):
    """N(0, scale * sqrt(1/fan_in)) dense kernel init. Reference models.py:19-20."""

    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0]  # linen Dense kernel is (in_features, out_features)
        std = scale * (1.0 / fan_in) ** 0.5
        return std * jax.random.normal(key, shape, dtype)

    return init


ENCDEC_LINEAR_INIT = fanin_linear_init(0.01)
GLOBAL_TRACK_INIT = fanin_linear_init(1.0)


class InstanceNorm(nn.Module):
    """Per-sample, per-channel normalization over H, W with affine params.

    Matches torch InstanceNorm2d(C, eps=1e-5, affine=True) as used in
    reference models.py:61 — biased variance, scale init 1, bias init 0,
    no running stats. Statistics are computed in f32 regardless of the
    compute dtype.
    """

    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,),
                          jnp.float32)
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(-3, -2), keepdims=True)
        var = jnp.var(x32, axis=(-3, -2), keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * scale + bias
        return y.astype(self.dtype)


class Merge(nn.Module):
    """Project the global-track vector and broadcast-add onto the feature map.

    Reference models.py:30-46 (MergeLayer).
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, global_track: Optional[jnp.ndarray]):
        if global_track is None:
            return x
        g = nn.Dense(self.features, use_bias=False,
                     kernel_init=ENCDEC_LINEAR_INIT, dtype=self.dtype,
                     name="fc")(global_track)
        return x + g[..., None, None, :]


class GlobalTrack(nn.Module):
    """FC + SELU over concat(global, channel-mean). Reference models.py:184-206."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, local_mean, global_track: Optional[jnp.ndarray]):
        h = (local_mean if global_track is None
             else jnp.concatenate([global_track, local_mean], axis=-1))
        h = nn.Dense(self.features, use_bias=True,
                     kernel_init=GLOBAL_TRACK_INIT,
                     bias_init=nn.initializers.zeros, dtype=self.dtype,
                     name="fc")(h)
        return jax.nn.selu(h)


def _spatial_mean(x):
    """Channel means over H, W (pre-norm global-track tap), f32.

    Reference models.py:73 (torch.mean over dims 2,3 in NCHW).
    """
    return jnp.mean(x.astype(jnp.float32), axis=(-3, -2))


class EncodingBlock(nn.Module):
    """Pre-LeakyReLU + stride-2 4x4 conv + pre-norm mean tap + IN + merge.

    Reference models.py:48-102 (InterconnectedConvLayer + EncodingLayer).
    Returns (features, channel_mean).
    """

    features: int
    use_norm: bool = True
    use_activation: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, global_track):
        if self.use_activation:
            x = nn.leaky_relu(x, negative_slope=0.2)
        x = nn.Conv(self.features, (4, 4), strides=(2, 2),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    kernel_init=conv_kernel_init(), dtype=self.dtype,
                    name="conv")(x)
        mean = _spatial_mean(x)
        if self.use_norm:
            x = InstanceNorm(dtype=self.dtype, name="norm")(x)
        x = Merge(self.features, dtype=self.dtype, name="merge")(
            x, global_track)
        return x, mean


def upsample_nearest_2x(x):
    """Nearest-neighbor 2x upsampling in NHWC (pixel replication).

    Matches torch nn.UpsamplingNearest2d(scale_factor=2), reference
    models.py:120.
    """
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def _pad_1212(x):
    """Zero pad (top 1, bottom 2, left 1, right 2).

    Matches torch ZeroPad2d((1, 2, 1, 2)) = (left, right, top, bottom),
    reference models.py:121,123.
    """
    return jnp.pad(x, ((0, 0), (1, 2), (1, 2), (0, 0)))


class DecodingBlock(nn.Module):
    """Skip-concat + pre-act + nearest-up + (pad+4x4 conv) x2 + IN + merge
    + optional dropout. Reference models.py:104-140 (DecodingLayer).

    Returns (features, channel_mean). Dropout (p=0.5) only when
    `deterministic=False` (rng collection 'dropout').
    """

    features: int
    use_norm: bool = True
    use_dropout: bool = False
    use_activation: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip, global_track, deterministic: bool = True):
        if skip is not None:
            x = jnp.concatenate([x, skip], axis=-1)
        if self.use_activation:
            x = nn.leaky_relu(x, negative_slope=0.2)
        x = upsample_nearest_2x(x)
        x = _pad_1212(x)
        x = nn.Conv(self.features, (4, 4), padding="VALID", use_bias=False,
                    kernel_init=conv_kernel_init(), dtype=self.dtype,
                    name="conv1")(x)
        x = _pad_1212(x)
        x = nn.Conv(self.features, (4, 4), padding="VALID", use_bias=False,
                    kernel_init=conv_kernel_init(), dtype=self.dtype,
                    name="conv2")(x)
        mean = _spatial_mean(x)
        if self.use_norm:
            x = InstanceNorm(dtype=self.dtype, name="norm")(x)
        x = Merge(self.features, dtype=self.dtype, name="merge")(
            x, global_track)
        if self.use_dropout:
            x = nn.Dropout(rate=0.5, deterministic=deterministic)(x)
        return x, mean


class ConvFeatureBlock(nn.Module):
    """3x3 stride-1 feature conv variant (multi-view fusion head).

    Reference models.py:142-161 (ConvFeatureLayer).
    """

    features: int
    use_norm: bool = True
    use_activation: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, global_track):
        if self.use_activation:
            x = nn.leaky_relu(x, negative_slope=0.2)
        x = nn.Conv(self.features, (3, 3), strides=(1, 1),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    kernel_init=conv_kernel_init(), dtype=self.dtype,
                    name="conv")(x)
        mean = _spatial_mean(x)
        if self.use_norm:
            x = InstanceNorm(dtype=self.dtype, name="norm")(x)
        x = Merge(self.features, dtype=self.dtype, name="merge")(
            x, global_track)
        return x, mean


def append_coords(x):
    """Append x/y coordinate channels in [-1, 1]. Reference models.py:163-182.

    x over the width axis; y = +1 at row 0 decreasing to -1 (same sign
    convention as the renderer's patch grid, reference renderers.py:73-76).
    """
    b, h, w, _ = x.shape
    xs = jnp.linspace(-1.0, 1.0, w, dtype=x.dtype)
    ys = -jnp.linspace(-1.0, 1.0, h, dtype=x.dtype)
    xg = jnp.broadcast_to(xs[None, :], (h, w))
    yg = jnp.broadcast_to(ys[:, None], (h, w))
    coords = jnp.stack([xg, yg], axis=-1)
    coords = jnp.broadcast_to(coords[None], (b, h, w, 2))
    return jnp.concatenate([x, coords], axis=-1)
