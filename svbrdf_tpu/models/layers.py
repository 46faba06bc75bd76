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

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
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


def derived_kernel(module: nn.Module, name: str, compute_fn):
    """Step-carried transformed conv kernels (the 'derived' collection).

    The decoder re-expresses its upsample+conv kernels in transformed
    layouts (dilated 5x5 / phase-folded 3x3); computing the transform
    inline re-materializes it EVERY step and XLA stages the fresh tensor
    into the conv's preferred layout with per-step relayout copies. The
    train step instead carries the transformed kernels as donated state
    (parallel/step.py: derive_model_kernels), recomputed once per
    optimizer update in the epilogue, so the convs read them in a stable
    AUTO layout. Three modes, decided by the caller's apply():
      - 'derived' collection provided (train hot path): read, skip the
        transform entirely;
      - mutable 'derived' (derive_model_kernels): compute AND record;
      - neither (eval/predict/init): compute inline, exactly as before.
    """
    if module.has_variable("derived", name):
        return module.get_variable("derived", name)
    kt = compute_fn()
    if (not module.is_initializing()
            and module.is_mutable_collection("derived")):
        module.put_variable("derived", name, kt)
    return kt


class InstanceNorm(nn.Module):
    """Per-sample, per-channel normalization over H, W with affine params.

    Matches torch InstanceNorm2d(C, eps=1e-5, affine=True) as used in
    reference models.py:61 — biased variance, scale init 1, bias init 0,
    no running stats. Statistics are computed in f32 regardless of the
    compute dtype.
    """

    eps: float = 1e-5
    dtype: Any = jnp.float32
    # phases > 1: x is a phase-major space-to-depth rep (B, h, w, phases*C);
    # statistics run per TRUE channel over (h, w, phases) — identical math
    # to normalizing the spatial tensor.
    phases: int = 1

    @nn.compact
    def __call__(self, x):
        if self.phases > 1:
            b, h, w, pc = x.shape
            features = pc // self.phases
            scale = self.param("scale", nn.initializers.ones, (features,),
                               jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (features,),
                              jnp.float32)
            x32 = x.astype(jnp.float32).reshape(b, h, w, self.phases,
                                                features)
            mean = jnp.mean(x32, axis=(1, 2, 3), keepdims=True)
            mean_sq = jnp.mean(jnp.square(x32), axis=(1, 2, 3),
                               keepdims=True)
            var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
            y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
            y = y * scale + bias
            return y.reshape(b, h, w, pc).astype(self.dtype)
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,),
                          jnp.float32)
        x32 = x.astype(jnp.float32)
        # Single-pass statistics: E[x^2] - E[x]^2 lets XLA fuse both
        # reductions into ONE read of x (jnp.var's two-pass form reads it
        # twice); cancellation is benign at activation scales, matching
        # cuDNN's own one-pass InstanceNorm.
        mean = jnp.mean(x32, axis=(-3, -2), keepdims=True)
        mean_sq = jnp.mean(jnp.square(x32), axis=(-3, -2), keepdims=True)
        var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * scale + bias
        return y.astype(self.dtype)


class Merge(nn.Module):
    """Project the global-track vector and broadcast-add onto the feature map.

    Reference models.py:30-46 (MergeLayer). `phases > 1` tiles the projected
    vector across a phase-major space-to-depth channel layout
    (see PhaseDecodingBlock) — same math, different data layout.
    """

    features: int
    dtype: Any = jnp.float32
    phases: int = 1

    @nn.compact
    def __call__(self, x, global_track: Optional[jnp.ndarray]):
        if global_track is None:
            return x
        g = nn.Dense(self.features, use_bias=False,
                     kernel_init=ENCDEC_LINEAR_INIT, dtype=self.dtype,
                     name="fc")(global_track)
        if self.phases > 1:
            g = jnp.tile(g, (1,) * (g.ndim - 1) + (self.phases,))
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


# Tap-folding matrices for the upsample-aware decoder conv. A 4-tap conv
# over a nearest-2x-upsampled, (1, 2)-padded signal reads at most 3 distinct
# LOW-res pixels per output; which taps collapse onto the same source pixel
# depends only on the output parity:
#   even rows u=2v: sources {v-1: k0, v: k1+k2, v+1: k3}
#   odd  rows u=2v+1: sources {v: k0+k1, v+1: k2+k3}
# (and identically over columns), including the zero-pad boundaries, which
# map exactly onto a 3-tap conv with padding 1 on the low-res signal.
_FOLD_EVEN = np.array([[1, 0, 0, 0], [0, 1, 1, 0], [0, 0, 0, 1]], np.float32)
_FOLD_ODD = np.array([[0, 0, 0, 0], [1, 1, 0, 0], [0, 0, 1, 1]], np.float32)


def fold_upsample_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """(4, 4, Cin, Cout) kernel -> (3, 3, Cin, 4*Cout) phase-stacked kernel.

    Output channel layout is (row_phase, col_phase, cout) flattened, matching
    the depth-to-space unpacking in FoldedUpConv.
    """
    phases = [jnp.einsum("pi,ijcd,qj->pqcd", ma, k, mb)
              for ma in (_FOLD_EVEN, _FOLD_ODD)
              for mb in (_FOLD_EVEN, _FOLD_ODD)]
    kp = jnp.stack(phases, axis=-2)  # (3, 3, Cin, 4, Cout)
    return kp.reshape(kp.shape[:3] + (4 * k.shape[3],))


def dilate_upsample_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """(4, 4, Cin, Cout) kernel -> (5, 5, Cin, Cout) for the lhs-dilated form.

    nearest-2x upsample = conv(zero-dilate(x, 2), ones(2, 2)), so the whole
    upsample+conv chain is one conv over the dilated input with
    K5 = K (*) ones(2, 2) (full 2D convolution = sum of 4 shifted copies).

    Expressed as four shifted PADS summed (not .at[].add accumulation):
    the pads fuse with the adds into ONE pass over the 5x5 output, where
    the scatter-add form lowers to 4 sequential full-tensor
    dynamic-update-slice passes (measured 0.46 ms/step on the three
    (4,4,1024,512) decoder kernels on v5e). Addition order matches the
    scatter form exactly (bitwise-identical results).
    """
    tail = ((0, 0),) * (k.ndim - 2)
    return (jnp.pad(k, ((0, 1), (0, 1)) + tail)
            + jnp.pad(k, ((0, 1), (1, 0)) + tail)
            + jnp.pad(k, ((1, 0), (0, 1)) + tail)
            + jnp.pad(k, ((1, 0), (1, 0)) + tail))


_DILATED_DN = ("NHWC", "HWIO", "NHWC")


@jax.custom_vjp
def _upconv_dilated_direct(x, k4, k5):
    """lhs-dilated upconv whose BACKWARD computes the 4x4 kernel gradient
    DIRECTLY, skipping the 5x5 intermediate.

    Forward: identical to the plain dilated conv (reads the carried k5).
    Backward:
      - dx: the standard transpose of the dilated conv (bitwise-identical
        to autodiff of the forward).
      - dk4: autodiff of the 5x5 form emits a (5,5,Cin,Cout) wgrad, a
        kernel reverse, and a 5x5 -> 4x4 slice-sum — at the DEEP decoder
        levels those kernels are 13-26 MB while the activations are tiny,
        so the kernel-shaped HBM traffic dominates the whole level
        (measured ~0.2 ms/step across dec8-dec5 at 256^2 on v5e). Here
        dk4 is the wgrad of the NAIVE upsample+pad+conv form over the
        materialized upsampled input (< 6 MB at these levels): one conv,
        16/25 the gradient bytes, no reverse, no reduction. Same chain
        rule, different summation order (float-level, not value-level,
        difference from the autodiff path).
      - dk5: zero (k5 is derived state; its cotangent is routed via dk4).

    Only used when the input spatial extent is at or below
    SVBRDF_UPCONV_WGRAD_MAX (default 8) — at larger levels the upsampled
    intermediate outweighs the kernel traffic (see FoldedUpConv).
    """
    return jax.lax.conv_general_dilated(
        x, k5, window_strides=(1, 1), padding=((2, 3), (2, 3)),
        lhs_dilation=(2, 2), dimension_numbers=_DILATED_DN)


def _upconv_dilated_direct_fwd(x, k4, k5):
    return _upconv_dilated_direct(x, k4, k5), (x, k4, k5)


def _upconv_dilated_direct_bwd(res, g):
    x, k4, k5 = res
    _, vjp_x = jax.vjp(
        lambda xx: jax.lax.conv_general_dilated(
            xx, k5, window_strides=(1, 1), padding=((2, 3), (2, 3)),
            lhs_dilation=(2, 2), dimension_numbers=_DILATED_DN), x)
    dx, = vjp_x(g)
    xup = _pad_1212(upsample_nearest_2x(x))
    _, vjp_k = jax.vjp(
        lambda kk: jax.lax.conv_general_dilated(
            xup, kk, window_strides=(1, 1), padding="VALID",
            dimension_numbers=_DILATED_DN), k4)
    dk4, = vjp_k(g)
    return dx, dk4, jnp.zeros_like(k5)


_upconv_dilated_direct.defvjp(_upconv_dilated_direct_fwd,
                              _upconv_dilated_direct_bwd)


# Implementation selector for the decoder's upsample+conv (benchmarked on
# v5e; all variants are mathematically identical — tests pin equivalence):
#   'auto':    DEFAULT. Per-level: 'naive' when the level's input spatial
#              extent is at or below SVBRDF_UPCONV_AUTO_MAX (default 4),
#              'dilated' above. Rationale (v5e profile): the dilated form
#              pays a PER-KERNEL cost every step — materializing the 5x5
#              kernel from the 4x4 param, dgrad's reverse of it, the
#              5x5 -> 4x4 gradient reduction, and staging copies of the
#              4-6.5 MB transformed kernels — which at the deep decoder
#              levels (1024x512 kernels, <= 8^2 outputs) dwarfs the conv
#              itself, while the 4x-sized upsampled intermediate 'naive'
#              avoids is negligible at those sizes. Same parameters either
#              way. AUTO_MAX measured at 256^2/b8: 4 -> 10.03 ms (twice),
#              2 -> 10.15, 8 -> 10.10, all-dilated -> 10.25.
#   'dilated': ONE lhs-dilated conv (dgrad-shaped; no upsampled
#              intermediate, no extra copies) at EVERY level — fastest
#              single-impl form (14.7 ms step vs fold 17.8 / naive 16.9
#              measured round 2). NOT spatial-SPMD-safe: XLA's partitioner
#              mishandles lhs_dilation + asymmetric padding when the H
#              axis is sharded (measured 5e-2 output error on a 4-device
#              mesh). Batch-axis sharding (the training layout) is
#              unaffected.
#   'fold':    3x3 low-res conv with phase-stacked kernels +
#              depth-to-space. Bit-exact under spatial SPMD
#              (tests/test_spatial_sharding.py) — REQUIRED when sharding
#              H/W across devices; pass upconv='fold' to the model.
#   'naive':   materialized upsample + pad + 4x4 conv (reference shape).
UPCONV_IMPL = os.environ.get("SVBRDF_UPCONV", "auto")


class FoldedUpConv(nn.Module):
    """nearest-2x upsample + ZeroPad2d(1,2,1,2) + 4x4 VALID conv as a single
    equivalent convolution (reference decoder chain, models.py:119-123).

    Two algebraic rewrites are available (see UPCONV_IMPL): an lhs-dilated
    5x5 conv (the transposed-conv/dgrad shape XLA:TPU has fast paths for)
    and a phase-folded 3x3 low-res conv + depth-to-space (16/9 fewer MACs).
    Both avoid materializing the 4x-sized upsampled intermediate in HBM and
    are exact up to float reassociation of pre-summed kernel taps. The
    parameter keeps the ORIGINAL (4, 4, Cin, Cout) layout under the same
    'kernel' name, so checkpoints, init statistics and the torch interop
    are unaffected.
    """

    features: int
    dtype: Any = jnp.float32
    impl: str = ""  # '' = module default (UPCONV_IMPL)

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        k = self.param("kernel", conv_kernel_init(),
                       (4, 4, cin, self.features), jnp.float32)
        impl = self.impl or UPCONV_IMPL
        if impl == "auto":
            small_max = int(os.environ.get("SVBRDF_UPCONV_AUTO_MAX", "4"))
            small_impl = os.environ.get("SVBRDF_UPCONV_SMALL", "naive")
            impl = small_impl if x.shape[1] <= small_max else "dilated"
        if impl == "dilated":
            k5 = derived_kernel(
                self, "kernel_t",
                lambda: dilate_upsample_kernel(k).astype(self.dtype))
            # Threshold measured on v5e at 256^2/b8: 4 (dec8-dec6) beats 8
            # (10.26 vs 10.39 ms) — at dec5 the 19x19x1024 upsampled
            # intermediate already outweighs the 13 MB kernel traffic.
            wgrad_max = int(os.environ.get("SVBRDF_UPCONV_WGRAD_MAX", "4"))
            if x.shape[1] <= wgrad_max:
                return _upconv_dilated_direct(
                    x.astype(self.dtype), k.astype(self.dtype), k5)
            return jax.lax.conv_general_dilated(
                x.astype(self.dtype), k5, window_strides=(1, 1),
                padding=((2, 3), (2, 3)), lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if impl == "fold":
            kf = derived_kernel(
                self, "kernel_t",
                lambda: fold_upsample_kernel(k).astype(self.dtype))
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kf, window_strides=(1, 1),
                padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return phase_to_space(y, self.features)
        if impl == "naive":
            h = _pad_1212(upsample_nearest_2x(x.astype(self.dtype)))
            return jax.lax.conv_general_dilated(
                h, k.astype(self.dtype), window_strides=(1, 1),
                padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        raise ValueError(f"unknown SVBRDF_UPCONV '{impl}'")


class DecodingBlock(nn.Module):
    """Skip-concat + pre-act + nearest-up + (pad+4x4 conv) x2 + IN + merge
    + optional dropout. Reference models.py:104-140 (DecodingLayer).

    The first (upsample + pad + conv) is computed as a folded low-res conv
    (FoldedUpConv) — same math, 16/9 fewer MACs, no upsampled intermediate.

    Returns (features, channel_mean). Dropout (p=0.5) only when
    `deterministic=False` (rng collection 'dropout').
    """

    features: int
    use_norm: bool = True
    use_dropout: bool = False
    use_activation: bool = True
    dtype: Any = jnp.float32
    upconv: str = ""  # FoldedUpConv impl override ('' = UPCONV_IMPL)

    @nn.compact
    def __call__(self, x, skip, global_track, deterministic: bool = True):
        if skip is not None:
            x = jnp.concatenate([x, skip], axis=-1)
        if self.use_activation:
            x = nn.leaky_relu(x, negative_slope=0.2)
        x = FoldedUpConv(self.features, dtype=self.dtype, impl=self.upconv,
                         name="conv1")(x)
        # ZeroPad2d(1,2,1,2) + VALID conv expressed as the conv's own
        # asymmetric padding — identical math (reference models.py:121-123),
        # but XLA:TPU handles in-conv padding for free while an explicit
        # pad materializes a misaligned 131^2 intermediate (measured
        # 0.37 ms at 23% MXU on the dec2 level).
        x = nn.Conv(self.features, (4, 4), padding=((1, 2), (1, 2)),
                    use_bias=False,
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


# --- Phase-space (space-to-depth) decoder tail -----------------------------
#
# The final decoder level works on 9-channel tensors at full resolution;
# XLA:TPU lays those out channel-minor and pads the lane dimension 9 -> 128,
# a 14x memory blowup that made dec1 the single hottest step component
# (~3.4 ms of a ~20 ms step). The fix: keep the last level's data in a
# phase-major space-to-depth layout (B, H/2, W/2, 4*C) — 36 channels at a
# quarter the area — and only unpack to (B, H, W, C) once at the very end.
# Both convs of the level have exact algebraic equivalents in that layout.

# Per-dimension tap mapping for the phase-space form of the second 4x4 conv:
# output parity a and kernel tap i read source phase c at 3-tap position P.
# Derived from out[2v+a] = sum_i K[i] * up[2v+a+i-1], up[2p+c] = phase c at p.
_PHASE_TAP = {
    0: [(1, 0), (0, 1), (1, 1), (0, 2)],  # a=0: t=a+i-1 in {-1,0,1,2}
    1: [(0, 1), (1, 1), (0, 2), (1, 2)],  # a=1: t in {0,1,2,3}
}

# Same idea for a 3-TAP (pad-1) conv whose INPUT arrives in phase form:
# out[2V+e] = sum_P K[P] * x[2V+e+P-1]; with x[2V'+c] = phase c at V',
# tap t = e+P-1 maps to (c = t mod 2, D = floor(t/2) + 1).
_PHASE_TAP3 = {
    0: [(1, 0), (0, 1), (1, 1)],  # e=0: t in {-1, 0, 1}
    1: [(0, 1), (1, 1), (0, 2)],  # e=1: t in {0, 1, 2}
}


def phase_conv_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """(4, 4, C, F) kernel of a pad(1,2)+4x4 conv on the UPSAMPLED grid ->
    (3, 3, 4C, 4F) kernel of the equivalent conv on phase-major
    space-to-depth data (channel layout (row_phase, col_phase, channel))."""
    kh, kw, c, f = k.shape
    kp = jnp.zeros((3, 3, 2, 2, c, 2, 2, f), k.dtype)
    for a in (0, 1):
        for i in range(4):
            ci, p = _PHASE_TAP[a][i]
            for b in (0, 1):
                for j in range(4):
                    dj, q = _PHASE_TAP[b][j]
                    kp = kp.at[p, q, ci, dj, :, a, b, :].add(k[i, j])
    return kp.reshape(3, 3, 4 * c, 4 * f)


def phase_input_kernel(k3: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, C, F) pad-1 conv kernel -> (3, 3, 4C, 4F) kernel consuming
    phase-major input and emitting phase-major output (the conv's own
    output parity becomes the outer phase of the result)."""
    _, _, c, f = k3.shape
    kp = jnp.zeros((3, 3, 2, 2, c, 2, 2, f), k3.dtype)
    for e in (0, 1):
        for p in range(3):
            ci, dpos = _PHASE_TAP3[e][p]
            for f_ph in (0, 1):
                for q in range(3):
                    dj, epos = _PHASE_TAP3[f_ph][q]
                    kp = kp.at[dpos, epos, ci, dj, :, e, f_ph, :].add(
                        k3[p, q])
    return kp.reshape(3, 3, 4 * c, 4 * f)


def phase_to_space(y: jnp.ndarray, features: int) -> jnp.ndarray:
    """(B, h, w, 4*F) phase-major rep -> (B, 2h, 2w, F) spatial tensor."""
    b, h, w, _ = y.shape
    y = y.reshape(b, h, w, 2, 2, features)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, features)


def space_to_phase(x: jnp.ndarray) -> jnp.ndarray:
    """(B, 2h, 2w, C) spatial tensor -> (B, h, w, 4*C) phase-major rep
    (inverse of phase_to_space)."""
    b, h2, w2, c = x.shape
    x = x.reshape(b, h2 // 2, 2, w2 // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, h2 // 2, w2 // 2, 4 * c)


def phase_concat(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Channel-concat of two phase-major reps so the result is the phase
    rep of the SPATIAL concat: interleave per phase, not per block."""
    b, h, w, cx = x.shape
    cy = y.shape[-1]
    out = jnp.concatenate([x.reshape(b, h, w, 4, cx // 4),
                           y.reshape(b, h, w, 4, cy // 4)], axis=-1)
    return out.reshape(b, h, w, cx + cy)


class _Kernel(nn.Module):
    """Bare conv-kernel parameter holder; mirrors nn.Conv's param path
    (<name>/kernel) so phase-space blocks stay checkpoint-compatible."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", conv_kernel_init(), self.shape,
                          jnp.float32)


class PhaseDecodingBlock(nn.Module):
    """A decoder block computed entirely in phase space.

    Semantics identical to DecodingBlock(use_dropout=False) — but the
    output stays in the (B, H/2, W/2, 4*features) phase-major layout;
    callers unpack with phase_to_space (or keep processing per-phase:
    norms, merges, tanh/decode are all phase-safe). Parameter tree is
    identical to DecodingBlock's (conv1/kernel, conv2/kernel, norm,
    merge/fc/kernel), so checkpoints and the torch interop are unaffected.

    phase_input=True consumes a phase-major input (the previous decoder
    block also ran in phase space); the skip (always spatial, from the
    encoder) is space-to-depth'd and interleave-concatenated. conv1 then
    runs at the SAME grid with 4x the channels — identical MACs, no
    narrow-lane tensors anywhere.

    Returns (phase_rep, channel_mean).
    """

    features: int
    use_norm: bool = False
    phase_input: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip, global_track):
        if skip is not None:
            skip = space_to_phase(skip) if self.phase_input else skip
            x = (phase_concat(x, skip) if self.phase_input
                 else jnp.concatenate([x, skip], axis=-1))
        x = nn.leaky_relu(x, negative_slope=0.2)
        f = self.features
        if self.phase_input:
            cin = x.shape[-1] // 4
            k1 = _Kernel((4, 4, cin, f), name="conv1")()
            # folded 3x3 conv, then re-expressed for phase-major input;
            # output phases are (outer spatial parity, inner conv1 phase).
            kk = derived_kernel(
                self, "conv1_t",
                lambda: phase_input_kernel(
                    fold_upsample_kernel(k1)).astype(self.dtype))
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kk,
                window_strides=(1, 1), padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            # Unpack the OUTER phase level: (B, h, w, 4*(4f)) -> spatial
            # (B, 2h, 2w, 4f), which is the standard phase rep for conv2.
            y = phase_to_space(y, 4 * f)
        else:
            cin = x.shape[-1]
            # conv1: upsample+pad+4x4 == folded 3x3 conv emitting phases.
            k1 = _Kernel((4, 4, cin, f), name="conv1")()
            kk = derived_kernel(
                self, "conv1_t",
                lambda: fold_upsample_kernel(k1).astype(self.dtype))
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kk,
                window_strides=(1, 1), padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        # conv2: pad(1,2)+4x4 on the upsampled grid == 3x3 conv in phase space.
        k2 = _Kernel((4, 4, f, f), name="conv2")()
        k2t = derived_kernel(
            self, "conv2_t",
            lambda: phase_conv_kernel(k2).astype(self.dtype))
        y = jax.lax.conv_general_dilated(
            y, k2t,
            window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        # Pre-norm channel-mean tap: per TRUE channel over (H, W, phases).
        b, h, w, _ = y.shape
        mean = jnp.mean(y.astype(jnp.float32).reshape(b, h, w, 4, f),
                        axis=(1, 2, 3))
        if self.use_norm:
            y = InstanceNorm(dtype=self.dtype, phases=4, name="norm")(y)
        y = Merge(f, dtype=self.dtype, phases=4, name="merge")(
            y, global_track)
        return y, mean


class PhaseConvFeatureBlock(nn.Module):
    """ConvFeatureBlock on phase-major data (multi-view fusion head).

    A plain 3x3 stride-1 conv re-expressed for phase-major input/output
    via phase_input_kernel — the tap mapping is DENSE (6 entries into 6
    slots per dimension), so unlike the 4x4 phase conv there is no MAC
    overhead; the win is pure layout (the head's 32- and 9-channel
    full-resolution tensors lane-pad 4x/14x in spatial form). Parameter
    tree matches ConvFeatureBlock (conv/kernel, norm, merge/fc).
    Returns (phase_rep, channel_mean).
    """

    features: int
    use_norm: bool = True
    use_activation: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, global_track):
        if self.use_activation:
            x = nn.leaky_relu(x, negative_slope=0.2)
        cin = x.shape[-1] // 4
        f = self.features
        k = _Kernel((3, 3, cin, f), name="conv")()
        kt = derived_kernel(
            self, "conv_t",
            lambda: phase_input_kernel(k).astype(self.dtype))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kt,
            window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        b, h, w, _ = y.shape
        mean = jnp.mean(y.astype(jnp.float32).reshape(b, h, w, 4, f),
                        axis=(1, 2, 3))
        if self.use_norm:
            y = InstanceNorm(dtype=self.dtype, phases=4, name="norm")(y)
        y = Merge(f, dtype=self.dtype, phases=4, name="merge")(
            y, global_track)
        return y, mean


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
