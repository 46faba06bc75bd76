"""Pallas TPU kernel: fused rendering loss (render x 2 -> log-L1 -> reduce).

The rendering loss shades pred & gt SVBRDFs under S scenes per batch item
(reference losses.py:21-52; 2 x S x B full-image renders per step). The jnp
path materializes (B, S, H, W, 3) radiance tensors in HBM twice; this kernel
never materializes them: each grid program loads one (12, TH, W) SVBRDF
tile pair into VMEM, shades all S scenes in registers/VMEM, and emits only
the per-tile sum of |log(r_p + eps) - log(r_t + eps)|. Under autodiff, a
single fused value+gradient kernel (_fwdgrad_kernel) shades each side ONCE
per scene and emits the loss partials AND the hand-derived SVBRDF-plane
gradients (pre-scaled by 1/count); the custom-VJP backward is then just a
scalar scale that XLA fuses into the consumer — no re-shading backward
pass at all. Outside autodiff (eval), the value-only kernel runs. The hand
VJP (_side_bwd) is pinned against the jnp composition's autodiff by tests.
HBM traffic stays O(svbrdf), not O(renders).

Layout: SVBRDFs are transposed to channel-planes (B, 12, H, W) so each
(TH, W) plane puts image width on the TPU lane dimension (W=256 -> two
full 128-lane tiles); all shading math is elementwise VPU work on planes.

Physics contract is identical to ops/render.py (Cook-Torrance GGX + Schlick
Fresnel + Smith G1 product, clamps at 1e-3; reference renderers.py:14-104);
tests assert value/grad equality against the jnp composition.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from svbrdf_tpu.scene import Scene

_PI = math.pi
EPSILON_RENDER = 0.1   # log-space epsilon, reference losses.py:46
EPSILON_L1 = 0.01      # log-space epsilon for diffuse/specular, losses.py:13
_EPS = 0.001

import os

DEFAULT_TILE_H = int(os.environ.get("SVBRDF_LOSS_TILE_H", "16"))


def pack_scenes(scenes: Scene) -> jnp.ndarray:
    """Scene pytree (B, S, 3) fields -> packed (B, S, 9) [cam|light|color]."""
    return jnp.concatenate(
        [scenes.camera_pos, scenes.light_pos, scenes.light_color],
        axis=-1).astype(jnp.float32)


def _scene_geometry(cam, light, x, y):
    """Per-scene, SVBRDF-independent geometry of one tile.

    Returns (v, l, h, dist_sq, VH-terms) shared by the pred and gt shades
    of the same scene — computing it once halves the vector-normalization
    work per scene pair.
    """
    vx = cam[0] - x
    vy = cam[1] - y
    vz = cam[2] - jnp.zeros_like(x)
    inv_v = jax.lax.rsqrt(vx * vx + vy * vy + vz * vz)
    vx, vy, vz = vx * inv_v, vy * inv_v, vz * inv_v

    lx = light[0] - x
    ly = light[1] - y
    lz = light[2] - jnp.zeros_like(x)
    dist_sq = lx * lx + ly * ly + lz * lz
    inv_l = jax.lax.rsqrt(dist_sq)
    lx, ly, lz = lx * inv_l, ly * inv_l, lz * inv_l

    hx, hy, hz = (vx + lx) * 0.5, (vy + ly) * 0.5, (vz + lz) * 0.5
    inv_h = jax.lax.rsqrt(hx * hx + hy * hy + hz * hz)
    hx, hy, hz = hx * inv_h, hy * inv_h, hz * inv_h

    VH = jnp.maximum(vx * hx + vy * hy + vz * hz, _EPS)
    LH = jnp.maximum(lx * hx + ly * hy + lz * hz, _EPS)
    one_minus_vh5 = (1.0 - VH) ** 5
    return ((vx, vy, vz), (lx, ly, lz), (hx, hy, hz), dist_sq,
            VH, LH, one_minus_vh5)


def _shade_planes(planes, geom, color):
    """Cook-Torrance shade of one SVBRDF tile under one point-light scene.

    planes: (12, TH, W) channel planes; geom: precomputed _scene_geometry;
    color: length-3 vector. Returns 3 radiance planes (3, TH, W).
    Same math as ops/render.py:render (reference renderers.py:67-104).
    """
    ((vx, vy, vz), (lx, ly, lz), (hx, hy, hz), dist_sq, VH, LH,
     one_minus_vh5) = geom
    nx, ny, nz = planes[0], planes[1], planes[2]

    def cdot(ax, ay, az, bx, by, bz):
        return jnp.maximum(ax * bx + ay * by + az * bz, _EPS)

    NH = cdot(nx, ny, nz, hx, hy, hz)
    VN = cdot(vx, vy, vz, nx, ny, nz)
    LN = cdot(lx, ly, lz, nx, ny, nz)

    NH_sq = NH * NH
    ln_pos = jnp.maximum(lx * nx + ly * ny + lz * nz, 0.0)
    scale = ln_pos / dist_sq  # cos * falloff

    out = []
    for c in range(3):
        albedo = planes[3 + c]
        spec = planes[9 + c]
        # Roughness is per color channel in the reference renderer
        # (3-channel roughness map, reference renderers.py:84-87) — the
        # channels usually replicate, but gradients must flow per channel.
        rough = jnp.maximum(planes[6 + c], _EPS)
        alpha_sq = rough ** 4

        # GGX D with chi+ and clamped denominator (renderers.py:22-27).
        denom = jnp.maximum(NH_sq * (alpha_sq + (1.0 - NH_sq) / NH_sq),
                            _EPS)
        chi = (NH > 0.0).astype(NH.dtype)
        D = alpha_sq * chi / (_PI * denom * denom)

        # Smith-style G1 product (renderers.py:34-41).
        def g1(XH, XN):
            XN_sq = XN * XN
            chi_x = (XH / XN > 0.0).astype(XH.dtype)
            return 2.0 * chi_x / (
                1.0 + jnp.sqrt(1.0 + alpha_sq * (1.0 - XN_sq) / XN_sq))

        G = g1(VH, VN) * g1(LH, LN)
        spec_base = G * D / (4.0 * VN * LN)

        F = spec + (1.0 - spec) * one_minus_vh5  # Schlick
        f = (1.0 - F) * albedo / _PI + F * spec_base
        out.append(f * color[c] * scale)
    return out


# --- Hand-derived backward pass ---------------------------------------------
#
# The backward kernels originally differentiated _scene_loss_sum with
# in-kernel jax.grad (~3x the forward's work after Mosaic scheduling); the
# manual VJP below computes the same gradients from a single primal pass
# per side with explicit reuse of the shared factors (geometry, D/G terms,
# per-channel F), targeting ~2x forward. Tests pin it to the jnp
# composition's autodiff at 2e-4 (tests/test_render_pallas.py), which is
# the same oracle the autodiff kernels were pinned to.
#
# Derivative conventions at the clamp boundaries match jnp/jax autodiff on
# the same expressions: d max(x, k)/dx = [x >= k] (ties are measure-zero
# on real data), chi+ factors are boolean casts treated as constants.


def _shade_side(planes, geom, color):
    """One side's primal shade + the per-channel intermediates its manual
    backward needs. Returns (outs, raw_dots, shared, per_channel)."""
    ((vx, vy, vz), (lx, ly, lz), (hx, hy, hz), dist_sq, VH, LH,
     one_minus_vh5) = geom
    nx, ny, nz = planes[0], planes[1], planes[2]

    nh_raw = nx * hx + ny * hy + nz * hz
    vn_raw = vx * nx + vy * ny + vz * nz
    ln_raw = lx * nx + ly * ny + lz * nz
    NH = jnp.maximum(nh_raw, _EPS)
    VN = jnp.maximum(vn_raw, _EPS)
    LN = jnp.maximum(ln_raw, _EPS)
    NH_sq = NH * NH
    ln_pos = jnp.maximum(ln_raw, 0.0)
    scale = ln_pos / dist_sq

    outs, chans = [], []
    for c in range(3):
        albedo = planes[3 + c]
        spec = planes[9 + c]
        rough_raw = planes[6 + c]
        rough = jnp.maximum(rough_raw, _EPS)
        a = rough ** 4

        denom_raw = NH_sq * (a + (1.0 - NH_sq) / NH_sq)
        denom = jnp.maximum(denom_raw, _EPS)
        chi = (NH > 0.0).astype(NH.dtype)
        D = a * chi / (_PI * denom * denom)

        # g1(XH, XN) with XH/XN > 0 guaranteed by the clamps (chi_x == 1).
        tv = (1.0 - VN * VN) / (VN * VN)
        sv = jnp.sqrt(1.0 + a * tv)
        g1v = 2.0 / (1.0 + sv)
        tl = (1.0 - LN * LN) / (LN * LN)
        sl = jnp.sqrt(1.0 + a * tl)
        g1l = 2.0 / (1.0 + sl)
        G = g1v * g1l

        inv_4vnln = 1.0 / (4.0 * VN * LN)
        spec_base = G * D * inv_4vnln
        F = spec + (1.0 - spec) * one_minus_vh5
        f = (1.0 - F) * albedo / _PI + F * spec_base
        outs.append(f * color[c] * scale)
        chans.append((albedo, spec, rough_raw, rough, a, denom_raw, denom,
                      chi, D, tv, sv, g1v, tl, sl, g1l, G, inv_4vnln,
                      spec_base, F, f))
    shared = (NH, VN, LN, NH_sq, ln_pos, scale,
              (nh_raw, vn_raw, ln_raw), dist_sq)
    return outs, shared, chans


def _side_bwd(planes, geom, color, shared, chans, u):
    """Gradient of sum_c u[c] * out_c wrt one side's 12 planes.

    u: per-channel upstream cotangents (same shape as a plane). Returns the
    (12, TH, W) gradient stacked in plane order.
    """
    ((vx, vy, vz), (lx, ly, lz), (hx, hy, hz), dist_sq, VH, LH,
     one_minus_vh5) = geom
    (NH, VN, LN, NH_sq, ln_pos, scale,
     (nh_raw, vn_raw, ln_raw), _dist) = shared

    zero = jnp.zeros_like(NH)
    dalbedo, drough, dspec = [], [], []
    A_NH = zero
    A_VN = zero
    A_LN = zero
    A_lp = zero
    for c in range(3):
        (albedo, spec, rough_raw, rough, a, denom_raw, denom, chi, D,
         tv, sv, g1v, tl, sl, g1l, G, inv_4vnln, spec_base, F, f) = chans[c]
        w = u[c] * color[c]
        ws = w * scale
        wsF = ws * F

        # Direct per-channel planes.
        dalbedo.append(ws * (1.0 - F) / _PI)
        dspec.append(ws * (1.0 - one_minus_vh5) * (spec_base - albedo / _PI))

        # d spec_base / d alpha_sq.
        mask_denom = (denom_raw >= _EPS).astype(zero.dtype)
        inv_denom = 1.0 / denom
        dD_da = chi * (denom - 2.0 * a * NH_sq * mask_denom) * (
            inv_denom * inv_denom * inv_denom) / _PI
        dg1v_da = -tv / (sv * (1.0 + sv) * (1.0 + sv))
        dg1l_da = -tl / (sl * (1.0 + sl) * (1.0 + sl))
        dG_da = dg1v_da * g1l + g1v * dg1l_da
        dsb_da = (dG_da * D + G * dD_da) * inv_4vnln
        mask_r = (rough_raw >= _EPS).astype(zero.dtype)
        drough.append(wsF * dsb_da * 4.0 * rough * rough * rough * mask_r)

        # Accumulate the normal-path cotangents.
        # d spec_base / d NH (through denom): d denom_raw / d NH = 2 NH (a-1).
        dsb_dNH = (G * inv_4vnln) * (
            -2.0 * a * chi * (inv_denom * inv_denom * inv_denom) / _PI
        ) * 2.0 * NH * (a - 1.0) * mask_denom
        # d spec_base / d VN: through g1v and the 1/(4 VN LN) factor.
        dg1v_dVN = 2.0 * a / ((1.0 + sv) * (1.0 + sv) * sv * VN * VN * VN)
        dsb_dVN = (dg1v_dVN * g1l * D - G * D / VN) * inv_4vnln
        dg1l_dLN = 2.0 * a / ((1.0 + sl) * (1.0 + sl) * sl * LN * LN * LN)
        dsb_dLN = (g1v * dg1l_dLN * D - G * D / LN) * inv_4vnln

        A_NH = A_NH + wsF * dsb_dNH
        A_VN = A_VN + wsF * dsb_dVN
        A_LN = A_LN + wsF * dsb_dLN
        A_lp = A_lp + w * f / dist_sq

    m_nh = (nh_raw >= _EPS).astype(zero.dtype)
    m_vn = (vn_raw >= _EPS).astype(zero.dtype)
    m_ln = (ln_raw >= _EPS).astype(zero.dtype)
    m_lp = (ln_raw >= 0.0).astype(zero.dtype)
    cn = A_NH * m_nh
    cv = A_VN * m_vn
    cl = A_LN * m_ln + A_lp * m_lp
    dnx = cn * hx + cv * vx + cl * lx
    dny = cn * hy + cv * vy + cl * ly
    dnz = cn * hz + cv * vz + cl * lz

    return jnp.stack([dnx, dny, dnz] + dalbedo + drough + dspec)


def _scene_loss_and_grads(pred_tile, gt_tile, scene_vec, x, y, want_dgt):
    """One scene's loss sum AND hand-derived gradients in a single pass.

    Shades both sides once and derives the |log-diff| sum plus the pred
    (and optionally gt) plane gradients from the same intermediates — the
    training path runs this instead of a value kernel followed by a
    re-shading backward kernel (the primal re-shade was ~45% of the pair's
    work). Returns (loss_sum, dpred, dgt-or-None)."""
    cam = scene_vec[0:3]
    light = scene_vec[3:6]
    color = scene_vec[6:9]
    geom = _scene_geometry(cam, light, x, y)
    rp, shr_p, ch_p = _shade_side(pred_tile, geom, color)
    rt, shr_t, ch_t = _shade_side(gt_tile, geom, color)
    loss = jnp.zeros((), jnp.float32)
    sign = []
    for c in range(3):
        diff = (jnp.log(rp[c] + EPSILON_RENDER)
                - jnp.log(rt[c] + EPSILON_RENDER))
        loss = loss + jnp.sum(jnp.abs(diff))
        sign.append(jnp.sign(diff))
    u_pred = [sign[c] / (rp[c] + EPSILON_RENDER) for c in range(3)]
    dpred = _side_bwd(pred_tile, geom, color, shr_p, ch_p, u_pred)
    if not want_dgt:
        return loss, dpred, None
    u_gt = [-sign[c] / (rt[c] + EPSILON_RENDER) for c in range(3)]
    dgt = _side_bwd(gt_tile, geom, color, shr_t, ch_t, u_gt)
    return loss, dpred, dgt


def _l1_tile(pred_tile, gt_tile, want_dgt):
    """svbrdf_l1_loss terms of one (12, TH, TW) tile pair.

    Returns (l1_sum, dpred_l1, dgt_l1-or-None): the four per-map L1 sums
    (normals/roughness plain, diffuse/specular in log(x + 0.01) space —
    reference losses.py:7-19) share one normalizer (each is a mean over
    B*H*W*3 elements), so their tile sums add into ONE scalar. Folding
    this into the rendering-loss kernel removes the separate full-tensor
    L1 passes and the gradient-add downstream (the tiles are already in
    VMEM)."""
    dn = pred_tile[0:3] - gt_tile[0:3]
    dr = pred_tile[6:9] - gt_tile[6:9]
    pd = pred_tile[3:6] + EPSILON_L1
    td = gt_tile[3:6] + EPSILON_L1
    ps = pred_tile[9:12] + EPSILON_L1
    ts = gt_tile[9:12] + EPSILON_L1
    dd = jnp.log(pd) - jnp.log(td)
    ds = jnp.log(ps) - jnp.log(ts)
    l1 = (jnp.sum(jnp.abs(dn)) + jnp.sum(jnp.abs(dd))
          + jnp.sum(jnp.abs(dr)) + jnp.sum(jnp.abs(ds)))
    sd = jnp.sign(dd)
    ss = jnp.sign(ds)
    dpred = jnp.concatenate(
        [jnp.sign(dn), sd / pd, jnp.sign(dr), ss / ps], axis=0)
    if not want_dgt:
        return l1, dpred, None
    dgt = jnp.concatenate(
        [-jnp.sign(dn), -sd / td, -jnp.sign(dr), -ss / ts], axis=0)
    return l1, dpred, dgt


def _patch_xy(tile_shape, row0, col0, height, width):
    # TPU iota must be integer-typed; cast after.
    col = jax.lax.broadcasted_iota(jnp.int32, tile_shape, 1).astype(
        jnp.float32) + col0
    row = jax.lax.broadcasted_iota(jnp.int32, tile_shape, 0).astype(
        jnp.float32) + row0
    x = -1.0 + 2.0 * col / (width - 1)
    y = 1.0 - 2.0 * row / (height - 1)
    return x, y


def _scene_loss_sum(pred_tile, gt_tile, scene_vec, x, y):
    """|log-diff| sum over one tile under ONE scene (9 scalars)."""
    cam = scene_vec[0:3]
    light = scene_vec[3:6]
    color = scene_vec[6:9]
    geom = _scene_geometry(cam, light, x, y)
    rp = _shade_planes(pred_tile, geom, color)
    rt = _shade_planes(gt_tile, geom, color)
    total = jnp.zeros((), jnp.float32)
    for c in range(3):
        diff = (jnp.log(rp[c] + EPSILON_RENDER)
                - jnp.log(rt[c] + EPSILON_RENDER))
        total = total + jnp.sum(jnp.abs(diff))
    return total


def _read_scene(scene_ref, s):
    """Read one scene's 9 scalars from SMEM at a dynamic index."""
    return [scene_ref[0, s, k] for k in range(9)]


def _fwd_kernel(off_ref, scene_ref, pred_ref, gt_ref, out_ref, *, tile_h,
                tile_w, height, width, n_scenes):
    row0 = pl.program_id(1) * tile_h + off_ref[0, 0]
    col0 = pl.program_id(2) * tile_w
    # Inputs may be bf16 planes (the TPU hot path — halves kernel IO);
    # all shading math runs in f32.
    pred_tile = pred_ref[0].astype(jnp.float32)
    gt_tile = gt_ref[0].astype(jnp.float32)
    x, y = _patch_xy(pred_tile.shape[1:], row0, col0, height, width)

    # fori_loop keeps the kernel body compact — fully unrolling S scenes
    # overwhelmed the TPU compiler.
    def body(s, acc):
        return acc + _scene_loss_sum(pred_tile, gt_tile,
                                     _read_scene(scene_ref, s), x, y)

    total = jax.lax.fori_loop(0, n_scenes, body, jnp.zeros((), jnp.float32))
    # Output is an (8, 128) VMEM tile per program (minimum f32 tile);
    # spread the partial sum so a global jnp.sum recovers it.
    out_ref[0] = jnp.full((8, 128), total / (8.0 * 128.0), jnp.float32)


def _fwdgrad_kernel(off_ref, scene_ref, pred_ref, gt_ref, loss_ref,
                    dpred_ref, *, tile_h, tile_w, height, width, n_scenes,
                    inv_count):
    """Fused value + pred-gradient kernel (the training hot path).

    Under autodiff, custom_vjp's f_fwd runs this ONE kernel instead of the
    value kernel + a re-shading backward kernel: the per-scene loop
    accumulates the loss sum and dpred from a single shade of each side.
    dpred is written pre-scaled by 1/count; f_bwd just multiplies by the
    scalar upstream cotangent (which XLA fuses into the consumer)."""
    row0 = pl.program_id(1) * tile_h + off_ref[0, 0]
    col0 = pl.program_id(2) * tile_w
    pred_tile = pred_ref[0].astype(jnp.float32)
    gt_tile = gt_ref[0].astype(jnp.float32)
    x, y = _patch_xy(pred_tile.shape[1:], row0, col0, height, width)

    def body(s, acc):
        total, dp_acc = acc
        loss, dp, _ = _scene_loss_and_grads(
            pred_tile, gt_tile, _read_scene(scene_ref, s), x, y, False)
        return total + loss, dp_acc + dp

    total, dp = jax.lax.fori_loop(
        0, n_scenes, body,
        (jnp.zeros((), jnp.float32), jnp.zeros_like(pred_tile)))
    loss_ref[0] = jnp.full((8, 128), total / (8.0 * 128.0), jnp.float32)
    dpred_ref[0] = (dp * inv_count).astype(dpred_ref.dtype)


def _patch_xy_fold(tile_shape, row0, col0, a, d, fold, height, width):
    """Full-resolution patch coordinates of one tile.

    fold=1: rows/cols are full-res (row0/col0 in full-res units, a=d=0).
    fold=2 (phase-planes layout): the tile holds HALF-res planes of phase
    cell (a, d); half-res pixel (i, j) is full-res (fold*i + a, fold*j + d).
    """
    col = jax.lax.broadcasted_iota(jnp.int32, tile_shape, 1).astype(
        jnp.float32) + col0
    row = jax.lax.broadcasted_iota(jnp.int32, tile_shape, 0).astype(
        jnp.float32) + row0
    if fold != 1:
        col = col * fold + d
        row = row * fold + a
    x = -1.0 + 2.0 * col / (width - 1)
    y = 1.0 - 2.0 * row / (height - 1)
    return x, y


def _mixed_fwd_kernel(off_ref, scene_ref, pred_ref, gt_ref, out_ref, *,
                      tile_h, tile_w, height, width, n_scenes, l1_weight,
                      inv_render, inv_l1, fold):
    """Value-only mixed loss: rendering term + l1_weight * svbrdf-L1, both
    from the SAME VMEM tiles; the partial is pre-normalized so the caller
    just sums. Grid is (batch, fold^2, n_h, n_w): with the phase-planes
    layout (fold=2) each program shades ONE phase cell's 12 half-res
    planes — the cell is grid-indexed, so the kernel body stays the fold=1
    body with offset coordinates and NO interleaving anywhere."""
    cell = pl.program_id(1)
    a, d = cell // fold, cell % fold
    row0 = pl.program_id(2) * tile_h + off_ref[0, 0]
    col0 = pl.program_id(3) * tile_w
    pred_tile = pred_ref[0].astype(jnp.float32)
    gt_tile = gt_ref[0].astype(jnp.float32)
    x, y = _patch_xy_fold(pred_tile.shape[1:], row0, col0, a, d, fold,
                          height, width)

    def body(s, acc):
        return acc + _scene_loss_sum(pred_tile, gt_tile,
                                     _read_scene(scene_ref, s), x, y)

    total = jax.lax.fori_loop(0, n_scenes, body, jnp.zeros((), jnp.float32))
    combined = total * inv_render
    if l1_weight != 0.0:
        l1, _, _ = _l1_tile(pred_tile, gt_tile, False)
        combined = combined + l1_weight * inv_l1 * l1
    out_ref[0] = jnp.full((8, 128), combined / (8.0 * 128.0), jnp.float32)


def _mixed_fwdgrad_kernel(off_ref, scene_ref, pred_ref, gt_ref, loss_ref,
                          dpred_ref, *, tile_h, tile_w, height, width,
                          n_scenes, l1_weight, inv_render, inv_l1, fold):
    """Fused mixed-loss value + COMBINED pred gradient (training hot path).

    One kernel emits the pre-normalized loss partial and
    d(mixed)/d(pred planes) = inv_render * d(render) + l1_weight * inv_l1
    * d(L1) — so no gradient-add, no separate L1 passes, and the custom-VJP
    backward is a scalar scale (+ one layout transpose for phase callers).
    See _mixed_fwd_kernel for the fold/grid convention."""
    cell = pl.program_id(1)
    a, d = cell // fold, cell % fold
    row0 = pl.program_id(2) * tile_h + off_ref[0, 0]
    col0 = pl.program_id(3) * tile_w
    pred_tile = pred_ref[0].astype(jnp.float32)
    gt_tile = gt_ref[0].astype(jnp.float32)
    x, y = _patch_xy_fold(pred_tile.shape[1:], row0, col0, a, d, fold,
                          height, width)

    def body(s, acc):
        total, dp_acc = acc
        loss, dp, _ = _scene_loss_and_grads(
            pred_tile, gt_tile, _read_scene(scene_ref, s), x, y, False)
        return total + loss, dp_acc + dp

    total, dp = jax.lax.fori_loop(
        0, n_scenes, body,
        (jnp.zeros((), jnp.float32), jnp.zeros_like(pred_tile)))
    combined = total * inv_render
    dp = dp * inv_render
    if l1_weight != 0.0:
        l1, dpl1, _ = _l1_tile(pred_tile, gt_tile, False)
        combined = combined + l1_weight * inv_l1 * l1
        dp = dp + (l1_weight * inv_l1) * dpl1
    loss_ref[0] = jnp.full((8, 128), combined / (8.0 * 128.0), jnp.float32)
    dpred_ref[0] = dp.astype(dpred_ref.dtype)


def _fwdgrad_kernel_both(off_ref, scene_ref, pred_ref, gt_ref, loss_ref,
                         dpred_ref, dgt_ref, *, tile_h, tile_w, height,
                         width, n_scenes, inv_count):
    """_fwdgrad_kernel variant that also emits the gt-plane gradients
    (want_target_grad=True callers, e.g. map-recovery on the target slot)."""
    row0 = pl.program_id(1) * tile_h + off_ref[0, 0]
    col0 = pl.program_id(2) * tile_w
    pred_tile = pred_ref[0].astype(jnp.float32)
    gt_tile = gt_ref[0].astype(jnp.float32)
    x, y = _patch_xy(pred_tile.shape[1:], row0, col0, height, width)

    def body(s, acc):
        total, dp_acc, dt_acc = acc
        loss, dp, dt = _scene_loss_and_grads(
            pred_tile, gt_tile, _read_scene(scene_ref, s), x, y, True)
        return total + loss, dp_acc + dp, dt_acc + dt

    total, dp, dt = jax.lax.fori_loop(
        0, n_scenes, body,
        (jnp.zeros((), jnp.float32), jnp.zeros_like(pred_tile),
         jnp.zeros_like(gt_tile)))
    loss_ref[0] = jnp.full((8, 128), total / (8.0 * 128.0), jnp.float32)
    dpred_ref[0] = (dp * inv_count).astype(dpred_ref.dtype)
    dgt_ref[0] = (dt * inv_count).astype(dgt_ref.dtype)


def _grid_call(kernel, pred_t, gt_t, scenes9, row_off, global_height,
               extra_inputs, extra_specs, out_shape, out_specs, tile_h,
               tile_w, interpret):
    batch, _, height, width = pred_t.shape
    n_h = height // tile_h
    n_w = width // tile_w
    svbrdf_spec = pl.BlockSpec((1, 12, tile_h, tile_w),
                               lambda b, h, w: (b, 0, h, w),
                               memory_space=pltpu.VMEM)
    # Scene scalars live in SMEM: the per-scene loop reads them at a
    # dynamic index, which VMEM loads can't lower.
    scene_spec = pl.BlockSpec((1,) + scenes9.shape[1:],
                              lambda b, h, w: (b, 0, 0),
                              memory_space=pltpu.SMEM)
    # Spatial SPMD: a sharded caller (shard_map over the H axis) passes its
    # shard's global row offset + the GLOBAL height so every shard shades
    # its true patch coordinates.
    off_spec = pl.BlockSpec((1, 1), lambda b, h, w: (0, 0),
                            memory_space=pltpu.SMEM)
    return pl.pallas_call(
        functools.partial(kernel, tile_h=tile_h, tile_w=tile_w,
                          height=global_height or height, width=width,
                          n_scenes=scenes9.shape[1]),
        grid=(batch, n_h, n_w),
        in_specs=[off_spec, scene_spec, svbrdf_spec, svbrdf_spec]
        + extra_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(row_off, scenes9, pred_t, gt_t, *extra_inputs)


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _fused_loss_planes(pred_t, gt_t, scenes9, row_off, tile_h, tile_w,
                       want_dgt, global_height):
    return _fused_fwd_value(pred_t, gt_t, scenes9, row_off, tile_h, tile_w,
                            global_height)


def _count(batch, n_scenes, height, width, global_height):
    """Loss normalizer = GLOBAL pixel count: a sharded caller's local sum
    over global_count psums to the exact global mean."""
    return batch * n_scenes * (global_height or height) * width * 3


def _fused_fwd_value(pred_t, gt_t, scenes9, row_off, tile_h, tile_w,
                     global_height):
    batch, _, height, width = pred_t.shape
    n_h = height // tile_h
    n_w = width // tile_w
    partials = _grid_call(
        _fwd_kernel, pred_t, gt_t, scenes9, row_off, global_height, [], [],
        jax.ShapeDtypeStruct((batch * n_h * n_w, 8, 128), jnp.float32),
        pl.BlockSpec((1, 8, 128),
                     lambda b, h, w: ((b * n_h + h) * n_w + w, 0, 0),
                     memory_space=pltpu.VMEM),
        tile_h, tile_w, _use_interpret())
    count = _count(batch, scenes9.shape[1], height, width, global_height)
    return jnp.sum(partials) / count


def _fused_fwd(pred_t, gt_t, scenes9, row_off, tile_h, tile_w, want_dgt,
               global_height):
    """custom_vjp forward: ONE fused value+gradient kernel.

    Outside autodiff, custom_vjp calls the primal (_fused_fwd_value's
    value-only kernel); under autodiff this runs instead, so training pays
    a single shade per (tile, scene, side) — the gradients come out with
    the value and the backward is a scalar scale."""
    batch, _, height, width = pred_t.shape
    n_h = height // tile_h
    n_w = width // tile_w
    count = _count(batch, scenes9.shape[1], height, width, global_height)
    loss_shape = jax.ShapeDtypeStruct((batch * n_h * n_w, 8, 128),
                                      jnp.float32)
    loss_spec = pl.BlockSpec((1, 8, 128),
                             lambda b, h, w: ((b * n_h + h) * n_w + w, 0, 0),
                             memory_space=pltpu.VMEM)
    svbrdf_out = pl.BlockSpec((1, 12, tile_h, tile_w),
                              lambda b, h, w: (b, 0, h, w),
                              memory_space=pltpu.VMEM)
    if want_dgt:
        kernel = functools.partial(_fwdgrad_kernel_both,
                                   inv_count=1.0 / count)
        partials, dpred, dgt = _grid_call(
            kernel, pred_t, gt_t, scenes9, row_off, global_height, [], [],
            (loss_shape,
             jax.ShapeDtypeStruct(pred_t.shape, pred_t.dtype),
             jax.ShapeDtypeStruct(gt_t.shape, gt_t.dtype)),
            (loss_spec, svbrdf_out, svbrdf_out),
            tile_h, tile_w, _use_interpret())
    else:
        kernel = functools.partial(_fwdgrad_kernel, inv_count=1.0 / count)
        partials, dpred = _grid_call(
            kernel, pred_t, gt_t, scenes9, row_off, global_height, [], [],
            (loss_shape,
             jax.ShapeDtypeStruct(pred_t.shape, pred_t.dtype)),
            (loss_spec, svbrdf_out),
            tile_h, tile_w, _use_interpret())
        dgt = None
    loss = jnp.sum(partials) / count
    return loss, (dpred, dgt, jnp.zeros((), gt_t.dtype))


def _fused_bwd(tile_h, tile_w, want_dgt, global_height, residuals, g):
    dpred_raw, dgt_raw, gt_marker = residuals
    gf = jnp.asarray(g, jnp.float32)
    dpred = (dpred_raw.astype(jnp.float32) * gf).astype(dpred_raw.dtype)
    if want_dgt:
        dgt = (dgt_raw.astype(jnp.float32) * gf).astype(dgt_raw.dtype)
        return dpred, dgt, None, None
    # The gt cotangent is structurally required but sliced off upstream:
    # rendering_loss_fused stop-gradients the target in this mode, so AD
    # discards this value — it can never leak as a (wrong) zero gradient.
    return dpred, jnp.zeros(dpred_raw.shape, gt_marker.dtype), None, None


_fused_loss_planes.defvjp(_fused_fwd, _fused_bwd)


MAX_TILE_W = 512  # keeps the backward kernel's scoped VMEM under 16 MB


def rendering_loss_fused(pred: jnp.ndarray, target: jnp.ndarray,
                         scenes: Scene,
                         tile_h: int = DEFAULT_TILE_H,
                         tile_w: int = 0,
                         want_target_grad: bool = False) -> jnp.ndarray:
    """Fused rendering loss over per-item scene sets.

    pred/target: (B, H, W, 12) channels-last SVBRDFs (f32 here; the bf16
    hot path enters through rendering_loss_fused_planes); scenes: Scene
    with (B, S, 3) fields. Equals losses.rendering_loss's value for the
    same scene set (tested), with O(tile) VMEM — both H and W are tiled,
    so arbitrary resolutions (tested to 1024^2) fit the 16 MB VMEM budget.
    tile_w=0 -> min(width, MAX_TILE_W).

    want_target_grad=False (default) skips the target's reverse sweep in
    the backward kernel (~25% less bwd work) and stop-gradients the target
    — matching training, where the target is data (the torch reference's
    target never requires grad either). Pass True to differentiate wrt the
    target (e.g. map-recovery style experiments on the target slot).
    """
    pred_t = jnp.transpose(pred.astype(jnp.float32), (0, 3, 1, 2))
    gt_t = jnp.transpose(target.astype(jnp.float32), (0, 3, 1, 2))
    return rendering_loss_fused_planes(pred_t, gt_t, scenes, tile_h,
                                       tile_w, want_target_grad)


def rendering_loss_fused_planes(pred_t: jnp.ndarray, gt_t: jnp.ndarray,
                                scenes: Scene,
                                tile_h: int = DEFAULT_TILE_H,
                                tile_w: int = 0,
                                want_target_grad: bool = False,
                                row_offset=None,
                                global_height: int = 0) -> jnp.ndarray:
    """Planes-layout entry: pred_t/gt_t are (B, 12, H, W) channel planes —
    the kernel's native layout, f32 or bf16 (bf16 halves the kernel's HBM
    IO and the upstream transpose traffic; all in-kernel math is f32).
    Callers that already hold a phase-major or planar prediction (e.g. the
    phase-tail model) use this to skip the NHWC round-trip."""
    if not want_target_grad:
        gt_t = jax.lax.stop_gradient(gt_t)
    scenes9 = pack_scenes(scenes)
    height, width = pred_t.shape[2], pred_t.shape[3]
    th = min(tile_h, height)
    tw = tile_w if tile_w > 0 else min(width, MAX_TILE_W)
    if height % th or width % tw:
        # The grid covers exactly n_h*th x n_w*tw pixels while the
        # normalizer uses the full H*W — a non-dividing tile would
        # silently drop rows/cols from the loss and their gradients.
        raise ValueError(
            f"tile ({th}, {tw}) must divide the image ({height}, {width})")
    if row_offset is None:
        row_offset = jnp.zeros((1, 1), jnp.int32)
    else:
        # Spatial SPMD (shard_map over H): this call sees its H-shard with
        # the given global row offset; global_height fixes the coordinate
        # grid and the mean's normalizer, so psum(local values) == the
        # replicated loss. See parallel/spatial.py.
        row_offset = jnp.asarray(row_offset, jnp.int32).reshape(1, 1)
    return _fused_loss_planes(pred_t, gt_t, scenes9, row_offset, th, tw,
                              want_target_grad, int(global_height))


def _mixed_grid_call(kernel_fn, pred_t, gt_t, scenes9, row_off,
                     global_height, fold, l1_weight, tile_h, tile_w,
                     with_grad):
    """Launch a mixed-loss kernel over grid (batch, fold^2, n_h, n_w).

    pred_t/gt_t: (B, 12, H, W) full-res planes (fold=1) or (B, 48, h, w)
    phase-planes (fold=2; plane (a*2+d)*12 + c holds map c of phase cell
    (a, d) at half resolution). row_off and global_height arrive in GRID
    units (the tensor's own row units: full-res for fold=1, half-res for
    fold=2 — mixed_loss_fused_planes converts from its public full-res
    convention); height/width passed to the kernel and the loss
    normalizers are always FULL resolution, global when sharded."""
    batch, _, gh, gw = pred_t.shape
    height, width = fold * gh, fold * gw
    # Sharded callers (global_height != 0) shade with GLOBAL coordinates:
    # the kernel's height sets the y normalization of the patch grid.
    full_height = fold * global_height if global_height else height
    n_h = gh // tile_h
    n_w = gw // tile_w
    cells = fold * fold
    inv_render = 1.0 / _count(batch, scenes9.shape[1], height, width,
                              fold * global_height)
    inv_l1 = 1.0 / (batch * full_height * width * 3)
    kernel = functools.partial(
        kernel_fn, tile_h=tile_h, tile_w=tile_w, height=full_height,
        width=width, n_scenes=scenes9.shape[1], l1_weight=l1_weight,
        inv_render=inv_render, inv_l1=inv_l1, fold=fold)
    svbrdf_spec = pl.BlockSpec((1, 12, tile_h, tile_w),
                               lambda b, cell, h, w: (b, cell, h, w),
                               memory_space=pltpu.VMEM)
    scene_spec = pl.BlockSpec((1,) + scenes9.shape[1:],
                              lambda b, cell, h, w: (b, 0, 0),
                              memory_space=pltpu.SMEM)
    off_spec = pl.BlockSpec((1, 1), lambda b, cell, h, w: (0, 0),
                            memory_space=pltpu.SMEM)
    loss_shape = jax.ShapeDtypeStruct((batch * cells * n_h * n_w, 8, 128),
                                      jnp.float32)
    loss_spec = pl.BlockSpec(
        (1, 8, 128),
        lambda b, cell, h, w: (((b * cells + cell) * n_h + h) * n_w + w,
                               0, 0),
        memory_space=pltpu.VMEM)
    if with_grad:
        out_shape = (loss_shape,
                     jax.ShapeDtypeStruct(pred_t.shape, pred_t.dtype))
        out_specs = (loss_spec, svbrdf_spec)
    else:
        out_shape = loss_shape
        out_specs = loss_spec
    return pl.pallas_call(
        kernel,
        grid=(batch, cells, n_h, n_w),
        in_specs=[off_spec, scene_spec, svbrdf_spec, svbrdf_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_use_interpret(),
    )(row_off, scenes9, pred_t, gt_t)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _fused_mixed(pred, gt_t, scenes9, row_off, tile_h, tile_w, l1_weight,
                 global_height, pred_kind):
    pred_t = phase_to_planes(pred) if pred_kind == "phase" else pred
    fold = 2 if pred_kind == "pp" else 1
    partials = _mixed_grid_call(
        _mixed_fwd_kernel, pred_t, gt_t, scenes9, row_off, global_height,
        fold, l1_weight, tile_h, tile_w, with_grad=False)
    return jnp.sum(partials)


def _fused_mixed_fwd(pred, gt_t, scenes9, row_off, tile_h, tile_w,
                     l1_weight, global_height, pred_kind):
    """One fused kernel -> (loss, combined pre-scaled pred gradient)."""
    pred_t = phase_to_planes(pred) if pred_kind == "phase" else pred
    fold = 2 if pred_kind == "pp" else 1
    partials, dpred = _mixed_grid_call(
        _mixed_fwdgrad_kernel, pred_t, gt_t, scenes9, row_off,
        global_height, fold, l1_weight, tile_h, tile_w, with_grad=True)
    return jnp.sum(partials), (dpred, jnp.zeros((), gt_t.dtype))


def _fused_mixed_bwd(tile_h, tile_w, l1_weight, global_height,
                     pred_kind, residuals, g):
    """Scalar cotangent scale; for 'phase' callers, ONE inverse transpose.

    Hand-writing this keeps any layout conversion INSIDE the VJP boundary:
    autodiff of the phase->planes pair materialized a 3-copy relayout
    chain on the backward (measured ~0.5 ms/step at 256^2 b8 on v5e). The
    'pp' (phase-planes) layout needs no conversion at all — the kernel
    grid-indexes the phase cell."""
    dpred_raw, gt_marker = residuals
    gf = jnp.asarray(g, jnp.float32)
    dpred = (dpred_raw.astype(jnp.float32) * gf).astype(dpred_raw.dtype)
    if pred_kind == "phase":
        dpred = planes_to_phase(dpred)
    # gt is stop-gradient'ed by the public wrappers; this zero never leaks.
    dgt = jnp.zeros(dpred_raw.shape, gt_marker.dtype)
    return dpred, dgt, None, None


_fused_mixed.defvjp(_fused_mixed_fwd, _fused_mixed_bwd)


def mixed_loss_fused_planes(pred_t: jnp.ndarray, gt_t: jnp.ndarray,
                            scenes: Scene, l1_weight: float = 0.1,
                            tile_h: int = DEFAULT_TILE_H, tile_w: int = 0,
                            row_offset=None,
                            global_height: int = 0) -> jnp.ndarray:
    """Fused mixed loss (l1_weight * svbrdf_l1 + rendering loss) on planes.

    pred_t may be (B, 12, H, W) channel planes, (B, h, w, 4, 12)
    phase-major maps, or (B, 48, h, w) phase-planes (the phase-tail
    model's output_layout='phase_planes' — plane (a*2+d)*12 + c is map c
    of phase cell (a, d) at half res). gt_t must match: (B, 12, H, W) for
    the first two, (B, 48, h, w) for phase-planes. Value equals
    l1_weight * losses.svbrdf_l1_loss + losses.rendering_loss for the same
    scenes (tested); the gradient comes out of ONE fused kernel with the
    L1 term folded in. Reference semantics: losses.py:54-63 (MixedLoss).

    Sharded (H-split shard_map) callers pass row_offset (this shard's
    first row) and global_height in FULL-RESOLUTION pixel units for every
    pred layout — phase-planes included (converted to half-res grid units
    internally; both are necessarily even there, since planes shards hold
    whole half-res rows). The per-shard value is pre-normalized by the
    GLOBAL pixel count, so psum(local) == the replicated loss
    (tests/test_spatial_sharding.py pins this for planes and phase-planes).
    """
    gt_t = jax.lax.stop_gradient(gt_t)
    scenes9 = pack_scenes(scenes)
    if pred_t.ndim == 5:
        # Converted to FULL-res planes inside the VJP; tiles divide those.
        pred_kind = "phase"
        gh, gw = 2 * pred_t.shape[1], 2 * pred_t.shape[2]
    elif pred_t.shape[1] == 48:
        pred_kind = "pp"
        gh, gw = pred_t.shape[2], pred_t.shape[3]
    else:
        pred_kind = "planes"
        gh, gw = pred_t.shape[2], pred_t.shape[3]
    # Tiles divide the KERNEL grid dims (full-res planes for 'planes' and
    # 'phase', half-res planes for 'pp').
    th = min(tile_h, gh)
    tw = tile_w if tile_w > 0 else min(gw, MAX_TILE_W)
    if gh % th or gw % tw:
        raise ValueError(
            f"tile ({th}, {tw}) must divide the plane grid ({gh}, {gw})")
    fold = 2 if pred_kind == "pp" else 1
    if int(global_height) % fold:
        raise ValueError(
            f"global_height ({global_height}) must be even for "
            "phase-planes predictions (full-res units; shards hold whole "
            "half-res rows)")
    if row_offset is None:
        row_offset = jnp.zeros((1, 1), jnp.int32)
    else:
        # Public convention: full-res pixel units. The kernel grid runs in
        # the tensor's own (half-res for 'pp') row units.
        row_offset = jnp.asarray(row_offset, jnp.int32).reshape(1, 1) // fold
    return _fused_mixed(pred_t, gt_t, scenes9, row_offset, th, tw,
                        float(l1_weight), int(global_height) // fold,
                        pred_kind)


def svbrdf_to_phase_planes(svbrdf: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) NHWC -> (B, 4C, H/2, W/2) phase-planes in ONE
    transpose: out[b, (a*2+d)*C + c, v, u] = svbrdf[b, 2v+a, 2u+d, c]."""
    b, hh, ww, c = svbrdf.shape
    h, w = hh // 2, ww // 2
    p = svbrdf.reshape(b, h, 2, w, 2, c).transpose(0, 2, 4, 5, 1, 3)
    return p.reshape(b, 4 * c, h, w)


def phase_to_planes(phase: jnp.ndarray) -> jnp.ndarray:
    """(B, h, w, 4, C) phase-major maps -> (B, C, 2h, 2w) channel planes
    in ONE transpose (planes[b, c, 2v+a, 2w+d] = phase[b, v, w, (a, d), c]).

    (A channel-major-first two-transpose decomposition was measured
    equal-or-slower on v5e; the fwd+bwd conversion pair costs ~1.5 ms of
    the step and is the main remaining glue — a kernel-side phase-aware
    index map would eliminate it but needs cross-lane shuffles Mosaic
    does not lower well today.)"""
    b, h, w, _, c = phase.shape
    p = phase.reshape(b, h, w, 2, 2, c).transpose(0, 5, 1, 3, 2, 4)
    return p.reshape(b, c, 2 * h, 2 * w)


def planes_to_phase(planes: jnp.ndarray) -> jnp.ndarray:
    """(B, C, 2h, 2w) channel planes -> (B, h, w, 4, C) phase-major maps:
    the exact inverse of phase_to_planes, used by the hand-written mixed
    loss VJP (one transpose instead of the autodiff-derived copy chain)."""
    b, c, hh, ww = planes.shape
    h, w = hh // 2, ww // 2
    p = planes.reshape(b, c, h, 2, w, 2).transpose(0, 2, 4, 3, 5, 1)
    return p.reshape(b, h, w, 4, c)
