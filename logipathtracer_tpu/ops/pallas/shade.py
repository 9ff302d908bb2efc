"""Fused shading kernel (Pallas TPU).

One kernel application shades a tile of rays end-to-end: miss/env
write, emission, geometric setup (barycentrics, shading normal, tangent
basis), lobe selection, the full 16-order Heitz multiple-scattering
walk, and Russian roulette — with the per-ray RNG advanced in-kernel.

Why: the jnp shade_step compiles to ~1000 small XLA ops over [R]-shaped
arrays; measured 50 ms per 1M rays on v5e (the Heitz walk alone 36 ms)
at a few percent of VPU peak — op dispatch overhead dominates.  Fusing
the whole thing into one Pallas kernel with component-major [K, TILE]
blocks keeps every intermediate in registers/VMEM.

Semantics are bit-identical to render/megakernel.shade_step for the
Heitz (use_microfacet) configurations — including NEE (nee=True:
in-kernel light pick + shadow-query setup + the walk's stochastic eval
hook; round 3) and textured scenes (tex mode: the XLA prologue
resolves texture taps into the material slots and passes the mapped
normal, since per-lane atlas gathers are the one thing the kernel
cannot do).  The jnp path stays the oracle and still covers the basic
BSDF and >512-light NEE.  RNG draw order matches exactly (parity hash
or Threefry, per config).

Reference hot loop: shaders/heitz/BSDF.glsl:108-275;
shading: shaders/path_tracing.comp:219-323.

Layout: state rows [IN_K, R] f32 (ints bitcast), tile blocks
[IN_K, T]; every per-ray quantity is a [T]-lane vector so each op runs
dense on the VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = 3.4e38
PI = 3.141592653589

# --- input row indices -------------------------------------------------
# rays/state
I_OX, I_OY, I_OZ = 0, 1, 2
I_DX, I_DY, I_DZ = 3, 4, 5
I_MR, I_MG, I_MB = 6, 7, 8
I_AR, I_AG, I_AB = 9, 10, 11
I_T = 12
I_S0, I_S1 = 13, 14          # seed (u32 bits)
I_ALIVE = 15                 # i32 bits
I_SKIP = 16                  # i32 bits
I_BOUNCE = 17                # i32 bits
I_TSH = 18                   # 32 rows of tri_shade
I_OSH = 50                   # 32 rows of obj_shade
IN_K = 82
# Small-scene variant (tri_block given): the 64 gathered table rows are
# replaced by ONE bitcast-i32 triangle-id row; the kernel selects the
# [64, T] table rows itself with an exact one-hot matmul against the
# VMEM-resident pre-split table (build_tri_block) — the XLA-level
# [R, 64] row gather and its transposes disappear from the shade stage.
I_TRI = 18
IN_K_SEL = 19
# Textured configs (tex=True) append the material-resolution prologue's
# normal-map output (render/megakernel.py::_shade_step_pallas computes
# texture taps in XLA and overwrites the obj_shade material slots; the
# mapped shading normal cannot ride a slot, so it gets its own rows).
I_FFX, I_FFY, I_FFZ = 82, 83, 84   # mapped front-face normal
I_FFLAG = 85                       # 1.0 where a normal map applied
IN_K_TEX = 86

# --- output row indices ------------------------------------------------
O_OX, O_OY, O_OZ = 0, 1, 2
O_DX, O_DY, O_DZ = 3, 4, 5
O_MR, O_MG, O_MB = 6, 7, 8
O_AR, O_AG, O_AB = 9, 10, 11
O_S0, O_S1 = 12, 13
O_ALIVE = 14
O_SKIP = 15
OUT_K = 16
# NEE variant (nee=True) appends the shadow query + pending
# contribution; visibility is resolved OUTSIDE the kernel (the shadow
# rays go through the main intersect kernel with t_max) and the
# contribution rows are added where visible.
O_SOX, O_SOY, O_SOZ = 16, 17, 18   # shadow origin (1e30-parked)
O_SDX, O_SDY, O_SDZ = 19, 20, 21   # shadow direction
O_TLIM = 22                        # shadow t_max (1.0 on non-NEE lanes)
O_CR, O_CG, O_CB = 23, 24, 25      # pending contribution (pre-visibility)
OUT_K_NEE = 26

# Light-table block layout (built by build_light_block): rows 0-15 are
# light_tris columns (v0.xyz, e1.xyz, e2.xyz, emission.xyz, area, pad),
# row 16 = cdf (last forced 1.0), row 17 = cdf shifted right (first
# -1.0) — the pair makes the in-kernel pick a two-compare one-hot with
# searchsorted-left semantics.  Lanes padded to 128 with cdf_hi=2.

_MUL = np.uint32(1103515245)
_INV_PARITY = np.float32(1.0) / np.float32(4294967295.0)
_INV24 = np.float32(1.0 / 16777216.0)


def _rand_parity(s0, s1, active):
    """Parity-hash draw on [T] u32 lanes; advances masked lanes only."""
    n0 = s0 + jnp.uint32(1)
    n1 = s1 + jnp.uint32(1)
    qx = _MUL * ((n0 >> jnp.uint32(1)) ^ n1)
    qy = _MUL * ((n1 >> jnp.uint32(1)) ^ n0)
    n = _MUL * (qx ^ (qy >> jnp.uint32(3)))
    # Mosaic has no u32->f32 cast; hi/lo 16-bit split via i32 is exact
    # (both terms exact in f32, one rounding = the native cast).
    hi = jax.lax.bitcast_convert_type(n >> jnp.uint32(16), jnp.int32)
    lo = jax.lax.bitcast_convert_type(n & jnp.uint32(0xFFFF), jnp.int32)
    val = (hi.astype(jnp.float32) * 65536.0
           + lo.astype(jnp.float32)) * _INV_PARITY
    s0 = jnp.where(active, n0, s0)
    s1 = jnp.where(active, n1, s1)
    return val, s0, s1


def _rand_threefry(s0, s1, active):
    """Threefry-2x32 counter draw (ops/rng.py semantics)."""
    ks0 = jnp.uint32(0xCAFEF00D)
    ks1 = jnp.uint32(0xBAADF00D)
    ks2 = jnp.uint32(0x1BD11BDA) ^ ks0 ^ ks1
    c0 = s0 + jnp.uint32(1)
    c1 = s1 + jnp.uint32(1)
    x0 = c0 + ks0
    x1 = c1 + ks1
    rot = (13, 15, 26, 6, 17, 29, 16, 24)
    sched = ((ks1, ks2), (ks2, ks0), (ks0, ks1), (ks1, ks2), (ks2, ks0))
    for block in range(5):
        for r in rot[4 * (block % 2): 4 * (block % 2) + 4]:
            x0 = x0 + x1
            x1 = (x1 << jnp.uint32(r)) | (x1 >> jnp.uint32(32 - r))
            x1 = x1 ^ x0
        ka, kb = sched[block]
        x0 = x0 + ka
        x1 = x1 + kb + jnp.uint32(block + 1)
    top = jax.lax.bitcast_convert_type(x0 >> jnp.uint32(8), jnp.int32)
    val = top.astype(jnp.float32) * _INV24  # < 2^24: exact via i32
    s0 = jnp.where(active, c0, s0)
    s1 = jnp.where(active, c1, s1)
    return val, s0, s1


def _norm3(x, y, z):
    # Same op sequence as ops/bsdf._normalize (1/sqrt, not rsqrt) so
    # results match the jnp oracle path closely.
    r = 1.0 / jnp.sqrt(jnp.maximum(x * x + y * y + z * z, 1e-38))
    return x * r, y * r, z * r


def _cross(ax, ay, az, bx, by, bz):
    return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)


def _dot(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _kernel(in_ref, *rest, cfg_tuple, rand_kind: str, tile: int,
            nee: bool = False, tex: bool = False, tri_sel: bool = False):
    rest = list(rest)
    tri_ref = rest.pop(0) if tri_sel else None
    if nee:
        lights_ref, out_ref = rest
    else:
        lights_ref, (out_ref,) = None, rest
    f = lambda k: in_ref[k, :]
    i = lambda k: jax.lax.bitcast_convert_type(in_ref[k, :], jnp.int32)

    # All-dead tiles (sorted pools park dead lanes contiguously at the
    # tail) skip the whole shading body: passthrough writes only.
    tile_live = jnp.any(i(I_ALIVE) != 0)

    @pl.when(~tile_live)
    def _():
        out_ref[O_OX, :] = f(I_OX)
        out_ref[O_OY, :] = f(I_OY)
        out_ref[O_OZ, :] = f(I_OZ)
        out_ref[O_DX, :] = f(I_DX)
        out_ref[O_DY, :] = f(I_DY)
        out_ref[O_DZ, :] = f(I_DZ)
        out_ref[O_MR, :] = f(I_MR)
        out_ref[O_MG, :] = f(I_MG)
        out_ref[O_MB, :] = f(I_MB)
        out_ref[O_AR, :] = f(I_AR)
        out_ref[O_AG, :] = f(I_AG)
        out_ref[O_AB, :] = f(I_AB)
        out_ref[O_S0, :] = f(I_S0)
        out_ref[O_S1, :] = f(I_S1)
        out_ref[O_ALIVE, :] = f(I_ALIVE)
        out_ref[O_SKIP, :] = f(I_SKIP)
        if nee:
            park = jnp.full((tile,), 1e30, jnp.float32)
            out_ref[O_SOX, :] = park
            out_ref[O_SOY, :] = park
            out_ref[O_SOZ, :] = park
            out_ref[O_SDX, :] = jnp.zeros((tile,), jnp.float32)
            out_ref[O_SDY, :] = jnp.zeros((tile,), jnp.float32)
            out_ref[O_SDZ, :] = jnp.ones((tile,), jnp.float32)
            out_ref[O_TLIM, :] = jnp.ones((tile,), jnp.float32)
            out_ref[O_CR, :] = jnp.zeros((tile,), jnp.float32)
            out_ref[O_CG, :] = jnp.zeros((tile,), jnp.float32)
            out_ref[O_CB, :] = jnp.zeros((tile,), jnp.float32)

    @pl.when(tile_live)
    def _():
        _shade_tile(in_ref, lights_ref, out_ref, cfg_tuple=cfg_tuple,
                    rand_kind=rand_kind, tile=tile, nee=nee, tex=tex,
                    tri_ref=tri_ref)


def _shade_tile(in_ref, lights_ref, out_ref, *, cfg_tuple, rand_kind: str,
                tile: int, nee: bool = False, tex: bool = False,
                tri_ref=None):
    (env_r, env_g, env_b, eps, rr_threshold, rr_bounces, max_order,
     nee_mis, total_area) = cfg_tuple
    rand = _rand_parity if rand_kind == "parity" else _rand_threefry

    f = lambda k: in_ref[k, :]
    u = lambda k: jax.lax.bitcast_convert_type(in_ref[k, :], jnp.uint32)
    i = lambda k: jax.lax.bitcast_convert_type(in_ref[k, :], jnp.int32)

    ox, oy, oz = f(I_OX), f(I_OY), f(I_OZ)
    dx, dy, dz = f(I_DX), f(I_DY), f(I_DZ)
    mr, mg, mb = f(I_MR), f(I_MG), f(I_MB)
    ar, ag, ab = f(I_AR), f(I_AG), f(I_AB)
    t = f(I_T)
    s0, s1 = u(I_S0), u(I_S1)
    alive = i(I_ALIVE) != 0
    prev_pdf = f(I_SKIP)  # NEE MIS state; always 0 in pallas configs
    bounce = i(I_BOUNCE)

    if tri_ref is not None:
        # In-kernel shade-table rows (small scenes): EXACT one-hot
        # selection matmul against the VMEM-resident pre-split table —
        # each lane's [64] tri_shade row materializes as dense [64, T]
        # component rows with zero XLA gathers (build_tri_block; same
        # split3/0-1 exactness argument as the compaction kernel's
        # _dot_onehot, so results are bit-identical to the gather form).
        from logipathtracer_tpu.ops.pallas.compact_intersect import \
            _dot_onehot
        tri = i(I_TRI)
        tp = tri_ref.shape[1]
        iota_t = jax.lax.broadcasted_iota(jnp.int32, (tp, tile), 0)
        oh = (iota_t == tri[None, :]).astype(jnp.bfloat16)   # [Tp, T]
        ts = _dot_onehot(tri_ref[:, :], oh, 64, ((1,), (0,)))
        tsh = lambda k: ts[k]
        osh = lambda k: ts[32 + k]
    else:
        tsh = lambda k: f(I_TSH + k)
        osh = lambda k: f(I_OSH + k)

    # ---- miss: acc = mask * env (overwrite), kill (:220-223) ----------
    miss = alive & (t >= INF)
    ar = jnp.where(miss, mr * env_r, ar)
    ag = jnp.where(miss, mg * env_g, ag)
    ab = jnp.where(miss, mb * env_b, ab)
    alive = alive & ~miss

    # ---- gathered rows (obj_shade / tri_shade layouts) -----------------
    # oshade: 0:9 world3, 9:21 inv34, 21:25 base_color, 25:28 emission,
    #         28:32 metallic/roughness/transmission/ior
    # tshade: 0:9 normals, 9:15 uvs, 15:24 verts
    base_r, base_g, base_b = osh(21), osh(22), osh(23)
    em_r, em_g, em_b = osh(25), osh(26), osh(27)
    metallic = osh(28)
    # Textured configs: the prologue already applied the jnp sequence
    # (floor THEN texture multiply) to the roughness slot — do not
    # re-floor (render/megakernel.py shade_step:317,361).
    roughness = osh(29) if tex else jnp.maximum(osh(29), 0.001)
    transmission = osh(30)
    ior = osh(31)

    # ---- hit position + barycentrics (:228-234) ------------------------
    lox = osh(9) * ox + osh(10) * oy + osh(11) * oz + osh(12)
    loy = osh(13) * ox + osh(14) * oy + osh(15) * oz + osh(16)
    loz = osh(17) * ox + osh(18) * oy + osh(19) * oz + osh(20)
    ldx = osh(9) * dx + osh(10) * dy + osh(11) * dz
    ldy = osh(13) * dx + osh(14) * dy + osh(15) * dz
    ldz = osh(17) * dx + osh(18) * dy + osh(19) * dz
    pwx = ox + t * dx
    pwy = oy + t * dy
    pwz = oz + t * dz
    plx = lox + t * ldx
    ply = loy + t * ldy
    plz = loz + t * ldz

    v0x, v0y, v0z = tsh(15), tsh(16), tsh(17)
    e0x = tsh(18) - v0x
    e0y = tsh(19) - v0y
    e0z = tsh(20) - v0z
    e1x = tsh(21) - v0x
    e1y = tsh(22) - v0y
    e1z = tsh(23) - v0z
    # barycentric (util.glsl:23-41 projection form, ops/intersect.py:55)
    d00 = _dot(e0x, e0y, e0z, e0x, e0y, e0z)
    d01 = _dot(e0x, e0y, e0z, e1x, e1y, e1z)
    d11 = _dot(e1x, e1y, e1z, e1x, e1y, e1z)
    qx = plx - v0x
    qy = ply - v0y
    qz = plz - v0z
    d20 = _dot(qx, qy, qz, e0x, e0y, e0z)
    d21 = _dot(qx, qy, qz, e1x, e1y, e1z)
    denom = d00 * d11 - d01 * d01
    inv_den = 1.0 / denom          # no zero-guard: ops/intersect.py:66
    bv = (d11 * d20 - d01 * d21) * inv_den
    bw = (d00 * d21 - d01 * d20) * inv_den
    bu = 1.0 - bv - bw

    # sRGB -> linear on base color (:263; film/image.py:32-44)
    def srgb(c):
        lo = c / 12.92
        hi = ((c + 0.055) / 1.055) ** 2.4
        return jnp.where(c <= 0.04045, lo, hi)

    base_r = srgb(base_r)
    base_g = srgb(base_g)
    base_b = srgb(base_b)

    # ---- lobe selection (interaction_type.glsl:10-29) ------------------
    met_w = metallic
    trans_w = (1.0 - metallic) * transmission
    diel_w = (1.0 - transmission) * (1.0 - metallic)
    norm = 1.0 / (met_w + trans_w + diel_w)
    met_w = met_w * norm
    trans_w = trans_w * norm
    r_lobe, s0, s1 = rand(s0, s1, alive)
    is_metal = r_lobe < met_w
    is_trans = (~is_metal) & (r_lobe < met_w + trans_w)
    is_diff = ~(is_metal | is_trans)

    # ---- shading normal (mat3(world) @ n, no inverse transpose :272) ----
    nlx = bu * tsh(0) + bv * tsh(3) + bw * tsh(6)
    nly = bu * tsh(1) + bv * tsh(4) + bw * tsh(7)
    nlz = bu * tsh(2) + bv * tsh(5) + bw * tsh(8)
    nx = osh(0) * nlx + osh(1) * nly + osh(2) * nlz
    ny = osh(3) * nlx + osh(4) * nly + osh(5) * nlz
    nz = osh(6) * nlx + osh(7) * nly + osh(8) * nlz
    nx, ny, nz = _norm3(nx, ny, nz)
    ndotd = _dot(nx, ny, nz, dx, dy, dz)
    flip = ndotd >= 0.0
    ffx = jnp.where(flip, -nx, nx)
    ffy = jnp.where(flip, -ny, ny)
    ffz = jnp.where(flip, -nz, nz)
    if tex:
        # Normal-mapped shading normal from the prologue (mapped in the
        # PRE-map tangent basis, matching the jnp path); the tangent
        # basis below then rebuilds about the mapped normal.  `outside`
        # keeps the unmapped geometric n (jnp parity).
        nm = i(I_FFLAG) != 0
        ffx = jnp.where(nm, f(I_FFX), ffx)
        ffy = jnp.where(nm, f(I_FFY), ffy)
        ffz = jnp.where(nm, f(I_FFZ), ffz)

    # ---- emission pre-BSDF with pre-bounce mask (:269).  With NEE+MIS
    # the emission found by a BSDF ray from a light-sampled diffuse
    # vertex carries the balance-heuristic weight
    # prev_pdf / (prev_pdf + p_light_hit) (render/megakernel.py jnp
    # twin); the block sits after the normal compute because the weight
    # needs |n.d| — draw order is unchanged (no rands consumed here).
    if nee:
        cos_l_hit = jnp.abs(ndotd)
        p_light_hit = t * t / (jnp.maximum(cos_l_hit, 1e-9) * total_area)
        is_emitter = jnp.maximum(em_r, jnp.maximum(em_g, em_b)) > 0.0
        mis_w = (prev_pdf / (prev_pdf + p_light_hit) if nee_mis
                 else jnp.zeros_like(prev_pdf))
        w_emit = jnp.where((prev_pdf > 0.0) & is_emitter, mis_w, 1.0)
    else:
        w_emit = 1.0
    ar = ar + jnp.where(alive, mr * em_r * w_emit, 0.0)
    ag = ag + jnp.where(alive, mg * em_g * w_emit, 0.0)
    ab = ab + jnp.where(alive, mb * em_b * w_emit, 0.0)

    # tangent basis: axis pick |ff.x| > 0.1 (:274-275)
    pick_y = jnp.abs(ffx) > 0.1
    axx = jnp.where(pick_y, 0.0, 1.0)
    axy = jnp.where(pick_y, 1.0, 0.0)
    ux, uy, uz = _cross(axx, axy, jnp.zeros_like(axx), ffx, ffy, ffz)
    ux, uy, uz = _norm3(ux, uy, uz)
    vx, vy, vz = _cross(ffx, ffy, ffz, ux, uy, uz)

    # view dir in tangent space
    view_x = -_dot(dx, dy, dz, ux, uy, uz)
    view_y = -_dot(dx, dy, dz, vx, vy, vz)
    view_z = -_dot(dx, dy, dz, ffx, ffy, ffz)
    outside = -_dot(nx, ny, nz, dx, dy, dz) > 0.0

    # ---- NEE light sample (beyond reference; jnp twin:
    # render/megakernel.py shade_step nee block).  Draw order matches
    # the jnp path exactly: r1, r2, r3 on diffuse lanes, then the walk.
    if nee:
        nee_mask = alive & is_diff
        r1, s0, s1 = rand(s0, s1, nee_mask)
        r2, s0, s1 = rand(s0, s1, nee_mask)
        r3, s0, s1 = rand(s0, s1, nee_mask)
        # Area-proportional pick: one-hot from the (cdf_lo, cdf_hi) row
        # pair — exactly searchsorted-left semantics — then a HIGHEST
        # one-hot matmul gathers the winning light row per lane.
        cdf_hi = lights_ref[16, :]
        cdf_lo = lights_ref[17, :]
        oh = ((cdf_hi[:, None] >= r1[None, :])
              & (cdf_lo[:, None] < r1[None, :])).astype(jnp.float32)
        lrow = jax.lax.dot_general(
            lights_ref[0:16, :], oh,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)      # [16, T]
        lv0x, lv0y, lv0z = lrow[0], lrow[1], lrow[2]
        le1x, le1y, le1z = lrow[3], lrow[4], lrow[5]
        le2x, le2y, le2z = lrow[6], lrow[7], lrow[8]
        le_r, le_g, le_b = lrow[9], lrow[10], lrow[11]
        su = jnp.sqrt(r2)
        bu_l = 1.0 - su
        bv_l = r3 * su
        lpx = lv0x + bu_l * le1x + bv_l * le2x
        lpy = lv0y + bu_l * le1y + bv_l * le2y
        lpz = lv0z + bu_l * le1z + bv_l * le2z
        # Park non-NEE lanes before the shadow-query math (same 1e30
        # protocol as the main-path dead-lane parking).
        shx = jnp.where(nee_mask, pwx, 1e30)
        shy = jnp.where(nee_mask, pwy, 1e30)
        shz = jnp.where(nee_mask, pwz, 1e30)
        ldirx = lpx - jnp.where(nee_mask, shx, 0.0)
        ldiry = lpy - jnp.where(nee_mask, shy, 0.0)
        ldirz = lpz - jnp.where(nee_mask, shz, 0.0)
        dist2 = jnp.maximum(
            ldirx * ldirx + ldiry * ldiry + ldirz * ldirz, 1e-12)
        dist = jnp.sqrt(dist2)
        inv_dist = 1.0 / dist
        wlx = ldirx * inv_dist
        wly = ldiry * inv_dist
        wlz = ldirz * inv_dist
        lnx, lny, lnz = _cross(le1x, le1y, le1z, le2x, le2y, le2z)
        ln_len = jnp.maximum(jnp.sqrt(
            lnx * lnx + lny * lny + lnz * lnz), 1e-20)
        cos_l = jnp.abs(-(lnx * wlx + lny * wly + lnz * wlz) / ln_len)
        cos_s = _dot(ffx, ffy, ffz, wlx, wly, wlz)
        # Light direction in tangent space (the walk's eval hook input).
        wlu = _dot(wlx, wly, wlz, ux, uy, uz)
        wlv = _dot(wlx, wly, wlz, vx, vy, vz)
        t_lim = jnp.where(nee_mask, dist * (1.0 - 1e-3), 1.0)
        p_light = dist2 / (jnp.maximum(cos_l, 1e-9) * total_area)
        p_bsdf_l = jnp.maximum(cos_s, 0.0) * (1.0 / PI)
        w_light = (p_light / (p_light + p_bsdf_l) if nee_mis
                   else jnp.ones_like(p_light))
        # Escape-probability rate toward the light (ops/bsdf.py:184-195).
        al_ = roughness * roughness
        slx = wlu * al_
        sly = wlv * al_
        proj_l = jnp.maximum(
            0.5 * (jnp.sqrt(slx * slx + sly * sly + cos_s * cos_s)
                   - cos_s), 1e-7)
        esc_rate = proj_l / jnp.maximum(cos_s, 1e-7)

    # ---- fused Heitz walk (ops/bsdf.py::heitz_sample) -------------------
    alpha = roughness * roughness
    ldx_t = -view_x
    ldy_t = -view_y
    ldz_t = -view_z
    height = jnp.zeros_like(alpha)
    en_r = jnp.ones_like(alpha)
    en_g = jnp.ones_like(alpha)
    en_b = jnp.ones_like(alpha)
    ior_out = jnp.where(outside, 1.0, ior)
    ior_in = jnp.where(outside, ior, 1.0)
    # Early exit: lanes rarely walk past order 2-3, so the loop is a
    # lax.while_loop that stops once no lane in the tile is walking
    # (identical RNG streams: skipped orders would only have executed
    # fully-masked draws, which never advance any state).
    # Bool carries go through f32 masks (Mosaic bool-carry limits).
    def walk_cond(carry):
        i = carry[0]
        walking_f = carry[11]
        return (i < max_order) & (jnp.sum(walking_f) > 0.0)

    def walk_body(carry):
        (i, s0, s1, ldx_t, ldy_t, ldz_t, height, en_r, en_g, en_b,
         wo_f, walking_f, fe_r, fe_g, fe_b) = carry
        walk_outside = wo_f > 0.5
        walking = walking_f > 0.5
        below = is_trans & ~walk_outside
        hdx = jnp.where(below, -ldx_t, ldx_t)
        hdy = jnp.where(below, -ldy_t, ldy_t)
        hdz = jnp.where(below, -ldz_t, ldz_t)
        h_in = jnp.where(below, -height, height)
        r_h, s0, s1 = rand(s0, s1, walking)
        # sample_ggx_height
        sx = hdx * alpha
        sy = hdy * alpha
        length = jnp.sqrt(sx * sx + sy * sy + hdz * hdz)
        projected = jnp.maximum(0.5 * (length - hdz), 1e-7)
        delta = -jnp.log(1.0 - r_h) * hdz / projected
        h_raw = h_in + delta
        h_new = jnp.where(below, -h_raw, h_raw)
        # bool-valued where hits Mosaic's truncation limit;
        # write selects on bools with &/| instead.
        left = (below & (h_new < 0.0)) | (~below & (h_new > 0.0))
        height = jnp.where(walking, h_new, height)
        cont = walking & ~left

        # VNDF micro-normal: 2 rands
        wox = -ldx_t
        woy = -ldy_t
        woz = -ldz_t
        r1, s0, s1 = rand(s0, s1, cont)
        r2, s0, s1 = rand(s0, s1, cont)
        vhx, vhy, vhz = _norm3(alpha * wox, alpha * woy, woz)
        # basis about vh (up = +z)
        t1x_r, t1y_r, t1z_r = _cross(
            jnp.zeros_like(vhx), jnp.zeros_like(vhx), jnp.ones_like(vhx),
            vhx, vhy, vhz)
        t1n_x, t1n_y, t1n_z = _norm3(t1x_r, t1y_r, t1z_r)
        deg = vhz >= 1.0
        t1x = jnp.where(deg, 1.0, t1n_x)
        t1y = jnp.where(deg, 0.0, t1n_y)
        t1z = jnp.where(deg, 0.0, t1n_z)
        t2x, t2y, t2z = _cross(vhx, vhy, vhz, t1x, t1y, t1z)
        rr = jnp.sqrt(r1)
        phi = (2.0 * PI) * r2
        t1c = rr * jnp.cos(phi)
        t2c = rr * jnp.sin(phi)
        sfac = 0.5 * (1.0 + vhz)
        t2c = (1.0 - sfac) * jnp.sqrt(jnp.maximum(1.0 - t1c * t1c, 0.0)) \
            + sfac * t2c
        nzc = jnp.sqrt(jnp.maximum(0.0, 1.0 - t1c * t1c - t2c * t2c))
        nhx = t1c * t1x + t2c * t2x + nzc * vhx
        nhy = t1c * t1y + t2c * t2y + nzc * vhy
        nhz = t1c * t1z + t2c * t2z + nzc * vhz
        mx, my, mz = _norm3(alpha * nhx, alpha * nhy,
                            jnp.maximum(nhz, 0.0))
        vdoth = _dot(wox, woy, woz, mx, my, mz)

        # conductor: clamped mirror
        vd_c = jnp.clip(vdoth, 0.0, 1.0)
        rcx = 2.0 * mx * vd_c - wox
        rcy = 2.0 * my * vd_c - woy
        rcz = 2.0 * mz * vd_c - woz

        # diffuse: 2 extra rands, concentric disk about micro-normal
        d_mask = cont & is_diff
        dux_r, duy_r, duz_r = _cross(
            jnp.zeros_like(mx), jnp.zeros_like(mx), jnp.ones_like(mx),
            mx, my, mz)
        dun_x, dun_y, dun_z = _norm3(dux_r, duy_r, duz_r)
        degd = mz >= 1.0
        dux = jnp.where(degd, 1.0, dun_x)
        duy = jnp.where(degd, 0.0, dun_y)
        duz = jnp.where(degd, 0.0, dun_z)
        dvx, dvy, dvz = _cross(mx, my, mz, dux, duy, duz)
        rd1, s0, s1 = rand(s0, s1, d_mask)
        rd2, s0, s1 = rand(s0, s1, d_mask)
        c1 = 2.0 * rd1 - 1.0
        c2 = 2.0 * rd2 - 1.0
        c1s = jnp.where(c1 == 0.0, 1.0, c1)
        c2s = jnp.where(c2 == 0.0, 1.0, c2)
        use_c1 = c1 * c1 > c2 * c2
        radius = jnp.where(use_c1, c1, c2)
        phi_d = jnp.where(use_c1, (PI / 4.0) * (c2 / c1s),
                          (PI / 2.0) - (c1 / c2s) * (PI / 4.0))
        both_zero = (c1 == 0.0) & (c2 == 0.0)
        radius = jnp.where(both_zero, 0.0, radius)
        phi_d = jnp.where(both_zero, 0.0, phi_d)
        ddx = radius * jnp.cos(phi_d)
        ddy = radius * jnp.sin(phi_d)
        ddz = jnp.sqrt(jnp.maximum(0.0, 1.0 - ddx * ddx - ddy * ddy))
        difx = ddx * dux + ddy * dvx + ddz * mx
        dify = ddx * duy + ddy * dvy + ddz * my
        difz = ddx * duz + ddy * dvz + ddz * mz

        # dielectric: 1 extra rand, Fresnel reflect/refract
        t_mask = cont & is_trans
        eta = jnp.where(walk_outside, ior_in / ior_out, ior_out / ior_in)
        cos_t2 = 1.0 - (1.0 - vdoth * vdoth) / (eta * eta)
        cos_t = jnp.sqrt(jnp.maximum(cos_t2, 0.0))
        rs = (vdoth - eta * cos_t) / (vdoth + eta * cos_t)
        rp = (eta * vdoth - cos_t) / (eta * vdoth + cos_t)
        fres = jnp.where(cos_t2 <= 0.0, 1.0,
                         0.5 * (rs * rs + rp * rp))
        r_f, s0, s1 = rand(s0, s1, t_mask)
        refl_choice = r_f < fres
        rtx = 2.0 * mx * vdoth - wox
        rty = 2.0 * my * vdoth - woy
        rtz = 2.0 * mz * vdoth - woz
        # refract_eta (unnormalized) then normalize
        cos_i = vdoth
        cos_tr = -jnp.sqrt(jnp.maximum(
            1.0 - (1.0 - cos_i * cos_i) / (eta * eta), 0.0))
        fac = cos_i / eta + cos_tr
        rfx = mx * fac - wox / eta
        rfy = my * fac - woy / eta
        rfz = mz * fac - woz / eta
        rfx, rfy, rfz = _norm3(rfx, rfy, rfz)
        trx = jnp.where(refl_choice, rtx, rfx)
        try_ = jnp.where(refl_choice, rty, rfy)
        trz = jnp.where(refl_choice, rtz, rfz)
        walk_outside = walk_outside ^ (t_mask & ~refl_choice)

        # NEE stochastic eval through this vertex's micro-normal
        # (ops/bsdf.py:249-259): phase toward the light x escape
        # probability, weighted by the CURRENT energy x base color.
        if nee:
            phase_l = jnp.maximum(
                wlu * mx + wlv * my + cos_s * mz, 0.0) * (1.0 / PI)
            esc = jnp.exp(jnp.minimum(height * esc_rate, 0.0))
            em_ = cont & is_diff & nee_mask & (cos_s > 0.0)
            pe = jnp.where(em_, phase_l * esc, 0.0)
            fe_r = fe_r + pe * (en_r * base_r)
            fe_g = fe_g + pe * (en_g * base_g)
            fe_b = fe_b + pe * (en_b * base_b)

        # merge phases
        newx = jnp.where(is_diff, difx, jnp.where(is_trans, trx, rcx))
        newy = jnp.where(is_diff, dify, jnp.where(is_trans, try_, rcy))
        newz = jnp.where(is_diff, difz, jnp.where(is_trans, trz, rcz))
        ldx_t = jnp.where(cont, newx, ldx_t)
        ldy_t = jnp.where(cont, newy, ldy_t)
        ldz_t = jnp.where(cont, newz, ldz_t)
        mul = cont & (is_diff | is_metal)
        en_r = jnp.where(mul, en_r * base_r, en_r)
        en_g = jnp.where(mul, en_g * base_g, en_g)
        en_b = jnp.where(mul, en_b * base_b, en_b)

        return (i + 1, s0, s1, ldx_t, ldy_t, ldz_t, height,
                en_r, en_g, en_b,
                jnp.where(walk_outside, 1.0, 0.0),
                jnp.where(cont, 1.0, 0.0), fe_r, fe_g, fe_b)

    zero = jnp.zeros_like(alpha)
    carry = (jnp.int32(0), s0, s1, ldx_t, ldy_t, ldz_t, height,
             en_r, en_g, en_b, jnp.ones_like(alpha),
             jnp.where(alive, 1.0, 0.0), zero, zero, zero)
    carry = jax.lax.while_loop(walk_cond, walk_body, carry)
    (_, s0, s1, ldx_t, ldy_t, ldz_t, height, en_r, en_g, en_b,
     _, walking_f, fe_r, fe_g, fe_b) = carry
    walking = walking_f > 0.5

    # exhaustion handling (heitz/BSDF.glsl:269-272, :208)
    d_ex = is_diff & walking
    en_r = jnp.where(d_ex, 0.0, en_r)
    en_g = jnp.where(d_ex, 0.0, en_g)
    en_b = jnp.where(d_ex, 0.0, en_b)
    ldx_t = jnp.where(d_ex, 0.0, ldx_t)
    ldy_t = jnp.where(d_ex, 0.0, ldy_t)
    ldz_t = jnp.where(d_ex, 1.0, ldz_t)
    w_r = jnp.where(is_trans, base_r, en_r)
    w_g = jnp.where(is_trans, base_g, en_g)
    w_b = jnp.where(is_trans, base_b, en_b)

    # ---- NEE pending contribution (pre-visibility), with the PRE-walk
    # mask (jnp twin: contrib computed before mask *= weight) ----------
    if nee:
        geom = cos_l * total_area / dist2 * w_light
        use = nee_mask & (cos_s > 0.0)
        gg = jnp.where(use, geom, 0.0)
        c_r = mr * le_r * fe_r * gg
        c_g = mg * le_g * fe_g * gg
        c_b = mb * le_b * fe_b * gg

    mr = jnp.where(alive, mr * w_r, mr)
    mg = jnp.where(alive, mg * w_g, mg)
    mb = jnp.where(alive, mb * w_b, mb)

    # tangent -> world light dir; update ray
    ldw_x = ldx_t * ux + ldy_t * vx + ldz_t * ffx
    ldw_y = ldx_t * uy + ldy_t * vy + ldz_t * ffy
    ldw_z = ldx_t * uz + ldy_t * vz + ldz_t * ffz
    ox = jnp.where(alive, pwx, ox)
    oy = jnp.where(alive, pwy, oy)
    oz = jnp.where(alive, pwz, oz)
    dx = jnp.where(alive, ldw_x, dx)
    dy = jnp.where(alive, ldw_y, dy)
    dz = jnp.where(alive, ldw_z, dz)

    # ---- Russian roulette (:317-323) ------------------------------------
    q = jnp.maximum(mr, jnp.maximum(mg, mb))
    rr_gate = alive & (q < rr_threshold) & (bounce > rr_bounces)
    r_rr, s0, s1 = rand(s0, s1, rr_gate)
    kill = rr_gate & (r_rr > q)
    alive = alive & ~kill
    boost = rr_gate & ~kill
    inv_q = 1.0 / jnp.where(q == 0.0, 1.0, q)
    mr = jnp.where(boost, mr * inv_q, mr)
    mg = jnp.where(boost, mg * inv_q, mg)
    mb = jnp.where(boost, mb * inv_q, mb)

    bf = lambda v: jax.lax.bitcast_convert_type(v, jnp.float32)
    out_ref[O_OX, :] = ox
    out_ref[O_OY, :] = oy
    out_ref[O_OZ, :] = oz
    out_ref[O_DX, :] = dx
    out_ref[O_DY, :] = dy
    out_ref[O_DZ, :] = dz
    out_ref[O_MR, :] = mr
    out_ref[O_MG, :] = mg
    out_ref[O_MB, :] = mb
    out_ref[O_AR, :] = ar
    out_ref[O_AG, :] = ag
    out_ref[O_AB, :] = ab
    out_ref[O_S0, :] = bf(s0)
    out_ref[O_S1, :] = bf(s1)
    out_ref[O_ALIVE, :] = bf(alive.astype(jnp.int32))
    if nee:
        # pdf (cos/pi) of the sampled diffuse direction — the NEXT
        # vertex's emission MIS input (jnp twin: prev_pdf' update).
        new_pdf = jnp.where(nee_mask,
                            jnp.maximum(ldz_t, 0.0) * (1.0 / PI), 0.0)
        out_ref[O_SKIP, :] = jnp.where(alive, new_pdf, prev_pdf)
        out_ref[O_SOX, :] = shx
        out_ref[O_SOY, :] = shy
        out_ref[O_SOZ, :] = shz
        out_ref[O_SDX, :] = wlx
        out_ref[O_SDY, :] = wly
        out_ref[O_SDZ, :] = wlz
        out_ref[O_TLIM, :] = t_lim
        out_ref[O_CR, :] = c_r
        out_ref[O_CG, :] = c_g
        out_ref[O_CB, :] = c_b
    else:
        out_ref[O_SKIP, :] = prev_pdf


def build_light_block(light_tris, light_cdf):
    """Host/trace-time light table for the NEE kernel: [18, Lp] f32
    (rows 0-15 = light_tris columns, 16 = cdf with the last entry
    forced to 1.0, 17 = cdf shifted right with a leading -1.0 so the
    in-kernel two-compare one-hot reproduces searchsorted-left).
    Lanes pad to a 128 multiple with cdf_hi=2 (never selected)."""
    l = light_tris.shape[0]
    lp = -(-l // 128) * 128
    cdf_hi = jnp.asarray(light_cdf).at[l - 1].set(1.0)
    cdf_lo = jnp.concatenate([jnp.full((1,), -1.0, jnp.float32),
                              cdf_hi[:l - 1]])
    block = jnp.concatenate([
        jnp.asarray(light_tris).T,          # [16, L]
        cdf_hi[None, :], cdf_lo[None, :]], axis=0)  # [18, L]
    if lp != l:
        pad = jnp.zeros((18, lp - l), jnp.float32).at[16, :].set(2.0)
        pad = pad.at[17, :].set(1.5)
        block = jnp.concatenate([block, pad], axis=1)
    return block


def build_tri_block(tri_shade):
    """Pre-split shade table for the in-kernel selection (tri_sel):
    [192, Tp] bf16 — the hi/mid/lo bf16 splits of tri_shade.T
    (compact_intersect._split3 exactness argument; table values are
    scene data, far below the ~1e30 bf16-overflow line), lanes padded
    to a 128 multiple (padding never selected: tri ids < T)."""
    from logipathtracer_tpu.ops.pallas.compact_intersect import _split3
    t = tri_shade.shape[0]
    tp = -(-t // 128) * 128
    block = jnp.asarray(tri_shade).T  # [64, T]
    if tp != t:
        block = jnp.concatenate(
            [block, jnp.zeros((64, tp - t), jnp.float32)], axis=1)
    return _split3(block)  # [192, Tp] bf16


@functools.partial(jax.jit, static_argnames=("cfg_tuple", "rand_kind",
                                             "tile", "interpret", "nee"))
def shade_pallas(state_rows, cfg_tuple, rand_kind: str = "parity",
                 tile: int = 2048, interpret: bool = False,
                 nee: bool = False, light_block=None, tri_block=None):
    """Apply the fused shading kernel.

    state_rows: [IN_K, R] f32 (R multiple of ``tile``; ints bitcast).
    cfg_tuple: (env_r, env_g, env_b, eps, rr_threshold, rr_bounces,
                max_order, nee_mis, total_light_area) — python
                floats/ints/bools (static).
    nee: in-kernel next-event light sampling; ``light_block`` (from
    build_light_block) is then required and the output grows to
    OUT_K_NEE rows (shadow query + pending contribution — the caller
    resolves visibility through the intersect kernel and adds the
    contribution rows).
    tri_block: (from build_tri_block) in-kernel shade-table selection —
    state_rows is then the [IN_K_SEL, R] form (triangle-id row instead
    of 64 gathered table rows; untextured configs only).
    Returns [OUT_K or OUT_K_NEE, R] f32.
    """
    k, r = state_rows.shape
    tri_sel = tri_block is not None
    tex = k == IN_K_TEX
    assert (k == IN_K_SEL if tri_sel else
            k in (IN_K, IN_K_TEX)) and r % tile == 0
    out_k = OUT_K_NEE if nee else OUT_K
    kernel = functools.partial(_kernel, cfg_tuple=cfg_tuple,
                               rand_kind=rand_kind, tile=tile, nee=nee,
                               tex=tex, tri_sel=tri_sel)
    in_specs = [pl.BlockSpec((k, tile), lambda g: (0, g),
                             memory_space=pltpu.VMEM)]
    args = [state_rows]
    if tri_sel:
        in_specs.append(pl.BlockSpec(tri_block.shape, lambda g: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(tri_block)
    if nee:
        lb = light_block
        in_specs.append(pl.BlockSpec(lb.shape, lambda g: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(lb)
    return pl.pallas_call(
        kernel,
        grid=(r // tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((out_k, tile), lambda g: (0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((out_k, r), jnp.float32),
        interpret=interpret,
    )(*args)
