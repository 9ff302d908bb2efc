"""Cluster-sweep intersection kernel (Pallas TPU) + jnp twin.

The TPU-native replacement for per-ray BVH stack traversal
(shaders/path_tracing.comp:130-209): instead of every ray chasing its
own pointers (per-lane gathers — the VPU's worst case), a *uniform*
scalar loop sweeps the scene's clusters (scene/clusters.py); each
iteration culls one cluster against a whole ray tile with a slab test
and, only when some lane can still hit it (`pl.when`), runs a dense
[TILE, 128] Möller-Trumbore against the cluster's lane-packed
triangles.  All control flow is scalar-uniform; all data flow is dense
vector math from VMEM.

Layouts (see scene/clusters.py): rays [8, R] component-major
(o.xyz, d.xyz, pad, pad); cluster triangles [C, 9, 128] component-major;
AABBs [8, C]; per-object inverse rows in SMEM.

Semantics match ops/traverse.intersect_scene: acceptance t > eps and
strictly closer than the current best; min-t result identical to the
reference's walk up to fp tie-breaks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Python float (weak-typed) so the Pallas kernel doesn't capture a
# traced constant; matches shaders/common/constants.glsl:9 in f32.
INF = 3.4e38


def _mt_cluster(lox, loy, loz, ldx, ldy, ldz, trib, eps):
    """Dense Möller-Trumbore: rays [T] (components) x cluster [9, S].

    Returns t [T, S] (inf/NaN on miss — caller gates acceptance).
    """
    v0x, v0y, v0z = trib[0][None, :], trib[1][None, :], trib[2][None, :]
    e1x, e1y, e1z = trib[3][None, :], trib[4][None, :], trib[5][None, :]
    e2x, e2y, e2z = trib[6][None, :], trib[7][None, :], trib[8][None, :]
    dx, dy, dz = ldx[:, None], ldy[:, None], ldz[:, None]
    ox, oy, oz = lox[:, None], loy[:, None], loz[:, None]

    # pvec = cross(d, e2)
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = 1.0 / (e1x * px + e1y * py + e1z * pz)
    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    u = (tx * px + ty * py + tz * pz) * det
    # qvec = cross(tvec, e1)
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * det
    t = (e2x * qx + e2y * qy + e2z * qz) * det
    miss = (u < 0.0) | (u > 1.0) | (v < 0.0) | (u + v > 1.0)
    return jnp.where(miss, INF, t)


def _slab(lox, loy, loz, ldx, ldy, ldz, amin, amax, best_t):
    """Slab test of one cluster AABB (scalars) against a ray tile [T]."""
    inv_x = 1.0 / ldx
    inv_y = 1.0 / ldy
    inv_z = 1.0 / ldz
    nx = (amin[0] - lox) * inv_x
    fx = (amax[0] - lox) * inv_x
    ny = (amin[1] - loy) * inv_y
    fy = (amax[1] - loy) * inv_y
    nz = (amin[2] - loz) * inv_z
    fz = (amax[2] - loz) * inv_z
    t0 = jnp.maximum(jnp.maximum(jnp.minimum(nx, fx), jnp.minimum(ny, fy)),
                     jnp.minimum(nz, fz))
    t1 = jnp.minimum(jnp.minimum(jnp.maximum(nx, fx), jnp.maximum(ny, fy)),
                     jnp.maximum(nz, fz))
    # Same decision table as rayAABBIntersectTest (ray.glsl:39-61),
    # expressed with and/or only (Mosaic-friendly, no bool selects).
    return ((t0 <= t1)
            & (((t0 > 0.0) & (t0 < best_t)) | ((t0 <= 0.0) & (t1 > 0.0))))


def _kernel(meta_ref, inv_ref, order_ref, rays_ref, aabb_ref, tris_ref,
            t_out, tri_out, obj_out, lray, best_t, best_tri, best_obj,
            *, num_objects: int, num_clusters: int, eps: float,
            tile: int, lanes: int):
    # --- per-object local rays --------------------------------------
    ox = rays_ref[0, :]
    oy = rays_ref[1, :]
    oz = rays_ref[2, :]
    dx = rays_ref[3, :]
    dy = rays_ref[4, :]
    dz = rays_ref[5, :]

    def obj_body(o, _):
        m = [inv_ref[o, k] for k in range(12)]
        lray[o, 0, :] = m[0] * ox + m[1] * oy + m[2] * oz + m[3]
        lray[o, 1, :] = m[4] * ox + m[5] * oy + m[6] * oz + m[7]
        lray[o, 2, :] = m[8] * ox + m[9] * oy + m[10] * oz + m[11]
        lray[o, 3, :] = m[0] * dx + m[1] * dy + m[2] * dz
        lray[o, 4, :] = m[4] * dx + m[5] * dy + m[6] * dz
        lray[o, 5, :] = m[8] * dx + m[9] * dy + m[10] * dz
        return 0

    jax.lax.fori_loop(0, num_objects, obj_body, 0)

    sub_n = tile // 128
    best_t[:] = jnp.full((sub_n, 128), INF)
    best_tri[:] = jnp.full((sub_n, 128), -1, jnp.int32)
    best_obj[:] = jnp.full((sub_n, 128), -1, jnp.int32)

    sub_slot_ids = jax.lax.broadcasted_iota(jnp.int32, (128, lanes), 1)

    # Tile direction octant (rays are octant-major sorted): pick the
    # front-to-back cluster order so best_t pruning culls far clusters.
    oct_ = ((rays_ref[3, 0] > 0.0).astype(jnp.int32) * 4
            + (rays_ref[4, 0] > 0.0).astype(jnp.int32) * 2
            + (rays_ref[5, 0] > 0.0).astype(jnp.int32))

    # --- uniform cluster sweep ---------------------------------------
    def cl_body(ci, _):
        c = order_ref[oct_, ci]
        obj = meta_ref[c, 0]
        tri_base = meta_ref[c, 1]
        lox = lray[obj, 0, :]
        loy = lray[obj, 1, :]
        loz = lray[obj, 2, :]
        ldx = lray[obj, 3, :]
        ldy = lray[obj, 4, :]
        ldz = lray[obj, 5, :]
        amin = (aabb_ref[c, 0], aabb_ref[c, 1], aabb_ref[c, 2])
        amax = (aabb_ref[c, 3], aabb_ref[c, 4], aabb_ref[c, 5])
        bt = best_t[:].reshape(tile)
        hit = _slab(lox, loy, loz, ldx, ldy, ldz, amin, amax, bt)

        @pl.when(jnp.any(hit))
        def _():
            trib = tris_ref[c]
            sub_n = tile // 128
            # Sub-tile masking: sorted rays make cluster hits clumpy, so
            # most 128-ray sub-tiles of a fired cluster can still be
            # skipped (measured ~2.4x fewer MT lanes at tile=1024).
            # Static unroll; per-ray state lives in [SUB, 128] scratch
            # so every access has static indices.
            for sub in range(sub_n):
                lo_, hi_ = sub * 128, (sub + 1) * 128

                @pl.when(jnp.any(hit[lo_:hi_]))
                def _(sub=sub, lo_=lo_, hi_=hi_):
                    t = _mt_cluster(lox[lo_:hi_], loy[lo_:hi_],
                                    loz[lo_:hi_], ldx[lo_:hi_],
                                    ldy[lo_:hi_], ldz[lo_:hi_],
                                    trib, eps)
                    bt2 = best_t[sub, :]
                    ok = (t > eps) & (t < bt2[:, None])
                    t = jnp.where(ok, t, INF)
                    tmin = jnp.min(t, axis=1)
                    # argmin via first-match select (Mosaic-friendly).
                    is_min = (t == tmin[:, None]) & (tmin[:, None] < INF)
                    slot = jnp.min(
                        jnp.where(is_min, sub_slot_ids, lanes), axis=1)
                    upd = tmin < bt2
                    best_t[sub, :] = jnp.where(upd, tmin, bt2)
                    best_tri[sub, :] = jnp.where(
                        upd, tri_base + slot, best_tri[sub, :])
                    best_obj[sub, :] = jnp.where(upd, obj,
                                                 best_obj[sub, :])

        return 0

    jax.lax.fori_loop(0, num_clusters, cl_body, 0)

    t_out[0] = best_t[:]
    tri_out[0] = best_tri[:]
    obj_out[0] = best_obj[:]


@functools.partial(jax.jit, static_argnames=("tile", "eps", "interpret"))
def cluster_intersect_pallas(cl_meta, cl_inv, cl_order, cl_aabb, cl_tris,
                             rays8, tile: int = 1024, eps: float = 1e-4,
                             interpret: bool = False):
    """Closest hit for rays8 [8, R] (R multiple of ``tile``).

    cl_meta:  [C, 2] int32 (obj, tri_base) — SMEM.
    cl_inv:   [O, 12] f32 — SMEM.
    cl_order: [8, C] int32 per-octant front-to-back order — SMEM.
    cl_aabb:  [C, 8] f32 — SMEM (scalar per-cluster reads).
    cl_tris:  [C, 9, S] f32 — VMEM.
    Returns (t [R], tri [R] i32, obj [R] i32).
    """
    r = rays8.shape[1]
    c, _, lanes = cl_tris.shape
    o = cl_inv.shape[0]
    # Outputs are [R/tile, tile/128, 128] (block = one full tile): this
    # satisfies Mosaic's block constraints for any tile multiple of 128
    # where 1-D layouts would pin the tile to XLA's T(1024).
    assert tile % 128 == 0 and r % tile == 0
    sub = tile // 128

    grid = (r // tile,)
    kernel = functools.partial(
        _kernel, num_objects=o, num_clusters=c, eps=eps, tile=tile,
        lanes=lanes)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # meta
            pl.BlockSpec(memory_space=pltpu.SMEM),   # inv
            pl.BlockSpec(memory_space=pltpu.SMEM),   # order [8, C]
            pl.BlockSpec((8, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),   # rays
            pl.BlockSpec(memory_space=pltpu.SMEM),   # aabb [C, 8]
            pl.BlockSpec(cl_tris.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),   # tris
        ],
        out_specs=[
            pl.BlockSpec((1, sub, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sub, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sub, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r // tile, sub, 128), jnp.float32),
            jax.ShapeDtypeStruct((r // tile, sub, 128), jnp.int32),
            jax.ShapeDtypeStruct((r // tile, sub, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((o, 6, tile), jnp.float32),   # local rays
            pltpu.VMEM((tile // 128, 128), jnp.float32),  # best_t
            pltpu.VMEM((tile // 128, 128), jnp.int32),    # best_tri
            pltpu.VMEM((tile // 128, 128), jnp.int32),    # best_obj
        ],
        interpret=interpret,
    )(cl_meta, cl_inv, cl_order, rays8, cl_aabb, cl_tris)
    return (outs[0].reshape(r), outs[1].reshape(r), outs[2].reshape(r))


def cluster_intersect_jnp(cl_meta, cl_inv, cl_aabb, cl_tris, rays8,
                          eps: float = 1e-4):
    """Pure-jnp twin of the sweep (CI oracle; O(R x C x S) work)."""
    cl_meta = jnp.asarray(cl_meta)
    cl_inv = jnp.asarray(cl_inv)
    cl_aabb = jnp.asarray(cl_aabb)
    cl_tris = jnp.asarray(cl_tris)
    r = rays8.shape[1]
    c, _, lanes = cl_tris.shape
    ox, oy, oz = rays8[0], rays8[1], rays8[2]
    dx, dy, dz = rays8[3], rays8[4], rays8[5]

    # Local rays for every object: [O, 6, R].
    m = cl_inv  # [O, 12]
    lox = m[:, 0:1] * ox + m[:, 1:2] * oy + m[:, 2:3] * oz + m[:, 3:4]
    loy = m[:, 4:5] * ox + m[:, 5:6] * oy + m[:, 6:7] * oz + m[:, 7:8]
    loz = m[:, 8:9] * ox + m[:, 9:10] * oy + m[:, 10:11] * oz + m[:, 11:12]
    ldx = m[:, 0:1] * dx + m[:, 1:2] * dy + m[:, 2:3] * dz
    ldy = m[:, 4:5] * dx + m[:, 5:6] * dy + m[:, 6:7] * dz
    ldz = m[:, 8:9] * dx + m[:, 9:10] * dy + m[:, 10:11] * dz
    lrays = jnp.stack([lox, loy, loz, ldx, ldy, ldz], axis=1)  # [O, 6, R]

    slot_ids = jax.lax.broadcasted_iota(jnp.int32, (r, lanes), 1)

    def cl_body(ci, carry):
        best_t, best_tri, best_obj = carry
        obj = cl_meta[ci, 0]
        tri_base = cl_meta[ci, 1]
        lr = lrays[obj]
        t = _mt_cluster(lr[0], lr[1], lr[2], lr[3], lr[4], lr[5],
                        cl_tris[ci], eps)
        ok = (t > eps) & (t < best_t[:, None])
        t = jnp.where(ok, t, INF)
        tmin = jnp.min(t, axis=1)
        is_min = (t == tmin[:, None]) & (tmin[:, None] < INF)
        slot = jnp.min(jnp.where(is_min, slot_ids, lanes), axis=1)
        upd = tmin < best_t
        return (jnp.where(upd, tmin, best_t),
                jnp.where(upd, tri_base + slot, best_tri),
                jnp.where(upd, obj, best_obj))

    init = (jnp.full((r,), INF), jnp.full((r,), -1, jnp.int32),
            jnp.full((r,), -1, jnp.int32))
    return jax.lax.fori_loop(0, c, cl_body, init)
