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


def _fast_recip(x):
    """Approximate VPU reciprocal + one Newton step: ~0.5-1 ulp of the
    rounded divide at a fraction of its op count.  Kernel-only (the VPU
    approx instruction does not exist outside Mosaic)."""
    r = pl.reciprocal(x, approx=True)
    return r * (2.0 - x * r)


def _guarded_recip(x):
    """_fast_recip with exact zeros guarded (axis-aligned directions):
    the Newton step is inf*(2 - 0*inf) = NaN there; keeping the raw
    approx inf preserves the slab test's IEEE divide semantics.  Use
    for slab-cull reciprocals; 1/det paths gate NaN as a miss anyway."""
    r = pl.reciprocal(x, approx=True)
    return jnp.where(x == 0.0, r, r * (2.0 - x * r))


def _mt_cluster(lox, loy, loz, ldx, ldy, ldz, trib, eps, fast: bool = False):
    """Dense Möller-Trumbore: rays [T] (components) x cluster [9, S].

    Returns t [T, S] (inf/NaN on miss — caller gates acceptance).
    ``fast`` swaps the 1/det divide for _fast_recip (kernel-only; ~1-ulp
    t noise, the same class as the compaction one-hot tail).
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
    det_raw = e1x * px + e1y * py + e1z * pz
    det = _fast_recip(det_raw) if fast else 1.0 / det_raw
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
    """Slab test of one cluster AABB (scalars) against a ray tile [T].

    Callers with precomputed reciprocal directions use _slab_inv; the
    results are bit-identical (this computes the same 1/ld then
    multiplies)."""
    return _slab_inv(lox, loy, loz, 1.0 / ldx, 1.0 / ldy, 1.0 / ldz,
                     amin, amax, best_t)


def _slab_inv(lox, loy, loz, inv_x, inv_y, inv_z, amin, amax, best_t):
    """Slab test with precomputed reciprocal directions (hoisted out of
    the per-cluster loop: 3 VPU reciprocals per cluster -> per object
    per tile)."""
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
    # The origin-inside branch carries an explicit best_t > 0 guard:
    # bit-identical for closest-hit queries (best_t is INF/t_max/an
    # accepted t > eps, all positive — entry t 0 < best_t was already
    # implied) and it lets the any-hit shadow mode park BLOCKED lanes
    # at best_t = -BIG so they fail every later slab even when their
    # origin sits inside the AABB (compact_intersect.py round 4).
    return ((t0 <= t1)
            & (((t0 > 0.0) & (t0 < best_t))
               | ((t0 <= 0.0) & (t1 > 0.0) & (best_t > 0.0))))


def _fill_local_rays(lray, inv_ref, ox, oy, oz, dx, dy, dz,
                     num_objects: int, fast: bool = False):
    """Per-object local rays + reciprocal directions into the
    [O, 9, T] scratch (rows: o.xyz, d.xyz, 1/d.xyz).

    ``fast`` swaps the three exact divides for _fast_recip (kernel-
    only).  The reciprocals feed only the slab CULL tests, whose ~1-ulp
    perturbation can flip a hit only when a triangle intersection lies
    within 1 ulp of its cluster's AABB face — the same near-tie class
    the probe's sweep-vs-compact comparison already tolerates."""

    def obj_body(o, _):
        m = [inv_ref[o, k] for k in range(12)]
        lray[o, 0, :] = m[0] * ox + m[1] * oy + m[2] * oz + m[3]
        lray[o, 1, :] = m[4] * ox + m[5] * oy + m[6] * oz + m[7]
        lray[o, 2, :] = m[8] * ox + m[9] * oy + m[10] * oz + m[11]
        ldx = m[0] * dx + m[1] * dy + m[2] * dz
        ldy = m[4] * dx + m[5] * dy + m[6] * dz
        ldz = m[8] * dx + m[9] * dy + m[10] * dz
        lray[o, 3, :] = ldx
        lray[o, 4, :] = ldy
        lray[o, 5, :] = ldz
        if fast:
            lray[o, 6, :] = _guarded_recip(ldx)
            lray[o, 7, :] = _guarded_recip(ldy)
            lray[o, 8, :] = _guarded_recip(ldz)
        else:
            lray[o, 6, :] = 1.0 / ldx
            lray[o, 7, :] = 1.0 / ldy
            lray[o, 8, :] = 1.0 / ldz
        return 0

    jax.lax.fori_loop(0, num_objects, obj_body, 0)


def _mt_subtile_update(lox, loy, loz, ldx, ldy, ldz, trib, tri_base, obj,
                       hit, best_t, best_tri, best_obj, sub_slot_ids,
                       *, tile: int, lanes: int, eps: float,
                       fast: bool = False):
    """Masked Möller-Trumbore of one fired cluster against the tile's
    128-ray sub-tiles, updating the best-hit scratch buffers.

    Sub-tile masking: sorted rays make cluster hits clumpy, so most
    128-ray sub-tiles of a fired cluster can still be skipped (measured
    ~2.4x fewer MT lanes at tile=1024).  Static unroll; per-ray state
    lives in [SUB, 128] scratch so every access has static indices.
    """
    sub_n = tile // 128
    for sub in range(sub_n):
        lo_, hi_ = sub * 128, (sub + 1) * 128

        @pl.when(jnp.any(hit[lo_:hi_]))
        def _(sub=sub, lo_=lo_, hi_=hi_):
            t = _mt_cluster(lox[lo_:hi_], loy[lo_:hi_],
                            loz[lo_:hi_], ldx[lo_:hi_],
                            ldy[lo_:hi_], ldz[lo_:hi_],
                            trib, eps, fast=fast)
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


def _kernel(meta_ref, inv_ref, order_ref, rays_ref, aabb_ref, tris_ref,
            t_out, tri_out, obj_out, lray, best_t, best_tri, best_obj,
            *, num_objects: int, num_clusters: int, eps: float,
            tile: int, lanes: int, has_tmax: bool = False,
            fast: bool = True):
    # --- per-object local rays --------------------------------------
    ox = rays_ref[0, :]
    oy = rays_ref[1, :]
    oz = rays_ref[2, :]
    dx = rays_ref[3, :]
    dy = rays_ref[4, :]
    dz = rays_ref[5, :]

    _fill_local_rays(lray, inv_ref, ox, oy, oz, dx, dy, dz, num_objects)

    sub_n = tile // 128
    # Any-hit-style queries (NEE shadow rays) pass a per-ray t_max in
    # rays row 6: initializing best_t to it prunes every cluster beyond
    # the light, the sweep analog of an any-hit early exit.
    best_t[:] = (rays_ref[6, :].reshape(sub_n, 128) if has_tmax
                 else jnp.full((sub_n, 128), INF))
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
        obj = meta_ref[0, c]
        tri_base = meta_ref[1, c]
        lox = lray[obj, 0, :]
        loy = lray[obj, 1, :]
        loz = lray[obj, 2, :]
        ldx = lray[obj, 3, :]
        ldy = lray[obj, 4, :]
        ldz = lray[obj, 5, :]
        amin = (aabb_ref[0, c], aabb_ref[1, c], aabb_ref[2, c])
        amax = (aabb_ref[3, c], aabb_ref[4, c], aabb_ref[5, c])
        bt = best_t[:].reshape(tile)
        hit = _slab_inv(lox, loy, loz, lray[obj, 6, :], lray[obj, 7, :],
                        lray[obj, 8, :], amin, amax, bt)

        @pl.when(jnp.any(hit))
        def _():
            _mt_subtile_update(lox, loy, loz, ldx, ldy, ldz, tris_ref[c],
                               tri_base, obj, hit, best_t, best_tri,
                               best_obj, sub_slot_ids, tile=tile,
                               lanes=lanes, eps=eps, fast=fast)

        return 0

    jax.lax.fori_loop(0, num_clusters, cl_body, 0)

    t_out[0] = (jnp.where(best_tri[:] >= 0, best_t[:], INF) if has_tmax
                else best_t[:])
    tri_out[0] = best_tri[:]
    obj_out[0] = best_obj[:]


@functools.partial(jax.jit, static_argnames=("tile", "eps", "interpret",
                                             "has_tmax"))
def cluster_intersect_pallas(cl_meta, cl_inv, cl_order, cl_aabb, cl_tris,
                             rays8, tile: int = 1024, eps: float = 1e-4,
                             interpret: bool = False,
                             has_tmax: bool = False):
    """Closest hit for rays8 [8, R] (R multiple of ``tile``).

    cl_meta:  [C, 2] int32 (obj, tri_base) — SMEM.
    cl_inv:   [O, 12] f32 — SMEM.
    cl_order: [8, C] int32 per-octant front-to-back order — SMEM.
    cl_aabb:  [C, 8] f32 — SMEM (scalar per-cluster reads).
    cl_tris:  [C, 9, S] f32 — VMEM.
    Returns (t [R], tri [R] i32, obj [R] i32).

    meta/aabb are transposed on entry: 2-D SMEM arrays pad the MINOR
    dim to 128 elements, so the large (cluster) dim must be minor.
    """
    cl_meta = cl_meta.T      # [2, C]
    cl_aabb = cl_aabb.T      # [8, C]
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
        lanes=lanes, has_tmax=has_tmax, fast=not interpret)

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
            pltpu.VMEM((o, 9, tile), jnp.float32),   # local rays + 1/d
            pltpu.VMEM((tile // 128, 128), jnp.float32),  # best_t
            pltpu.VMEM((tile // 128, 128), jnp.int32),    # best_tri
            pltpu.VMEM((tile // 128, 128), jnp.int32),    # best_obj
        ],
        interpret=interpret,
    )(cl_meta, cl_inv, cl_order, rays8, cl_aabb, cl_tris)
    return (outs[0].reshape(r), outs[1].reshape(r), outs[2].reshape(r))


def _local_ray(inv_ref, obj, ox, oy, oz, dx, dy, dz, fast: bool):
    """On-demand local ray + reciprocal directions for one object
    (round 3: replaces the [O, 9, tile] prefill scratch, whose VMEM
    footprint scaled O(objects) and capped the stream tile for
    outside-class scenes)."""
    m = [inv_ref[obj, k] for k in range(12)]
    lox = m[0] * ox + m[1] * oy + m[2] * oz + m[3]
    loy = m[4] * ox + m[5] * oy + m[6] * oz + m[7]
    loz = m[8] * ox + m[9] * oy + m[10] * oz + m[11]
    ldx = m[0] * dx + m[1] * dy + m[2] * dz
    ldy = m[4] * dx + m[5] * dy + m[6] * dz
    ldz = m[8] * dx + m[9] * dy + m[10] * dz
    rcp = _guarded_recip if fast else (lambda x: 1.0 / x)
    return lox, loy, loz, ldx, ldy, ldz, rcp(ldx), rcp(ldy), rcp(ldz)


def _stream_kernel(oct_ref, order_ref, live_ref, meta_ref, inv_ref,
                   chunk_aabb_ref, rays_ref, aabb_ref, tris_ref, t_out,
                   tri_out, obj_out, best_t, best_tri, best_obj, *,
                   num_objects: int, chunk: int, num_chunks: int,
                   num_real: int, eps: float, tile: int, lanes: int,
                   has_tmax: bool = False, fast: bool = True):
    """HBM-streamed cluster sweep: grid (ray tiles, cluster chunks).

    The resident kernel holds every cluster triangle in VMEM; scenes
    beyond the VMEM budget instead stream ``chunk``-cluster blocks of
    cl_tris from HBM (Pallas double-buffers the block fetches along the
    inner grid dimension), giving the reference's ability to render
    outside.gltf-scale scenes (399,949 tris, resources/outside.gltf)
    through the same sweep.  Per-chunk world-space AABBs let whole
    chunks skip their cluster loop when no ray can hit them.

    Grid order is ray-tile-major so the best-hit scratch accumulates
    across the chunk dimension (classic K-reduction; outputs written at
    the last chunk step).  Cluster arrays are padded to a chunk
    multiple; padded slots are gated off by ``num_real`` (static).

    Round-3 scalar-prefetch triple (oct_ref [tiles], order_ref [8, NC],
    live_ref [tiles]):
      * chunks stream FRONT-TO-BACK per ray-tile direction octant —
        early chunks fill best_t so later chunks fail the slab cull
        (the stream analog of the resident sweep's cl_order);
      * ALL-PARKED tiles (live_ref[i]==0 — wavefront pools park dead
        lanes at 1e30, and sorted pools park them in contiguous tiles)
        pin every chunk DMA to the tile's first streamed block, which
        Pallas recognizes as an unchanged index and skips — the
        drain-tail iterations of small pools stop paying the full
        per-(tile, chunk) stream cost.
    Local rays are computed on demand per cluster (no [O, 9, tile]
    scratch), so the tile size no longer trades off against the scene's
    object count.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    jc = order_ref[oct_ref[i], j]
    ox = rays_ref[0, :]
    oy = rays_ref[1, :]
    oz = rays_ref[2, :]
    dx = rays_ref[3, :]
    dy = rays_ref[4, :]
    dz = rays_ref[5, :]
    sub_n = tile // 128

    @pl.when(j == 0)
    def _():
        best_t[:] = (rays_ref[6, :].reshape(sub_n, 128) if has_tmax
                     else jnp.full((sub_n, 128), INF))
        best_tri[:] = jnp.full((sub_n, 128), -1, jnp.int32)
        best_obj[:] = jnp.full((sub_n, 128), -1, jnp.int32)

    sub_slot_ids = jax.lax.broadcasted_iota(jnp.int32, (128, lanes), 1)

    # Chunk-level cull: union AABB of the chunk's clusters in WORLD
    # space, tested against the untransformed rays (conservative; t is
    # world-parameterized in both spaces, ops/traverse.py:36-48).
    camin = (chunk_aabb_ref[0, jc], chunk_aabb_ref[1, jc],
             chunk_aabb_ref[2, jc])
    camax = (chunk_aabb_ref[3, jc], chunk_aabb_ref[4, jc],
             chunk_aabb_ref[5, jc])
    bt_flat = best_t[:].reshape(tile)
    chunk_hit = _slab(ox, oy, oz, dx, dy, dz, camin, camax, bt_flat)

    @pl.when(jnp.any(chunk_hit) & (live_ref[i] == 1))
    def _():
        def cl_body(k, _):
            c = jc * chunk + k
            obj = meta_ref[0, c]
            tri_base = meta_ref[1, c]
            (lox, loy, loz, ldx, ldy, ldz, ix, iy, iz) = _local_ray(
                inv_ref, obj, ox, oy, oz, dx, dy, dz, fast)
            amin = (aabb_ref[0, c], aabb_ref[1, c], aabb_ref[2, c])
            amax = (aabb_ref[3, c], aabb_ref[4, c], aabb_ref[5, c])
            bt = best_t[:].reshape(tile)
            hit = _slab_inv(lox, loy, loz, ix, iy, iz, amin, amax, bt)

            @pl.when(jnp.any(hit) & (c < num_real))
            def _():
                _mt_subtile_update(lox, loy, loz, ldx, ldy, ldz,
                                   tris_ref[k], tri_base, obj, hit,
                                   best_t, best_tri, best_obj,
                                   sub_slot_ids, tile=tile, lanes=lanes,
                                   eps=eps, fast=fast)

            return 0

        jax.lax.fori_loop(0, chunk, cl_body, 0)

    @pl.when(j == num_chunks - 1)
    def _():
        t_out[0] = (jnp.where(best_tri[:] >= 0, best_t[:], INF)
                    if has_tmax else best_t[:])
        tri_out[0] = best_tri[:]
        obj_out[0] = best_obj[:]


def chunk_world_bounds(cl_meta, cl_aabb, obj_world, c: int, cp: int,
                       chunk: int):
    """World-space per-chunk cull AABBs: transform each cluster's 8
    local corners by its object matrix, bound, then merge ``chunk``
    consecutive (DFS-ordered) clusters.  Padded cluster slots get
    +/-INF so padded chunks never fire."""
    amin = cl_aabb[:, 0:3]
    amax = cl_aabb[:, 3:6]
    picks = jnp.asarray(
        [[(ci >> 2) & 1, (ci >> 1) & 1, ci & 1] for ci in range(8)],
        jnp.float32)  # [8, 3]
    corners = (amin[:, None, :] * (1.0 - picks[None])
               + amax[:, None, :] * picks[None])          # [Cp, 8, 3]
    mats = jnp.take(obj_world, jnp.maximum(cl_meta[:, 0], 0),
                    axis=0)                               # [Cp, 4, 4]
    wc = (jnp.einsum("cij,ckj->cki", mats[:, :3, :3], corners,
                     precision=jax.lax.Precision.HIGHEST)
          + mats[:, None, :3, 3])                         # [Cp, 8, 3]
    valid = (jnp.arange(cp) < c)[:, None]
    wmin = jnp.where(valid, wc.min(axis=1), INF)
    wmax = jnp.where(valid, wc.max(axis=1), -INF)
    chunk_min = wmin.reshape(cp // chunk, chunk, 3).min(axis=1)
    chunk_max = wmax.reshape(cp // chunk, chunk, 3).max(axis=1)
    return chunk_min, chunk_max


@functools.partial(jax.jit,
                   static_argnames=("tile", "chunk", "eps", "interpret",
                                    "has_tmax", "cap", "any_hit"))
def cluster_intersect_stream(cl_meta, cl_inv, cl_aabb, cl_tris, obj_world,
                             rays8, tile: int = 2048, chunk: int = 16,
                             eps: float = 1e-4, interpret: bool = False,
                             has_tmax: bool = False, cap: int = 0,
                             any_hit: bool = False):
    """Closest hit via the HBM-streamed sweep (big scenes).

    Same contract as cluster_intersect_pallas; obj_world [O, 4, 4] is
    used to build the world-space per-chunk cull AABBs.  All padding
    (rays to ``tile``, clusters to ``chunk``) happens here.  cap > 0
    switches the per-cluster MT to the ray-compaction update
    (compact_intersect.py) with that block width.
    """
    r = rays8.shape[1]
    c, _, lanes = cl_tris.shape
    o = cl_inv.shape[0]
    assert tile % 128 == 0 and r % tile == 0
    sub = tile // 128

    # --- pad clusters to a chunk multiple -----------------------------
    cp = ((c + chunk - 1) // chunk) * chunk
    if cp != c:
        cl_meta = jnp.concatenate(
            [cl_meta, jnp.zeros((cp - c, 2), jnp.int32)], axis=0)
        cl_aabb = jnp.concatenate(
            [cl_aabb, jnp.zeros((cp - c, 8), jnp.float32)], axis=0)
        cl_tris = jnp.concatenate(
            [cl_tris, jnp.zeros((cp - c, 9, lanes), jnp.float32)], axis=0)
    num_chunks = cp // chunk

    # --- world-space chunk AABBs (8 transformed corners per cluster) --
    chunk_min, chunk_max = chunk_world_bounds(cl_meta, cl_aabb, obj_world,
                                              c, cp, chunk)
    # SMEM 2-D arrays pad the minor dim to 128 elements: keep the large
    # (cluster/chunk) dimension minor or a 2k-cluster scene blows the
    # 1 MB SMEM budget (observed on v5e).
    chunk_aabb_t = jnp.concatenate([chunk_min, chunk_max], axis=1).T
    meta_t = cl_meta.T
    aabb_t = cl_aabb.T

    # --- per-octant front-to-back chunk order + per-tile octant -------
    # (scalar-prefetch pair: drives the tris BlockSpec index map so
    # chunks STREAM in near-first order for each ray tile — best_t then
    # culls the far chunks' cluster loops.  Padded-chunk centroids are
    # non-finite and sort last.)
    centroid = 0.5 * (chunk_min + chunk_max)              # [NC, 3]
    signs = jnp.asarray([[1.0 if oc & 4 else -1.0,
                          1.0 if oc & 2 else -1.0,
                          1.0 if oc & 1 else -1.0] for oc in range(8)],
                        jnp.float32)                      # [8, 3]
    keys = jnp.where(jnp.isfinite(centroid).all(axis=1)[None, :],
                     signs @ centroid.T, INF)             # [8, NC]
    chunk_order = jnp.argsort(keys, axis=1).astype(jnp.int32)
    d0 = rays8[3:6, ::tile]                               # [3, tiles]
    oct_tile = ((d0[0] > 0).astype(jnp.int32) * 4
                + (d0[1] > 0).astype(jnp.int32) * 2
                + (d0[2] > 0).astype(jnp.int32))          # [tiles]
    # All-parked tiles (every origin at the 1e30 park) pin their chunk
    # DMAs to one block in the index map below — Pallas skips refetches
    # of an unchanged block index, so dead tiles stop paying the
    # per-chunk stream cost.
    live_tile = (jnp.min(rays8[0].reshape(-1, tile), axis=1)
                 < 1e29).astype(jnp.int32)                # [tiles]

    grid = (r // tile, num_chunks)
    if cap:
        from logipathtracer_tpu.ops.pallas.compact_intersect import \
            _stream_compact_kernel
        kernel = functools.partial(
            _stream_compact_kernel, num_objects=o, chunk=chunk,
            num_chunks=num_chunks, num_real=c, eps=eps, tile=tile,
            lanes=lanes, cap=cap, has_tmax=has_tmax, fast=not interpret,
            any_hit=any_hit)
    else:
        # any_hit is a compaction-update lever; the plain sweep's
        # closest-hit answer yields the identical occlusion predicate.
        kernel = functools.partial(
            _stream_kernel, num_objects=o, chunk=chunk,
            num_chunks=num_chunks, num_real=c, eps=eps, tile=tile,
            lanes=lanes, has_tmax=has_tmax, fast=not interpret)

    def tris_index(i, j, ot, co, lv):
        first = co[ot[i], 0]
        return (jnp.where(lv[i] == 1, co[ot[i], j], first), 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # (oct_tile, chunk_order, live_tile)
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # meta [2, Cp]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # inv [O, 12]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # chunk_aabb [6, NC]
            pl.BlockSpec((8, tile), lambda i, j, ot, co, lv: (0, i),
                         memory_space=pltpu.VMEM),   # rays
            pl.BlockSpec(memory_space=pltpu.SMEM),   # aabb [8, Cp]
            pl.BlockSpec((chunk, 9, lanes), tris_index,
                         memory_space=pltpu.VMEM),   # tris (streamed
                                                     # front-to-back)
        ],
        out_specs=[
            pl.BlockSpec((1, sub, 128),
                         lambda i, j, ot, co, lv: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sub, 128),
                         lambda i, j, ot, co, lv: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sub, 128),
                         lambda i, j, ot, co, lv: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((sub, 128), jnp.float32),          # best_t
            pltpu.VMEM((sub, 128), jnp.int32),            # best_tri
            pltpu.VMEM((sub, 128), jnp.int32),            # best_obj
        ],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((r // tile, sub, 128), jnp.float32),
            jax.ShapeDtypeStruct((r // tile, sub, 128), jnp.int32),
            jax.ShapeDtypeStruct((r // tile, sub, 128), jnp.int32),
        ],
        interpret=interpret,
    )(oct_tile, chunk_order, live_tile, meta_t, cl_inv, chunk_aabb_t,
      rays8, aabb_t, cl_tris)
    return (outs[0].reshape(r), outs[1].reshape(r), outs[2].reshape(r))


def cluster_intersect_jnp(cl_meta, cl_inv, cl_aabb, cl_tris, rays8,
                          eps: float = 1e-4, t_max=None):
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

    init_t = jnp.full((r,), INF) if t_max is None else t_max
    init = (init_t, jnp.full((r,), -1, jnp.int32),
            jnp.full((r,), -1, jnp.int32))
    bt, btri, bobj = jax.lax.fori_loop(0, c, cl_body, init)
    if t_max is not None:
        bt = jnp.where(btri >= 0, bt, INF)
    return bt, btri, bobj
