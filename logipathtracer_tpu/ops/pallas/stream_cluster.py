"""Cluster-granular worklist stream sweep (Pallas TPU).

The chunk worklist kernel (compact_intersect.py::
cluster_intersect_worklist) culls the HBM stream at CHUNK granularity
(16 clusters): every member cluster of every per-ray-fired chunk pays
an in-kernel local-ray + slab visit — measured 861 visits/tile against
165.6 per-ray-exact fired clusters on the outside class (ROADMAP
round 3), and streams the whole chunk's triangle block whether or not
its clusters can fire.

This kernel moves the cull to CLUSTER granularity using the per-tile
interval-arithmetic frustum mask (ops/frustum.py) — a [tiles, C] test
that is conservative (a culled cluster has NO ray in the tile whose
slab could pass, so skipping it is bit-identical) and nearly free
(~50 flops per (tile, cluster) pair vs per-ray slabs' tile x that).
The prepass hands each ray tile its fired-CLUSTER list front-to-back;
the kernel loops over just those clusters with a dynamic trip count,
streaming each cluster's [16, lanes] triangle block HBM->VMEM through
an NBUF-deep manual async-copy pipeline (one 32 KB block per visit vs
the chunk kernel's 512 KB per fired chunk).

Closest-hit results match the chunk worklist kernel except
cross-cluster near-ties on coplanar geometry (visit order differs —
the same caveat as every sweep-order change, tests/test_wavefront.py).

TPU-only: make_async_copy inside fori_loop has no interpret-mode
support (CLAUDE.md round-3 notes); CPU tests cover the prepass, and
the TPU-gated identity test compares against the grid stream kernel.

Reference capability: shaders/path_tracing.comp:130-209 — the same
two-level traversal contract, with the frustum mask standing in for
the per-ray top-level BVH rejection at the tile granularity the TPU
sweep dispatches at.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from logipathtracer_tpu.ops.frustum import frustum_cluster_mask
from logipathtracer_tpu.ops.pallas.cluster_intersect import (
    INF, _local_ray, _slab_inv, chunk_world_bounds)
from logipathtracer_tpu.ops.pallas.compact_intersect import (
    BIG, _compact_cluster_update_roll, _roll_prefix_consts, _split3,
    _vmem_params)


def build_cluster_worklists(wmin, wmax, rays8, tile: int,
                            has_tmax: bool = False, chunk_gate: int = 0):
    """Per-tile fired-CLUSTER lists, front-to-back.

    wmin/wmax: [C, 3] per-cluster world AABBs.  Returns (wl [tiles, C]
    i32 fired-first cluster order, wn [tiles] i32 fired counts).

    The fired set is the frustum mask (ops/frustum.py) — conservative
    per tile, so every cluster any ray could hit is in the list.  With
    ``chunk_gate`` = k > 0, it is additionally intersected with the
    per-RAY chunk-AABB slab at k-cluster granularity (the chunk
    kernel's exact prepass; catches tiles whose origin x direction box
    overfires — measured tightness tradeoff in scripts/frustum_stats).
    Parked pools (origins at the 1e30 park) come out with wn == 0 via
    the frustum live mask.
    """
    r = rays8.shape[1]
    tiles = r // tile
    c = wmin.shape[0]
    fired = frustum_cluster_mask(
        rays8, wmin, wmax, tile,
        best_hint=rays8[6] if has_tmax else None)          # [tiles, C]

    if chunk_gate:
        cp = ((c + chunk_gate - 1) // chunk_gate) * chunk_gate
        pmin = jnp.concatenate(
            [wmin, jnp.full((cp - c, 3), BIG, jnp.float32)])
        pmax = jnp.concatenate(
            [wmax, jnp.full((cp - c, 3), -BIG, jnp.float32)])
        cmin = pmin.reshape(-1, chunk_gate, 3).min(axis=1)
        cmax = pmax.reshape(-1, chunk_gate, 3).max(axis=1)
        nc = cp // chunk_gate
        ox, oy, oz = rays8[0], rays8[1], rays8[2]
        best0 = (jnp.minimum(rays8[6], BIG) if has_tmax
                 else jnp.full((r,), BIG))
        inv_x, inv_y, inv_z = 1.0 / rays8[3], 1.0 / rays8[4], 1.0 / rays8[5]

        # Mega-block batching exactly as build_chunk_worklists
        # (compact_intersect.py): lax.map is serial, so map a few big
        # vectorized blocks, bounding the [NC, block] temporaries.
        block = tile
        while (block * 2 <= r and r % (block * 2) == 0
               and nc * block * 2 * 4 < (48 << 20)):
            block *= 2
        nblk = r // block

        def hit_chunks(args):
            o1, o2, o3, i1, i2, i3, b = args
            nx = (cmin[:, 0][:, None] - o1[None]) * i1[None]
            fx = (cmax[:, 0][:, None] - o1[None]) * i1[None]
            ny = (cmin[:, 1][:, None] - o2[None]) * i2[None]
            fy = (cmax[:, 1][:, None] - o2[None]) * i2[None]
            nz = (cmin[:, 2][:, None] - o3[None]) * i3[None]
            fz = (cmax[:, 2][:, None] - o3[None]) * i3[None]
            t0 = jnp.maximum(jnp.maximum(jnp.minimum(nx, fx),
                                         jnp.minimum(ny, fy)),
                             jnp.minimum(nz, fz))
            t1 = jnp.minimum(jnp.minimum(jnp.maximum(nx, fx),
                                         jnp.maximum(ny, fy)),
                             jnp.maximum(nz, fz))
            ok = ((t0 <= t1) & (((t0 > 0.0) & (t0 < b[None]))
                                | ((t0 <= 0.0) & (t1 > 0.0))))
            return ok.reshape(nc, block // tile, tile).any(axis=2)

        cfired = jax.lax.map(
            hit_chunks,
            tuple(a.reshape(nblk, block) for a in
                  (ox, oy, oz, inv_x, inv_y, inv_z, best0)))
        cfired = cfired.transpose(0, 2, 1).reshape(tiles, -1)  # [T, NC]
        fired = fired & jnp.repeat(cfired, chunk_gate, axis=1)[:, :c]

    centroid = 0.5 * (wmin + wmax)                         # [C, 3]
    dx = rays8[3].reshape(tiles, tile)
    dy = rays8[4].reshape(tiles, tile)
    dz = rays8[5].reshape(tiles, tile)
    mean_dir = jnp.stack(
        [dx.mean(axis=1), dy.mean(axis=1), dz.mean(axis=1)], axis=1)
    # ordering only affects perf (earlier best_t fills), not hits
    key = jnp.einsum("tk,ck->tc", mean_dir, centroid)      # [T, C]
    key = jnp.where(fired, key, jnp.inf)
    wl = jnp.argsort(key, axis=1).astype(jnp.int32)
    wn = jnp.sum(fired.astype(jnp.int32), axis=1)
    return wl, wn


def _cluster_wl_kernel(wl_ref, wn_ref, meta_ref, inv_ref, aabb_ref,
                       rays_ref, tris_hbm, t_out, tri_out, obj_out,
                       tris_buf, sem, best_t, best_tri, best_obj, *,
                       eps: float, tile: int, lanes: int, cap: int,
                       has_tmax: bool, nbuf: int, fast: bool = True,
                       any_hit: bool = False):
    """Grid (ray tiles,): dynamic trip over the tile's fired-cluster
    list, NBUF-deep manual double buffering of the per-cluster
    [16, lanes] triangle blocks (per-visit compute ~ the 32 KB DMA
    latency, so 2 slots are not enough to hide it — the chunk kernel's
    512 KB blocks amortized it, these need depth instead)."""
    i = pl.program_id(0)
    n = wn_ref[i]
    g_n = tile // 128
    ox = rays_ref[0, :]
    oy = rays_ref[1, :]
    oz = rays_ref[2, :]
    dx = rays_ref[3, :]
    dy = rays_ref[4, :]
    dz = rays_ref[5, :]

    best_t[:] = (jnp.minimum(rays_ref[6, :].reshape(g_n, 128), BIG)
                 if has_tmax else jnp.full((g_n, 128), BIG))
    best_tri[:] = jnp.full((g_n, 128), -1, jnp.int32)
    best_obj[:] = jnp.full((g_n, 128), -1, jnp.int32)

    slot_ids = jax.lax.broadcasted_iota(jnp.int32, (cap, lanes), 1)
    consts = _roll_prefix_consts(g_n, cap, tile)

    def get_dma(slot, widx):
        jc = wl_ref[i, widx]
        return pltpu.make_async_copy(
            tris_hbm.at[pl.ds(jc, 1)], tris_buf.at[slot], sem.at[slot])

    for k in range(nbuf - 1):
        @pl.when(k < n)
        def _(k=k):
            get_dma(k, k).start()

    def wl_body(j, _):
        slot = jax.lax.rem(j, nbuf)

        @pl.when(j + nbuf - 1 < n)
        def _():
            get_dma(jax.lax.rem(j + nbuf - 1, nbuf), j + nbuf - 1).start()

        jc = wl_ref[i, j]
        obj = meta_ref[0, jc]
        tri_base = meta_ref[1, jc]
        (lox, loy, loz, ldx, ldy, ldz, ix, iy, iz) = _local_ray(
            inv_ref, obj, ox, oy, oz, dx, dy, dz, fast)
        amin = (aabb_ref[0, jc], aabb_ref[1, jc], aabb_ref[2, jc])
        amax = (aabb_ref[3, jc], aabb_ref[4, jc], aabb_ref[5, jc])
        bt = best_t[:].reshape(tile)
        hit = _slab_inv(lox, loy, loz, ix, iy, iz, amin, amax, bt)
        get_dma(slot, j).wait()

        @pl.when(jnp.any(hit))
        def _():
            feats6 = jnp.concatenate([
                lox[None], loy[None], loz[None],
                ldx[None], ldy[None], ldz[None]], axis=0)
            _compact_cluster_update_roll(
                hit, _split3(feats6), tris_buf[slot, 0], tri_base,
                obj, best_t, best_tri, best_obj, consts, slot_ids,
                g_n=g_n, cap=cap, lanes=lanes, eps=eps, fast=fast,
                any_hit=any_hit)

        return 0

    jax.lax.fori_loop(0, n, wl_body, 0)

    t_out[0] = jnp.where(best_tri[:] >= 0, best_t[:], INF)
    tri_out[0] = best_tri[:]
    obj_out[0] = best_obj[:]


@functools.partial(jax.jit,
                   static_argnames=("tile", "eps", "has_tmax", "cap",
                                    "any_hit", "nbuf", "chunk_gate"))
def cluster_intersect_stream_cl(cl_meta, cl_inv, cl_aabb, cl_tris,
                                obj_world, rays8, tile: int = 4096,
                                eps: float = 1e-4, has_tmax: bool = False,
                                cap: int = 32, any_hit: bool = False,
                                nbuf: int = 4, chunk_gate: int = 0):
    """Closest hit via the cluster-granular worklist stream sweep.

    Contract and array layouts identical to cluster_intersect_worklist
    (compact_intersect.py); TPU-only (manual-DMA loop).  ``tile`` must
    be a multiple of 1024 (whole (8, 128) vector tiles — the Mosaic
    1-D<->2-D reshape limit, same as the chunk worklist kernel).
    """
    r = rays8.shape[1]
    c, _, lanes = cl_tris.shape
    if tile % 1024 != 0:
        raise ValueError(
            f"tile={tile} must be a multiple of 1024 (Mosaic "
            "'unsupported shape cast' below whole (8, 128) tiles)")
    assert cap > 0 and r % tile == 0
    sub = tile // 128
    tiles = r // tile

    # Mosaic DMA slices: sublane dims of sliced arrays must be
    # 8-aligned — pad the 9 triangle component rows to 16 (the tiled
    # VMEM layout rounds 9 -> 16 anyway).
    cl_tris = jnp.concatenate(
        [cl_tris, jnp.zeros((c, 7, lanes), jnp.float32)], axis=1)

    wmin, wmax = chunk_world_bounds(cl_meta, cl_aabb, obj_world, c, c, 1)
    wl, wn = build_cluster_worklists(wmin, wmax, rays8, tile,
                                     has_tmax=has_tmax,
                                     chunk_gate=chunk_gate)

    kernel = functools.partial(
        _cluster_wl_kernel, eps=eps, tile=tile, lanes=lanes, cap=cap,
        has_tmax=has_tmax, nbuf=nbuf, fast=True, any_hit=any_hit)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # (wl, wn)
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # meta [2, C]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # inv [O, 12]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # aabb [8, C]
            pl.BlockSpec((8, tile), lambda i, w, n: (0, i),
                         memory_space=pltpu.VMEM),   # rays
            pl.BlockSpec(memory_space=pl.ANY),       # tris (HBM)
        ],
        out_specs=[
            pl.BlockSpec((1, sub, 128), lambda i, w, n: (i, 0, 0),
                         memory_space=pltpu.VMEM)] * 3,
        scratch_shapes=[
            pltpu.VMEM((nbuf, 1, 16, lanes), jnp.float32),  # tri blocks
            pltpu.SemaphoreType.DMA((nbuf,)),
            pltpu.VMEM((sub, 128), jnp.float32),            # best_t
            pltpu.VMEM((sub, 128), jnp.int32),              # best_tri
            pltpu.VMEM((sub, 128), jnp.int32),              # best_obj
        ],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((tiles, sub, 128), jnp.float32),
            jax.ShapeDtypeStruct((tiles, sub, 128), jnp.int32),
            jax.ShapeDtypeStruct((tiles, sub, 128), jnp.int32),
        ],
        compiler_params=_vmem_params(False),
    )(wl, wn, cl_meta.T, cl_inv, cl_aabb.T, rays8, cl_tris)
    return (outs[0].reshape(r), outs[1].reshape(r), outs[2].reshape(r))
