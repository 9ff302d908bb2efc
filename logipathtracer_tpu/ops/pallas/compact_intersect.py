"""Per-cluster ray compaction sweep (Pallas TPU).

The resident cluster sweep (cluster_intersect.py) fires a dense
[128, S] Möller-Trumbore for every (128-ray sub-tile, cluster) pair
whose slab union passes.  Measured on cornell bounce rays
(scripts/bin_stats.py), a sorted 128-ray sub-tile's cluster union is
~10x wider than any single ray's pass set — i.e. ~90% of the MT lanes
test rays that could never hit the cluster.

This kernel removes that waste *without per-lane gathers* (the VPU's
worst case, measured ~20-30 ns/row at the XLA level — ROADMAP round-2
notes): for each fired cluster it compacts exactly the rays whose slab
test passed into dense CAP-lane blocks using one-hot matmuls on the
(otherwise idle) MXU:

    rank = exclusive prefix-sum of the hit mask  (roll log-steps, [G,128])
    P    = onehot(rank folded with hit)          [CAP, TILE] bf16
    rays'= split3(feats) @ P                     (gather  — ONE matmul)
    t'   = Möller-Trumbore(rays', cluster)       [CAP, S] (VPU, fast recip)
    out  = split3(results) @ P^T                 (scatter — ONE matmul)

Round-3 form (scripts/epilogue_probe.py + compact_probe.py measured it
at 2.1x the round-2 kernel): the one-hot matmuls run at DEFAULT
precision over hi/mid/lo bf16 splits of the f32 data — an EXACT
selection (disjoint exponent windows; no 1-ulp tail, unlike the
round-2 HIGHEST path) at half the MXU passes — and the rank comes from
log-step roll prefix sums instead of transpose matmuls (the round-2
'matmul' rank form was pruned round 4).  The MT's 1/det uses the
VPU approx reciprocal + one Newton step on hardware (exact divide in
interpret mode, so CPU tests stay bitwise vs the jnp twin).  The sweep
structure is otherwise identical to cluster_intersect_pallas (same
front-to-back cluster order, strict-< acceptance, min-slot tie-break);
vs the sub-tile sweep, results differ only on coplanar near-ties where
the fast-reciprocal 1-ulp t noise flips the winner (observed 36/1M
rays on cornell; scripts/compact_probe.py).

Semantics match ops/traverse.intersect_scene (closest hit, t > eps).
Reference analog: the per-ray BVH traversal of
shaders/path_tracing.comp:130-209 — re-expressed as a scalar-uniform
cluster sweep whose MT work tracks the per-ray truth instead of the
tile union.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from logipathtracer_tpu.ops.pallas.cluster_intersect import (
    INF, _fill_local_rays, _mt_cluster, _slab, _slab_inv)

# Internal miss sentinel.  Must stay exactly representable through the
# one-hot matmul's bf16 hi/lo decomposition — the output INF (3.4e38)
# overflows bf16's max normal (~3.39e38) and would round to inf, making
# the decomposition lo term NaN.  Outputs convert back to INF on miss.
BIG = 1e30

_HI = jax.lax.Precision.HIGHEST


def _vmem_params(interpret: bool):
    """Raise the Mosaic scoped-VMEM ceiling (default 16 MB): cap=256
    blocks at tile=4096 need ~20 MB of stack for the [cap, tile]
    one-hot intermediates (v5e has 128 MB; we use no deep pipeline
    buffers that would compete)."""
    return (None if interpret
            else pltpu.CompilerParams(vmem_limit_bytes=64 << 20))


def _dotg(a, b, dims):
    return jax.lax.dot_general(a, b, dimension_numbers=(dims, ((), ())),
                               precision=_HI,
                               preferred_element_type=jnp.float32)


def _split3(a):
    """a (f32) -> [3K, ...] bf16 rows (hi/mid/lo stacked on the row
    axis): successive bf16 roundings reconstruct every f32 exactly
    (8+8+8 mantissa bits in disjoint exponent windows)."""
    bh = a.astype(jnp.bfloat16)
    r1 = a - bh.astype(jnp.float32)
    bm = r1.astype(jnp.bfloat16)
    bl = (r1 - bm.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([bh, bm, bl], axis=0)


def _dot_onehot(a3, b16, k: int, dims):
    """EXACT f32 selection matmul: ``a3`` = _split3 of [K, ...] f32
    data, ``b16`` a 0/1 one-hot in bf16 — ONE DEFAULT-precision matmul
    over the stacked 3K rows, then the 3-term reconstruction sum.

    Each partial product against a 0/1 matrix is exact in the f32
    accumulator (one nonzero per contraction), and the hi+mid+lo sum
    is exact by the disjoint-window argument — so unlike the HIGHEST
    path (6 bf16 passes) this has NO 1-ulp tail at half the MXU work.
    """
    out = jax.lax.dot_general(
        a3, b16, dimension_numbers=(dims, ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32)
    return out[0:k] + out[k:2 * k] + out[2 * k:3 * k]


def _roll_prefix_consts(g_n: int, cap: int, tile: int):
    """Iotas for the roll-based rank path (rank_mode='roll').  The
    last entry is a pre-cast bf16 twin used only by the 'nohot' probe
    ablation (skip the [cap, tile] one-hot compare+cast)."""
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (g_n, 128), 1)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (g_n, 1), 0)
    iota_cap_t = jax.lax.broadcasted_iota(
        jnp.int32, (cap, tile), 0).astype(jnp.float32)
    return lane_iota, sub_iota, iota_cap_t, iota_cap_t.astype(jnp.bfloat16)


def _rank_roll(hit, lane_iota, sub_iota, g_n: int, tile: int):
    """Exclusive prefix rank of a [tile] hit mask via log-step rolls in
    the natural [G, 128] layout (the rank_mode='roll' chain).  Returns
    (rank_flat [1, tile] f32 — the hit mask folded in as -1 on non-hit
    lanes, so one-hot builds are ONE compare + cast — and n, the f32
    total hit count)."""
    h2 = hit.astype(jnp.float32).reshape(g_n, 128)
    inc = h2
    k = 1
    while k < 128:
        inc = inc + jnp.where(lane_iota >= k,
                              pltpu.roll(inc, k, axis=1), 0.0)
        k *= 2
    colex = inc - h2                   # exclusive, within each row
    tot = inc[:, 127:128]              # [G, 1] row totals
    ro = tot
    k = 1
    while k < g_n:
        ro = ro + jnp.where(sub_iota >= k,
                            pltpu.roll(ro, k, axis=0), 0.0)
        k *= 2
    n = ro[g_n - 1, 0]
    ro = ro - tot                      # exclusive row offsets
    rank_flat = jnp.where(h2 > 0.5, colex + ro, -1.0).reshape(1, tile)
    return rank_flat, n


def _compact_cluster_update_roll(hit, feats3, trib, tri_base, obj, best_t,
                                 best_tri, best_obj, rconsts, slot_ids, *,
                                 g_n: int, cap: int, lanes: int,
                                 eps: float, fast: bool = True,
                                 ablate: str = "", any_hit: bool = False):
    """Compact the slab-passing rays of ONE fired cluster into dense
    CAP-lane blocks (one-hot MXU matmuls), Möller-Trumbore them
    (elementwise VPU with fast reciprocal), and scatter the
    improvements back into the best-hit scratch: log-step roll prefix
    sums in the natural [G, 128] layout and ONE transposed [cap, tile]
    one-hot per block — no transpose matmuls, no per-group loops (the
    round-3 winner over the matmul-rank form on real workloads,
    scripts/compact_probe.py --rank; the losing variants — matmul
    ranks, MXU MT, pair/batch interleaves — were pruned round 4, see
    ROADMAP for their measurements and do-not-retry notes).

    ``feats3`` is the _split3 of the cluster's [6, tile] local-ray rows
    (callers may hoist it per object out of the cluster loop — the
    round-4 'presplit' lever).

    (A 16-bit one-hot compare was tried round 4 and is IMPOSSIBLE on
    v5e: Mosaic rejects both bf16 cmpf AND int16 cmpi vector compares
    — "Target does not support this comparison".  The f32 compare +
    bf16 cast below is the narrowest supported build.)

    ``ablate`` (probe-only, wrong results): 'norank' skips the roll
    prefix chain; 'ksmall' builds the one-hot and runs the gather/
    scatter matmuls over a 128-lane K instead of K=tile (the upper
    bound of any group-windowed gather); 'nomt' replaces the MT with a
    2-op dummy.  Used by scripts/compact_probe.py --ablate to split
    the per-fired-cluster cost on hardware."""
    lane_iota, sub_iota, iota_cap_t, iota_cap_bf = rconsts
    tile = g_n * 128
    if ablate == "norank":
        rank_flat = jnp.broadcast_to(
            lane_iota[0:1, :].astype(jnp.float32), (1, 128))
        rank_flat = jnp.concatenate([rank_flat] * g_n, axis=1)
        n = jnp.sum(hit.astype(jnp.float32))
    else:
        # Hit mask folded into the rank (-1 on non-hit lanes): the
        # per-block one-hot then needs only ONE compare + bf16 cast
        # over [cap, tile] instead of sub/cmp/and/cast.
        rank_flat, n = _rank_roll(hit, lane_iota, sub_iota, g_n, tile)
    nb = jax.lax.convert_element_type(
        jnp.ceil(n * (1.0 / cap)), jnp.int32)

    def block_body(b, _):
        basef = jax.lax.convert_element_type(b, jnp.float32) * cap
        if ablate == "ksmall":
            rank_sh = rank_flat[:, 0:128] - basef        # [1, 128]
            p_t = (rank_sh == iota_cap_t[:, 0:128]).astype(
                jnp.bfloat16)                            # [cap, 128]
            acc = _dot_onehot(feats3[:, 0:128], p_t, 6, ((1,), (1,)))
        elif ablate == "nohot":
            # probe-only: constant stand-in for the one-hot — isolates
            # the [cap, tile] compare+cast build cost (wrong results)
            p_t = iota_cap_bf
            acc = _dot_onehot(feats3, p_t, 6, ((1,), (1,)))
        else:
            rank_sh = rank_flat - basef                  # [1, tile]
            p_t = (rank_sh == iota_cap_t).astype(
                jnp.bfloat16)                            # [cap, tile]
            acc = _dot_onehot(feats3, p_t, 6, ((1,), (1,)))  # [6, cap]
        if ablate == "nomt":
            t = acc[0][:, None] + trib[0][None, 0:lanes]  # [cap, S] dummy
        else:
            t = _mt_cluster(acc[0], acc[1], acc[2], acc[3], acc[4],
                            acc[5], trib, eps, fast=fast)  # [cap, S]
        ok = t > eps
        t = jnp.where(ok, t, BIG)
        tmin = jnp.min(t, axis=1)
        is_min = (t == tmin[:, None]) & (tmin[:, None] < BIG)
        slot = jnp.min(jnp.where(is_min, slot_ids, lanes), axis=1)
        hitf = tmin < BIG
        res = jnp.concatenate([
            tmin[None, :],
            jnp.where(hitf, slot.astype(jnp.float32), 0.0)[None, :],
            hitf.astype(jnp.float32)[None, :]], axis=0)  # [3, cap]
        if ablate == "ksmall":
            out_small = _dot_onehot(_split3(res), p_t, 3, ((1,), (0,)))
            out_all = jnp.concatenate([out_small] * g_n, axis=1)
        else:
            out_all = _dot_onehot(_split3(res), p_t, 3, ((1,), (0,)))
        if ablate == "upd2d":
            # Correct alternative (probe: variants wl:upd2d): one 2-D
            # relayout per row instead of g_n unrolled [128]-lane
            # slices — same results, different issue count.
            o3 = [out_all[i].reshape(g_n, 128) for i in range(3)]
            du = (o3[2] > 0.5) & (o3[0] < best_t[:])
            best_t[:] = jnp.where(du, o3[0], best_t[:])
            best_tri[:] = jnp.where(
                du, tri_base + o3[1].astype(jnp.int32), best_tri[:])
            best_obj[:] = jnp.where(du, obj, best_obj[:])
            return 0
        for g in range(g_n):
            sl = slice(g * 128, (g + 1) * 128)
            du = (out_all[2, sl] > 0.5) & (out_all[0, sl] < best_t[g, :])
            # any_hit (NEE shadow occlusion): an accepted hit < t_max
            # BLOCKS the lane for good — park its best_t at -BIG so
            # every later slab test fails instantly (tn < -BIG is
            # impossible).  The visibility predicate t < t_max is
            # unchanged (any occluder == the closest occluder blocks);
            # t/tri/obj are NOT closest-hit values in this mode.
            best_t[g, :] = jnp.where(
                du, -BIG if any_hit else out_all[0, sl], best_t[g, :])
            best_tri[g, :] = jnp.where(
                du, tri_base + out_all[1, sl].astype(jnp.int32),
                best_tri[g, :])
            best_obj[g, :] = jnp.where(du, obj, best_obj[g, :])
        return 0

    jax.lax.fori_loop(0, nb, block_body, 0)


def _compact_loop(get_cluster, trip, meta_ref, inv_ref, rays_ref,
                  aabb_ref, tris_ref, t_out, tri_out, obj_out, lray,
                  lray3, best_t, best_tri, best_obj, *, num_objects: int,
                  eps: float, tile: int, lanes: int,
                  cap: int, has_tmax: bool,
                  fast: bool = True,
                  ablate: str = "",
                  variant: str = "", any_hit: bool = False):
    """Shared body of the resident compaction kernels: sweep the
    clusters yielded by ``get_cluster(ci)`` for ci < ``trip`` (octant
    front-to-back order in _compact_kernel; a per-tile fired-cluster
    worklist in _compact_wl_kernel).

    ``variant`` (round-4 levers, CORRECT results — bit-identical hits,
    unlike ``ablate``): 'presplit' hoists the per-cluster _split3 of
    the local-ray features out of the cluster loop (once per object
    into the ``lray3`` scratch)."""
    g_n = tile // 128
    presplit = "presplit" in variant
    ox = rays_ref[0, :]
    oy = rays_ref[1, :]
    oz = rays_ref[2, :]
    dx = rays_ref[3, :]
    dy = rays_ref[4, :]
    dz = rays_ref[5, :]

    if ablate not in ("nofill", "floor0"):
        _fill_local_rays(
            lray, inv_ref, ox, oy, oz, dx, dy, dz, num_objects,
            fast=(ablate == "fillfast") and fast)
        if presplit:
            for ob in range(num_objects):
                lray3[ob] = _split3(lray[ob, 0:6, :])
    if ablate == "floor0":
        trip = 0  # dispatch skeleton: init + outputs only

    # t_max (NEE shadow) rays clamp to BIG: padded lanes carry INF,
    # which is not matmul-safe (see BIG above); min() keeps semantics
    # (scene t values are << 1e30).
    best_t[:] = (jnp.minimum(rays_ref[6, :].reshape(g_n, 128), BIG)
                 if has_tmax else jnp.full((g_n, 128), BIG))
    best_tri[:] = jnp.full((g_n, 128), -1, jnp.int32)
    best_obj[:] = jnp.full((g_n, 128), -1, jnp.int32)

    slot_ids = jax.lax.broadcasted_iota(jnp.int32, (cap, lanes), 1)
    consts = _roll_prefix_consts(g_n, cap, tile)

    def cl_body(ci, _):
        c = get_cluster(ci)
        # floor micro-ablations (probe-only; see --ablate in
        # scripts/compact_probe.py): fB pins the dynamic object index,
        # fC pins the SMEM AABB reads, fA drops the best_t read from
        # the slab, fD replaces the slab math with 1 op.
        obj = meta_ref[0, c] * 0 if ablate == "fB" else meta_ref[0, c]
        tri_base = meta_ref[1, c]
        lox = lray[obj, 0, :]
        loy = lray[obj, 1, :]
        loz = lray[obj, 2, :]
        ldx = lray[obj, 3, :]
        ldy = lray[obj, 4, :]
        ldz = lray[obj, 5, :]
        if ablate == "fC":
            amin = (-1e30, -1e30, -1e30)
            amax = (aabb_ref[3, 0], aabb_ref[4, 0], aabb_ref[5, 0])
        else:
            amin = (aabb_ref[0, c], aabb_ref[1, c], aabb_ref[2, c])
            amax = (aabb_ref[3, c], aabb_ref[4, c], aabb_ref[5, c])
        if ablate == "fA":
            bt_flat = jnp.full((tile,), BIG)
        else:
            bt_flat = best_t[:].reshape(tile)
        if ablate == "fD":
            hit = lox < amin[0]
        else:
            hit = _slab_inv(lox, loy, loz, lray[obj, 6, :],
                            lray[obj, 7, :], lray[obj, 8, :], amin, amax,
                            bt_flat)

        # 'noupd' floor probe: a data-dependent never-true predicate
        # (best_t stays positive) keeps the slab + branch machinery
        # but never runs the update.  'noskip' runs the update for
        # EVERY cluster (correct results; isolates the any-reduce +
        # branch cost vs the extra updates).
        if ablate in ("noupd", "nofill", "fA", "fB", "fC", "fD"):
            pred = jnp.any(hit) & (best_t[0, 0] < 0.0)
        elif ablate == "noskip":
            pred = best_t[0, 0] > 0.0
        else:
            pred = jnp.any(hit)

        @pl.when(pred)
        def _():
            feats3 = (lray3[obj] if presplit
                      else _split3(lray[obj, 0:6, :]))
            _compact_cluster_update_roll(
                feats3=feats3, hit=hit, trib=tris_ref[c],
                tri_base=tri_base, obj=obj, best_t=best_t,
                best_tri=best_tri, best_obj=best_obj, rconsts=consts,
                slot_ids=slot_ids,
                g_n=g_n, cap=cap, lanes=lanes, eps=eps, fast=fast,
                ablate=ablate, any_hit=any_hit)

        return 0

    jax.lax.fori_loop(0, trip, cl_body, 0)

    t_out[0] = jnp.where(best_tri[:] >= 0, best_t[:], INF)
    tri_out[0] = best_tri[:]
    obj_out[0] = best_obj[:]


def _compact_kernel(meta_ref, inv_ref, order_ref, rays_ref, aabb_ref,
                    tris_ref, t_out, tri_out, obj_out, lray, lray3,
                    best_t, best_tri, best_obj, *, num_clusters: int,
                    **kw):
    oct_ = ((rays_ref[3, 0] > 0.0).astype(jnp.int32) * 4
            + (rays_ref[4, 0] > 0.0).astype(jnp.int32) * 2
            + (rays_ref[5, 0] > 0.0).astype(jnp.int32))
    _compact_loop(lambda ci: order_ref[oct_, ci], num_clusters,
                  meta_ref, inv_ref, rays_ref, aabb_ref, tris_ref,
                  t_out, tri_out, obj_out, lray, lray3, best_t, best_tri,
                  best_obj, **kw)


def _compact_wl_kernel(wl_ref, wn_ref, meta_ref, inv_ref, rays_ref,
                       aabb_ref, tris_ref, t_out, tri_out, obj_out, lray,
                       lray3, best_t, best_tri, best_obj, **kw):
    """Worklist-driven resident sweep: the XLA prepass
    (build_chunk_worklists over per-cluster world AABBs) hands each
    ray tile its fired clusters front-to-back; the in-kernel trip
    count is the tile's fired count (zero for parked/retired tiles),
    so the ~60 of 85 per-tile dead slab steps the octant sweep pays
    (ROADMAP round-3 ablation split) never issue."""
    i = pl.program_id(0)
    _compact_loop(lambda ci: wl_ref[i, ci], wn_ref[i],
                  meta_ref, inv_ref, rays_ref, aabb_ref, tris_ref,
                  t_out, tri_out, obj_out, lray, lray3, best_t, best_tri,
                  best_obj, **kw)


def _stream_compact_kernel(oct_ref, order_ref, live_ref, meta_ref, inv_ref,
                           chunk_aabb_ref, rays_ref,
                           aabb_ref, tris_ref, t_out, tri_out, obj_out,
                           best_t, best_tri, best_obj, *,
                           num_objects: int, chunk: int, num_chunks: int,
                           num_real: int, eps: float, tile: int,
                           lanes: int, cap: int, has_tmax: bool,
                           fast: bool = True, any_hit: bool = False):
    """HBM-streamed variant: grid (ray tiles, cluster chunks), cluster
    blocks double-buffered from HBM (see cluster_intersect.py::
    _stream_kernel for the streaming structure, incl. the front-to-back
    scalar-prefetch chunk order, the dead-tile DMA pinning, and the
    on-demand local rays) with the compacted MT update per fired
    cluster."""
    from logipathtracer_tpu.ops.pallas.cluster_intersect import _local_ray

    i = pl.program_id(0)
    j = pl.program_id(1)
    jc = order_ref[oct_ref[i], j]
    ox = rays_ref[0, :]
    oy = rays_ref[1, :]
    oz = rays_ref[2, :]
    dx = rays_ref[3, :]
    dy = rays_ref[4, :]
    dz = rays_ref[5, :]
    g_n = tile // 128

    @pl.when(j == 0)
    def _():
        best_t[:] = (jnp.minimum(rays_ref[6, :].reshape(g_n, 128), BIG)
                     if has_tmax else jnp.full((g_n, 128), BIG))
        best_tri[:] = jnp.full((g_n, 128), -1, jnp.int32)
        best_obj[:] = jnp.full((g_n, 128), -1, jnp.int32)

    slot_ids = jax.lax.broadcasted_iota(jnp.int32, (cap, lanes), 1)
    consts = _roll_prefix_consts(g_n, cap, tile)

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
                feats6 = jnp.concatenate([
                    lox[None], loy[None], loz[None],
                    ldx[None], ldy[None], ldz[None]], axis=0)
                _compact_cluster_update_roll(
                    hit, _split3(feats6), tris_ref[k],
                    tri_base, obj, best_t, best_tri, best_obj,
                    consts, slot_ids, g_n=g_n, cap=cap, lanes=lanes,
                    eps=eps, fast=fast, any_hit=any_hit)

            return 0

        jax.lax.fori_loop(0, chunk, cl_body, 0)

    @pl.when(j == num_chunks - 1)
    def _():
        t_out[0] = jnp.where(best_tri[:] >= 0, best_t[:], INF)
        tri_out[0] = best_tri[:]
        obj_out[0] = best_obj[:]


def _worklist_compact_kernel(wl_ref, wn_ref, meta_ref, inv_ref,
                             chunk_aabb_ref, aabb_ref, rays_ref, tris_hbm,
                             t_out, tri_out, obj_out, tris_buf, sem,
                             best_t, best_tri, best_obj, *, chunk: int,
                             num_real: int, eps: float, tile: int,
                             lanes: int, cap: int, has_tmax: bool,
                             fast: bool = True, any_hit: bool = False):
    """Worklist-driven HBM-streamed compaction sweep: grid (ray tiles,).

    The 2-D grid stream kernel (_stream_compact_kernel) pays a fixed
    ~2.7 us grid step for EVERY (tile, chunk) pair — measured 26 ms of
    a 104 ms outside-scene dispatch with all tiles parked
    (scripts/stream_stats.py).  Here the grid has one step per ray
    tile; an XLA prepass (cluster_intersect_worklist) gives each tile
    its fired-chunk list front-to-back, and the kernel loops over just
    those chunks with a DYNAMIC trip count, double-buffering the chunk
    triangle blocks HBM->VMEM with manual async copies.  Dead tiles
    (wn == 0) cost one grid step total; chunks the prepass culled cost
    nothing at all.

    Reference capability: shaders/path_tracing.comp:130-209 (the same
    two-level traversal contract as the other sweep kernels).
    """
    from logipathtracer_tpu.ops.pallas.cluster_intersect import _local_ray

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
            tris_hbm.at[pl.ds(jc * chunk, chunk)], tris_buf.at[slot],
            sem.at[slot])

    @pl.when(n > 0)
    def _():
        get_dma(0, 0).start()

    def wl_body(j, _):
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < n)
        def _():
            get_dma(jax.lax.rem(j + 1, 2), j + 1).start()

        jc = wl_ref[i, j]
        camin = (chunk_aabb_ref[0, jc], chunk_aabb_ref[1, jc],
                 chunk_aabb_ref[2, jc])
        camax = (chunk_aabb_ref[3, jc], chunk_aabb_ref[4, jc],
                 chunk_aabb_ref[5, jc])
        bt_flat = best_t[:].reshape(tile)
        # Re-test the chunk with the LIVE best_t: the prepass culled at
        # INF, so front-to-back best_t fills prune whole chunks here.
        chunk_hit = _slab(ox, oy, oz, dx, dy, dz, camin, camax, bt_flat)
        get_dma(slot, j).wait()

        @pl.when(jnp.any(chunk_hit))
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
                    feats6 = jnp.concatenate([
                        lox[None], loy[None], loz[None],
                        ldx[None], ldy[None], ldz[None]], axis=0)
                    _compact_cluster_update_roll(
                        hit, _split3(feats6), tris_buf[slot, k], tri_base,
                        obj, best_t, best_tri, best_obj, consts,
                        slot_ids, g_n=g_n, cap=cap, lanes=lanes,
                        eps=eps, fast=fast, any_hit=any_hit)

                return 0

            jax.lax.fori_loop(0, chunk, cl_body, 0)

        return 0

    jax.lax.fori_loop(0, n, wl_body, 0)

    t_out[0] = jnp.where(best_tri[:] >= 0, best_t[:], INF)
    tri_out[0] = best_tri[:]
    obj_out[0] = best_obj[:]


def build_chunk_worklists(chunk_min, chunk_max, rays8, tile: int,
                          has_tmax: bool = False):
    """XLA prepass for the worklist kernel: slab every ray against
    every world-space chunk AABB (mapped per ray tile so no [NC, R]
    temporary materializes), any-reduce per tile, and order each
    tile's fired chunks front-to-back along the tile's mean direction.

    Returns (wl [tiles, NC] i32 fired-first chunk order, wn [tiles]
    i32 fired counts).  Parked pools (origins at the 1e30 park) fail
    every slab, so dead tiles come out with wn == 0.
    """
    r = rays8.shape[1]
    tiles = r // tile
    ox, oy, oz = rays8[0], rays8[1], rays8[2]
    dx, dy, dz = rays8[3], rays8[4], rays8[5]
    best0 = (jnp.minimum(rays8[6], BIG) if has_tmax
             else jnp.full((r,), BIG))
    inv_x = 1.0 / dx
    inv_y = 1.0 / dy
    inv_z = 1.0 / dz

    # Batch tiles into a few mega-blocks: lax.map is a SERIAL scan, so
    # per-tile mapping cost ~10 ms of pure dispatch overhead on a 64-
    # tile pool (measured, scripts/worklist_probe.py round 3); a
    # handful of big vectorized blocks bounds the [NC, block] f32
    # temporaries (~40 MB each) while staying parallel.
    nc = chunk_min.shape[0]
    block = tile
    while (block * 2 <= r and r % (block * 2) == 0
           and nc * block * 2 * 4 < (48 << 20)):
        block *= 2
    nblk = r // block

    def hit_chunks(args):
        o1, o2, o3, i1, i2, i3, b = args                  # [block] each
        nx = (chunk_min[:, 0][:, None] - o1[None]) * i1[None]
        fx = (chunk_max[:, 0][:, None] - o1[None]) * i1[None]
        ny = (chunk_min[:, 1][:, None] - o2[None]) * i2[None]
        fy = (chunk_max[:, 1][:, None] - o2[None]) * i2[None]
        nz = (chunk_min[:, 2][:, None] - o3[None]) * i3[None]
        fz = (chunk_max[:, 2][:, None] - o3[None]) * i3[None]
        t0 = jnp.maximum(jnp.maximum(jnp.minimum(nx, fx),
                                     jnp.minimum(ny, fy)),
                         jnp.minimum(nz, fz))
        t1 = jnp.minimum(jnp.minimum(jnp.maximum(nx, fx),
                                     jnp.maximum(ny, fy)),
                         jnp.maximum(nz, fz))
        ok = ((t0 <= t1) & (((t0 > 0.0) & (t0 < b[None]))
                            | ((t0 <= 0.0) & (t1 > 0.0))))  # [NC, block]
        return ok.reshape(nc, block // tile, tile).any(axis=2)

    fired = jax.lax.map(
        hit_chunks,
        tuple(a.reshape(nblk, block) for a in
              (ox, oy, oz, inv_x, inv_y, inv_z, best0)))   # [B, NC, T/B]
    fired = fired.transpose(0, 2, 1).reshape(tiles, -1)    # [T, NC] bool
    return _order_fired(fired, chunk_min, chunk_max, rays8, tile)


def _order_fired(fired, chunk_min, chunk_max, rays8, tile: int):
    """Shared worklist tail: order each tile's fired chunks/clusters
    front-to-back along the tile's mean direction.  Stable argsort over
    an identical key => any two clusters fired by BOTH prepasses keep
    their relative visit order, which is what bit-identity needs."""
    r = rays8.shape[1]
    tiles = r // tile
    dx, dy, dz = rays8[3], rays8[4], rays8[5]
    centroid = 0.5 * (chunk_min + chunk_max)              # [NC, 3]
    mean_dir = jnp.stack(
        [dx.reshape(tiles, tile).mean(axis=1),
         dy.reshape(tiles, tile).mean(axis=1),
         dz.reshape(tiles, tile).mean(axis=1)], axis=1)   # [T, 3]
    # ordering only affects perf (earlier best_t fills), not hits —
    # default einsum precision (bf16 rounding) is fine here
    key = jnp.einsum("tk,ck->tc", mean_dir, centroid)     # [T, NC]
    key = jnp.where(fired, key, jnp.inf)
    wl = jnp.argsort(key, axis=1).astype(jnp.int32)       # [T, NC]
    wn = jnp.sum(fired.astype(jnp.int32), axis=1)         # [T]
    return wl, wn


def build_frustum_worklists(cluster_min, cluster_max, rays8, tile: int,
                            has_tmax: bool = False):
    """Frustum-prepass twin of build_chunk_worklists: the fired set is
    the per-TILE interval-arithmetic mask (ops/frustum.py) instead of
    the per-ray slab — O(tiles x C) prepass work instead of O(rays x
    C).  The mask is a proven superset of the per-ray fired set
    (tests/test_worklist.py), the in-kernel exact slab gates every
    update, and _order_fired's stable identical key preserves the
    relative visit order of commonly-fired clusters, so hits are
    bit-identical to the per-ray prepass; the extra conservative
    visits fire no updates (noupd == floor0, ROADMAP round 4)."""
    from logipathtracer_tpu.ops.frustum import frustum_cluster_mask

    best_hint = rays8[6] if has_tmax else None
    fired = frustum_cluster_mask(rays8, cluster_min, cluster_max, tile,
                                 best_hint=best_hint)
    return _order_fired(fired, cluster_min, cluster_max, rays8, tile)


@functools.partial(jax.jit,
                   static_argnames=("tile", "chunk", "eps", "has_tmax",
                                    "cap", "any_hit"))
def cluster_intersect_worklist(cl_meta, cl_inv, cl_aabb, cl_tris,
                               obj_world, rays8, tile: int = 4096,
                               chunk: int = 16, eps: float = 1e-4,
                               has_tmax: bool = False, cap: int = 128,
                               any_hit: bool = False):
    """Closest hit via the worklist-driven streamed compaction sweep.

    Same contract/layouts as cluster_intersect_stream; TPU-only (the
    manual-DMA loop has no interpreter support — CPU/interpret callers
    use the grid-based stream kernel, which computes the same hits).

    The XLA prepass here does the chunk-level culling ONCE per
    dispatch: a world-space slab of every ray against every chunk AABB
    (fused reduce, no [R, NC] materialization), any-reduced per ray
    tile, then ordered front-to-back along each tile's mean direction.

    ``tile`` must be a multiple of 1024 (whole (8, 128) vector tiles):
    the kernel's 1-D<->2-D best_t reshapes are Mosaic "unsupported
    shape cast" errors below 1024 lanes (measured on v5e at tile=512;
    tile=512 was valid before round 3 — callers must move to 1024+).
    """
    from logipathtracer_tpu.ops.pallas.cluster_intersect import (
        chunk_world_bounds)

    r = rays8.shape[1]
    c, _, lanes = cl_tris.shape
    o = cl_inv.shape[0]
    if tile % 1024 != 0:
        raise ValueError(
            f"tile={tile} must be a multiple of 1024: the kernel's "
            "1-D<->2-D best_t reshapes need whole (8, 128) vector "
            "tiles (Mosaic 'unsupported shape cast' below 1024 lanes)")
    assert cap > 0 and r % tile == 0
    sub = tile // 128
    tiles = r // tile

    cp = ((c + chunk - 1) // chunk) * chunk
    if cp != c:
        cl_meta = jnp.concatenate(
            [cl_meta, jnp.zeros((cp - c, 2), jnp.int32)], axis=0)
        cl_aabb = jnp.concatenate(
            [cl_aabb, jnp.zeros((cp - c, 8), jnp.float32)], axis=0)
        cl_tris = jnp.concatenate(
            [cl_tris, jnp.zeros((cp - c, 9, lanes), jnp.float32)], axis=0)
    num_chunks = cp // chunk
    # Mosaic DMA slices must be sublane-aligned: pad the 9 component
    # rows to 16 (the tiled VMEM layout rounds 9 -> 16 anyway, so the
    # only cost is streaming real zeros instead of implicit ones).
    cl_tris = jnp.concatenate(
        [cl_tris, jnp.zeros((cp, 7, lanes), jnp.float32)], axis=1)

    chunk_min, chunk_max = chunk_world_bounds(cl_meta, cl_aabb, obj_world,
                                              c, cp, chunk)
    wl, wn = build_chunk_worklists(chunk_min, chunk_max, rays8, tile,
                                   has_tmax=has_tmax)

    grid = (tiles,)
    kernel = functools.partial(
        _worklist_compact_kernel, chunk=chunk, num_real=c, eps=eps,
        tile=tile, lanes=lanes, cap=cap, has_tmax=has_tmax, fast=True,
        any_hit=any_hit)

    meta_t = cl_meta.T
    aabb_t = cl_aabb.T
    chunk_aabb_t = jnp.concatenate([chunk_min, chunk_max], axis=1).T
    inv_rows = cl_inv

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # (wl, wn)
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # meta [2, Cp]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # inv [O, 12]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # chunk_aabb [6, NC]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # aabb [8, Cp]
            pl.BlockSpec((8, tile), lambda i, w, n: (0, i),
                         memory_space=pltpu.VMEM),   # rays
            pl.BlockSpec(memory_space=pl.ANY),       # tris (HBM)
        ],
        out_specs=[
            pl.BlockSpec((1, sub, 128), lambda i, w, n: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sub, 128), lambda i, w, n: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sub, 128), lambda i, w, n: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, chunk, 16, lanes), jnp.float32),  # tri chunks
            pltpu.SemaphoreType.DMA((2,)),
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
    )(wl, wn, meta_t, inv_rows, chunk_aabb_t, aabb_t, rays8, cl_tris)
    return (outs[0].reshape(r), outs[1].reshape(r), outs[2].reshape(r))


@functools.partial(jax.jit, static_argnames=("tile", "cap", "eps",
                                             "interpret", "has_tmax",
                                             "ablate", "worklist",
                                             "variant", "any_hit"))
def cluster_intersect_compact(cl_meta, cl_inv, cl_order, cl_aabb, cl_tris,
                              rays8, tile: int = 1024, cap: int = 128,
                              eps: float = 1e-4, interpret: bool = False,
                              has_tmax: bool = False,
                              ablate: str = "", worklist: bool = False,
                              obj_world=None,
                              variant: str = "", any_hit: bool = False):
    """Closest hit via the compaction sweep; contract and array layouts
    identical to cluster_intersect_pallas (cluster_intersect.py).

    worklist=True (needs obj_world [O, 4, 4]): an XLA prepass slabs
    every ray against per-cluster WORLD AABBs, any-reduces per ray
    tile, and hands the kernel per-tile fired-cluster lists ordered
    front-to-back along the tile's mean direction (scalar-prefetched).
    The in-kernel sweep then visits only the conservative fired set
    (~22 of 85 on scrambled cornell; zero on parked tiles) instead of
    every cluster; the exact local-space slab still gates each update.
    Cross-cluster near-ties (coplanar geometry) may resolve differently
    than the octant order because the visit order differs.
    """
    if worklist:
        assert obj_world is not None
        from logipathtracer_tpu.ops.pallas.cluster_intersect import (
            chunk_world_bounds)
        c0 = cl_tris.shape[0]
        wmin, wmax = chunk_world_bounds(cl_meta, cl_aabb, obj_world,
                                        c0, c0, 1)
    cl_meta = cl_meta.T      # [2, C]
    cl_aabb = cl_aabb.T      # [8, C]
    r = rays8.shape[1]
    c, _, lanes = cl_tris.shape
    o = cl_inv.shape[0]
    assert tile % 128 == 0 and r % tile == 0 and cap % 8 == 0
    sub = tile // 128

    grid = (r // tile,)
    common = dict(num_objects=o, eps=eps, tile=tile,
                  lanes=lanes, cap=cap, has_tmax=has_tmax,
                  fast=not interpret, ablate=ablate, variant=variant,
                  any_hit=any_hit)
    out_shape = [
        jax.ShapeDtypeStruct((r // tile, sub, 128), jnp.float32),
        jax.ShapeDtypeStruct((r // tile, sub, 128), jnp.int32),
        jax.ShapeDtypeStruct((r // tile, sub, 128), jnp.int32),
    ]
    # 'presplit' hoists the per-cluster _split3 into a per-object bf16
    # scratch; a 1-row stub keeps the kernel signature fixed otherwise.
    lray3_shape = ((o, 18, tile) if "presplit" in variant else (1, 1, 128))
    scratch_shapes = [
        pltpu.VMEM((o, 9, tile), jnp.float32),       # local rays + 1/d
        pltpu.VMEM(lray3_shape, jnp.bfloat16),       # split3 rows
        pltpu.VMEM((sub, 128), jnp.float32),         # best_t
        pltpu.VMEM((sub, 128), jnp.int32),           # best_tri
        pltpu.VMEM((sub, 128), jnp.int32),           # best_obj
    ]

    if worklist:
        wl, wn = build_chunk_worklists(wmin, wmax, rays8, tile,
                                       has_tmax=has_tmax)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # (wl, wn)
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),   # meta
                pl.BlockSpec(memory_space=pltpu.SMEM),   # inv
                pl.BlockSpec((8, tile), lambda i, w, n: (0, i),
                             memory_space=pltpu.VMEM),   # rays
                pl.BlockSpec(memory_space=pltpu.SMEM),   # aabb [C, 8]
                pl.BlockSpec(cl_tris.shape, lambda i, w, n: (0, 0, 0),
                             memory_space=pltpu.VMEM),   # tris
            ],
            out_specs=[
                pl.BlockSpec((1, sub, 128), lambda i, w, n: (i, 0, 0),
                             memory_space=pltpu.VMEM)] * 3,
            scratch_shapes=scratch_shapes,
        )
        outs = pl.pallas_call(
            functools.partial(_compact_wl_kernel, **common),
            grid_spec=grid_spec,
            out_shape=out_shape,
            compiler_params=_vmem_params(interpret),
            interpret=interpret,
        )(wl, wn, cl_meta, cl_inv, rays8, cl_aabb, cl_tris)
        return (outs[0].reshape(r), outs[1].reshape(r),
                outs[2].reshape(r))

    kernel = functools.partial(_compact_kernel, num_clusters=c, **common)

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
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        compiler_params=_vmem_params(interpret),
        interpret=interpret,
    )(cl_meta, cl_inv, cl_order, rays8, cl_aabb, cl_tris)
    return (outs[0].reshape(r), outs[1].reshape(r), outs[2].reshape(r))
