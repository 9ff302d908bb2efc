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
log-step roll prefix sums instead of transpose matmuls (rank_mode
switches back to the round-2 'matmul' form).  The MT's 1/det uses the
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


def _prefix_consts(g_n: int):
    """0/1 helper matrices for the in-kernel prefix sums (exact in any
    matmul precision)."""
    ii = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    ident = (ii == jj).astype(jnp.float32)
    ltri = (ii > jj).astype(jnp.float32)  # row l sums hits of l' < l
    gi = jax.lax.broadcasted_iota(jnp.int32, (g_n, g_n), 0)
    gj = jax.lax.broadcasted_iota(jnp.int32, (g_n, g_n), 1)
    gtri = (gi < gj).astype(jnp.float32)  # col g sums rows g' < g
    ones_row = jnp.ones((1, 128), jnp.float32)
    return ident, ltri, gtri, ones_row


def _mt_mxu(acc, trib_mt, centroid, eps, lanes, fast: bool = False):
    """Möller-Trumbore of one compacted block via ONE MXU matmul.

    acc: [6+, cap] compacted local rays; trib_mt:
    [16, 4S] bilinear feature matrix (clusters.py::build_mt_features);
    centroid: (cx, cy, cz) scalars — ray origins are shifted into the
    cluster-local frame the features were built in.  Returns t [cap, S]
    with BIG on miss.  The matmul's bf16x3 HIGHEST passes carry ~1-ulp
    noise vs the elementwise form (acceptable: same class as the
    one-hot gather tail).

    Round-3 epilogue (VERDICT r2 item 1): ``fast`` swaps the exact
    1/det — which dominated the round-2 MXU attempt's epilogue — for
    the approx-reciprocal + Newton step the VPU MT already uses on
    hardware, so the whole post-matmul chain is ~15 vreg-ops/pair vs
    the elementwise MT's ~60 (measured via scripts/compact_probe.py
    --mxu --rank roll).
    """
    from logipathtracer_tpu.ops.pallas.cluster_intersect import _fast_recip

    opx = acc[0] - centroid[0]
    opy = acc[1] - centroid[1]
    opz = acc[2] - centroid[2]
    dx, dy, dz = acc[3], acc[4], acc[5]
    mx = opy * dz - opz * dy
    my = opz * dx - opx * dz
    mz = opx * dy - opy * dx
    one = jnp.ones_like(dx)
    zero = jnp.zeros_like(dx)
    frows = jnp.concatenate([
        dx[None, :], dy[None, :], dz[None, :],
        mx[None, :], my[None, :], mz[None, :],
        opx[None, :], opy[None, :], opz[None, :], one[None, :],
        zero[None, :], zero[None, :], zero[None, :],
        zero[None, :], zero[None, :], zero[None, :]], axis=0)  # [16, cap]
    prod = _dotg(frows, trib_mt, ((0,), (0,)))                 # [cap, 4S]
    det = prod[:, 0 * lanes:1 * lanes]
    un = prod[:, 1 * lanes:2 * lanes]
    vn = prod[:, 2 * lanes:3 * lanes]
    tn = prod[:, 3 * lanes:4 * lanes]
    inv = _fast_recip(det) if fast else 1.0 / det
    u = un * inv
    v = vn * inv
    t = tn * inv
    miss = (u < 0.0) | (u > 1.0) | (v < 0.0) | (u + v > 1.0)
    return jnp.where(miss, BIG, t)


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


def _compact_cluster_update_roll(hit, feats6, trib, tri_base, obj, best_t,
                                 best_tri, best_obj, rconsts, slot_ids, *,
                                 g_n: int, cap: int, lanes: int,
                                 eps: float, fast: bool = True,
                                 mxu: bool = False, centroid=None,
                                 ablate: str = ""):
    """rank_mode='roll' variant of _compact_cluster_update: log-step
    roll prefix sums in the natural [G, 128] layout and ONE transposed
    [cap, tile] one-hot per block — no transpose matmuls, no per-group
    loops (measured vs the matmul-rank form on real workloads via
    scripts/compact_probe.py --rank).

    ``mxu``: trib holds the [16, 4S] bilinear feature matrix and each
    block's Möller-Trumbore runs as one MXU matmul with the fast-recip
    epilogue (_mt_mxu) instead of the elementwise VPU chain.

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
    feats3 = _split3(feats6)               # [18, tile] bf16

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
        elif mxu:
            t = _mt_mxu(acc, trib, centroid, eps, lanes, fast=fast)
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
            best_t[g, :] = jnp.where(du, out_all[0, sl], best_t[g, :])
            best_tri[g, :] = jnp.where(
                du, tri_base + out_all[1, sl].astype(jnp.int32),
                best_tri[g, :])
            best_obj[g, :] = jnp.where(du, obj, best_obj[g, :])
        return 0

    jax.lax.fori_loop(0, nb, block_body, 0)


def _block_chain(rank_flat, feats3, trib, basef, iota_cap_t, slot_ids,
                 lanes, eps, fast):
    """One compaction block of one chain: one-hot select the block's
    ranked lanes, MT them against the cluster, min-reduce per lane,
    scatter (t, slot, hit) back through the transposed one-hot.
    Returns [3, tile] (rows: t, slot, hitflag) ready for the caller's
    best merge."""
    p_t = (rank_flat - basef == iota_cap_t).astype(jnp.bfloat16)
    acc = _dot_onehot(feats3, p_t, 6, ((1,), (1,)))      # [6, cap]
    t = _mt_cluster(acc[0], acc[1], acc[2], acc[3], acc[4],
                    acc[5], trib, eps, fast=fast)        # [cap, S]
    ok = t > eps
    t = jnp.where(ok, t, BIG)
    tmin = jnp.min(t, axis=1)
    is_min = (t == tmin[:, None]) & (tmin[:, None] < BIG)
    slot = jnp.min(jnp.where(is_min, slot_ids, lanes), axis=1)
    hitf = tmin < BIG
    res = jnp.concatenate([
        tmin[None, :],
        jnp.where(hitf, slot.astype(jnp.float32), 0.0)[None, :],
        hitf.astype(jnp.float32)[None, :]], axis=0)      # [3, cap]
    return _dot_onehot(_split3(res), p_t, 3, ((1,), (0,)))


def _compact_cluster_update_roll_tile2(
        hitA, featsA, tribA, tri_baseA, objA,
        hitB, featsB, tribB, tri_baseB, objB,
        best_t, best_tri, best_obj, rconsts, slot_ids, *,
        g_n: int, cap: int, lanes: int, eps: float, fast: bool = True):
    """TWO independent ray TILES' update chains in one straight-line
    block body (pair_tiles mode).  Unlike the pair-mode loss (ROADMAP:
    stale-gate superset + shared merge), the chains here are FULLY
    independent: each tile's slab gate reads its own live best_t, each
    merge targets its own best rows (A rows [0:g_n], B rows
    [g_n:2*g_n]), and their clusters come from different worklists —
    the only shared cost is nb = max over the two tiles' block counts.
    Bit-identical per tile to the serial worklist sweep."""
    lane_iota, sub_iota, iota_cap_t, _ = rconsts
    tile = g_n * 128
    rankA, nA = _rank_roll(hitA, lane_iota, sub_iota, g_n, tile)
    rankB, nB = _rank_roll(hitB, lane_iota, sub_iota, g_n, tile)
    nb = jax.lax.convert_element_type(
        jnp.ceil(jnp.maximum(nA, nB) * (1.0 / cap)), jnp.int32)
    fA3 = _split3(featsA)
    fB3 = _split3(featsB)

    def block_body(b, _):
        basef = jax.lax.convert_element_type(b, jnp.float32) * cap
        outA = _block_chain(rankA, fA3, tribA, basef, iota_cap_t,
                            slot_ids, lanes, eps, fast)
        outB = _block_chain(rankB, fB3, tribB, basef, iota_cap_t,
                            slot_ids, lanes, eps, fast)
        for g in range(g_n):
            sl = slice(g * 128, (g + 1) * 128)
            for out_all, tri_base, obj, row in (
                    (outA, tri_baseA, objA, g),
                    (outB, tri_baseB, objB, g_n + g)):
                du = ((out_all[2, sl] > 0.5)
                      & (out_all[0, sl] < best_t[row, :]))
                best_t[row, :] = jnp.where(du, out_all[0, sl],
                                           best_t[row, :])
                best_tri[row, :] = jnp.where(
                    du, tri_base + out_all[1, sl].astype(jnp.int32),
                    best_tri[row, :])
                best_obj[row, :] = jnp.where(du, obj, best_obj[row, :])
        return 0

    jax.lax.fori_loop(0, nb, block_body, 0)


def _compact_cluster_update_roll_pair(
        hitA, featsA, tribA, tri_baseA, objA,
        hitB, featsB, tribB, tri_baseB, objB,
        best_t, best_tri, best_obj, rconsts, slot_ids, *,
        g_n: int, cap: int, lanes: int, eps: float, fast: bool = True):
    """TWO independent compaction chains in ONE straight-line block
    body (the round-4 latency-wall lever, ROADMAP).  Each dependent
    slab->rank->one-hot->gather->MT->scatter sequence costs ~2-4 us of
    dataflow latency regardless of width, and Mosaic does not overlap
    ADJACENT regions — the failed ``batch`` unroll kept one inner
    fori_loop per cluster, so its chains stayed in separate regions.
    Here clusters A and B share one fori_loop over max(nbA, nbB)
    blocks and every block body emits both chains' ops back to back,
    giving the VLIW scheduler two independent dataflows to interleave.

    Bit-identical to serial _compact_cluster_update_roll visits: B's
    slab mask was built against the pre-pair best_t (a superset of the
    lanes a post-A-merge slab admits), but extra lanes must still beat
    the live best_t at the strict-< merge, and the A-then-B merge
    order preserves the serial tie-break.  Blocks past a chain's own
    nb build all-zero one-hots, gather degenerate zero rays whose MT
    fails ``t > eps``, and scatter nothing.
    """
    lane_iota, sub_iota, iota_cap_t, _ = rconsts
    tile = g_n * 128
    rankA, nA = _rank_roll(hitA, lane_iota, sub_iota, g_n, tile)
    rankB, nB = _rank_roll(hitB, lane_iota, sub_iota, g_n, tile)
    nb = jax.lax.convert_element_type(
        jnp.ceil(jnp.maximum(nA, nB) * (1.0 / cap)), jnp.int32)
    fA3 = _split3(featsA)
    fB3 = _split3(featsB)

    def chain(rank_flat, feats3, trib, basef):
        return _block_chain(rank_flat, feats3, trib, basef, iota_cap_t,
                            slot_ids, lanes, eps, fast)

    def block_body(b, _):
        basef = jax.lax.convert_element_type(b, jnp.float32) * cap
        outA = chain(rankA, fA3, tribA, basef)
        outB = chain(rankB, fB3, tribB, basef)
        for g in range(g_n):
            sl = slice(g * 128, (g + 1) * 128)
            for out_all, tri_base, obj in ((outA, tri_baseA, objA),
                                           (outB, tri_baseB, objB)):
                du = ((out_all[2, sl] > 0.5)
                      & (out_all[0, sl] < best_t[g, :]))
                best_t[g, :] = jnp.where(du, out_all[0, sl], best_t[g, :])
                best_tri[g, :] = jnp.where(
                    du, tri_base + out_all[1, sl].astype(jnp.int32),
                    best_tri[g, :])
                best_obj[g, :] = jnp.where(du, obj, best_obj[g, :])
        return 0

    jax.lax.fori_loop(0, nb, block_body, 0)


def _compact_cluster_update(hit, feats6, trib, tri_base, obj, best_t,
                            best_tri, best_obj, consts, slot_ids, *,
                            g_n: int, cap: int, lanes: int, eps: float,
                            mxu: bool = False, centroid=None,
                            fast: bool = True):
    """Compact the slab-passing rays of ONE fired cluster into dense
    CAP-lane blocks (one-hot MXU matmuls), Möller-Trumbore them
    (elementwise VPU with fast reciprocal, or one MXU matmul when
    ``mxu`` — trib then holds the [16, 4S] feature matrix), and scatter
    the improvements back into the best-hit scratch.

    feats6: [6, tile] local rays (o.xyz, d.xyz) — one 2-D ref read.

    Round-3 restructure (scripts/epilogue_probe.py measurements):
      * gather/scatter run as ONE [6,tile]@[tile,cap] / [3,cap]@[tile,cap]^T
        matmul each (K=tile) instead of per-128-group loops — the
        per-group matmuls were launch-overhead-bound (measured 12x
        slower in isolation);
      * the best-t acceptance moved to the scatter side (equivalent:
        min over the superset {t > eps} equals min over {t > eps,
        t < best} whenever the latter is nonempty, and the scatter
        compare rejects the rest), dropping the best_t gather row;
      * the MT's 1/det runs as approx-reciprocal + one Newton step on
        TPU (``fast``) — the exact divide dominated the epilogue.
    """
    ident, ltri, gtri, ones_row = consts
    h2 = hit.astype(jnp.float32).reshape(g_n, 128)      # [G, 128]
    # Transpose the hit mask so ranks live on sublanes (where the
    # one-hot comparison needs them) — an MXU transpose, not a
    # relayout.  All reductions stay 2-D (1-D [G] vectors trip Mosaic
    # relayout bugs).
    hit_t = _dotg(ident, h2, ((1,), (1,)))              # [128, G]
    row_tot = _dotg(ones_row, hit_t, ((1,), (0,)))      # [1, G]
    n = jnp.sum(row_tot)
    # Row offsets: exclusive prefix over the G groups.
    ro = _dotg(row_tot, gtri, ((1,), (0,)))             # [1, G]
    colex = _dotg(ltri, hit_t, ((1,), (0,)))            # [128, G]
    rank_t = colex + ro                                 # [128, G]
    nb = jax.lax.convert_element_type(
        jnp.ceil(n * (1.0 / cap)), jnp.int32)
    iota_cap = jax.lax.broadcasted_iota(
        jnp.int32, (128, cap), 1).astype(jnp.float32)

    def onehot(g, basef):
        return ((rank_t[:, g:g + 1] - basef == iota_cap)
                & (hit_t[:, g:g + 1] > 0.5)).astype(jnp.float32)

    def block_body(b, _):
        basef = jax.lax.convert_element_type(b, jnp.float32) * cap
        p_all = jnp.concatenate(
            [onehot(g, basef) for g in range(g_n)], axis=0)  # [tile, cap]
        acc = _dotg(feats6, p_all, ((1,), (0,)))             # [6, cap]

        if mxu:
            t = _mt_mxu(acc, trib, centroid, eps, lanes)  # [cap, S]
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
        out_all = _dotg(res, p_all, ((1,), (1,)))        # [3, tile]
        for g in range(g_n):
            sl = slice(g * 128, (g + 1) * 128)
            du = (out_all[2, sl] > 0.5) & (out_all[0, sl] < best_t[g, :])
            best_t[g, :] = jnp.where(du, out_all[0, sl], best_t[g, :])
            best_tri[g, :] = jnp.where(
                du, tri_base + out_all[1, sl].astype(jnp.int32),
                best_tri[g, :])
            best_obj[g, :] = jnp.where(du, obj, best_obj[g, :])
        return 0

    jax.lax.fori_loop(0, nb, block_body, 0)


def _compact_loop(get_cluster, trip, meta_ref, inv_ref, rays_ref,
                  aabb_ref, tris_ref, t_out, tri_out, obj_out, lray,
                  best_t, best_tri, best_obj, *, num_objects: int,
                  eps: float, tile: int, lanes: int,
                  cap: int, has_tmax: bool, mxu: bool = False,
                  fast: bool = True, rank_mode: str = "matmul",
                  ablate: str = "", fill_fast: bool = False,
                  batch: int = 1, max_ci: int = 0, pair: bool = False):
    """Shared body of the resident compaction kernels: sweep the
    clusters yielded by ``get_cluster(ci)`` for ci < ``trip`` (octant
    front-to-back order in _compact_kernel; a per-tile fired-cluster
    worklist in _compact_wl_kernel).

    ``batch`` > 1 (worklist mode only): visit ``batch`` clusters per
    fori_loop step, unrolled with NO per-cluster pl.when — Mosaic's
    dynamic-trip-count loop costs ~2.4 us/step of fixed machinery
    (ROADMAP round-3 floor split), and on worklist-prefired clusters
    the exact-slab branch saves nothing (noskip measured == wl), so
    fewer/wider steps amortize the floor and let the ``batch``
    independent slab/rank/MT chains overlap.  Ragged tails are safe
    without sentinels: visits past ``trip`` read unfired clusters
    (world-AABB prepass rejected => the exact local slab rejects every
    lane => zero compaction blocks), and indices are clamped to
    ``max_ci``-1 (duplicate visits are best-merge idempotent)."""
    g_n = tile // 128
    ox = rays_ref[0, :]
    oy = rays_ref[1, :]
    oz = rays_ref[2, :]
    dx = rays_ref[3, :]
    dy = rays_ref[4, :]
    dz = rays_ref[5, :]

    if ablate not in ("nofill", "floor0"):
        _fill_local_rays(
            lray, inv_ref, ox, oy, oz, dx, dy, dz, num_objects,
            fast=(fill_fast or ablate == "fillfast") and fast)
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
    use_roll = rank_mode == "roll"
    consts = (_roll_prefix_consts(g_n, cap, tile) if use_roll
              else _prefix_consts(g_n))

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

        centroid = (0.5 * (amin[0] + amax[0]),
                    0.5 * (amin[1] + amax[1]),
                    0.5 * (amin[2] + amax[2])) if mxu else None

        @pl.when(pred)
        def _():
            if use_roll:
                _compact_cluster_update_roll(
                    hit, lray[obj, 0:6, :], tris_ref[c], tri_base,
                    obj, best_t, best_tri, best_obj, consts, slot_ids,
                    g_n=g_n, cap=cap, lanes=lanes, eps=eps, fast=fast,
                    mxu=mxu, centroid=centroid, ablate=ablate)
            else:
                _compact_cluster_update(
                    hit, lray[obj, 0:6, :], tris_ref[c], tri_base,
                    obj, best_t, best_tri, best_obj, consts, slot_ids,
                    g_n=g_n, cap=cap, lanes=lanes, eps=eps, mxu=mxu,
                    centroid=centroid, fast=fast)

        return 0

    def cl_body_batched(k, _):
        # One step-start best_t read for all ``batch`` slabs: the
        # intra-batch cull feedback this forgoes is negligible (the
        # clusters are front-to-back neighbours) and it keeps the
        # unrolled chains independent until the serial best merges.
        bt_flat = best_t[:].reshape(tile)
        for j in range(batch):
            c = get_cluster(jnp.minimum(k * batch + j, max_ci - 1))
            obj = meta_ref[0, c]
            tri_base = meta_ref[1, c]
            amin = (aabb_ref[0, c], aabb_ref[1, c], aabb_ref[2, c])
            amax = (aabb_ref[3, c], aabb_ref[4, c], aabb_ref[5, c])
            hit = _slab_inv(lray[obj, 0, :], lray[obj, 1, :],
                            lray[obj, 2, :], lray[obj, 6, :],
                            lray[obj, 7, :], lray[obj, 8, :],
                            amin, amax, bt_flat)
            centroid = (0.5 * (amin[0] + amax[0]),
                        0.5 * (amin[1] + amax[1]),
                        0.5 * (amin[2] + amax[2])) if mxu else None
            if use_roll:
                _compact_cluster_update_roll(
                    hit, lray[obj, 0:6, :], tris_ref[c], tri_base,
                    obj, best_t, best_tri, best_obj, consts, slot_ids,
                    g_n=g_n, cap=cap, lanes=lanes, eps=eps, fast=fast,
                    mxu=mxu, centroid=centroid)
            else:
                _compact_cluster_update(
                    hit, lray[obj, 0:6, :], tris_ref[c], tri_base,
                    obj, best_t, best_tri, best_obj, consts, slot_ids,
                    g_n=g_n, cap=cap, lanes=lanes, eps=eps, mxu=mxu,
                    centroid=centroid, fast=fast)
        return 0

    def cl_body_pair(k, _):
        # Two clusters per step, their update chains interleaved in one
        # straight-line block body (_compact_cluster_update_roll_pair).
        # The odd tail clamps B onto A's cluster — duplicate visits are
        # best-merge idempotent (strict-< acceptance).
        bt_flat = best_t[:].reshape(tile)

        def load(idx):
            c = get_cluster(jnp.minimum(idx, trip - 1))
            obj = meta_ref[0, c]
            tri_base = meta_ref[1, c]
            amin = (aabb_ref[0, c], aabb_ref[1, c], aabb_ref[2, c])
            amax = (aabb_ref[3, c], aabb_ref[4, c], aabb_ref[5, c])
            hit = _slab_inv(lray[obj, 0, :], lray[obj, 1, :],
                            lray[obj, 2, :], lray[obj, 6, :],
                            lray[obj, 7, :], lray[obj, 8, :],
                            amin, amax, bt_flat)
            return c, obj, tri_base, hit

        cA, objA, tbA, hitA = load(2 * k)
        cB, objB, tbB, hitB = load(2 * k + 1)

        @pl.when(jnp.any(hitA) | jnp.any(hitB))
        def _():
            _compact_cluster_update_roll_pair(
                hitA, lray[objA, 0:6, :], tris_ref[cA], tbA, objA,
                hitB, lray[objB, 0:6, :], tris_ref[cB], tbB, objB,
                best_t, best_tri, best_obj, consts, slot_ids,
                g_n=g_n, cap=cap, lanes=lanes, eps=eps, fast=fast)
        return 0

    if pair:
        assert use_roll and not mxu and ablate == "" and batch == 1, \
            "pair mode is roll-rank only, no ablations/mxu/batch"
        jax.lax.fori_loop(0, (trip + 1) // 2, cl_body_pair, 0)
    elif batch > 1:
        assert ablate == "", "batched worklist loop has no ablations"
        assert max_ci >= batch
        jax.lax.fori_loop(0, (trip + batch - 1) // batch,
                          cl_body_batched, 0)
    else:
        jax.lax.fori_loop(0, trip, cl_body, 0)

    t_out[0] = jnp.where(best_tri[:] >= 0, best_t[:], INF)
    tri_out[0] = best_tri[:]
    obj_out[0] = best_obj[:]


def _compact_kernel(meta_ref, inv_ref, order_ref, rays_ref, aabb_ref,
                    tris_ref, t_out, tri_out, obj_out, lray, best_t,
                    best_tri, best_obj, *, num_clusters: int, **kw):
    oct_ = ((rays_ref[3, 0] > 0.0).astype(jnp.int32) * 4
            + (rays_ref[4, 0] > 0.0).astype(jnp.int32) * 2
            + (rays_ref[5, 0] > 0.0).astype(jnp.int32))
    _compact_loop(lambda ci: order_ref[oct_, ci], num_clusters,
                  meta_ref, inv_ref, rays_ref, aabb_ref, tris_ref,
                  t_out, tri_out, obj_out, lray, best_t, best_tri,
                  best_obj, **kw)


def _compact_wl_kernel(wl_ref, wn_ref, meta_ref, inv_ref, rays_ref,
                       aabb_ref, tris_ref, t_out, tri_out, obj_out, lray,
                       best_t, best_tri, best_obj, **kw):
    """Worklist-driven resident sweep: the XLA prepass
    (build_chunk_worklists over per-cluster world AABBs) hands each
    ray tile its fired clusters front-to-back; the in-kernel trip
    count is the tile's fired count (zero for parked/retired tiles),
    so the ~60 of 85 per-tile dead slab steps the octant sweep pays
    (ROADMAP round-3 ablation split) never issue."""
    i = pl.program_id(0)
    _compact_loop(lambda ci: wl_ref[i, ci], wn_ref[i],
                  meta_ref, inv_ref, rays_ref, aabb_ref, tris_ref,
                  t_out, tri_out, obj_out, lray, best_t, best_tri,
                  best_obj, max_ci=wl_ref.shape[1], **kw)


def _compact_wl2_kernel(wl_ref, wn_ref, meta_ref, inv_ref, rays_ref,
                        aabb_ref, tris_ref, t_out, tri_out, obj_out, lray,
                        best_t, best_tri, best_obj, *, num_objects: int,
                        eps: float, tile: int, lanes: int, cap: int,
                        has_tmax: bool, fast: bool = True,
                        fill_fast: bool = False):
    """pair_tiles worklist kernel: TWO ray tiles per grid step, their
    per-cluster update chains interleaved in one straight-line block
    body (_compact_cluster_update_roll_tile2).  Each tile walks its
    OWN fired-cluster worklist against its OWN live best buffer —
    fully independent dataflows for the VLIW scheduler to overlap,
    with none of pair mode's stale-gate/shared-merge waste; the only
    shared costs are the loop trip (max of the two fired counts, with
    the shorter side's hits masked off past its count) and each
    cluster visit's block count (max of the two chains').  The local-
    ray fill runs ONCE over both tiles (same per-ray cost, half the
    fill dispatches)."""
    i = pl.program_id(0)
    g_n = tile // 128
    _fill_local_rays(lray, inv_ref, rays_ref[0, :], rays_ref[1, :],
                     rays_ref[2, :], rays_ref[3, :], rays_ref[4, :],
                     rays_ref[5, :], num_objects, fast=fill_fast and fast)

    best_t[:] = (jnp.minimum(rays_ref[6, :].reshape(2 * g_n, 128), BIG)
                 if has_tmax else jnp.full((2 * g_n, 128), BIG))
    best_tri[:] = jnp.full((2 * g_n, 128), -1, jnp.int32)
    best_obj[:] = jnp.full((2 * g_n, 128), -1, jnp.int32)

    slot_ids = jax.lax.broadcasted_iota(jnp.int32, (cap, lanes), 1)
    consts = _roll_prefix_consts(g_n, cap, tile)

    wnA = wn_ref[2 * i]
    wnB = wn_ref[2 * i + 1]
    trip = jnp.maximum(wnA, wnB)

    def body(ci, _):
        def side(tix, wn_i, r0):
            # Past this tile's own fired count the cluster index is
            # clamped (never out of the worklist row) and the hit
            # vector masked to zero: the chain contributes no blocks.
            c = wl_ref[tix, jnp.maximum(jnp.minimum(ci, wn_i - 1), 0)]
            obj = meta_ref[0, c]
            tri_base = meta_ref[1, c]
            amin = (aabb_ref[0, c], aabb_ref[1, c], aabb_ref[2, c])
            amax = (aabb_ref[3, c], aabb_ref[4, c], aabb_ref[5, c])
            sl = slice(r0 * tile, (r0 + 1) * tile)
            bt_flat = best_t[r0 * g_n:(r0 + 1) * g_n, :].reshape(tile)
            hit = _slab_inv(lray[obj, 0, sl], lray[obj, 1, sl],
                            lray[obj, 2, sl], lray[obj, 6, sl],
                            lray[obj, 7, sl], lray[obj, 8, sl],
                            amin, amax, bt_flat) & (ci < wn_i)
            return c, obj, tri_base, hit

        cA, objA, tbA, hitA = side(2 * i, wnA, 0)
        cB, objB, tbB, hitB = side(2 * i + 1, wnB, 1)

        @pl.when(jnp.any(hitA) | jnp.any(hitB))
        def _():
            _compact_cluster_update_roll_tile2(
                hitA, lray[objA, 0:6, 0:tile], tris_ref[cA], tbA, objA,
                hitB, lray[objB, 0:6, tile:2 * tile], tris_ref[cB],
                tbB, objB, best_t, best_tri, best_obj, consts,
                slot_ids, g_n=g_n, cap=cap, lanes=lanes, eps=eps,
                fast=fast)
        return 0

    jax.lax.fori_loop(0, trip, body, 0)

    t_final = jnp.where(best_tri[:] >= 0, best_t[:], INF)
    t_out[0] = t_final[0:g_n, :]
    t_out[1] = t_final[g_n:, :]
    tri_out[0] = best_tri[0:g_n, :]
    tri_out[1] = best_tri[g_n:, :]
    obj_out[0] = best_obj[0:g_n, :]
    obj_out[1] = best_obj[g_n:, :]


def _stream_compact_kernel(oct_ref, order_ref, live_ref, meta_ref, inv_ref,
                           chunk_aabb_ref, rays_ref,
                           aabb_ref, tris_ref, t_out, tri_out, obj_out,
                           best_t, best_tri, best_obj, *,
                           num_objects: int, chunk: int, num_chunks: int,
                           num_real: int, eps: float, tile: int,
                           lanes: int, cap: int, has_tmax: bool,
                           fast: bool = True, rank_mode: str = "roll"):
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
    consts = (_roll_prefix_consts(g_n, cap, tile) if rank_mode == "roll"
              else _prefix_consts(g_n))

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
                if rank_mode == "roll":
                    _compact_cluster_update_roll(
                        hit, feats6, tris_ref[k],
                        tri_base, obj, best_t, best_tri, best_obj,
                        consts, slot_ids, g_n=g_n, cap=cap, lanes=lanes,
                        eps=eps, fast=fast)
                else:
                    _compact_cluster_update(
                        hit, feats6, tris_ref[k],
                        tri_base, obj, best_t, best_tri, best_obj,
                        consts, slot_ids, g_n=g_n, cap=cap, lanes=lanes,
                        eps=eps, fast=fast)

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
                             fast: bool = True, rank_mode: str = "roll"):
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
    consts = (_roll_prefix_consts(g_n, cap, tile) if rank_mode == "roll"
              else _prefix_consts(g_n))

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
                    if rank_mode == "roll":
                        _compact_cluster_update_roll(
                            hit, feats6, tris_buf[slot, k], tri_base,
                            obj, best_t, best_tri, best_obj, consts,
                            slot_ids, g_n=g_n, cap=cap, lanes=lanes,
                            eps=eps, fast=fast)
                    else:
                        _compact_cluster_update(
                            hit, feats6, tris_buf[slot, k], tri_base,
                            obj, best_t, best_tri, best_obj, consts,
                            slot_ids, g_n=g_n, cap=cap, lanes=lanes,
                            eps=eps, fast=fast)

                return 0

            jax.lax.fori_loop(0, chunk, cl_body, 0)

        return 0

    jax.lax.fori_loop(0, n, wl_body, 0)

    t_out[0] = jnp.where(best_tri[:] >= 0, best_t[:], INF)
    tri_out[0] = best_tri[:]
    obj_out[0] = best_obj[:]


def _worklist_block_kernel(wl_ref, wn_ref, meta_ref, inv_ref,
                           chunk_aabb_ref, aabb_ref, rays_ref, tris_hbm,
                           t_out, tri_out, obj_out, tris_buf, sem,
                           best_t, best_tri, best_obj, blk, *, chunk: int,
                           num_real: int, eps: float, tile: int,
                           lanes: int, ccap: int, has_tmax: bool,
                           fast: bool = True, scap: int = 0):
    """Chunk-level lane compaction for the worklist stream sweep.

    The per-cluster compact update of _worklist_compact_kernel is
    O(tile) machinery (rank rolls, [cap, tile] one-hot, K=tile gather/
    scatter matmuls) per FIRED CLUSTER — measured 165.6 fired clusters
    per 4096-ray tile with a mean of only 16.8 slab-passing lanes each
    on the outside-class bounce pool (ROADMAP round 3): ~99.6% of every
    update is padding.  Here the O(tile) work happens once per FIRED
    CHUNK (53.8/tile on the same pool): the lanes passing the chunk's
    world slab (~200 mean) are compacted into ONE dense ``ccap``-lane
    block, and the chunk's clusters run their local-ray fill, slab cull
    and dense Möller-Trumbore on the block's lanes only — 16x narrower
    — with a single acceptance scatter back per block.

    Hit semantics match _worklist_compact_kernel: lanes in the block
    that fail a cluster's slab still enter its MT, but a valid triangle
    hit closer than best_t implies its cluster slab passes, so the
    strict-< acceptance admits exactly the same winners (up to the
    documented fast-reciprocal near-tie class; NaN/INF t from degenerate
    padding lanes fail ``t > eps`` and become BIG).  Cull feedback is
    exact: block lanes see best-t updates immediately (blk row 0), and
    the tile-level best_t is merged before the next chunk's slab test.

    ``scap`` > 0 adds the second compaction level the round-3 A/B
    said was missing (ROADMAP: block=256 alone LOST 2x because every
    in-chunk cluster paid a [ccap, S] Möller-Trumbore): each cluster's
    slab-passing block lanes (~17 mean on the outside bounce pool) are
    compacted AGAIN into dense ``scap``-lane sub-blocks — the rank /
    one-hot / gather machinery is O(ccap), 16x narrower than the
    per-cluster worklist kernel's O(tile), and the MT runs [scap, S].
    Sub-block padding slots gather zero rays whose degenerate MT fails
    ``t > eps``; the strict-< merge keeps winners identical.

    Reference capability: shaders/path_tracing.comp:130-209 (same
    two-level traversal contract as every other sweep kernel).
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
    # Hoisted world-ray reciprocals for the per-chunk slab (exact
    # divides — bit-identical to _slab's, paid once per tile).
    iwx = 1.0 / dx
    iwy = 1.0 / dy
    iwz = 1.0 / dz

    best_t[:] = (jnp.minimum(rays_ref[6, :].reshape(g_n, 128), BIG)
                 if has_tmax else jnp.full((g_n, 128), BIG))
    best_tri[:] = jnp.full((g_n, 128), -1, jnp.int32)
    best_obj[:] = jnp.full((g_n, 128), -1, jnp.int32)

    slot_ids = jax.lax.broadcasted_iota(
        jnp.int32, (scap or ccap, lanes), 1)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (g_n, 128), 1)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (g_n, 1), 0)
    iota_ccap_t = jax.lax.broadcasted_iota(
        jnp.int32, (ccap, tile), 0).astype(jnp.float32)
    if scap:
        # ccap > 128 needs a [ccap] -> [ccap/128, 128] vector reshape
        # in the sub-rank, which Mosaic rejects for 1-D lengths that
        # are not a whole (8, 128) tile ("infer-vector-layout:
        # unsupported shape cast", measured on v5e at ccap=256).
        assert ccap == 128, "scap sub-compaction needs ccap == 128"
        g2 = ccap // 128
        lane_iota2 = jax.lax.broadcasted_iota(jnp.int32, (g2, 128), 1)
        sub_iota2 = jax.lax.broadcasted_iota(jnp.int32, (g2, 1), 0)
        iota_scap_t = jax.lax.broadcasted_iota(
            jnp.int32, (scap, ccap), 0).astype(jnp.float32)

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
        # Live best_t re-test: the prepass culled at INF, so
        # front-to-back fills prune whole chunks here.
        chunk_hit = _slab_inv(ox, oy, oz, iwx, iwy, iwz, camin, camax,
                              bt_flat)
        get_dma(slot, j).wait()

        @pl.when(jnp.any(chunk_hit))
        def _():
            rank_flat, npass = _rank_roll(chunk_hit, lane_iota, sub_iota,
                                          g_n, tile)
            nb = jax.lax.convert_element_type(
                jnp.ceil(npass * (1.0 / ccap)), jnp.int32)
            feats = jnp.concatenate([
                ox[None], oy[None], oz[None],
                dx[None], dy[None], dz[None],
                bt_flat[None]], axis=0)                    # [7, tile]
            feats3 = _split3(feats)                        # [21, tile]

            def block_body(b, _):
                basef = jax.lax.convert_element_type(b, jnp.float32) * ccap
                p_t = (rank_flat - basef == iota_ccap_t).astype(
                    jnp.bfloat16)                          # [ccap, tile]
                acc = _dot_onehot(feats3, p_t, 7, ((1,), (1,)))  # [7, ccap]
                box, boy, boz = acc[0], acc[1], acc[2]
                bdx, bdy, bdz = acc[3], acc[4], acc[5]
                # blk rows: best_t, tri (f32, exact < 2^24), obj,
                # improved flag.  Padding block slots gather zeros
                # (best_t 0 -> nothing beats it) and have all-zero
                # one-hot columns, so they can never scatter back.
                blk[0, :] = acc[6]
                blk[1, :] = jnp.zeros((ccap,), jnp.float32)
                blk[2, :] = jnp.zeros((ccap,), jnp.float32)
                blk[3, :] = jnp.zeros((ccap,), jnp.float32)

                def cl_body(k, _):
                    c = jc * chunk + k
                    obj = meta_ref[0, c]
                    tri_base = meta_ref[1, c]
                    (lox, loy, loz, ldx, ldy, ldz, ix, iy, iz) = \
                        _local_ray(inv_ref, obj, box, boy, boz,
                                   bdx, bdy, bdz, fast)
                    amin = (aabb_ref[0, c], aabb_ref[1, c], aabb_ref[2, c])
                    amax = (aabb_ref[3, c], aabb_ref[4, c], aabb_ref[5, c])
                    hitc = _slab_inv(lox, loy, loz, ix, iy, iz, amin,
                                     amax, blk[0, :])

                    @pl.when(jnp.any(hitc) & (c < num_real))
                    def _():
                        if scap:
                            # Second compaction level: only the
                            # cluster's slab-passing block lanes enter
                            # its MT, as dense scap-lane sub-blocks.
                            rank_s, np_s = _rank_roll(
                                hitc, lane_iota2, sub_iota2, g2, ccap)
                            nb_s = jax.lax.convert_element_type(
                                jnp.ceil(np_s * (1.0 / scap)), jnp.int32)
                            sf = jnp.concatenate([
                                lox[None], loy[None], loz[None],
                                ldx[None], ldy[None], ldz[None],
                                blk[0, :][None]], axis=0)   # [7, ccap]
                            sf3 = _split3(sf)               # [21, ccap]

                            def sb_body(b2, _):
                                b2f = jax.lax.convert_element_type(
                                    b2, jnp.float32) * scap
                                p_s = (rank_s - b2f == iota_scap_t
                                       ).astype(jnp.bfloat16)  # [scap,ccap]
                                a7 = _dot_onehot(sf3, p_s, 7,
                                                 ((1,), (1,)))  # [7, scap]
                                t = _mt_cluster(
                                    a7[0], a7[1], a7[2], a7[3], a7[4],
                                    a7[5], tris_buf[slot, k], eps,
                                    fast=fast)              # [scap, S]
                                ok = t > eps
                                t = jnp.where(ok, t, BIG)
                                tmin = jnp.min(t, axis=1)
                                is_min = ((t == tmin[:, None])
                                          & (tmin[:, None] < BIG))
                                sl = jnp.min(
                                    jnp.where(is_min, slot_ids, lanes),
                                    axis=1)
                                du = (tmin < BIG) & (tmin < a7[6])
                                res = jnp.concatenate([
                                    jnp.where(du, tmin, 0.0)[None],
                                    jnp.where(
                                        du,
                                        jax.lax.convert_element_type(
                                            tri_base + sl, jnp.float32),
                                        0.0)[None],
                                    jnp.where(
                                        du,
                                        jax.lax.convert_element_type(
                                            obj, jnp.float32), 0.0)[None],
                                    du.astype(jnp.float32)[None]],
                                    axis=0)                 # [4, scap]
                                out = _dot_onehot(_split3(res), p_s, 4,
                                                  ((1,), (0,)))  # [4,ccap]
                                du2 = (out[3] > 0.5) & (out[0] < blk[0, :])
                                blk[0, :] = jnp.where(du2, out[0],
                                                      blk[0, :])
                                blk[1, :] = jnp.where(du2, out[1],
                                                      blk[1, :])
                                blk[2, :] = jnp.where(du2, out[2],
                                                      blk[2, :])
                                blk[3, :] = jnp.where(du2, 1.0, blk[3, :])
                                return 0

                            jax.lax.fori_loop(0, nb_s, sb_body, 0)
                            return
                        t = _mt_cluster(lox, loy, loz, ldx, ldy, ldz,
                                        tris_buf[slot, k], eps,
                                        fast=fast)         # [ccap, S]
                        ok = t > eps
                        t = jnp.where(ok, t, BIG)
                        tmin = jnp.min(t, axis=1)
                        is_min = (t == tmin[:, None]) & (tmin[:, None] < BIG)
                        sl = jnp.min(jnp.where(is_min, slot_ids, lanes),
                                     axis=1)
                        du = (tmin < BIG) & (tmin < blk[0, :])
                        blk[0, :] = jnp.where(du, tmin, blk[0, :])
                        blk[1, :] = jnp.where(
                            du,
                            jax.lax.convert_element_type(
                                tri_base + sl, jnp.float32),
                            blk[1, :])
                        blk[2, :] = jnp.where(
                            du,
                            jax.lax.convert_element_type(obj, jnp.float32),
                            blk[2, :])
                        blk[3, :] = jnp.where(du, 1.0, blk[3, :])

                    return 0

                jax.lax.fori_loop(0, chunk, cl_body, 0)

                out = _dot_onehot(_split3(blk[:, :]), p_t, 4,
                                  ((1,), (0,)))            # [4, tile]
                o2 = [out[r].reshape(g_n, 128) for r in range(4)]
                du = (o2[3] > 0.5) & (o2[0] < best_t[:])
                best_t[:] = jnp.where(du, o2[0], best_t[:])
                best_tri[:] = jnp.where(
                    du, o2[1].astype(jnp.int32), best_tri[:])
                best_obj[:] = jnp.where(
                    du, o2[2].astype(jnp.int32), best_obj[:])
                return 0

            jax.lax.fori_loop(0, nb, block_body, 0)

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


@functools.partial(jax.jit,
                   static_argnames=("tile", "chunk", "eps", "has_tmax",
                                    "cap", "rank_mode", "block_cap",
                                    "block_sub"))
def cluster_intersect_worklist(cl_meta, cl_inv, cl_aabb, cl_tris,
                               obj_world, rays8, tile: int = 4096,
                               chunk: int = 16, eps: float = 1e-4,
                               has_tmax: bool = False, cap: int = 128,
                               rank_mode: str = "roll",
                               block_cap: int = 0, block_sub: int = 0):
    """Closest hit via the worklist-driven streamed compaction sweep.

    Same contract/layouts as cluster_intersect_stream; TPU-only (the
    manual-DMA loop has no interpreter support — CPU/interpret callers
    use the grid-based stream kernel, which computes the same hits).

    The XLA prepass here does the chunk-level culling ONCE per
    dispatch: a world-space slab of every ray against every chunk AABB
    (fused reduce, no [R, NC] materialization), any-reduced per ray
    tile, then ordered front-to-back along each tile's mean direction.

    ``block_cap`` > 0 switches the kernel to chunk-level lane
    compaction (_worklist_block_kernel): the lanes passing each fired
    chunk's slab are compacted ONCE into dense ``block_cap``-lane
    blocks and the chunk's clusters sweep only those, instead of
    paying the O(tile) per-fired-cluster update (``cap``/``rank_mode``
    are then unused).  ``block_sub`` > 0 additionally sub-compacts
    each cluster's slab-passing block lanes into ``block_sub``-lane MT
    sub-blocks (see _worklist_block_kernel's scap).
    """
    from logipathtracer_tpu.ops.pallas.cluster_intersect import (
        chunk_world_bounds)

    r = rays8.shape[1]
    c, _, lanes = cl_tris.shape
    o = cl_inv.shape[0]
    # tile must be whole (8, 128) vector tiles: the kernels' 1-D<->2-D
    # best_t reshapes are Mosaic "unsupported shape cast" errors below
    # 1024 lanes (measured on v5e at tile=512).
    assert cap > 0 and tile % 1024 == 0 and r % tile == 0
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
    if block_cap > 0:
        assert block_cap % 8 == 0
        kernel = functools.partial(
            _worklist_block_kernel, chunk=chunk, num_real=c, eps=eps,
            tile=tile, lanes=lanes, ccap=block_cap, has_tmax=has_tmax,
            fast=True, scap=block_sub)
    else:
        kernel = functools.partial(
            _worklist_compact_kernel, chunk=chunk, num_real=c, eps=eps,
            tile=tile, lanes=lanes, cap=cap, has_tmax=has_tmax, fast=True,
            rank_mode=rank_mode)

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
        ] + ([pltpu.VMEM((4, block_cap), jnp.float32)]      # block best
             if block_cap > 0 else []),
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((tiles, sub, 128), jnp.float32),
            jax.ShapeDtypeStruct((tiles, sub, 128), jnp.int32),
            jax.ShapeDtypeStruct((tiles, sub, 128), jnp.int32),
        ],
        **({"compiler_params": _vmem_params(False)}
           if block_cap > 0 else {}),
    )(wl, wn, meta_t, inv_rows, chunk_aabb_t, aabb_t, rays8, cl_tris)
    return (outs[0].reshape(r), outs[1].reshape(r), outs[2].reshape(r))


@functools.partial(jax.jit, static_argnames=("tile", "cap", "eps",
                                             "interpret", "has_tmax",
                                             "mxu", "rank_mode", "ablate",
                                             "worklist", "fill_fast",
                                             "batch", "pair",
                                             "pair_tiles"))
def cluster_intersect_compact(cl_meta, cl_inv, cl_order, cl_aabb, cl_tris,
                              rays8, tile: int = 1024, cap: int = 128,
                              eps: float = 1e-4, interpret: bool = False,
                              has_tmax: bool = False, mxu: bool = False,
                              rank_mode: str = "matmul",
                              ablate: str = "", worklist: bool = False,
                              obj_world=None, fill_fast: bool = False,
                              batch: int = 1, pair: bool = False,
                              pair_tiles: bool = False):
    """Closest hit via the compaction sweep; contract and array layouts
    identical to cluster_intersect_pallas (cluster_intersect.py).

    mxu=True: cl_tris must be the [C, 16, 4S] bilinear MT feature
    matrices (scene.cl_mt) and each fired cluster's triangle test runs
    as one MXU matmul (_mt_mxu) instead of the elementwise VPU form.

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
    c, rows, cols = cl_tris.shape
    if mxu:
        assert rows == 16, "mxu path needs scene.cl_mt [C, 16, 4S]"
        assert c == cl_meta.shape[1], (
            f"cl_tris has {c} clusters but cl_meta has {cl_meta.shape[1]}; "
            "scene was compiled with a placeholder cl_mt (cfg.mt_mxu must "
            "be set at compile_scene time for big scenes)")
        lanes = cols // 4
    else:
        lanes = cols
    o = cl_inv.shape[0]
    assert tile % 128 == 0 and r % tile == 0 and cap % 8 == 0
    sub = tile // 128

    assert batch == 1 or (worklist and ablate == ""), \
        "batch > 1 is a worklist-mode knob (no ablations)"
    assert not pair or (rank_mode == "roll" and not mxu and ablate == ""
                        and batch == 1), \
        "pair mode needs rank_mode='roll', no mxu/ablations/batch"
    assert not pair_tiles or (worklist and rank_mode == "roll"
                              and not mxu and ablate == "" and batch == 1
                              and not pair and (r // tile) % 2 == 0), \
        "pair_tiles needs worklist + rank_mode='roll' + an even tile count"
    grid = (r // tile,)
    common = dict(num_objects=o, eps=eps, tile=tile,
                  lanes=lanes, cap=cap, has_tmax=has_tmax, mxu=mxu,
                  fast=not interpret, rank_mode=rank_mode, ablate=ablate,
                  fill_fast=fill_fast, pair=pair)
    out_shape = [
        jax.ShapeDtypeStruct((r // tile, sub, 128), jnp.float32),
        jax.ShapeDtypeStruct((r // tile, sub, 128), jnp.int32),
        jax.ShapeDtypeStruct((r // tile, sub, 128), jnp.int32),
    ]
    scratch_shapes = [
        pltpu.VMEM((o, 9, tile), jnp.float32),       # local rays + 1/d
        pltpu.VMEM((sub, 128), jnp.float32),         # best_t
        pltpu.VMEM((sub, 128), jnp.int32),           # best_tri
        pltpu.VMEM((sub, 128), jnp.int32),           # best_obj
    ]

    if worklist and pair_tiles:
        wl, wn = build_chunk_worklists(wmin, wmax, rays8, tile,
                                       has_tmax=has_tmax)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # (wl, wn)
            grid=(r // (2 * tile),),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),   # meta
                pl.BlockSpec(memory_space=pltpu.SMEM),   # inv
                pl.BlockSpec((8, 2 * tile), lambda i, w, n: (0, i),
                             memory_space=pltpu.VMEM),   # rays
                pl.BlockSpec(memory_space=pltpu.SMEM),   # aabb [C, 8]
                pl.BlockSpec(cl_tris.shape, lambda i, w, n: (0, 0, 0),
                             memory_space=pltpu.VMEM),   # tris
            ],
            out_specs=[
                pl.BlockSpec((2, sub, 128), lambda i, w, n: (i, 0, 0),
                             memory_space=pltpu.VMEM)] * 3,
            scratch_shapes=[
                pltpu.VMEM((o, 9, 2 * tile), jnp.float32),
                pltpu.VMEM((2 * sub, 128), jnp.float32),
                pltpu.VMEM((2 * sub, 128), jnp.int32),
                pltpu.VMEM((2 * sub, 128), jnp.int32),
            ],
        )
        outs = pl.pallas_call(
            functools.partial(_compact_wl2_kernel, num_objects=o,
                              eps=eps, tile=tile, lanes=lanes, cap=cap,
                              has_tmax=has_tmax, fast=not interpret,
                              fill_fast=fill_fast),
            grid_spec=grid_spec,
            out_shape=out_shape,
            compiler_params=_vmem_params(interpret),
            interpret=interpret,
        )(wl, wn, cl_meta, cl_inv, rays8, cl_aabb, cl_tris)
        return (outs[0].reshape(r), outs[1].reshape(r),
                outs[2].reshape(r))

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
            functools.partial(_compact_wl_kernel, batch=batch, **common),
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
