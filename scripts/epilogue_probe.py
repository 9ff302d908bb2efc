"""Probe: MXU Möller-Trumbore EPILOGUE ablations (round-3 item 1).

Round-2 measured (ROADMAP): the [cap,16]@[16,4S] HIGHEST matmul is ~6x
the VPU pair rate, but the VPU epilogue (1/det, 4 masks, min-reduce
over [cap, 4S]) costs as much as the whole VPU MT chain at compacted
block sizes, so end-to-end the MXU path lost (10.9 vs 13.1 Mrays/s).
This probe ablates the epilogue piecewise in isolated kernels to find
which component eats the win, and measures restructured variants:

  vpu          — elementwise VPU MT + min-reduce (baseline chain)
  vpu_newton   — VPU MT with approx-reciprocal+Newton instead of divide
  mm_only      — matmul + trivial accumulate (the MXU ceiling)
  mm_full      — matmul + current epilogue (divide)         [round-2 form]
  mm_newton    — matmul + approx recip + 1 Newton
  mm_sign      — matmul + sign-product acceptance, newton t, min
  mm_nomin     — mm_newton without the min-reduce (isolates min cost)
  mm_min128    — mm_newton, min folded to [cap,128] pairwise then lane

Also: one-hot gather formulations at tile=2048, cap=128:
  gather_loop  — 16x [7,128]@[128,cap] (round-2 form)
  gather_big   — concat onehots -> ONE [7,2048]@[2048,cap]
  scatter_loop / scatter_big — same for the write-back direction.

python scripts/epilogue_probe.py            (on TPU)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from logipathtracer_tpu.ops.pallas.cluster_intersect import _mt_cluster

INF = 3.4e38
BIG = 1e30
_HI = jax.lax.Precision.HIGHEST


def _dotg(a, b, dims):
    return jax.lax.dot_general(a, b, dimension_numbers=(dims, ((), ())),
                               precision=_HI,
                               preferred_element_type=jnp.float32)


def _time(f, *args, n=20):
    f = jax.jit(f)
    jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    leaf = jax.tree_util.tree_leaves(r)[0]
    float(jnp.sum(leaf.reshape(-1)[0:1]))
    return (time.perf_counter() - t0) / n


# Accumulators are [T, 128] and reductions keep dims: Mosaic relayout
# rules reject folding 1-D reduce results back into (1, 128) blocks.


def _newton_recip(x):
    r = pl.reciprocal(x, approx=True)
    return r * (2.0 - x * r)


# ---------------------------------------------------------------------------
# Section A: epilogue ablations
# ---------------------------------------------------------------------------

def vpu_kernel(rays_ref, tris_ref, out_ref, *, reps, T, S, newton):
    def body(i, acc):
        t = _mt_cluster(rays_ref[0], rays_ref[1], rays_ref[2],
                        rays_ref[3], rays_ref[4], rays_ref[5],
                        tris_ref[i], 1e-4, fast=newton)
        tm = jnp.min(jnp.where(t > 0, t, INF), axis=1, keepdims=True)
        return acc + tm

    out_ref[...] = jax.lax.fori_loop(0, reps, body,
                                     jnp.zeros((T, 128), jnp.float32))


def mxu_kernel(feat_ref, g_ref, out_ref, *, reps, T, S, variant):
    def body(i, acc):
        prod = _dotg(feat_ref[...], g_ref[i], ((1,), (0,)))  # [T, 4S]
        det = prod[:, 0:S]
        un = prod[:, S:2 * S]
        vn = prod[:, 2 * S:3 * S]
        tn = prod[:, 3 * S:4 * S]
        if variant == "mm_only":
            s4 = (det[:, 0:128] + un[:, 0:128] + vn[:, 0:128]
                  + tn[:, 0:128])                     # [T, 128]
            return acc + s4 * (1.0 / T)
        if variant == "mm_full":
            inv = 1.0 / det
            u = un * inv
            v = vn * inv
            t = tn * inv
            miss = (u < 0.0) | (u > 1.0) | (v < 0.0) | (u + v > 1.0)
            t = jnp.where(miss, BIG, t)
        elif variant in ("mm_newton", "mm_nomin", "mm_min128"):
            inv = _newton_recip(det)
            u = un * inv
            v = vn * inv
            t = tn * inv
            miss = (u < 0.0) | (u > 1.0) | (v < 0.0) | (u + v > 1.0)
            t = jnp.where(miss, BIG, t)
        elif variant == "mm_sign":
            qu = un * det
            qv = vn * det
            qw = (det - un - vn) * det
            ok = (qu >= 0.0) & (qv >= 0.0) & (qw >= 0.0)
            t = tn * _newton_recip(det)
            t = jnp.where(ok, t, BIG)
        if variant == "mm_nomin":
            tm2 = t[:, 0:128] + t[:, 128:256]
            return acc + tm2
        if variant == "mm_min128":
            tm2 = jnp.minimum(t[:, 0:128], t[:, 128:256])  # [T, 128]
            tm = jnp.min(tm2, axis=1, keepdims=True)
        else:
            tm = jnp.min(jnp.where(t > 0, t, BIG), axis=1, keepdims=True)
        return acc + tm

    out_ref[...] = jax.lax.fori_loop(0, reps, body,
                                     jnp.zeros((T, 128), jnp.float32))


def run_epilogue(T, S=256, C=64, grid=32):
    rng = np.random.default_rng(0)
    reps = C
    pairs = grid * reps * T * S
    rays = jnp.asarray(rng.normal(size=(6, T)).astype(np.float32))
    tris = jnp.asarray(rng.normal(size=(C, 9, S)).astype(np.float32))
    for newton in (False, True):
        f = pl.pallas_call(
            functools.partial(vpu_kernel, reps=reps, T=T, S=S,
                              newton=newton),
            grid=(grid,),
            in_specs=[pl.BlockSpec((6, T), lambda i: (0, 0)),
                      pl.BlockSpec((C, 9, S), lambda i: (0, 0, 0))],
            out_specs=pl.BlockSpec((T, 128), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((T, 128), jnp.float32))
        dt = _time(f, rays, tris)
        name = "vpu_newton" if newton else "vpu"
        print(f"{name:11s} T={T:4d}: {dt*1e3:7.2f} ms "
              f"{pairs/dt/1e9:7.1f} Gpairs/s", flush=True)

    feat = jnp.asarray(rng.normal(size=(T, 16)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(C, 16, 4 * S)).astype(np.float32))
    for variant in ("mm_only", "mm_full", "mm_newton", "mm_sign",
                    "mm_nomin", "mm_min128"):
        fm = pl.pallas_call(
            functools.partial(mxu_kernel, reps=reps, T=T, S=S,
                              variant=variant),
            grid=(grid,),
            in_specs=[pl.BlockSpec((T, 16), lambda i: (0, 0)),
                      pl.BlockSpec((C, 16, 4 * S), lambda i: (0, 0, 0))],
            out_specs=pl.BlockSpec((T, 128), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((T, 128), jnp.float32))
        dt = _time(fm, feat, g)
        print(f"{variant:11s} T={T:4d}: {dt*1e3:7.2f} ms "
              f"{pairs/dt/1e9:7.1f} Gpairs/s", flush=True)


# ---------------------------------------------------------------------------
# Section B: one-hot gather/scatter formulations
# ---------------------------------------------------------------------------

def gather_kernel(rank_ref, hit_ref, feats_ref, out_ref, *, reps, tile,
                  cap, variant):
    g_n = tile // 128
    iota_cap = jax.lax.broadcasted_iota(
        jnp.int32, (128, cap), 1).astype(jnp.float32)

    def onehot(g):
        return ((rank_ref[:, g:g + 1] == iota_cap)
                & (hit_ref[:, g:g + 1] > 0.5)).astype(jnp.float32)

    def body(i, acc):
        if variant == "gather_loop":
            a = jnp.zeros((7, cap), jnp.float32)
            for g in range(g_n):
                a = a + _dotg(feats_ref[:, g * 128:(g + 1) * 128],
                              onehot(g), ((1,), (0,)))
            res = jnp.concatenate([a[0:3] * 0.5, a[0:3] * 0.25,
                                   a[0:1]], axis=0)  # [7, cap] stand-in
            out = jnp.zeros((1, 128), jnp.float32)
            for g in range(g_n):
                outg = _dotg(res[0:3], onehot(g), ((1,), (1,)))  # [3,128]
                out = out + outg[0:1]
            return acc + out
        else:  # gather_big
            p_all = jnp.concatenate([onehot(g) for g in range(g_n)],
                                    axis=0)          # [tile, cap]
            a = _dotg(feats_ref[...], p_all, ((1,), (0,)))  # [7, cap]
            res = jnp.concatenate([a[0:3] * 0.5, a[0:3] * 0.25,
                                   a[0:1]], axis=0)
            outb = _dotg(res[0:3], p_all, ((1,), (1,)))     # [3, tile]
            return acc + outb[0:1, 0:128]

    out_ref[...] = jax.lax.fori_loop(0, reps, body, jnp.zeros((1, 128)))


def run_gather(tile=2048, cap=128, reps=45, grid=32):
    rng = np.random.default_rng(1)
    g_n = tile // 128
    # ~60% fill like the measured compact workload
    hit = (rng.uniform(size=(tile,)) < 0.04).astype(np.float32)
    ranks = np.minimum(np.cumsum(hit) - 1, cap - 1).astype(np.float32)
    rank_t = ranks.reshape(g_n, 128).T.copy()   # [128, G]
    hit_t = hit.reshape(g_n, 128).T.copy()
    feats = rng.normal(size=(7, tile)).astype(np.float32)
    for variant in ("gather_loop", "gather_big"):
        f = pl.pallas_call(
            functools.partial(gather_kernel, reps=reps, tile=tile, cap=cap,
                              variant=variant),
            grid=(grid,),
            in_specs=[pl.BlockSpec((128, g_n), lambda i: (0, 0)),
                      pl.BlockSpec((128, g_n), lambda i: (0, 0)),
                      pl.BlockSpec((7, tile), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32))
        dt = _time(f, jnp.asarray(rank_t), jnp.asarray(hit_t),
                   jnp.asarray(feats))
        per_fire = dt / (grid * reps) * 1e6
        print(f"{variant:12s} tile={tile} cap={cap}: {dt*1e3:7.2f} ms "
              f"({per_fire:6.2f} us/fired-cluster)", flush=True)


def main():
    import sys
    section = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("device:", jax.devices()[0], flush=True)
    if section in ("all", "epilogue"):
        print("--- epilogue ablations (S=256, C=64, grid=32) ---",
              flush=True)
        for T in (128, 256, 512):
            run_epilogue(T)
    if section in ("all", "gather"):
        print("--- gather/scatter formulations ---", flush=True)
        run_gather(tile=2048, cap=128)
    if section in ("all", "rank"):
        print("--- rank + one-hot formulations ---", flush=True)
        run_rank(tile=2048, cap=128)




# ---------------------------------------------------------------------------
# Section C: rank + one-hot formulations (full per-fired-cluster cost)
# ---------------------------------------------------------------------------

def rank_kernel(hit_ref, feats_ref, out_ref, *, reps, tile, cap, variant):
    """Per-fired-cluster compaction INCLUDING rank computation.

    matmul_rank — round-2/3 production form: ident/ltri/gtri matmuls
                  for rank_t [128, G], per-group one-hots concatenated
                  to [tile, cap], K=tile gather/scatter matmuls.
    roll_rank   — log-step roll prefix sums in the natural [G, 128]
                  layout, flat rank row, transposed [cap, tile] one-hot
                  (no per-group loops, no transpose matmuls).
    """
    g_n = tile // 128

    if variant == "matmul_rank":
        ident, ltri, gtri, ones_row = _prefix_consts_probe(g_n)
        iota_cap = jax.lax.broadcasted_iota(
            jnp.int32, (128, cap), 1).astype(jnp.float32)
    else:
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (g_n, 128), 1)
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (g_n, 1), 0)
        iota_cap_t = jax.lax.broadcasted_iota(
            jnp.int32, (cap, tile), 0).astype(jnp.float32)

    def body(i, acc):
        hit = hit_ref[i, :] > 0.5                       # [tile]
        h2 = hit.astype(jnp.float32).reshape(g_n, 128)
        if variant == "matmul_rank":
            hit_t = _dotg(ident, h2, ((1,), (1,)))      # [128, G]
            row_tot = _dotg(ones_row, hit_t, ((1,), (0,)))
            n = jnp.sum(row_tot)
            ro = _dotg(row_tot, gtri, ((1,), (0,)))
            colex = _dotg(ltri, hit_t, ((1,), (0,)))
            rank_t = colex + ro

            def onehot(g):
                return ((rank_t[:, g:g + 1] == iota_cap)
                        & (hit_t[:, g:g + 1] > 0.5)).astype(jnp.float32)

            p_all = jnp.concatenate([onehot(g) for g in range(g_n)],
                                    axis=0)             # [tile, cap]
            a = _dotg(feats_ref[...], p_all, ((1,), (0,)))  # [6, cap]
            res = jnp.concatenate([a[0:3] * 0.5], axis=0)
            outb = _dotg(res, p_all, ((1,), (1,)))      # [3, tile]
        else:
            inc = h2
            for k in (1, 2, 4, 8, 16, 32, 64):
                inc = inc + jnp.where(lane_iota >= k,
                                      pltpu.roll(inc, k, axis=1), 0.0)
            colex = inc - h2                            # exclusive, per row
            tot = inc[:, 127:128]                       # [G, 1]
            ro = tot
            for k in (1, 2, 4, 8):
                ro_s = pltpu.roll(ro, k, axis=0)
                ro = ro + jnp.where(sub_iota >= k, ro_s, 0.0)
            ro = ro - tot                               # exclusive row offsets
            rank = colex + ro                           # [G, 128]
            rank_flat = rank.reshape(1, tile)
            hit_flat = h2.reshape(1, tile)
            p_t = ((rank_flat == iota_cap_t)
                   & (hit_flat > 0.5)).astype(jnp.float32)  # [cap, tile]
            a = _dotg(feats_ref[...], p_t, ((1,), (1,)))    # [6, cap]
            res = jnp.concatenate([a[0:3] * 0.5], axis=0)
            outb = _dotg(res, p_t, ((1,), (0,)))        # [3, tile]
        return acc + outb[0:3, 0:128] * (1.0 / tile)

    out_ref[...] = jax.lax.fori_loop(0, reps, body,
                                     jnp.zeros((3, 128), jnp.float32))


def _prefix_consts_probe(g_n):
    ii = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    ident = (ii == jj).astype(jnp.float32)
    ltri = (ii > jj).astype(jnp.float32)
    gi = jax.lax.broadcasted_iota(jnp.int32, (g_n, g_n), 0)
    gj = jax.lax.broadcasted_iota(jnp.int32, (g_n, g_n), 1)
    gtri = (gi < gj).astype(jnp.float32)
    ones_row = jnp.ones((1, 128), jnp.float32)
    return ident, ltri, gtri, ones_row


def run_rank(tile=2048, cap=128, reps=45, grid=32):
    rng = np.random.default_rng(2)
    hits = (rng.uniform(size=(reps, tile)) < 0.04).astype(np.float32)
    feats = rng.normal(size=(6, tile)).astype(np.float32)
    for variant in ("matmul_rank", "roll_rank"):
        f = pl.pallas_call(
            functools.partial(rank_kernel, reps=reps, tile=tile, cap=cap,
                              variant=variant),
            grid=(grid,),
            in_specs=[pl.BlockSpec((reps, tile), lambda i: (0, 0)),
                      pl.BlockSpec((6, tile), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((3, 128), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((3, 128), jnp.float32))
        dt = _time(f, jnp.asarray(hits), jnp.asarray(feats))
        per_fire = dt / (grid * reps) * 1e6
        print(f"{variant:12s} tile={tile} cap={cap}: {dt*1e3:7.2f} ms "
              f"({per_fire:6.2f} us/fired-cluster)", flush=True)
if __name__ == "__main__":
    main()
