"""Per-fired-cluster lane-WINDOW statistics on real production pools.

Round-4 design probe for the compaction sweep: each fired cluster's
update currently builds a [cap, TILE] one-hot and runs gather/scatter
matmuls with K = TILE (4096).  If the slab-passing lanes of a fired
cluster are CLUSTERED in consecutive 128-lane groups of the sorted
tile (the octant+Morton sort should make them so), a windowed form —
rank + one-hot + matmuls over just the [first_group, last_group]
span — cuts the one-hot build and the matmul K by the window ratio.

This script measures, on the REAL dumped pool states
(scripts/stage_profile.py --dump), the per-fired-cluster window width
in 128-lane groups, with the honest front-to-back best_t evolution
(a numpy re-implementation of the sweep's slab gate).

Usage:
  python scripts/window_stats.py [--pool /tmp/pool_r3.npz] [--tile 4096]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_scene(tile):
    import jax
    jax.config.update("jax_platforms", "cpu")
    from logipathtracer_tpu.config import RenderConfig
    from logipathtracer_tpu.scene.compile import compile_scene
    from logipathtracer_tpu.scene.gltf import load_gltf
    cfg = RenderConfig(width=64, height=64, sweep_tile=tile)
    return compile_scene(load_gltf(
        "/root/reference/resources/cornell_box.gltf"), cfg)


def mt_best_t(scene, o, d):
    """Reference best_t per ray (numpy, batched over clusters) — used
    to drive the slab gate with the final t as a stand-in for the
    front-to-back live evolution (the live value is >= this, so the
    windows measured here are a mild UNDERestimate of live windows;
    we also report the INF-best conservative upper bound)."""
    import jax
    import jax.numpy as jnp
    from logipathtracer_tpu.ops.traverse import intersect_scene
    t, _, _ = jax.jit(intersect_scene)(scene, jnp.asarray(o),
                                       jnp.asarray(d))
    return np.asarray(t)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pool", default="/tmp/pool_r3.npz")
    ap.add_argument("--tile", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=2,
                    help="last N dumped iterations to analyse")
    args = ap.parse_args()

    scene = load_scene(args.tile)
    cl_meta = np.asarray(scene.cl_meta)          # [C, 2] (obj, tri_base)
    cl_aabb = np.asarray(scene.cl_aabb)          # [C, 8] local min/max
    inv = np.asarray(scene.obj_world_inv)        # [O, 4, 4]
    C = cl_meta.shape[0]
    tile = args.tile

    z = np.load(args.pool)
    its = sorted({int(k[1:]) for k in z.files if k.startswith("o")})
    for it in its[-args.iters:]:
        o = z[f"o{it}"]                          # [P, 3]
        d = z[f"d{it}"]
        p = o.shape[0]
        pp = (p // tile) * tile
        o, d = o[:pp], d[:pp]
        bt_final = mt_best_t(scene, o, d)
        bt_final = np.where(np.isfinite(bt_final), bt_final, 1e30)

        # Local rays per object (numpy): [O, P, 3]
        n_obj = inv.shape[0]
        lo = np.einsum("oij,pj->opi", inv[:, :3, :3], o) + inv[:, None,
                                                              :3, 3]
        ld = np.einsum("oij,pj->opi", inv[:, :3, :3], d)
        with np.errstate(divide="ignore"):
            li = 1.0 / ld

        stats = {"inf": [], "fin": []}
        fired_counts = []
        for t0 in range(0, pp, tile):
            sl = slice(t0, t0 + tile)
            for mode in ("inf", "fin"):
                bt = (np.full(tile, 1e30) if mode == "inf"
                      else bt_final[sl])
                for c in range(C):
                    ob = cl_meta[c, 0]
                    amin = cl_aabb[c, 0:3]
                    amax = cl_aabb[c, 3:6]
                    lox = lo[ob, sl]             # [tile, 3]
                    lix = li[ob, sl]
                    near = (amin[None] - lox) * lix
                    far = (amax[None] - lox) * lix
                    tn = np.minimum(near, far).max(axis=1)
                    tf = np.maximum(near, far).min(axis=1)
                    hit = (tn <= tf) & (tf > 0.0) & (tn < bt)
                    n = int(hit.sum())
                    if n == 0:
                        continue
                    idx = np.flatnonzero(hit)
                    g0, g1 = idx[0] // 128, idx[-1] // 128
                    stats[mode].append((n, g1 - g0 + 1))
        for mode in ("inf", "fin"):
            arr = np.array(stats[mode], np.float64)
            if arr.size == 0:
                print(f"it{it} {mode}: no fired clusters")
                continue
            n, w = arr[:, 0], arr[:, 1]
            g_n = tile // 128
            print(f"it{it} [{mode}-best] fired={len(arr)} "
                  f"({len(arr)/ (pp//tile):.1f}/tile of {C})")
            print(f"  lanes/fired: mean {n.mean():.0f} "
                  f"p50 {np.percentile(n, 50):.0f} "
                  f"p90 {np.percentile(n, 90):.0f}")
            print(f"  window groups (of {g_n}): mean {w.mean():.1f} "
                  f"p50 {np.percentile(w, 50):.0f} "
                  f"p90 {np.percentile(w, 90):.0f} "
                  f"p99 {np.percentile(w, 99):.0f}")
            # K-work ratio: windowed matmul K vs full-tile K, and the
            # same with windows rounded up to powers of two (static
            # shape ladder a kernel could actually compile).
            full = len(arr) * g_n
            print(f"  K-ratio windowed/full: {w.sum()/full:.3f}  "
                  f"pow2: {np.exp2(np.ceil(np.log2(w))).sum()/full:.3f}")
            # Block count ratio: ceil(n/cap) blocks today; a windowed
            # kernel still runs the same blocks, only K shrinks.
            nb = np.ceil(n / 128)
            print(f"  blocks/fired (cap=128): mean {nb.mean():.2f} "
                  f"padding waste {(nb * 128 / n.clip(1)).mean():.2f}x")


if __name__ == "__main__":
    main()
