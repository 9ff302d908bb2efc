"""Size the two-stage (group-union) compaction for the stream sweep.

Outside-class isect anatomy: ~300 fired-cluster visits per 4096-ray
tile, each running O(tile) rank/one-hot machinery to serve a mean ~17
passing lanes.  Round 3's block_sub variant (one chunk-level union
compaction + narrow per-cluster sub-updates) LOST because chunk
granularity visited every cluster of fired chunks (~480 subs); with
CLUSTER-granular worklists the design becomes: group G consecutive
front-to-back fired clusters, compact the union of their slab-passing
lanes ONCE (O(tile)), then per-cluster updates in union space
(K = Kcap instead of K = tile).

The correctness risk is union overflow (union > Kcap drops lanes).
This probe measures, on real dumped pools, the distribution of union
sizes for G in {4, 8, 16} and Kcap coverage — with best_t = BIG, a
SUPERSET of the kernel's live-best_t passing sets, so "fits under the
BIG bound" implies "fits in the kernel".

python scripts/union_stats.py [--pool .pools/outside_pool.npz]
    [--scene outside] [--tile 4096] [--tiles 8]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from subaabb_stats import np_slab  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pool", default=".pools/outside_pool.npz")
    ap.add_argument("--scene", default="outside",
                    choices=["cornell", "outside"])
    ap.add_argument("--tile", type=int, default=4096)
    ap.add_argument("--tiles", type=int, default=8)
    ap.add_argument("--groups", default="4,8,16")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    from logipathtracer_tpu.config import RenderConfig
    from logipathtracer_tpu.scene.compile import compile_scene
    from logipathtracer_tpu.scene.gltf import load_gltf

    cfg = RenderConfig(width=256, height=256)
    if args.scene == "outside":
        from logipathtracer_tpu.scene.procedural import make_outside_scene
        scene = compile_scene(make_outside_scene(), cfg)
    else:
        scene = compile_scene(
            load_gltf("/root/reference/resources/cornell_box.gltf"), cfg)

    meta = np.asarray(scene.cl_meta)
    aabb = np.asarray(scene.cl_aabb)
    inv = np.asarray(scene.obj_world_inv)
    world = np.asarray(scene.obj_world)
    C = meta.shape[0]
    print(f"C={C}", flush=True)

    # World AABBs per cluster (transform the 8 local corners).
    corners = np.stack(np.meshgrid([0, 1], [0, 1], [0, 1],
                                   indexing="ij"), -1).reshape(8, 3)
    wmin = np.empty((C, 3), np.float32)
    wmax = np.empty((C, 3), np.float32)
    for c in range(C):
        lo, hi = aabb[c, 0:3], aabb[c, 3:6]
        pts = lo[None] + corners * (hi - lo)[None]
        m = world[meta[c, 0]][:3]
        wpts = pts @ m[:, :3].T + m[:, 3]
        wmin[c], wmax[c] = wpts.min(axis=0), wpts.max(axis=0)

    groups = [int(g) for g in args.groups.split(",")]
    z = np.load(args.pool)
    its = sorted({int(k[1:]) for k in z.files if k.startswith("o")})[-2:]
    for it in its:
        o, d = z[f"o{it}"], z[f"d{it}"]
        r = o.shape[0]
        tiles = r // args.tile
        step = max(tiles // args.tiles, 1)
        unions = {g: [] for g in groups}
        passing = []
        fired_counts = []
        for t in range(0, tiles, step):
            ot = o[t * args.tile:(t + 1) * args.tile]
            dt = d[t * args.tile:(t + 1) * args.tile]
            live = np.abs(ot).max(axis=1) < 1e29
            if not live.any():
                continue
            # Fired clusters front-to-back (world slab, best = inf).
            hits = {}
            key = []
            mean_dir = dt[live].mean(axis=0)
            for c in range(C):
                m = inv[meta[c, 0]][:3]
                lo = ot @ m[:, :3].T + m[:, 3]
                ld = dt @ m[:, :3].T
                h = live & np_slab(lo, ld, aabb[c, 0:3], aabb[c, 3:6],
                                   np.inf)
                if h.any():
                    hits[c] = h
                    key.append((0.5 * (wmin[c] + wmax[c]) @ mean_dir, c))
            key.sort()
            order = [c for _, c in key]
            fired_counts.append(len(order))
            passing.extend(int(hits[c].sum()) for c in order)
            for g in groups:
                for s in range(0, len(order), g):
                    u = np.zeros(args.tile, bool)
                    for c in order[s:s + g]:
                        u |= hits[c]
                    unions[g].append(int(u.sum()))
        passing = np.asarray(passing)
        print(f"it{it}: fired/tile mean {np.mean(fired_counts):.0f}  "
              f"passing/cluster mean {passing.mean():.1f} "
              f"p50 {np.percentile(passing, 50):.0f} "
              f"p90 {np.percentile(passing, 90):.0f} "
              f"p99 {np.percentile(passing, 99):.0f}", flush=True)
        for g in groups:
            u = np.asarray(unions[g])
            print(f"  G={g:2d}: union mean {u.mean():6.1f}  "
                  f"p50 {np.percentile(u, 50):6.0f}  "
                  f"p90 {np.percentile(u, 90):6.0f}  "
                  f"p99 {np.percentile(u, 99):6.0f}  max {u.max():6d}  "
                  f"fits128 {100.0 * (u <= 128).mean():5.1f}%  "
                  f"fits256 {100.0 * (u <= 256).mean():5.1f}%  "
                  f"fits512 {100.0 * (u <= 512).mean():5.1f}%",
                  flush=True)


if __name__ == "__main__":
    main()
