"""Tightness of tile-level cluster culling schemes on real pools.

Round-4 design probe (VERDICT r3 item 3 / ROADMAP lever "fewer
sequences"): the streamed worklist kernel visits every member cluster
of every per-ray-fired CHUNK (measured 861 visits/tile vs 165.6
per-ray-exact on the outside class), and the resident worklist kernel
pays a per-ray x per-cluster world-slab PREPASS (~half of floor0's
22.3 ms).  The interval-arithmetic frustum mask (ops/frustum.py) is a
per-TILE [tiles, C] test costing ~nothing — if it is tight enough, it
can (a) cut the streamed kernel's visits to near-truth via
cluster-granular worklists and (b) replace the resident prepass's
per-ray slab entirely.

This script measures, on the REAL dumped post-sort pools
(scripts/stage_profile.py --dump), per-tile cluster-visit counts for:
  exact   — per-ray world slab vs per-cluster AABB, union over tile
            (the unreachable truth; what the resident prepass computes)
  chunk   — per-ray slab vs chunk AABB, any per tile, x chunk members
            (what the streamed kernel visits today)
  frus    — frustum_cluster_mask alone (per-tile interval slab)
  frus&ch — frustum AND chunk (what cluster-granular worklists would
            visit, if the per-ray chunk prepass is kept)

Usage:
  python scripts/frustum_stats.py --pool .pools/outside_pool.npz \
      --scene outside [--tile 4096] [--chunk 16]
  python scripts/frustum_stats.py --pool .pools/cornell_pool.npz \
      --scene cornell
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BIG = 1e30


def ray_slab(o, d, bmin, bmax, best):
    """[R] rays vs [C] AABBs -> [R, C] bool (build_chunk_worklists
    semantics: positive near hit below best, or origin-inside)."""
    inv = 1.0 / d                                        # [R, 3]
    n = (bmin[None] - o[:, None]) * inv[:, None]         # [R, C, 3]
    f = (bmax[None] - o[:, None]) * inv[:, None]
    t0 = np.minimum(n, f).max(axis=2)
    t1 = np.maximum(n, f).min(axis=2)
    return (t0 <= t1) & (((t0 > 0.0) & (t0 < best[:, None]))
                         | ((t0 <= 0.0) & (t1 > 0.0)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pool", default=".pools/outside_pool.npz")
    ap.add_argument("--scene", default="outside",
                    choices=["outside", "cornell"])
    ap.add_argument("--tile", type=int, default=4096)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--iters", type=int, default=3,
                    help="last N dumped iterations to analyse")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from logipathtracer_tpu.config import RenderConfig
    from logipathtracer_tpu.ops.frustum import frustum_cluster_mask
    from logipathtracer_tpu.ops.pallas.cluster_intersect import (
        chunk_world_bounds)
    from logipathtracer_tpu.scene.compile import compile_scene

    cfg = RenderConfig(width=512, height=512)
    if args.scene == "outside":
        from logipathtracer_tpu.scene.procedural import make_outside_scene
        scene = compile_scene(make_outside_scene(), cfg)
    else:
        from logipathtracer_tpu.scene.gltf import load_gltf
        scene = compile_scene(load_gltf(
            "/root/reference/resources/cornell_box.gltf"), cfg)

    c = scene.cl_tris.shape[0]
    wmin, wmax = chunk_world_bounds(scene.cl_meta, scene.cl_aabb,
                                    scene.obj_world, c, c, 1)
    wmin = np.asarray(wmin)
    wmax = np.asarray(wmax)
    cp = ((c + args.chunk - 1) // args.chunk) * args.chunk
    pmin = np.concatenate([wmin, np.full((cp - c, 3), BIG, np.float32)])
    pmax = np.concatenate([wmax, np.full((cp - c, 3), -BIG, np.float32)])
    cmin = pmin.reshape(-1, args.chunk, 3).min(axis=1)
    cmax = pmax.reshape(-1, args.chunk, 3).max(axis=1)
    print(f"scene={args.scene}: C={c} clusters, lanes="
          f"{scene.cl_tris.shape[2]}, {cp // args.chunk} chunks of "
          f"{args.chunk}", flush=True)

    dat = np.load(args.pool)
    n_it = int(dat["iters"])
    first = max(0, n_it - args.iters)
    fmask = jax.jit(frustum_cluster_mask, static_argnames=("tile",))

    for it in range(first, n_it):
        o = np.asarray(dat[f"o{it}"], np.float32)
        d = np.asarray(dat[f"d{it}"], np.float32)
        r = o.shape[0]
        tiles = r // args.tile
        rays8 = jnp.concatenate(
            [jnp.asarray(o).T, jnp.asarray(d).T,
             jnp.full((2, r), BIG, jnp.float32)], axis=0)
        frus = np.asarray(fmask(rays8, jnp.asarray(wmin),
                                jnp.asarray(wmax), tile=args.tile))
        live_tiles = 0
        ex_n, ch_n, fr_n, fc_n = [], [], [], []
        for t in range(tiles):
            sl = slice(t * args.tile, (t + 1) * args.tile)
            ot, dt = o[sl], d[sl]
            live = np.abs(ot).max(axis=1) < 1e29
            if not live.any():
                continue
            live_tiles += 1
            best = np.full((args.tile,), BIG, np.float32)
            ex = ray_slab(ot, dt, wmin, wmax, best)
            ex[~live] = False
            exact = ex.any(axis=0)                       # [C]
            ch = ray_slab(ot, dt, cmin, cmax, best)
            ch[~live] = False
            chunk_any = ch.any(axis=0)                   # [NC]
            chunk_vis = np.repeat(chunk_any, args.chunk)[:c]
            fr = frus[t, :c]
            ex_n.append(exact.sum())
            ch_n.append(chunk_vis.sum())
            fr_n.append(fr.sum())
            fc_n.append((fr & chunk_vis).sum())
            miss = exact & ~fr
            if miss.any():
                print(f"  !! tile {t}: frustum UNDERFIRES "
                      f"{miss.sum()} clusters (conservativity bug)",
                      flush=True)
        if not ex_n:
            print(f"it {it}: all tiles parked")
            continue
        f = lambda v: (f"{np.mean(v):7.1f} mean {np.median(v):6.0f} "
                       f"med {np.max(v):5.0f} max")
        print(f"it {it}: {live_tiles} live tiles of {tiles}")
        print(f"  exact   {f(ex_n)}")
        print(f"  chunk   {f(ch_n)}   (today's streamed visits)")
        print(f"  frus    {f(fr_n)}")
        print(f"  frus&ch {f(fc_n)}   (cluster-granular worklist)")


if __name__ == "__main__":
    main()
