"""Where does the streamed sweep's time go on outside-class scenes?

Three direct measurements on v5e (pool rays dumped by
`stage_profile.py --scene outside --dump /tmp/outside_pool.npz`):

  1. parked pool  -> pure grid-step + DMA + chunk-slab floor (every
     tile dead: all chunk DMAs pinned, all cluster loops skipped);
  2. bounce pool  -> the production workload;
  3. primary rays -> the coherent best case;

plus XLA-level cull statistics on the bounce pool: per-tile fired
chunks (chunk slab, INF best_t — what the kernel's pl.when gate sees
on first touch), per-ray chunk passes, and per-(tile, cluster) fired
clusters with the final best_t (the compact-MT dispatch volume).

python scripts/stream_stats.py [--pool /tmp/outside_pool.npz] [--it 3]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", "tests",
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from logipathtracer_tpu.config import RenderConfig
from logipathtracer_tpu.ops.camera import generate_ray
from logipathtracer_tpu.ops.rng import seed_from_pixel
from logipathtracer_tpu.ops.traverse import intersect_scene_stream
from logipathtracer_tpu.scene.compile import compile_scene
from logipathtracer_tpu.scene.procedural import make_outside_scene


def timeit(f, *a, n=5):
    out = f(*a)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*a)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
    return (time.perf_counter() - t0) / n, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pool", default="/tmp/outside_pool.npz")
    ap.add_argument("--it", type=int, default=3)
    ap.add_argument("--tile", type=int, default=4096)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--cap", type=int, default=128)
    ap.add_argument("--stats-only", action="store_true")
    args = ap.parse_args()

    cfg = RenderConfig(stream_tile=args.tile, stream_chunk=args.chunk)
    scene = compile_scene(make_outside_scene(), cfg)
    C = scene.cl_tris.shape[0]
    chunk = args.chunk
    nc = (C + chunk - 1) // chunk
    print(f"clusters={C} chunks={nc} objects={scene.num_objects} "
          f"tris={scene.num_triangles}", flush=True)

    dat = np.load(args.pool)
    o_b = jnp.asarray(dat[f"o{args.it}"])
    d_b = jnp.asarray(dat[f"d{args.it}"])
    alive = np.asarray(dat[f"alive{args.it}"])
    r = o_b.shape[0]
    tile = args.tile
    tiles = r // tile
    print(f"pool={r} tiles={tiles} alive={alive.sum()} "
          f"({100 * alive.mean():.0f}%)", flush=True)

    isect = jax.jit(lambda oo, dd: intersect_scene_stream(
        scene, oo, dd, eps=cfg.eps, tile=tile, chunk=chunk,
        cap=args.cap))

    if not args.stats_only:
        # parked pool: every lane at the dead-park (origin 1e30, +z)
        o_p = jnp.full((r, 3), 1e30, jnp.float32)
        d_p = jnp.zeros((r, 3), jnp.float32).at[:, 2].set(1.0)
        dt, _ = timeit(isect, o_p, d_p)
        print(f"parked:  {dt * 1e3:7.1f} ms  ({r / dt / 1e6:6.2f} Mrays/s)",
              flush=True)

        dt, (bt, bo, btri) = timeit(isect, o_b, d_b)
        print(f"bounce:  {dt * 1e3:7.1f} ms  ({r / dt / 1e6:6.2f} Mrays/s)",
              flush=True)

        # primaries at the same ray count
        h = w = 512
        ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                              jnp.arange(w, dtype=jnp.float32),
                              indexing="ij")
        pix = jnp.stack([xs, ys], -1).reshape(-1, 2)
        seed = seed_from_pixel(jnp.asarray([48271, 16807], jnp.uint32), pix)
        cam = scene.cameras[0]
        o_1, d_1, _ = generate_ray(jnp.asarray(cam.world_matrix),
                                   jnp.float32(cam.yfov), pix, (w, h), seed)
        o_1, d_1 = o_1[:r], d_1[:r]
        dt, _ = timeit(isect, o_1, d_1)
        print(f"primary: {dt * 1e3:7.1f} ms  ({r / dt / 1e6:6.2f} Mrays/s)",
              flush=True)
    else:
        bt = intersect_scene_stream(scene, o_b, d_b, eps=cfg.eps,
                                    tile=tile, chunk=chunk,
                                    cap=args.cap)[0]

    # ---- cull statistics (XLA level) ---------------------------------
    # world-space cluster AABBs (same 8-corner transform as the kernel
    # wrapper, cluster_intersect.py:455-472)
    amin = scene.cl_aabb[:, 0:3]
    amax = scene.cl_aabb[:, 3:6]
    picks = jnp.asarray([[(ci >> 2) & 1, (ci >> 1) & 1, ci & 1]
                         for ci in range(8)], jnp.float32)
    corners = (amin[:, None, :] * (1.0 - picks[None])
               + amax[:, None, :] * picks[None])
    mats = jnp.take(scene.obj_world, scene.cl_meta[:, 0], axis=0)
    wc = (jnp.einsum("cij,ckj->cki", mats[:, :3, :3], corners,
                     precision=jax.lax.Precision.HIGHEST)
          + mats[:, None, :3, 3])
    wmin = wc.min(axis=1)                      # [C, 3]
    wmax = wc.max(axis=1)
    pad = (-C) % chunk
    if pad:
        wmin_p = jnp.concatenate([wmin, jnp.full((pad, 3), np.inf)], 0)
        wmax_p = jnp.concatenate([wmax, jnp.full((pad, 3), -np.inf)], 0)
    else:
        wmin_p, wmax_p = wmin, wmax
    chunk_min = wmin_p.reshape(nc, chunk, 3).min(axis=1)   # [NC, 3]
    chunk_max = wmax_p.reshape(nc, chunk, 3).max(axis=1)

    def slab_any(o, d, amin, amax, best):
        """[R] rays vs [B] boxes -> [R, B] pass (same decision table)."""
        inv = 1.0 / d
        n = (amin[None, :, :] - o[:, None, :]) * inv[:, None, :]
        f = (amax[None, :, :] - o[:, None, :]) * inv[:, None, :]
        t0 = jnp.minimum(n, f).max(axis=2)
        t1 = jnp.maximum(n, f).min(axis=2)
        return ((t0 <= t1) & (((t0 > 0.0) & (t0 < best[:, None]))
                              | ((t0 <= 0.0) & (t1 > 0.0))))

    INFB = jnp.full((r,), 3.4e38)

    @jax.jit
    def chunk_stats(o, d, best):
        hit_inf = slab_any(o, d, chunk_min, chunk_max, INFB)   # [R, NC]
        hit_bt = slab_any(o, d, chunk_min, chunk_max, best)
        tile_inf = hit_inf.reshape(tiles, tile, nc).any(axis=1)
        tile_bt = hit_bt.reshape(tiles, tile, nc).any(axis=1)
        return (tile_inf.sum(axis=1), tile_bt.sum(axis=1),
                hit_inf.sum(axis=1), hit_bt.sum(axis=1))

    ti, tb, ri, rb = chunk_stats(o_b, d_b, bt)
    print(f"\nchunk fired/tile (INF best): mean {np.mean(ti):.1f} / {nc} "
          f"p50 {np.percentile(ti, 50):.0f} p90 {np.percentile(ti, 90):.0f}")
    print(f"chunk fired/tile (final bt): mean {np.mean(tb):.1f}")
    print(f"chunk passes/ray: INF {np.mean(ri):.2f}  final {np.mean(rb):.2f}")

    # per-(tile, cluster) fired with final best_t, in local space,
    # batched over cluster slices to bound memory
    inv_rows = scene.obj_world_inv[:, :3, :4].reshape(scene.num_objects, 12)

    @jax.jit
    def cl_fired_slice(o, d, best, c0):
        sl = jnp.arange(256) + c0
        sl = jnp.minimum(sl, C - 1)
        m = jnp.take(inv_rows, jnp.take(scene.cl_meta[:, 0], sl), axis=0)
        m = m.reshape(-1, 3, 4)                      # [B, 3, 4]
        lo = (jnp.einsum("bij,rj->rbi", m[:, :, :3], o)
              + m[:, :, 3][None])
        ld = jnp.einsum("bij,rj->rbi", m[:, :, :3], d)
        am = jnp.take(scene.cl_aabb, sl, axis=0)
        n = (am[None, :, 0:3] - lo) / ld
        f = (am[None, :, 3:6] - lo) / ld
        t0 = jnp.minimum(n, f).max(axis=2)
        t1 = jnp.maximum(n, f).min(axis=2)
        hit = ((t0 <= t1) & (((t0 > 0.0) & (t0 < best[:, None]))
                             | ((t0 <= 0.0) & (t1 > 0.0))))
        hit = hit & (sl[None, :] == jnp.arange(256)[None, :] + c0)
        tile_any = hit.reshape(tiles, tile, -1).any(axis=1)   # [tiles, B]
        tile_cnt = hit.reshape(tiles, tile, -1).sum(axis=1)
        return tile_any.sum(axis=1), hit.sum(axis=1), tile_cnt.max(axis=1)

    fired = np.zeros(tiles, np.int64)
    per_ray = np.zeros(r, np.int64)
    maxcnt = np.zeros(tiles, np.int64)
    for c0 in range(0, C, 256):
        fa, pr, mc = cl_fired_slice(o_b, d_b, bt, c0)
        fired += np.asarray(fa)
        per_ray += np.asarray(pr)
        maxcnt = np.maximum(maxcnt, np.asarray(mc))
    print(f"\nclusters fired/tile (final bt): mean {fired.mean():.1f} "
          f"p50 {np.percentile(fired, 50):.0f} "
          f"p90 {np.percentile(fired, 90):.0f} max {fired.max()}")
    print(f"cluster passes/ray: mean {per_ray.mean():.2f}")
    print(f"max passing lanes per (tile, cluster): "
          f"p50 {np.percentile(maxcnt, 50):.0f} "
          f"p90 {np.percentile(maxcnt, 90):.0f} max {maxcnt.max()} "
          f"(cap {args.cap})")
    mt_lanes = fired.sum() * args.cap            # one cap-block per fired
    print(f"MT lanes/ray at cap={args.cap}: {mt_lanes / r:.0f} "
          f"(per-ray truth {per_ray.mean() * scene.cl_tris.shape[2]:.0f})")


if __name__ == "__main__":
    main()
