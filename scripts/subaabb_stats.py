"""Size the in-cluster sub-AABB MT cull before building it.

The compacted-block Möller-Trumbore is the biggest per-sequence issue
slice ([cap, S] = 32 vregs x ~80 ops at S=256).  Lane padding makes
sub-blocks below 128 lanes free-of-charge impossible (a [cap, 32]
array pads to 128 lanes), so the only in-kernel cull granularity worth
having is S/128 sub-groups (2 at cluster 256, 4 at 512): per block,
slab the compacted rays against each sub-group's local AABB and
pl.when-skip the sub-MT when no ray passes.

This probe measures, on REAL dumped pools (stage_profile --dump), the
fraction of (block, sub-group) pairs that would skip — separating
  tile-level  (no ray in the TILE passes: upper bound for a prepass
               cull, lower bound for the block-level rate)
  block-level (no ray in the compacted 128-ray BLOCK passes: the
               exact pl.when skip rate, best_t=BIG approximation —
               the kernel's live best_t only shrinks slabs further,
               so the real rate is >= this)
and the implied MT-issue saving (each skipped sub-group saves 1/(S/128)
of the block's MT work).

python scripts/subaabb_stats.py [--pool .pools/cornell_pool.npz]
    [--tile 4096] [--cap 128] [--tiles 16] [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def np_slab(o, d, amin, amax, best):
    """Vectorized slab: o,d [N,3]; amin/amax [3]; best [N]."""
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = 1.0 / d
        n = (amin[None] - o) * inv
        f = (amax[None] - o) * inv
    t0 = np.minimum(n, f).max(axis=1)
    t1 = np.maximum(n, f).min(axis=1)
    return (t0 <= t1) & (((t0 > 0.0) & (t0 < best)) | ((t0 <= 0.0) & (t1 > 0.0)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pool", default=".pools/cornell_pool.npz")
    ap.add_argument("--tile", type=int, default=4096)
    ap.add_argument("--cap", type=int, default=128)
    ap.add_argument("--tiles", type=int, default=16,
                    help="sample this many tiles per iteration")
    ap.add_argument("--cluster", type=int, default=0,
                    help="cluster size override (0 = config auto)")
    ap.add_argument("--scene", default="cornell",
                    choices=["cornell", "outside"])
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    from logipathtracer_tpu.config import RenderConfig
    from logipathtracer_tpu.scene.compile import compile_scene
    from logipathtracer_tpu.scene.gltf import load_gltf

    cfg = RenderConfig(width=256, height=256, cluster_size=args.cluster)
    if args.scene == "outside":
        from logipathtracer_tpu.scene.procedural import make_outside_scene
        scene = compile_scene(make_outside_scene(), cfg)
    else:
        scene = compile_scene(
            load_gltf("/root/reference/resources/cornell_box.gltf"), cfg)

    tris = np.asarray(scene.cl_tris)          # [C, 9, S]
    meta = np.asarray(scene.cl_meta)          # [C, 2]
    aabb = np.asarray(scene.cl_aabb)          # [C, 8]
    inv = np.asarray(scene.obj_world_inv)     # [O, 4, 4]
    C, _, S = tris.shape
    ns = S // 128
    print(f"C={C} S={S} sub-groups={ns}", flush=True)

    # Sub-group local AABBs over {v0, v0+e1, v0+e2}, masking padded
    # degenerate lanes (e1 == e2 == 0).
    v0 = tris[:, 0:3]
    v1 = v0 + tris[:, 3:6]
    v2 = v0 + tris[:, 6:9]
    valid = (np.abs(tris[:, 3:9]).max(axis=1) > 0)            # [C, S]
    pts = np.stack([v0, v1, v2], axis=1)                      # [C, 3v, 3, S]
    pm = np.where(valid[:, None, None, :], pts, np.inf)
    pM = np.where(valid[:, None, None, :], pts, -np.inf)
    sub_min = pm.reshape(C, 3, 3, ns, 128).min(axis=(1, 4))   # [C, 3, ns]
    sub_max = pM.reshape(C, 3, 3, ns, 128).max(axis=(1, 4))

    # World-space sub-AABBs (8-corner transform, as chunk_world_bounds)
    # for the FRUSTUM-level skip rate: the prepass can only hand the
    # kernel tile-interval bits, which are conservative vs the exact
    # per-ray tile-level rate above — measure the gap before building.
    ow = np.asarray(scene.obj_world)                          # [O, 4, 4]
    picks = np.array([[(ci >> 2) & 1, (ci >> 1) & 1, ci & 1]
                      for ci in range(8)], np.float32)        # [8, 3]
    sm = sub_min.transpose(0, 2, 1).reshape(C * ns, 3)        # [C*ns, 3]
    sM = sub_max.transpose(0, 2, 1).reshape(C * ns, 3)
    corners = (sm[:, None] * (1.0 - picks[None])
               + sM[:, None] * picks[None])                   # [C*ns, 8, 3]
    mats = ow[np.repeat(np.maximum(meta[:, 0], 0), ns)]       # [C*ns, 4, 4]
    wc = (np.einsum("cij,ckj->cki", mats[:, :3, :3], corners)
          + mats[:, None, :3, 3])
    pad_grp = ~np.isfinite(sm).all(axis=1)
    wsub_min = np.where(pad_grp[:, None], np.inf, wc.min(axis=1))
    wsub_max = np.where(pad_grp[:, None], -np.inf, wc.max(axis=1))

    from logipathtracer_tpu.ops.frustum import frustum_cluster_mask
    import jax.numpy as jnp

    z = np.load(args.pool)
    its = sorted({int(k[1:]) for k in z.files if k.startswith("o")})[-2:]
    for it in its:
        o = z[f"o{it}"]                                       # [R, 3]
        d = z[f"d{it}"]
        r = o.shape[0]
        tiles = r // args.tile
        step = max(tiles // args.tiles, 1)
        rays8 = np.zeros((8, r), np.float32)
        rays8[5] = 1.0
        rays8[0:3] = o.T
        rays8[3:6] = d.T
        fr_bits = np.asarray(frustum_cluster_mask(
            jnp.asarray(rays8), jnp.asarray(wsub_min),
            jnp.asarray(wsub_max), args.tile)).reshape(tiles, C, ns)
        n_tile_pairs = n_tile_skip = 0
        n_blk_pairs = n_blk_skip = 0
        n_fr_skip = n_fr_viol = 0
        n_blocks = 0
        for t in range(0, tiles, step):
            ot = o[t * args.tile:(t + 1) * args.tile]
            dt = d[t * args.tile:(t + 1) * args.tile]
            live = np.abs(ot).max(axis=1) < 1e29
            if not live.any():
                continue
            for c in range(C):
                ob = meta[c, 0]
                m = inv[ob][:3]
                lo = ot @ m[:, :3].T + m[:, 3]
                ld = dt @ m[:, :3].T
                hit = live & np_slab(lo, ld, aabb[c, 0:3], aabb[c, 3:6],
                                     np.inf)
                nh = int(hit.sum())
                if nh == 0:
                    continue
                idx = np.flatnonzero(hit)
                # tile-level: any live passing ray vs each sub-AABB
                for sb in range(ns):
                    amin, amax = sub_min[c, :, sb], sub_max[c, :, sb]
                    if not np.isfinite(amin).all():
                        continue  # fully-padded sub-group
                    sub_hit = np_slab(lo[idx], ld[idx], amin, amax,
                                      np.full(nh, np.inf))
                    n_tile_pairs += 1
                    n_tile_skip += int(not sub_hit.any())
                    n_fr_skip += int(not fr_bits[t, c, sb])
                    # superset check: a clear frustum bit with an exact
                    # passing ray would be a CORRECTNESS bug
                    n_fr_viol += int(sub_hit.any()
                                     and not fr_bits[t, c, sb])
                    # block-level: compacted 128-ray blocks in lane order
                    for b in range(0, nh, args.cap):
                        blk = sub_hit[b:b + args.cap]
                        if sb == 0:
                            n_blocks += 1
                        n_blk_pairs += 1
                        n_blk_skip += int(not blk.any())
        print(f"it{it}: tile-level skip {n_tile_skip}/{n_tile_pairs} "
              f"({100.0 * n_tile_skip / max(n_tile_pairs, 1):.1f}%)  "
              f"block-level skip {n_blk_skip}/{n_blk_pairs} "
              f"({100.0 * n_blk_skip / max(n_blk_pairs, 1):.1f}%)  "
              f"blocks {n_blocks}  "
              f"MT saved >= {100.0 * n_blk_skip / max(n_blk_pairs, 1):.1f}% "
              f"of block MT issues  "
              f"FRUSTUM-level skip {n_fr_skip}/{n_tile_pairs} "
              f"({100.0 * n_fr_skip / max(n_tile_pairs, 1):.1f}%)  "
              f"violations {n_fr_viol}", flush=True)


if __name__ == "__main__":
    main()
