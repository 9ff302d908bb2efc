"""Measure the per-cluster ray-binning opportunity (ROADMAP item 1).

For real bounce-ray distributions on cornell_box, computes per ray the
set of clusters whose AABB the ray's slab test passes, then reports:
  * per-ray pass counts (binned-pipeline work),
  * per-ray front-to-back fired counts until the closest hit (the
    sequential lower bound),
  * per-128-group and per-1024-tile unions after the octant+Morton sort
    (what the current sweep kernel fires).

Run on CPU: python scripts/bin_stats.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from logipathtracer_tpu.config import RenderConfig
from logipathtracer_tpu.ops.camera import generate_ray
from logipathtracer_tpu.ops.rng import seed_from_pixel
from logipathtracer_tpu.ops.traverse import intersect_scene
from logipathtracer_tpu.render.megakernel import ray_sort_key, shade_step
from logipathtracer_tpu.scene.compile import compile_scene
from logipathtracer_tpu.scene.gltf import load_gltf


def slab_pass(scene, origin, direction):
    """[R, C] bool pass mask + entry t0 (numpy, unpruned)."""
    inv = np.asarray(scene.obj_world_inv)[:, :3, :4]  # [O, 3, 4]
    aabb = np.asarray(scene.cl_aabb)                  # [C, 8]
    obj = np.asarray(scene.cl_meta)[:, 0]             # [C]
    o = np.asarray(origin)
    d = np.asarray(direction)
    r = o.shape[0]
    c = aabb.shape[0]
    t0 = np.zeros((r, c), np.float32)
    t1 = np.zeros((r, c), np.float32)
    for ci in range(c):
        m = inv[obj[ci]]
        lo = o @ m[:, :3].T + m[:, 3]
        ld = d @ m[:, :3].T
        with np.errstate(divide="ignore", invalid="ignore"):
            n = (aabb[ci, 0:3] - lo) / ld
            f = (aabb[ci, 3:6] - lo) / ld
        tn = np.minimum(n, f).max(1)
        tf = np.maximum(n, f).min(1)
        t0[:, ci] = tn
        t1[:, ci] = tf
    ok = (t0 <= t1) & (((t0 > 0)) | ((t0 <= 0) & (t1 > 0)))
    return ok, t0, t1


def main():
    cfg = RenderConfig(width=256, height=256, max_depth=5,
                       intersect="bvh", renderer="megakernel")
    scene = compile_scene(load_gltf(
        "/root/reference/resources/cornell_box.gltf"), cfg)
    cam = scene.cameras[0]
    h, w = 256, 256
    ys, xs = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    pix = jnp.asarray(np.stack([xs, ys], -1).reshape(-1, 2))
    seed = seed_from_pixel(jnp.asarray([48271, 16807], jnp.uint32), pix)
    origin, direction, seed = generate_ray(
        jnp.asarray(cam.world_matrix), jnp.float32(cam.yfov), pix,
        (w, h), seed)

    r = origin.shape[0]
    acc = jnp.zeros((r, 3)); mask = jnp.ones((r, 3))
    alive = jnp.ones((r,), bool)
    skip = jnp.zeros((r,), bool)

    for bounce in range(4):
        ok, t0, t1 = slab_pass(scene, origin, direction)
        al = np.asarray(alive)
        okl = ok[al]
        t0l = np.maximum(t0[al], 0.0)
        passes = okl.sum(1)

        # Closest hit (ground truth) for pruned-fired stats.
        t, obj, tri = intersect_scene(scene, origin, direction, eps=cfg.eps)
        tl = np.asarray(t)[al]
        # front-to-back fired = passes whose entry t0 <= hit t.
        fired_ftb = (okl & (t0l <= tl[:, None])).sum(1)
        # rank of the hit-containing pass in per-ray t0 order: how big
        # K must be so the kept pairs contain the closest hit.
        t0m = np.where(okl, t0l, np.inf)
        order = np.sort(t0m, axis=1)
        # number of passes strictly nearer than the hit's t
        k_needed = (order <= tl[:, None] + 1e-6).sum(1)
        k_needed = np.minimum(k_needed, passes)

        # Union stats after octant+Morton sort.
        key = np.asarray(ray_sort_key(scene, origin, direction))[al]
        perm = np.argsort(key, kind="stable")
        oks = okl[perm]
        n = (oks.shape[0] // 128) * 128
        u128 = oks[:n].reshape(-1, 128, oks.shape[1]).any(1).sum(1)
        u8 = oks[:n].reshape(-1, 8, oks.shape[1]).any(1).sum(1)
        u32 = oks[:n].reshape(-1, 32, oks.shape[1]).any(1).sum(1)
        n1k = (oks.shape[0] // 1024) * 1024
        u1k = oks[:n1k].reshape(-1, 1024, oks.shape[1]).any(1).sum(1)

        q = lambda a: np.percentile(a, [50, 90, 99, 100]).round(1).tolist()
        print(f"bounce {bounce}: alive {al.sum()}")
        print(f"  per-ray passes       mean {passes.mean():6.2f} "
              f"p50/90/99/max {q(passes)}")
        print(f"  per-ray fired (ftb)  mean {fired_ftb.mean():6.2f} "
              f"p50/90/99/max {q(fired_ftb)}")
        print(f"  K needed for hit     mean {k_needed.mean():6.2f} "
              f"p50/90/99/max {q(k_needed)}  "
              f"tail>8: {(k_needed > 8).mean()*100:.2f}%  "
              f"passes>16: {(passes > 16).mean()*100:.2f}%")
        print(f"  union/8 {u8.mean():5.2f}  union/32 {u32.mean():5.2f}  "
              f"union/128 {u128.mean():6.2f}  "
              f"union/1024 {u1k.mean():6.2f}  (C={okl.shape[1]})")
        # row-chunks fired per fired (sub, cluster): the 8-row masking win
        f128 = oks[:n].reshape(-1, 16, 8, oks.shape[1])
        sub_f = f128.any((1, 2))          # [subs, C] fired subs
        chunk_f = f128.any(2)             # [subs, 16, C]
        frac = chunk_f.sum((0, 1)).sum() / (sub_f.sum() * 16 + 1e-9)
        print(f"  row-chunks fired per fired (sub,cluster): "
              f"{frac * 16:.2f}/16")

        origin, direction, acc, mask, alive, seed, skip = shade_step(
            scene, cfg, origin, direction, acc, mask, alive, seed,
            jnp.int32(bounce), t, obj, tri, prev_pdf=jnp.zeros_like(t),
            isect=intersect_scene)


if __name__ == "__main__":
    main()
