"""Intersect-only TPU benchmark: sorted primary rays + scrambled rays.

python scripts/isect_bench.py [--tile 1024] [--res 1024]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from logipathtracer_tpu.config import RenderConfig
from logipathtracer_tpu.ops.camera import generate_ray
from logipathtracer_tpu.ops.rng import seed_from_pixel
from logipathtracer_tpu.render.megakernel import pick_intersect, sorted_intersect
from logipathtracer_tpu.scene.compile import compile_scene
from logipathtracer_tpu.scene.gltf import load_gltf


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tile", type=int, default=1024)
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--cluster", type=int, default=256)
    ap.add_argument("--scene",
                    default="/root/reference/resources/cornell_box.gltf")
    args = ap.parse_args()

    cfg = RenderConfig(width=args.res, height=args.res, max_depth=10,
                       sweep_tile=args.tile, cluster_size=args.cluster)
    scene = compile_scene(load_gltf(args.scene), cfg)
    cam = scene.cameras[0]
    h = w = args.res
    ys, xs = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    pix = jnp.asarray(np.stack([xs, ys], -1).reshape(-1, 2))
    seed = seed_from_pixel(jnp.asarray([48271, 16807], jnp.uint32), pix)
    o, d, _ = generate_ray(jnp.asarray(cam.world_matrix),
                           jnp.float32(cam.yfov), pix, (w, h), seed)
    isect = pick_intersect(cfg, scene)

    # Scrambled = bounce-like incoherence (fixed permutation).
    perm = np.random.default_rng(1).permutation(h * w)
    o_s = jnp.asarray(np.asarray(o)[perm])
    d_s = jnp.asarray(np.asarray(d)[perm])

    def run(name, oo, dd, n=8):
        f = jax.jit(lambda a, b: sorted_intersect(
            isect, scene, a, b, cfg.eps)[0].sum()[None])
        t0 = time.perf_counter()
        float(np.asarray(f(oo, dd))[0])
        print(f"  compile {time.perf_counter()-t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        for _ in range(n):
            r = f(oo, dd)
        float(np.asarray(r)[0])
        dt = (time.perf_counter() - t0) / n
        print(f"{name:24s} {h*w/dt/1e6:8.2f} Mrays/s  ({dt*1e3:.1f} ms)",
              flush=True)

    print("device:", jax.devices()[0], " tile:", args.tile, flush=True)
    run("primary sorted", o, d)
    run("scrambled sorted", o_s, d_s)


if __name__ == "__main__":
    main()
