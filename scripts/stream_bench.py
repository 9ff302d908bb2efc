"""TPU benchmark of the HBM-streamed cluster sweep on a 400k-tri soup
(the outside.gltf-scale workload, BASELINE config 3).

python scripts/stream_bench.py [--tris 400000] [--res 256] [--spp 2]
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
from logipathtracer_tpu.render.megakernel import (pick_intersect,
                                                  resolve_intersect_mode,
                                                  sorted_intersect)
from logipathtracer_tpu.scene.compile import compile_scene
from logipathtracer_tpu.scene.procedural import (make_outside_scene,
                                                 make_triangle_soup)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="soup", choices=["soup", "outside"])
    ap.add_argument("--tris", type=int, default=400_000)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--spp", type=int, default=2)
    ap.add_argument("--tile", type=int, default=4096)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--render", action="store_true",
                    help="also time an end-to-end progressive render")
    args = ap.parse_args()

    cfg = RenderConfig(width=args.res, height=args.res, max_depth=10,
                       stream_tile=args.tile, stream_chunk=args.chunk)
    t0 = time.perf_counter()
    gltf = (make_outside_scene(tri_budget=args.tris)
            if args.scene == "outside" else make_triangle_soup(args.tris))
    scene = compile_scene(gltf, cfg)
    print(f"scene compile: {time.perf_counter() - t0:.1f}s  "
          f"clusters={scene.cl_tris.shape[0]}  "
          f"cl_tris={scene.cl_tris.nbytes / 2**20:.1f} MB  "
          f"mode={resolve_intersect_mode(cfg, scene)}", flush=True)

    # --- intersect-only: sorted primary wavefront ----------------------
    h = w = 1024
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    pix = jnp.stack([xs, ys], -1).reshape(-1, 2)
    seed = seed_from_pixel(jnp.asarray([48271, 16807], jnp.uint32), pix)
    cam = scene.cameras[0]
    o, d, _ = generate_ray(jnp.asarray(cam.world_matrix),
                           jnp.float32(cam.yfov), pix, (w, h), seed)
    isect = pick_intersect(cfg, scene)
    f = jax.jit(lambda oo, dd: sorted_intersect(
        isect, scene, oo, dd, cfg.eps)[0].sum()[None])
    t0 = time.perf_counter()
    hits = float(np.asarray(f(o, d))[0])
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        float(np.asarray(f(o, d))[0])
    dt = time.perf_counter() - t0
    print(f"intersect-only: {n * h * w / dt / 1e6:.2f} Mrays/s "
          f"({dt / n * 1e3:.0f} ms per {h}x{w})", flush=True)

    if args.render:
        from logipathtracer_tpu.render.progressive import ProgressiveRenderer
        r = ProgressiveRenderer(scene, cfg, host_seed=0)
        t0 = time.perf_counter()
        r.step(args.spp)
        print(f"render warmup: {time.perf_counter() - t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        r.step(args.spp)
        dt = time.perf_counter() - t0
        rays = r.total_rays / r.sample_count * args.spp
        print(f"end-to-end: {rays / dt / 1e6:.2f} Mrays/s  "
              f"({args.spp / dt:.3f} samples/s @ {args.res}^2)", flush=True)


if __name__ == "__main__":
    main()
