"""Autotune the Pallas sweep kernel (tile x cluster_size) on the chip.

Times the kernel with an on-device reduction so the axon tunnel's host
transfer doesn't pollute the measurement.  Writes results to stdout.
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--tiles", default="256,512,1024")
    ap.add_argument("--clusters", default="32,64,128")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import logipathtracer_tpu as lpt
    from logipathtracer_tpu.ops.camera import generate_ray
    from logipathtracer_tpu.ops.rng import seed_from_pixel
    from logipathtracer_tpu.ops.traverse import intersect_scene_sweep

    g = lpt.load_gltf("/root/reference/resources/cornell_box.gltf")
    h = w = args.res
    n = h * w
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")

    results = []
    for cs in [int(x) for x in args.clusters.split(",")]:
        cfg = lpt.RenderConfig(cluster_size=cs)
        scene = lpt.compile_scene(g, cfg)
        cam = scene.cameras[0]
        for tile in [int(x) for x in args.tiles.split(",")]:
            # Block-major ray order: one tile = one compact pixel block.
            bw = 32
            bh = tile // bw
            def to_blocks(a):
                return a.reshape(h // bh, bh, w // bw, bw).transpose(
                    0, 2, 1, 3).reshape(-1)
            pix = jnp.stack([to_blocks(xs), to_blocks(ys)], -1)
            seed = seed_from_pixel(jnp.array([12345, 67890], jnp.uint32),
                                   pix)
            o, d, _ = generate_ray(jnp.asarray(cam.world_matrix), cam.yfov,
                                   pix, (w, h), seed)
            o = jax.block_until_ready(o)
            d = jax.block_until_ready(d)
            f = jax.jit(lambda o_, d_: jnp.sum(jnp.where(
                intersect_scene_sweep(scene=scene, origin=o_, direction=d_,
                                      tile=tile)[0] < 3e38, 1.0, 0.0)))
            try:
                t0 = time.time()
                hits = float(np.asarray(f(o, d)))
                compile_s = time.time() - t0
                best = 1e9
                for _ in range(args.iters):
                    t0 = time.time()
                    float(np.asarray(f(o, d)))
                    best = min(best, time.time() - t0)
                mrays = n / best / 1e6
                print(f"cluster={cs:4d} tile={tile:5d}: {mrays:8.1f} Mrays/s"
                      f"  (best {best*1e3:.1f} ms, compile {compile_s:.0f}s,"
                      f" hits {hits:.0f})", flush=True)
                results.append((mrays, cs, tile))
            except Exception as e:
                print(f"cluster={cs:4d} tile={tile:5d}: FAILED "
                      f"{str(e)[:120]}", flush=True)
    if results:
        best = max(results)
        print(f"BEST: cluster={best[1]} tile={best[2]} {best[0]:.1f} Mrays/s")


if __name__ == "__main__":
    main()
