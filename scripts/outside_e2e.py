"""Outside-scene end-to-end anatomy: iterations, occupancy, Mrays.

The config-3 stand-in benches at ~1.06 Mrays/s e2e while the stage
profile's pool-lane rate is ~4 Mrays/s-iter — this script measures the
gap's anatomy on hardware: pool occupancy (traced rays per iteration
vs pool lanes) and the per-step iteration count, for a few pool sizes.

python scripts/outside_e2e.py [--samples 16] [--res 512]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=16)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--pools", default="262144,131072")
    args = ap.parse_args()

    from logipathtracer_tpu.config import RenderConfig
    from logipathtracer_tpu.render.wavefront import render_wavefront
    from logipathtracer_tpu.scene.compile import compile_scene
    from logipathtracer_tpu.scene.procedural import make_outside_scene

    cfg = RenderConfig(width=args.res, height=args.res, max_depth=10)
    scene = compile_scene(make_outside_scene(), cfg)
    cam = scene.cameras[0]
    cam_world = jnp.asarray(cam.world_matrix)
    fov = jnp.float32(cam.yfov)
    rng = np.random.default_rng(0)

    for pool in [int(x) for x in args.pools.split(",")]:
        seeds = jnp.asarray(rng.integers(1, 2 ** 31, (args.samples, 2)),
                            jnp.uint32)
        # warmup/compile with the same shapes
        # NB: block_until_ready does NOT synchronize through the axon
        # relay (stage_profile sync note) — fetch one element instead.
        sync = lambda a: float(jnp.sum(a.reshape(-1)[0:1]))
        acc, rays, iters = render_wavefront(scene, cfg, cam_world, fov,
                                            seeds, pool=pool)
        sync(acc)
        t0 = time.perf_counter()
        acc, rays, iters = render_wavefront(scene, cfg, cam_world, fov,
                                            seeds, pool=pool)
        sync(acc)
        dt = time.perf_counter() - t0
        rays = float(rays)
        iters = int(iters)
        npix = args.res * args.res
        print(f"pool {pool}: {rays/1e6:.2f} Mrays, {iters} iters, "
              f"{dt:.2f} s -> {rays/dt/1e6:.2f} Mrays/s e2e; "
              f"occupancy {rays/(iters*pool)*100:.1f}%  "
              f"({dt/iters*1e3:.1f} ms/iter, "
              f"{rays/(args.samples*npix):.2f} rays/path)", flush=True)


if __name__ == "__main__":
    main()
