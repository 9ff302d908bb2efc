"""TPU sweep of the wavefront scheduling knobs (sort_every, lazy_regen).

python scripts/sched_sweep.py [--res 1024] [--spp 16]
"""

import argparse
import itertools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", "tests",
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from logipathtracer_tpu.config import RenderConfig
from logipathtracer_tpu.render.progressive import ProgressiveRenderer
from logipathtracer_tpu.scene.compile import compile_scene
from logipathtracer_tpu.scene.gltf import load_gltf


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--scene",
                    default="/root/reference/resources/cornell_box.gltf")
    args = ap.parse_args()

    gltf = load_gltf(args.scene)
    results = []
    # lazy_regen measured neutral (round 2); sort_every is worth
    # re-testing per intersect backend — the compaction kernel is much
    # less sort-sensitive than the sub-tile sweep (unsorted costs ~2x,
    # not ~10x), so staler orders may now pay off.
    for sort_every, lazy in itertools.product((1, 2, 3), (0,)):
        cfg = RenderConfig(width=args.res, height=args.res, max_depth=10,
                           sort_every=sort_every, lazy_regen=lazy)
        scene = compile_scene(gltf, cfg)
        r = ProgressiveRenderer(scene, cfg, host_seed=0)
        r.step(args.spp)  # warmup/compile
        t0 = time.perf_counter()
        r.step(args.spp)
        dt = time.perf_counter() - t0
        rays = r.total_rays / r.sample_count * args.spp
        mr = rays / dt / 1e6
        mean = float(r.radiance().mean())
        results.append((sort_every, lazy, mr, mean))
        print(f"sort_every={sort_every} lazy_regen={lazy}: "
              f"{mr:.2f} Mrays/s  mean_radiance={mean:.5f}", flush=True)
    best = max(results, key=lambda x: x[2])
    print(f"BEST: sort_every={best[0]} lazy_regen={best[1]} "
          f"{best[2]:.2f} Mrays/s")


if __name__ == "__main__":
    main()
