"""A/B production-renderer configs on hardware (default: cfg.pool_cm).

Times the PRODUCTIVE progressive renderer (carryover wavefront) at
bench scale with a baseline config vs the same config plus overrides,
interleaved in ONE process (isolated cross-process timings swing 9-40x
on axon — CLAUDE.md).  The default A/B is the component-major pool,
whose images are equal up to XLA-fusion ULPs (tests/test_wavefront.py::
test_pool_cm_bit_identical), so the decision is timings alone.

python scripts/cm_ab.py [--res 1024] [--samples 16] [--reps 3]
                        [--ab pool_cm=True] [--ab sort_every=2] ...
"""

import argparse
import ast
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# One cache-key universe (CLAUDE.md: the axon cache key folds these).
for var in ("XLA_FLAGS", "AXON_LIBTPU_OVERRIDES", "LIBTPU_INIT_ARGS"):
    os.environ.pop(var, None)

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--samples", type=int, default=16)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--scene", default="cornell",
                    choices=["cornell", "outside"])
    ap.add_argument("--ab", action="append", default=[],
                    help="cfg override(s) for the B arm, e.g. "
                         "pool_cm=True (default) or sort_every=2")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from logipathtracer_tpu.utils.cache import configure_compile_cache
    configure_compile_cache(jax, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", ".jax_cache"), cpu=args.cpu)

    overrides = {}
    for spec in (args.ab or ["pool_cm=True"]):
        k, v = spec.split("=", 1)
        overrides[k] = ast.literal_eval(v)
    print("B overrides:", overrides, flush=True)

    from logipathtracer_tpu.config import RenderConfig
    from logipathtracer_tpu.render.progressive import ProgressiveRenderer
    from logipathtracer_tpu.scene.compile import compile_scene
    from logipathtracer_tpu.scene.gltf import load_gltf

    if args.scene == "outside":
        from logipathtracer_tpu.scene.procedural import make_outside_scene
        gltf = make_outside_scene()
    else:
        gltf = load_gltf("/root/reference/resources/cornell_box.gltf")

    sessions = {}
    for arm, ov in (("A", {}), ("B", overrides)):
        cfg = RenderConfig(width=args.res, height=args.res, max_depth=10,
                           **ov)
        scene = compile_scene(gltf, cfg)
        r = ProgressiveRenderer(scene, cfg, host_seed=0)
        t0 = time.perf_counter()
        r.step(args.samples)  # compile + fill
        print(f"{arm} warmup {time.perf_counter() - t0:.1f}s", flush=True)
        sessions[arm] = r

    for rnd in range(args.rounds):
        for arm, r in sessions.items():
            best = 0.0
            for _ in range(args.reps):
                rays0 = r.total_rays
                t0 = time.perf_counter()
                r.step(args.samples)
                dt = time.perf_counter() - t0
                best = max(best, (r.total_rays - rays0) / dt / 1e6)
            print(f"round {rnd} {arm}: {best:6.2f} Mrays/s "
                  f"(best of {args.reps})", flush=True)

    m = {arm: round(float(np.asarray(r.radiance()).mean()), 6)
         for arm, r in sessions.items()}
    print(f"mean radiance A={m['A']} B={m['B']}")


if __name__ == "__main__":
    main()
