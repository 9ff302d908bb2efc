"""Prewarm the persistent XLA compile cache for the production shape
set (VERDICT r4 item 7).

Container resets wipe tests/.jax_cache; every remote TPU AOT compile
then costs 100-300 s, which is what sank the round-4 driver bench
(rc=124 at ~20 min).  This script compiles the flagship shapes in one
pass so that any later bench.py / viewer / queue-script invocation is
warm:

  1. cornell 1024^2 wavefront chunk (bench headline; chunk=16 seeds —
     the seed-batch shape is part of the jit key)
  2. ray-query intersect-only jit (bench headline extra)
  3. outside-class 512^2 wavefront (bench extra)
  4. nee+textured 512^2 (bench extra)
  5. viewer 1920x1080 full-res step + 480x270 navigation preview
     (scripts/interactive_1080p.py / `web` subcommand)

Stage split graphs (scripts/stage_profile.py) share the same kernels
at the same shapes, so they come along for free.

All stages run in ONE process sequentially — the cache is shared via
disk, and the TPU chip is exclusive anyway.  Safe to re-run: warm
shapes cost seconds.

Usage:  python scripts/prewarm.py [--cpu] [--only headline,viewer,...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _stage(name, fn, done):
    t0 = time.perf_counter()
    try:
        fn()
        print(f"[prewarm] {name}: {time.perf_counter() - t0:.1f}s",
              flush=True)
        done.append(name)
    except Exception as e:  # keep warming the rest
        print(f"[prewarm] {name} FAILED after "
              f"{time.perf_counter() - t0:.1f}s: {e}", flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--only", default=None,
                    help="comma-separated subset of: headline, rayquery, "
                         "outside, nee_tex, viewer")
    ap.add_argument("--scene",
                    default="/root/reference/resources/cornell_box.gltf")
    args = ap.parse_args()
    want = set(args.only.split(",")) if args.only else None

    def wanted(name):
        return want is None or name in want

    # Cache-key hygiene (bench.py:_init_jax): the axon cache key folds
    # these env vars, so any leftover (e.g. from a multichip dryrun)
    # would make this prewarm useless to a clean-env bench.
    for var in ("XLA_FLAGS", "AXON_LIBTPU_OVERRIDES", "LIBTPU_INIT_ARGS"):
        os.environ.pop(var, None)
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from logipathtracer_tpu.utils.cache import configure_compile_cache
    configure_compile_cache(
        jax, os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tests", ".jax_cache"),
        cpu=args.cpu)

    from logipathtracer_tpu.config import RenderConfig
    from logipathtracer_tpu.render.progressive import ProgressiveRenderer
    from logipathtracer_tpu.scene.compile import compile_scene
    from logipathtracer_tpu.scene.gltf import load_gltf

    done = []
    t_all = time.perf_counter()
    gltf = load_gltf(args.scene)

    def step_once(scene_cfg, chunk, gltf_obj=None):
        scene = compile_scene(gltf_obj if gltf_obj is not None else gltf,
                              scene_cfg)
        r = ProgressiveRenderer(scene, scene_cfg, host_seed=0)
        r.step(chunk)
        # Read path too (drain + tonemap graphs).
        import numpy as np
        np.asarray(r.image())
        return scene

    cornell_cfg = RenderConfig(width=1024, height=1024, max_depth=10)
    if wanted("headline"):
        _stage("headline cornell 1024^2 (chunk 16)",
               lambda: step_once(cornell_cfg, 16), done)

    if wanted("rayquery"):
        def rayquery():
            import jax.numpy as jnp
            import numpy as np

            from logipathtracer_tpu.ops.camera import generate_ray
            from logipathtracer_tpu.ops.rng import seed_from_pixel
            from logipathtracer_tpu.render.megakernel import (
                pick_intersect, sorted_intersect)
            scene = compile_scene(gltf, cornell_cfg)
            h, w = cornell_cfg.render_height, cornell_cfg.render_width
            ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                                  jnp.arange(w, dtype=jnp.float32),
                                  indexing="ij")
            pix = jnp.stack([xs, ys], -1).reshape(-1, 2)
            seed = seed_from_pixel(
                jnp.asarray([48271, 16807], jnp.uint32), pix)
            o, d, _ = generate_ray(
                jnp.asarray(scene.cameras[0].world_matrix),
                jnp.float32(scene.cameras[0].yfov), pix, (w, h), seed)
            isect = pick_intersect(cornell_cfg, scene)
            f = jax.jit(lambda oo, dd: sorted_intersect(
                isect, scene, oo, dd, cornell_cfg.eps)[0].sum()[None])
            float(np.asarray(f(o, d))[0])
        _stage("ray-query 1024^2", rayquery, done)

    if wanted("outside"):
        def outside():
            from logipathtracer_tpu.scene.procedural import \
                make_outside_scene
            step_once(RenderConfig(width=512, height=512, max_depth=10),
                      16, gltf_obj=make_outside_scene())
        _stage("outside-class 512^2 (chunk 16)", outside, done)

    if wanted("nee_tex"):
        def nee_tex():
            from logipathtracer_tpu.scene.procedural import make_box_scene
            step_once(RenderConfig(width=512, height=512, max_depth=10,
                                   nee=True), 16,
                      gltf_obj=make_box_scene(spheres=6, subdiv=3,
                                              textured=True))
        _stage("nee+textured 512^2 (chunk 16)", nee_tex, done)

    if wanted("viewer"):
        _stage("viewer 1920x1080 (chunk 1)",
               lambda: step_once(RenderConfig(width=1920, height=1080,
                                              max_depth=10), 1), done)
        # The navigation preview defaults to depth 4 (cli/main.py
        # --preview-depth); warm that exact shape.
        _stage("viewer preview 480x270 depth4 (chunk 1)",
               lambda: step_once(RenderConfig(width=480, height=270,
                                              max_depth=4), 1), done)

    print(f"[prewarm] done {len(done)} stages in "
          f"{time.perf_counter() - t_all:.1f}s: {', '.join(done)}",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
