"""Measure the 1080p-class interactive session (VERDICT r3 missing #1).

The reference presents progressive 1920x1080 frames through a Vulkan
swapchain every sample, with camera keys resetting accumulation
(/root/reference/src/RendererPT.cpp:550-567,
 src/RendererCore.cpp:373-412, src/Main.cpp:57-93).  On this headless
TPU host the analog is the web viewer (cli/webview.py); this script
runs the viewer's exact present loop — step(1), drain, tonemap, fetch,
PNG-encode — at full 1920x1080 on the real chip and records what a
user of the `web` subcommand would experience:

  * a NAVIGATE phase: the camera rotates every frame (accumulation
    resets each time, the reference's dirty protocol) — 1 spp frames;
  * a CONVERGE phase: camera still, one more sample accumulated and
    presented per frame.

Writes a JSON report (per-phase fps + per-frame breakdown) and the
final converged frame as PNG.  Timing note: np.asarray(image) is a
real device fetch, so every frame is host-synced through the relay —
no async-dispatch credit (CLAUDE.md sync rules).

Usage (idle host, one TPU process):
  python scripts/interactive_1080p.py \
      [--scene /root/reference/resources/cornell_box.gltf]
      [--width 1920 --height 1080] [--nav-frames 12 --acc-frames 12]
      [--out renders/interactive_1080p]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene",
                    default="/root/reference/resources/cornell_box.gltf")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--nav-frames", type=int, default=12)
    ap.add_argument("--acc-frames", type=int, default=12)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="renders/interactive_1080p")
    args = ap.parse_args()

    # Cache-key hygiene (bench.py:_init_jax): scrub the env vars the
    # axon cache key folds, then share the repo's persistent cache.
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

    import numpy as np

    from logipathtracer_tpu.config import RenderConfig
    from logipathtracer_tpu.film.image import to_uint8
    from logipathtracer_tpu.film.png import encode_png, write_png
    from logipathtracer_tpu.render.progressive import ProgressiveRenderer
    from logipathtracer_tpu.scene.compile import compile_scene
    from logipathtracer_tpu.scene.gltf import load_gltf

    cfg = RenderConfig(width=args.width, height=args.height, max_depth=10)
    t0 = time.perf_counter()
    scene = compile_scene(load_gltf(args.scene), cfg)
    scene_compile_s = time.perf_counter() - t0
    r = ProgressiveRenderer(scene, cfg, host_seed=0)

    def present():
        """One viewer frame: advance one sample, then do exactly what
        cli/webview.py::serve does to put it on screen."""
        t_step = time.perf_counter()
        r.step(1)
        img = np.asarray(r.image())     # drain + tonemap + device fetch
        t_fetch = time.perf_counter()
        png = encode_png(to_uint8(img))
        t_done = time.perf_counter()
        return img, png, t_fetch - t_step, t_done - t_fetch

    # Warmup: compiles the wavefront step + drain graphs (one shape).
    t0 = time.perf_counter()
    present()
    warmup_s = time.perf_counter() - t0

    def run_phase(n, move):
        frames = []
        for i in range(n):
            if move:
                r.rotate(1, 0.02)       # viewer 'j' key: dirty + reset
            t0 = time.perf_counter()
            _, png, render_s, encode_s = present()
            frames.append({"total_s": round(time.perf_counter() - t0, 4),
                           "render_s": round(render_s, 4),
                           "encode_s": round(encode_s, 4),
                           "png_bytes": len(png)})
        total = [f["total_s"] for f in frames]
        return {
            "frames": frames,
            "fps_mean": round(n / sum(total), 3),
            "fps_best": round(1.0 / min(total), 3),
            "frame_ms_median": round(sorted(total)[n // 2] * 1e3, 1),
        }

    nav = run_phase(args.nav_frames, move=True)
    acc = run_phase(args.acc_frames, move=False)

    img = np.asarray(r.image())
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    write_png(args.out + ".png", to_uint8(img))

    report = {
        "scene": scene.name,
        "resolution": f"{cfg.render_width}x{cfg.render_height}",
        "device": str(jax.devices()[0]),
        "renderer": "wavefront" if r._use_wavefront() else "megakernel",
        "scene_compile_s": round(scene_compile_s, 2),
        "xla_warmup_s": round(warmup_s, 1),
        "navigate_1spp": {k: v for k, v in nav.items() if k != "frames"},
        "converge_accum": {k: v for k, v in acc.items() if k != "frames"},
        "samples_per_sec_converge": round(r.samples_per_sec(), 3),
        "mrays_per_sec_converge": round(r.mrays_per_sec(), 3),
        "nav_frames": nav["frames"],
        "acc_frames": acc["frames"],
    }
    with open(args.out + "_report.json", "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps({k: v for k, v in report.items()
                      if k not in ("nav_frames", "acc_frames")}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
