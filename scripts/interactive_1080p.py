"""Measure the 1080p-class interactive session (VERDICT r3 missing #1,
VERDICT r4 next-round item 3).

The reference presents progressive 1920x1080 frames through a Vulkan
swapchain every sample, with camera keys resetting accumulation
(/root/reference/src/RendererPT.cpp:550-567,
 src/RendererCore.cpp:373-412, src/Main.cpp:57-93).  On this headless
TPU host the analog is the web viewer (cli/webview.py); this script
runs the viewer's exact present loop at the reference's DEFAULT
interactive config (1920x1080, 1 spp per frame, max_depth 10):

  * a NAVIGATE phase: the camera rotates every frame (accumulation
    resets, the reference's dirty protocol); frames render on the
    reduced-scale PREVIEW renderer exactly as `web` does while keys
    arrive, and present as the raw-RGBA blit the browser draws;
  * a CONVERGE phase: camera still, full-resolution accumulation, one
    more sample presented per frame (raw blit again — PNG encoding is
    on-demand only in the viewer, measured separately here once).

Timing notes: np.asarray(image) is a real device fetch, so every frame
is host-synced through the relay — no async-dispatch credit (CLAUDE.md
sync rules).  Phase throughputs are derived from the phase's own
wall-clock frame totals, NOT from ProgressiveRenderer's internal timer
(its block_until_ready bracketing does not synchronize through the
axon relay in this container — CLAUDE.md; ADVICE r4).

Usage (idle host, one TPU process):
  python scripts/interactive_1080p.py \
      [--scene /root/reference/resources/cornell_box.gltf]
      [--width 1920 --height 1080] [--preview-scale 4]
      [--nav-frames 12 --acc-frames 12]
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
    ap.add_argument("--preview-scale", type=int, default=4)
    ap.add_argument("--preview-depth", type=int, default=4,
                    help="max path depth for navigation frames (0 = "
                         "full depth; matches `web --preview-depth`)")
    ap.add_argument("--nav-frames", type=int, default=12)
    ap.add_argument("--acc-frames", type=int, default=12)
    ap.add_argument("--acc-spp", type=int, default=1,
                    help="samples per converge present (matches `web "
                         "--spp-per-frame`; each present pays a full "
                         "pool drain, so batching amortizes it)")
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

    gltf = load_gltf(args.scene)
    cfg = RenderConfig(width=args.width, height=args.height, max_depth=10)
    t0 = time.perf_counter()
    scene = compile_scene(gltf, cfg)
    r = ProgressiveRenderer(scene, cfg, host_seed=0)
    rp = None
    if args.preview_scale > 1:
        pw = max(64, args.width // args.preview_scale)
        ph = max(64, args.height // args.preview_scale)
        cfg_p = RenderConfig(width=pw, height=ph,
                             max_depth=(args.preview_depth or 10))
        rp = ProgressiveRenderer(compile_scene(gltf, cfg_p), cfg_p,
                                 host_seed=0)
    scene_compile_s = time.perf_counter() - t0

    def submit(renderer, move, spp=1):
        """Dispatch one viewer frame WITHOUT host syncs: advance
        ``spp`` samples (deferred counter fetches, step_nosync) and
        return the device-side uint8 RGBA frame handle.  The caller
        fetches it AFTER dispatching the next frame, so frame N+1's
        device compute overlaps frame N's relay transfer — the
        double-buffered present the web viewer runs."""
        if move:
            renderer.rotate(1, 0.02)        # viewer 'j': dirty + reset
        renderer.step_nosync(spp)
        frame = renderer.image_u8()         # dispatch drain + tonemap
        try:
            frame.copy_to_host_async()
        except Exception:
            pass
        return frame

    def present_sync(renderer):
        """Non-pipelined frame (warmup / phase boundaries)."""
        t0 = time.perf_counter()
        frame = submit(renderer, move=False)
        rgba = np.asarray(frame)
        return rgba, time.perf_counter() - t0

    # Warmup both render graphs (one shape each).
    t0 = time.perf_counter()
    present_sync(r)
    if rp is not None:
        present_sync(rp)
    warmup_s = time.perf_counter() - t0

    def run_phase(n, renderer, move, spp=1):
        """Pipelined phase: n presented frames, each fetched after the
        NEXT frame's dispatch.  Frame time = present-to-present
        interval (what a viewer client experiences).  ADVICE r4: n == 0
        yields an empty-phase record; throughput derives from the
        phase's own wall-clock totals."""
        if n == 0:
            return {"frames": [], "fps_mean": None, "fps_best": None,
                    "frame_ms_median": None, "samples_per_sec": None,
                    "mrays_per_sec": None}
        frames = []
        rays_start = renderer.total_rays
        pending = submit(renderer, move, spp)
        t_prev = time.perf_counter()
        t_phase = t_prev
        for i in range(n):
            nxt = submit(renderer, move, spp) if i + 1 < n else None
            t_fetch0 = time.perf_counter()
            rgba = np.asarray(pending)
            t_fetch1 = time.perf_counter()
            blob = rgba.tobytes()
            now = time.perf_counter()
            frames.append({"total_s": round(now - t_prev, 4),
                           "fetch_s": round(t_fetch1 - t_fetch0, 4),
                           "encode_s": round(now - t_fetch1, 4),
                           "blob_bytes": len(blob)})
            t_prev = now
            pending = nxt
        wall = time.perf_counter() - t_phase
        # Ray accounting: still phases accumulate (total delta); moved
        # phases reset per frame, so scale the LAST frame's count (all
        # nav frames trace the same fresh-1spp workload).
        if move:
            phase_rays = n * renderer.total_rays
        else:
            phase_rays = renderer.total_rays - rays_start
        total = [f["total_s"] for f in frames]
        return {
            "frames": frames,
            "fps_mean": round(n / wall, 3),
            "fps_best": round(1.0 / min(total), 3),
            "frame_ms_median": round(sorted(total)[n // 2] * 1e3, 1),
            "samples_per_sec": round(n * spp / wall, 3),
            "mrays_per_sec": round(phase_rays / wall / 1e6, 3),
        }

    nav = run_phase(args.nav_frames, rp if rp is not None else r,
                    move=True)
    # Camera moved on the preview only during nav; mark the full-res
    # session dirty so converge starts a clean accumulation (ADVICE r4:
    # don't average a navigate frame into the converge stats).
    if rp is not None and args.nav_frames:
        r.rotate(1, 0.02 * args.nav_frames)
    acc = run_phase(args.acc_frames, r, move=False, spp=args.acc_spp)

    # PNG screenshot cost, measured ONCE (the viewer encodes PNG only
    # on demand — it is no longer on the per-frame present path).
    img = np.asarray(r.image())
    t0 = time.perf_counter()
    png = encode_png(to_uint8(img))
    png_encode_s = time.perf_counter() - t0

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    write_png(args.out + ".png", to_uint8(img))

    report = {
        "scene": scene.name,
        "resolution": f"{cfg.render_width}x{cfg.render_height}",
        "preview_resolution": (
            f"{rp.config.render_width}x{rp.config.render_height}"
            if rp is not None else None),
        "preview_depth": (rp.config.max_depth if rp is not None
                          else None),
        "device": str(jax.devices()[0]),
        "renderer": "wavefront" if r._use_wavefront() else "megakernel",
        "scene_compile_s": round(scene_compile_s, 2),
        "xla_warmup_s": round(warmup_s, 1),
        "navigate_1spp": {k: v for k, v in nav.items() if k != "frames"},
        "converge_accum": {k: v for k, v in acc.items() if k != "frames"},
        "png_screenshot_s": round(png_encode_s, 3),
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
