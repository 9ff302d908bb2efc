"""Progressive-vs-direct outside probe + production-body step timing.

Queue-20 found the bench's outside extra at 0.789 Mrays/s — each timed
ProgressiveRenderer.step(16) took ~10.3 s — while the DIRECT
render_wavefront path ran the same 16 samples in 2.74 s minutes
earlier (scripts/outside_e2e.py).  Two questions, one harness:

  A. Which knob slows the chunk/carryover path 3.7x on outside?
     Variants: production default; pool_carryover=False (direct
     render_wavefront inside step()); stream_granularity="chunk"
     (the pre-284f76c stream kernel).
  B. Where do the real loop's 72 ms/iter go when the isolated stage
     sum is 48.2 (q20 items 2/3)?  The production while body itself,
     run as an amortized jitted step function from a fresh pool with
     the same seeds, gives the true per-iteration cost of the exact
     production computation — if it reproduces ~72, the gap is in the
     body (stage-profile composition mismatch); if ~48, it is
     while-loop/axon machinery.

  C. Part B answered "while-loop/axon machinery" (39.4 ms/iter
     host-stepped vs 72 in the real loop, queue 21).  Part C pins the
     mechanism: the SAME body from the SAME fresh pool state, wrapped
     three ways — (host) host-stepped groups of G=8 with one
     next_work fetch per group (the production-replacement candidate),
     (while) the exact production lax.while_loop chunk structure,
     (fori) a static-trip lax.fori_loop.  If while >> host == fori,
     the overhead is the dynamic cond; if while == fori >> host, it is
     any single-program loop through this backend.  Run each variant
     in its OWN process (--parts C --loop <v>): resident-session
     executables contaminate the outside dispatch path (queue 21).

python scripts/prog_probe.py [--res 512] [--samples 16] [--reps 3]
                             [--parts A,B] [--loop host|while|fori]
                             [--scene outside|cornell]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def sync(a):
    # block_until_ready does NOT synchronize through the axon relay in
    # this container (CLAUDE.md); fetch one element instead.
    return float(jnp.sum(a.reshape(-1)[0:1]))


def part_a(scene_gltf, args):
    from logipathtracer_tpu.config import RenderConfig
    from logipathtracer_tpu.render.progressive import ProgressiveRenderer
    from logipathtracer_tpu.scene.compile import compile_scene

    variants = {
        "carryover(default)": dict(),
        "no_carryover": dict(pool_carryover=False),
        "granularity_chunk": dict(stream_granularity="chunk"),
    }
    if args.variants:
        want = args.variants.split(",")
        variants = {k: v for k, v in variants.items()
                    if any(k.startswith(w) for w in want)}
    for name, kw in variants.items():
        cfg = RenderConfig(width=args.res, height=args.res, max_depth=10,
                           renderer="wavefront", **kw)
        scene = compile_scene(scene_gltf, cfg)
        r = ProgressiveRenderer(scene, cfg, host_seed=0)
        r.step(args.samples)  # warmup/compile
        rows = []
        for _ in range(args.reps):
            rays0 = r.total_rays
            t0 = time.perf_counter()
            r.step(args.samples)
            dt = time.perf_counter() - t0
            dr = r.total_rays - rays0
            rows.append((dt, dr / dt / 1e6, r.last_iterations))
        print(f"A {name:20s} " + "  ".join(
            f"{dt:5.2f}s {mr:5.2f}Mr/s it={it}" for dt, mr, it in rows),
            flush=True)


def part_b(scene_gltf, args):
    from logipathtracer_tpu.config import RenderConfig
    from logipathtracer_tpu.render.wavefront import (_make_body,
                                                     _make_pix_coords,
                                                     pix_layout,
                                                     wavefront_pool_state)
    from logipathtracer_tpu.scene.compile import compile_scene

    for gran in ("cluster", "chunk"):
        cfg = RenderConfig(width=args.res, height=args.res, max_depth=10,
                           stream_granularity=gran)
        scene = compile_scene(scene_gltf, cfg)
        cam = scene.cameras[0]
        cam_world = jnp.asarray(cam.world_matrix)
        fov = jnp.float32(cam.yfov)
        h = w = args.res
        npix = h * w
        s = args.samples
        total = s * npix
        p = min(1 << 20, npix)  # ProgressiveRenderer's pool sizing
        ubo_seeds = jnp.asarray(np.random.default_rng(0).integers(
            1, 2 ** 31, (s, 2)), jnp.uint32)
        blocked, bh, bw = pix_layout(cfg, scene, h, w)
        pix_coords = _make_pix_coords(blocked, bh, bw, w,
                                      jnp.asarray(0, jnp.int32))
        body = jax.jit(_make_body(scene, cfg, cam_world, fov, ubo_seeds,
                                  p, npix, total, min(p, 1 << 18),
                                  pix_coords),
                       donate_argnums=(0,))
        st = wavefront_pool_state(p, npix, cm=cfg.pool_cm)
        st = body(st)  # compile
        sync(st["accum"])
        # Fresh state; run the frame's iterations in sync groups of G:
        # per-group host sync costs ride the ~160 ms relay floor, so
        # amortize within groups and subtract nothing (the production
        # while loop pays zero host syncs — report both the raw and
        # the floor-adjusted number).
        st = wavefront_pool_state(p, npix, cm=cfg.pool_cm)
        G, NG = 8, 5
        times = []
        t_all0 = time.perf_counter()
        for g in range(NG):
            t0 = time.perf_counter()
            for _ in range(G):
                st = body(st)
            sync(st["rays"])
            times.append((time.perf_counter() - t0) / G * 1e3)
        t_all = time.perf_counter() - t_all0
        rays = float(st["rays"])
        it = int(st["it"])
        print(f"B gran={gran:8s} body-step ms/iter by group: "
              + " ".join(f"{t:6.1f}" for t in times)
              + f"  | {NG*G} iters, {rays/1e6:.2f} Mrays, "
              f"{rays/t_all/1e6:.2f} Mrays/s, it={it}", flush=True)


def _chunk_setup(scene_gltf, args):
    """Shared part-C setup: production body + fresh chunk-call state."""
    from logipathtracer_tpu.config import RenderConfig
    from logipathtracer_tpu.render.wavefront import (_make_body,
                                                     _make_pix_coords,
                                                     pix_layout,
                                                     wavefront_pool_state)
    from logipathtracer_tpu.scene.compile import compile_scene

    cfg = RenderConfig(width=args.res, height=args.res, max_depth=10,
                       renderer="wavefront")
    scene = compile_scene(scene_gltf, cfg)
    cam = scene.cameras[0]
    cam_world = jnp.asarray(cam.world_matrix)
    fov = jnp.float32(cam.yfov)
    h = w = args.res
    npix = h * w
    s = args.samples
    total = s * npix
    p = min(1 << 20, npix)
    ubo_seeds = jnp.asarray(np.random.default_rng(0).integers(
        1, 2 ** 31, (s, 2)), jnp.uint32)
    blocked, bh, bw = pix_layout(cfg, scene, h, w)
    pix_coords = _make_pix_coords(blocked, bh, bw, w,
                                  jnp.asarray(0, jnp.int32))
    body = _make_body(scene, cfg, cam_world, fov, ubo_seeds, p, npix,
                      total, min(p, 1 << 18), pix_coords)
    fresh = lambda: wavefront_pool_state(p, npix, cm=cfg.pool_cm)
    return body, fresh, total


def part_c(scene_gltf, args):
    import jax.lax as lax

    body, fresh, total = _chunk_setup(scene_gltf, args)
    G, MAXIT = 8, 64

    if args.loop == "host":
        step = jax.jit(body, donate_argnums=(0,))

        def run():
            st = fresh()
            it = 0
            while it < MAXIT:
                for _ in range(G):
                    st = step(st)
                it += G
                if int(st["next_work"]) >= total:
                    break
            sync(st["rays"])
            return st, it
    elif args.loop == "while":
        # The exact production wavefront_chunk structure.
        def cond(st):
            return (st["next_work"] < total) & (st["it"] < MAXIT)

        loop = jax.jit(lambda st: lax.while_loop(cond, body, st),
                       donate_argnums=(0,))

        def run():
            st = loop(fresh())
            sync(st["rays"])
            return st, int(st["it"])
    elif args.loop == "fori":
        n = args.fori_iters

        def loop_fn(st):
            return lax.fori_loop(0, n, lambda i, s: body(s), st)

        loop = jax.jit(loop_fn, donate_argnums=(0,))

        def run():
            st = loop(fresh())
            sync(st["rays"])
            return st, n
    else:
        raise SystemExit(f"unknown --loop {args.loop}")

    run()  # compile + warm
    for _ in range(args.reps):
        t0 = time.perf_counter()
        st, it = run()
        dt = time.perf_counter() - t0
        rays = float(st["rays"])
        print(f"C scene={args.scene} loop={args.loop:5s} {dt:6.2f}s "
              f"it={it:3d} {dt/it*1e3:6.1f} ms/iter "
              f"{rays/1e6:.2f} Mrays {rays/dt/1e6:5.2f} Mrays/s",
              flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--samples", type=int, default=16)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--parts", default="A,B")
    ap.add_argument("--variants", default="",
                    help="part-A variant name prefixes (comma list); "
                         "run ONE per process on outside (queue-21 "
                         "contamination)")
    ap.add_argument("--loop", default="host",
                    choices=("host", "while", "fori"))
    ap.add_argument("--fori-iters", type=int, default=40)
    ap.add_argument("--scene", default="outside",
                    choices=("outside", "cornell"))
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    if args.scene == "cornell":
        from logipathtracer_tpu.scene.gltf import load_gltf
        gltf = load_gltf("/root/reference/resources/cornell_box.gltf")
    else:
        from logipathtracer_tpu.scene.procedural import make_outside_scene
        gltf = make_outside_scene()
    if "A" in args.parts:
        part_a(gltf, args)
    if "B" in args.parts:
        part_b(gltf, args)
    if "C" in args.parts:
        part_c(gltf, args)


if __name__ == "__main__":
    main()
