"""Worklist stream kernel vs the 2-D-grid stream kernel (v5e).

Correctness: same hits up to coplanar tie-breaks (both kernels sweep
clusters in different orders, so near-ties may resolve differently —
same caveat as megakernel-vs-wavefront).  Timing on the dumped outside
bounce pool, primaries, and a parked pool.

python scripts/worklist_probe.py [--pool /tmp/outside_pool.npz]
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
from logipathtracer_tpu.ops.traverse import (intersect_scene_stream,
                                             intersect_scene_worklist)
from logipathtracer_tpu.scene.compile import compile_scene
from logipathtracer_tpu.scene.procedural import make_outside_scene


def timeit(f, *a, n=5):
    out = f(*a)
    float(np.asarray(out[0])[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*a)
    float(np.asarray(out[0])[0])
    return (time.perf_counter() - t0) / n, out


def compare(name, got, ref, r):
    tg, og, trg = (np.asarray(x) for x in got)
    tr, orf, trr = (np.asarray(x) for x in ref)
    hit_mismatch = np.sum((trg >= 0) != (trr >= 0))
    both = (trg >= 0) & (trr >= 0)
    t_close = np.isclose(tg[both], tr[both], rtol=1e-5, atol=1e-6)
    diff = np.sum(~t_close) + hit_mismatch
    print(f"{name}: hit-flag mismatches {hit_mismatch}, "
          f"t mismatches {np.sum(~t_close)} "
          f"({100.0 * diff / r:.4f}% divergent)", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pool", default="/tmp/outside_pool.npz")
    ap.add_argument("--it", type=int, default=3)
    ap.add_argument("--tile", type=int, default=4096)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--cap", type=int, default=128)
    ap.add_argument("--wl-only", action="store_true",
                    help="skip the 2-D-grid kernel (tile sweeps: only "
                         "the worklist kernel is production)")
    ap.add_argument("--cluster", type=int, default=256,
                    help="scene cluster_size: the stream kernel's "
                         "per-fired-cluster machinery is launch-bound "
                         "at ~17 passing lanes (ROADMAP round 3), so "
                         "bigger clusters amortize it")
    args = ap.parse_args()

    cfg = RenderConfig(cluster_size=args.cluster)
    scene = compile_scene(make_outside_scene(), cfg)
    dat = np.load(args.pool)
    o_b = jnp.asarray(dat[f"o{args.it}"])
    d_b = jnp.asarray(dat[f"d{args.it}"])
    r = o_b.shape[0]

    f_wl = jax.jit(lambda oo, dd: intersect_scene_worklist(
        scene, oo, dd, eps=cfg.eps, tile=args.tile, chunk=args.chunk,
        cap=args.cap))
    f_gr = jax.jit(lambda oo, dd: intersect_scene_stream(
        scene, oo, dd, eps=cfg.eps, tile=args.tile, chunk=args.chunk,
        cap=args.cap))

    t0 = time.perf_counter()
    out_wl = jax.tree_util.tree_map(lambda x: x, f_wl(o_b, d_b))
    float(np.asarray(out_wl[0])[0])
    print(f"worklist compile+first: {time.perf_counter() - t0:.1f}s",
          flush=True)

    dt_wl, out_wl = timeit(f_wl, o_b, d_b)
    if args.wl_only:
        print(f"bounce:  worklist {dt_wl * 1e3:7.1f} ms "
              f"({r / dt_wl / 1e6:5.2f} Mrays/s)", flush=True)
    else:
        dt_gr, out_gr = timeit(f_gr, o_b, d_b)
        print(f"bounce:  worklist {dt_wl * 1e3:7.1f} ms "
              f"({r / dt_wl / 1e6:5.2f} Mrays/s)  "
              f"grid {dt_gr * 1e3:7.1f} ms ({r / dt_gr / 1e6:5.2f})",
              flush=True)
        compare("bounce", out_wl, out_gr, r)

    # primaries
    h = w = 512
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    pix = jnp.stack([xs, ys], -1).reshape(-1, 2)
    seed = seed_from_pixel(jnp.asarray([48271, 16807], jnp.uint32), pix)
    cam = scene.cameras[0]
    o_1, d_1, _ = generate_ray(jnp.asarray(cam.world_matrix),
                               jnp.float32(cam.yfov), pix, (w, h), seed)
    o_1, d_1 = o_1[:r], d_1[:r]
    dt_wl, out_wl = timeit(f_wl, o_1, d_1)
    if args.wl_only:
        print(f"primary: worklist {dt_wl * 1e3:7.1f} ms "
              f"({r / dt_wl / 1e6:5.2f} Mrays/s)", flush=True)
        return
    dt_gr, out_gr = timeit(f_gr, o_1, d_1)
    print(f"primary: worklist {dt_wl * 1e3:7.1f} ms "
          f"({r / dt_wl / 1e6:5.2f} Mrays/s)  "
          f"grid {dt_gr * 1e3:7.1f} ms ({r / dt_gr / 1e6:5.2f})",
          flush=True)
    compare("primary", out_wl, out_gr, r)

    # parked
    o_p = jnp.full((r, 3), 1e30, jnp.float32)
    d_p = jnp.zeros((r, 3), jnp.float32).at[:, 2].set(1.0)
    dt_wl, _ = timeit(f_wl, o_p, d_p)
    dt_gr, _ = timeit(f_gr, o_p, d_p)
    print(f"parked:  worklist {dt_wl * 1e3:7.1f} ms  "
          f"grid {dt_gr * 1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
