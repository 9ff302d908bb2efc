"""A/B the cluster-granular worklist kernel (stream_cluster.py) vs the
chunk worklist kernel (compact_intersect.py) on real dumped outside
pools + primaries, with hit identity checks.

frustum_stats (round 4) says the visit cut is only ~15% on bounce
pools — the remaining edges are per-visit DMA bytes (32 KB vs 512 KB
chunk blocks) and the dropped chunk-loop machinery.  This probe
settles whether those are worth anything on hardware.

python scripts/cluster_wl_probe.py [--pool .pools/outside_pool.npz]
    [--tile 4096] [--cap 32] [--nbuf 4] [--chunk-gate 0]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    # block_until_ready does NOT synchronize through the axon relay
    # (no-op observed round 4) — fetch one element instead.
    float(jnp.sum(out[0].reshape(-1)[0:1]))


def timeit(f, *a, n=8):
    out = f(*a)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*a)
    _sync(out)
    return (time.perf_counter() - t0) / n, out


def compare(name, got, ref, r):
    t_g, t_r = np.asarray(got[0])[:r], np.asarray(ref[0])[:r]
    neq = int((t_g != t_r).sum())
    print(f"    {name}: {neq}/{r} t mismatches", flush=True)
    for k in np.flatnonzero(t_g != t_r)[:5]:
        print(f"      ray {k}: cl t={t_g[k]!r} wl t={t_r[k]!r}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pool", default=".pools/outside_pool.npz")
    ap.add_argument("--it", type=int, default=-1,
                    help="dumped iteration (-1 = last two)")
    ap.add_argument("--tile", type=int, default=4096)
    ap.add_argument("--cap", type=int, default=32)
    ap.add_argument("--nbuf", type=int, default=4)
    ap.add_argument("--chunk-gate", type=int, default=0)
    ap.add_argument("--chunk", type=int, default=16,
                    help="chunk worklist kernel's chunk size")
    args = ap.parse_args()

    from logipathtracer_tpu.config import RenderConfig
    from logipathtracer_tpu.ops.pallas.compact_intersect import (
        cluster_intersect_worklist)
    from logipathtracer_tpu.ops.pallas.stream_cluster import (
        cluster_intersect_stream_cl)
    from logipathtracer_tpu.scene.compile import compile_scene
    from logipathtracer_tpu.scene.procedural import make_outside_scene

    cfg = RenderConfig(width=512, height=512)
    scene = compile_scene(make_outside_scene(), cfg)
    inv_rows = scene.obj_world_inv[:, :3, :4].reshape(
        scene.num_objects, 12)
    print(f"C={scene.cl_tris.shape[0]} lanes={scene.cl_tris.shape[2]} "
          f"tile={args.tile} cap={args.cap} nbuf={args.nbuf} "
          f"chunk_gate={args.chunk_gate}", flush=True)

    def pack(o, d):
        r = o.shape[0]
        rp = ((r + args.tile - 1) // args.tile) * args.tile
        rays8 = np.zeros((8, rp), np.float32)
        rays8[0:3, :r] = o.T
        rays8[3:6, :r] = d.T
        rays8[0:3, r:] = 1e30  # park padding (prepass-visible)
        rays8[5, r:] = 1.0
        return jnp.asarray(rays8), r

    f_cl = jax.jit(lambda r8: cluster_intersect_stream_cl(
        scene.cl_meta, inv_rows, scene.cl_aabb, scene.cl_tris,
        scene.obj_world, r8, tile=args.tile, cap=args.cap,
        nbuf=args.nbuf, chunk_gate=args.chunk_gate))
    f_sm = None  # submask knob pruned round 5 (measured loss, queue 24)
    f_wl = jax.jit(lambda r8: cluster_intersect_worklist(
        scene.cl_meta, inv_rows, scene.cl_aabb, scene.cl_tris,
        scene.obj_world, r8, tile=args.tile, chunk=args.chunk,
        cap=args.cap))

    dat = np.load(args.pool)
    its = sorted({int(k[1:]) for k in dat.files if k.startswith("o")})
    sel = its[-2:] if args.it < 0 else [args.it]
    workloads = [(f"pool-it{i}", dat[f"o{i}"], dat[f"d{i}"])
                 for i in sel]

    # primaries
    from logipathtracer_tpu.ops.camera import generate_ray
    from logipathtracer_tpu.ops.rng import seed_from_pixel
    cam = scene.cameras[0]
    h = w = 512
    ys, xs = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    pix = jnp.asarray(np.stack([xs, ys], -1).reshape(-1, 2))
    seed = seed_from_pixel(jnp.asarray([48271, 16807], jnp.uint32), pix)
    o_p, d_p, _ = generate_ray(jnp.asarray(cam.world_matrix),
                               jnp.float32(cam.yfov), pix, (w, h), seed)
    workloads.append(("primary", np.asarray(o_p)[:262144],
                      np.asarray(d_p)[:262144]))

    for label, o, d in workloads:
        rays8, r = pack(np.asarray(o, np.float32),
                        np.asarray(d, np.float32))
        print(label, flush=True)
        t0 = time.perf_counter()
        out_cl = f_cl(rays8)
        _sync(out_cl)
        print(f"  cl compile+first {time.perf_counter()-t0:.1f}s",
              flush=True)
        if f_sm is not None:
            t0 = time.perf_counter()
            out_sm = f_sm(rays8)
            _sync(out_sm)
            print(f"  sm compile+first {time.perf_counter()-t0:.1f}s",
                  flush=True)
        for rep in range(2):
            dt_cl, out_cl = timeit(f_cl, rays8)
            dt_wl, out_wl = timeit(f_wl, rays8)
            line = (f"  #{rep} cl {dt_cl*1e3:7.1f} ms "
                    f"({r/dt_cl/1e6:5.2f} Mrays/s)   wl {dt_wl*1e3:7.1f} "
                    f"ms ({r/dt_wl/1e6:5.2f})")
            if f_sm is not None:
                dt_sm, out_sm = timeit(f_sm, rays8)
                line += f"   cl+sm {dt_sm*1e3:7.1f} ms ({r/dt_sm/1e6:5.2f})"
            print(line, flush=True)
        compare(label, out_cl, out_wl, r)
        if f_sm is not None:
            compare(label + " sm-vs-cl", out_sm, out_cl, r)


if __name__ == "__main__":
    main()
