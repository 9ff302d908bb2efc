"""Validate + benchmark the compaction sweep (compact_intersect.py).

Modes:
  python scripts/compact_probe.py exact     # one-hot matmul exactness (TPU)
  python scripts/compact_probe.py interp    # kernel logic vs jnp twin (CPU)
  python scripts/compact_probe.py bench [--tile N] [--cap N] [--res N]
        # TPU: bitwise vs cluster_intersect_pallas + timing
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def cmd_exact():
    """Bit-exactness of one-hot gather/scatter matmuls at HIGHEST."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    # Full-range finite f32 below the bf16-overflow line (|x| < 1e30 in
    # kernel practice; test up to 1e30 and down to tiny subnormal-ish).
    mant = rng.random((8, 1024)).astype(np.float32) * 2 - 1
    expo = rng.integers(-30, 30, (8, 1024)).astype(np.float32)
    vals = (mant * (10.0 ** expo)).astype(np.float32)
    vals[0, :3] = [1e30, -1e30, 1.0000001]
    perm = rng.permutation(1024)[:128]
    onehot = np.zeros((1024, 128), np.float32)
    onehot[perm, np.arange(128)] = 1.0

    def kernel(v_ref, p_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            v_ref[:], p_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(vals), jnp.asarray(onehot))
    got = np.asarray(out)
    want = vals[:, perm]
    same = (got.view(np.int32) == want.view(np.int32)).mean()
    print(f"gather HIGHEST bit-match: {same*100:.4f}%")
    if same < 1.0:
        bad = np.argwhere(got.view(np.int32) != want.view(np.int32))[:5]
        for i, j in bad:
            print(f"  want {want[i, j]!r} got {got[i, j]!r}")
    # Default-precision comparison for reference.
    out2 = pl.pallas_call(
        lambda v, p, o: o.__setitem__(
            slice(None), jnp.dot(v[:], p[:],
                                 preferred_element_type=jnp.float32)),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(vals), jnp.asarray(onehot))
    same2 = (np.asarray(out2).view(np.int32) == want.view(np.int32)).mean()
    print(f"gather DEFAULT bit-match: {same2*100:.4f}%")


def _scene_rays(res, tile, cluster):
    from logipathtracer_tpu.config import RenderConfig
    from logipathtracer_tpu.ops.camera import generate_ray
    from logipathtracer_tpu.ops.rng import seed_from_pixel
    from logipathtracer_tpu.render.megakernel import ray_sort_key
    from logipathtracer_tpu.scene.compile import compile_scene
    from logipathtracer_tpu.scene.gltf import load_gltf

    cfg = RenderConfig(width=res, height=res, max_depth=10,
                       sweep_tile=tile, cluster_size=cluster)
    scene = compile_scene(load_gltf(
        "/root/reference/resources/cornell_box.gltf"), cfg)
    cam = scene.cameras[0]
    h = w = res
    ys, xs = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    pix = jnp.asarray(np.stack([xs, ys], -1).reshape(-1, 2))
    seed = seed_from_pixel(jnp.asarray([48271, 16807], jnp.uint32), pix)
    o, d, _ = generate_ray(jnp.asarray(cam.world_matrix),
                           jnp.float32(cam.yfov), pix, (w, h), seed)
    # Scrambled + sorted = bounce-like workload (isect_bench convention).
    perm = np.random.default_rng(1).permutation(h * w)
    o_s, d_s = np.asarray(o)[perm], np.asarray(d)[perm]
    key = np.asarray(ray_sort_key(scene, jnp.asarray(o_s),
                                  jnp.asarray(d_s)))
    sp = np.argsort(key, kind="stable")
    return scene, cfg, (np.asarray(o), np.asarray(d)), (o_s[sp], d_s[sp])


def _pack(o, d, tile):
    r = o.shape[0]
    rp = ((r + tile - 1) // tile) * tile
    rays8 = np.zeros((8, rp), np.float32)
    rays8[5] = 1.0
    rays8[0:3, :r] = o.T
    rays8[3:6, :r] = d.T
    return jnp.asarray(rays8)


def cmd_interp(args):
    jax.config.update("jax_platforms", "cpu")
    from logipathtracer_tpu.ops.pallas.cluster_intersect import \
        cluster_intersect_jnp
    from logipathtracer_tpu.ops.pallas.compact_intersect import \
        cluster_intersect_compact

    scene, cfg, (o, d), _ = _scene_rays(64, args.tile, args.cluster)
    rays8 = _pack(o, d, args.tile)
    inv_rows = scene.obj_world_inv[:, :3, :4].reshape(scene.num_objects, 12)
    t0, tri0, obj0 = cluster_intersect_jnp(
        scene.cl_meta, inv_rows, scene.cl_aabb, scene.cl_tris, rays8)
    t1, tri1, obj1 = cluster_intersect_compact(
        scene.cl_meta, inv_rows, scene.cl_order, scene.cl_aabb,
        scene.cl_tris, rays8, tile=args.tile, cap=args.cap, interpret=True)
    t0, t1 = np.asarray(t0), np.asarray(t1)
    tri0, tri1 = np.asarray(tri0), np.asarray(tri1)
    print("t mismatches:", int((t0 != t1).sum()), "/", t0.size)
    print("tri mismatches:", int((tri0 != tri1).sum()))
    if (t0 != t1).any():
        i = np.argwhere(t0 != t1)[:5, 0]
        for k in i:
            print(f"  ray {k}: jnp t={t0[k]!r} tri={tri0[k]} "
                  f"compact t={t1[k]!r} tri={tri1[k]}")


def cmd_bench(args):
    from logipathtracer_tpu.ops.pallas.cluster_intersect import \
        cluster_intersect_pallas
    from logipathtracer_tpu.ops.pallas.compact_intersect import \
        cluster_intersect_compact

    scene, cfg, (o, d), (o_s, d_s) = _scene_rays(args.res, args.tile,
                                                 args.cluster)
    inv_rows = scene.obj_world_inv[:, :3, :4].reshape(scene.num_objects, 12)
    print("device:", jax.devices()[0], " tile:", args.tile, " cap:",
          args.cap, " cluster:", args.cluster, " C:",
          scene.cl_tris.shape[0], flush=True)

    def run(name, fn, rays8, n=16):
        t0 = time.perf_counter()
        out = fn(rays8)
        res = tuple(np.asarray(x) for x in out)
        print(f"  {name} compile {time.perf_counter()-t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(rays8)
        _ = np.asarray(out[0][:8])
        dt = (time.perf_counter() - t0) / n
        r = rays8.shape[1]
        print(f"  {name:10s} {r/dt/1e6:8.2f} Mrays/s  ({dt*1e3:.1f} ms)",
              flush=True)
        return res

    def make_comp(worklist, ablate, cap=None, variant=""):
        return lambda r8: cluster_intersect_compact(
            scene.cl_meta, inv_rows, scene.cl_order, scene.cl_aabb,
            scene.cl_tris, r8,
            tile=args.tile, cap=cap or args.cap,
            ablate=ablate, worklist=worklist,
            obj_world=scene.obj_world if worklist else None,
            variant=variant)

    base = lambda r8: cluster_intersect_pallas(
        scene.cl_meta, inv_rows, scene.cl_order, scene.cl_aabb,
        scene.cl_tris, r8, tile=args.tile)
    comp = make_comp(args.worklist, args.ablate)

    if args.variants:
        # In-process A/B matrix: isolated cross-process probe timings
        # swing 9-40x on axon (CLAUDE.md); same-process interleaved
        # repeats are the only trustworthy deltas.
        specs = []
        for spec in args.variants.split(","):
            body = spec
            cap = None
            if "@" in body:  # e.g. wl@64 = worklist with cap 64
                body, cap_s = body.split("@", 1)
                cap = int(cap_s)
            variant = ""
            if "+" in body:  # e.g. wl+hot32, wl+presplit (CORRECT
                body, variant = body.split("+", 1)   # round-4 levers)
                variant = variant.replace("+", ",")
            wl = body.startswith("wl")
            abl = body.split(":", 1)[1] if ":" in body else ""
            specs.append((spec, make_comp(wl, abl, cap, variant)))
        if args.pool_npz:
            # Real production pool states (stage_profile --dump):
            # post-regen origins/directions incl. parked lanes — the
            # honest bounce workload, unlike synthetic scrambles.
            z = np.load(args.pool_npz)
            its = sorted({int(k[1:]) for k in z.files
                          if k.startswith("o")})
            workloads = [(f"pool-it{i}", (z[f"o{i}"], z[f"d{i}"]))
                         for i in its[-2:]]
        else:
            workloads = [("primary", (o, d)), ("scrambled", (o_s, d_s))]
        for label, (oo, dd) in workloads:
            if (not args.pool_npz
                    and args.workload not in ("both", label)):
                continue
            rays8 = _pack(oo, dd, args.tile)
            print(label, flush=True)
            for rep in range(2):
                for spec, fn in specs:
                    run(f"{spec}#{rep}", fn, rays8)
        return

    workloads = (("primary", (o, d)), ("scrambled", (o_s, d_s)))
    if args.workload != "both":
        workloads = tuple(wl for wl in workloads if wl[0] == args.workload)
    for label, (oo, dd) in workloads:
        rays8 = _pack(oo, dd, args.tile)
        print(label, flush=True)
        if args.skip_sweep:
            rc = run("compact", comp, rays8)
            continue
        rb = run("sweep", base, rays8)
        rc = run("compact", comp, rays8)
        for nm, a, b in zip(("t", "tri", "obj"), rb, rc):
            neq = int((a != b).sum())
            print(f"    {nm} mismatches: {neq}/{a.size}")
        bad = np.flatnonzero(rb[0] != rc[0])[:8]
        for k in bad:
            ulp = abs(int(rb[0][k].view(np.int32)) -
                      int(rc[0][k].view(np.int32)))
            print(f"      ray {k}: sweep t={rb[0][k]!r} tri={rb[1][k]} "
                  f"compact t={rc[0][k]!r} tri={rc[1][k]} ulp={ulp}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["exact", "interp", "bench"])
    ap.add_argument("--tile", type=int, default=1024)
    ap.add_argument("--cap", type=int, default=128)
    ap.add_argument("--cluster", type=int, default=256)
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--workload", default="both",
                    choices=["both", "primary", "scrambled"])
    ap.add_argument("--skip-sweep", action="store_true",
                    help="time the compact kernel only (the sub-tile "
                         "sweep's cluster=128 compile is pathological)")
    ap.add_argument("--ablate", default="",
                    choices=["", "norank", "ksmall", "nomt", "noupd",
                             "noskip", "nofill", "fillfast", "floor0",
                             "nohot", "fA", "fB", "fC", "fD"],
                    help="probe-only kernel ablation (WRONG results)")
    ap.add_argument("--worklist", action="store_true",
                    help="compact kernel: per-tile fired-cluster lists "
                         "from the world-AABB prepass")
    ap.add_argument("--pool-npz", default="",
                    help="bench --variants on real dumped pool states "
                         "(stage_profile --dump npz) instead of the "
                         "synthetic primary/scrambled workloads")
    ap.add_argument("--variants", default="",
                    help="comma list of in-process A/B variants, each "
                         "'wl'/'oct' with optional ':ablate' suffix "
                         "(e.g. wl,wl:floor0,wl:noupd,oct); two "
                         "interleaved reps each, overrides "
                         "--worklist/--ablate")
    args = ap.parse_args()
    if args.mode == "exact":
        cmd_exact()
    elif args.mode == "interp":
        cmd_interp(args)
    else:
        cmd_bench(args)
