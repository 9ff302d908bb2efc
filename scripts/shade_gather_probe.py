"""Measure the shade-table gather's cost structure on hardware.

The round-3/round-4 evidence is ambiguous: folding obj_shade into
tri_shade (two 32-col gathers -> one 64-col) halved the measured shade
gather cost, but the variadic sort prices per-operand row gathers at
~0.55-0.57 ms per f32 column per 1M rows (purely per-element).  Which
regime the [T, 64] gather sits in decides whether compile-time column
slimming (untextured scenes need ~50 of the 64 cols) is worth ~2 ms or
~nothing.

Workload: REAL best_tri keys — the dumped production pool's rays run
through the production intersect so the gather indices have the true
post-sort locality.  Timings amortize K dispatches behind one sync
(the ~160 ms relay round-trip floor, CLAUDE.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--pool-npz", default="/tmp/pool_r3.npz")
    ap.add_argument("--iters", type=int, default=32)
    args = ap.parse_args()

    from logipathtracer_tpu.config import RenderConfig
    from logipathtracer_tpu.ops.pallas.compact_intersect import \
        cluster_intersect_compact
    from logipathtracer_tpu.scene.compile import compile_scene
    from logipathtracer_tpu.scene.gltf import load_gltf

    cfg = RenderConfig(width=1024, height=1024, max_depth=10)
    scene = compile_scene(load_gltf(
        "/root/reference/resources/cornell_box.gltf"), cfg)
    inv_rows = scene.obj_world_inv[:, :3, :4].reshape(
        scene.num_objects, 12)

    z = np.load(args.pool_npz)
    its = sorted({int(k[1:]) for k in z.files if k.startswith("o")})
    o, d = z[f"o{its[-1]}"], z[f"d{its[-1]}"]
    r = o.shape[0]
    rays8 = jnp.concatenate([
        jnp.asarray(o).T, jnp.asarray(d).T,
        jnp.zeros((2, r), jnp.float32)], axis=0)
    t, tri, obj = cluster_intersect_compact(
        scene.cl_meta, inv_rows, scene.cl_order, scene.cl_aabb,
        scene.cl_tris, rays8, tile=4096, cap=128, worklist=True,
        obj_world=scene.obj_world)
    tri = jnp.maximum(tri, 0)
    tri.block_until_ready()
    hitfrac = float(jnp.mean((t < 1e30).astype(jnp.float32)))
    print(f"pool rows {r}  hit frac {hitfrac:.2f}", flush=True)

    ts64 = scene.tri_shade                       # [T, 64]
    t_count = ts64.shape[0]
    print(f"tri_shade [{t_count}, {ts64.shape[1]}]", flush=True)

    # Pre-materialized narrow tables (what a compile-time slim would
    # ship) vs in-graph slices (XLA fuses the slice into the gather).
    slim50 = jnp.concatenate(
        [ts64[:, 0:9], ts64[:, 15:24], ts64[:, 32:64]], axis=1)
    slim50 = jax.device_put(slim50).block_until_ready()

    variants = {
        "full64": jax.jit(lambda k: jnp.take(ts64, k, axis=0)),
        "slim50_pre": jax.jit(lambda k: jnp.take(slim50, k, axis=0)),
        "slim50_insl": jax.jit(lambda k: jnp.take(
            jnp.concatenate([ts64[:, 0:9], ts64[:, 15:24],
                             ts64[:, 32:64]], axis=1), k, axis=0)),
        "three_gather": jax.jit(lambda k: (
            jnp.take(ts64[:, 0:9], k, axis=0),
            jnp.take(ts64[:, 15:24], k, axis=0),
            jnp.take(ts64[:, 32:64], k, axis=0))),
        "two_gather32": jax.jit(lambda k: (
            jnp.take(ts64[:, 0:32], k, axis=0),
            jnp.take(ts64[:, 32:64], k, axis=0))),
        "one_col": jax.jit(lambda k: jnp.take(ts64[:, 0], k, axis=0)),
        "eight_col": jax.jit(lambda k: jnp.take(ts64[:, 0:8], k,
                                                axis=0)),
        "sixteen_col": jax.jit(lambda k: jnp.take(ts64[:, 0:16], k,
                                                  axis=0)),
    }

    def leaves(x):
        return jax.tree_util.tree_leaves(x)

    for name, fn in variants.items():
        out = fn(tri)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(tri)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters * 1e3
        cols = sum(lv.size for lv in leaves(out)) // r
        print(f"  {name:14s} {dt:7.2f} ms  ({cols} cols, "
              f"{dt / cols:.3f} ms/col)", flush=True)

    # Random keys (locality control): same table, shuffled indices.
    rng = np.random.default_rng(0)
    tri_rand = jnp.asarray(rng.integers(0, t_count, size=r,
                                        dtype=np.int32))
    for name in ("full64", "one_col"):
        fn = variants[name]
        out = fn(tri_rand)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(tri_rand)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"  {name:14s} {dt:7.2f} ms  RANDOM keys", flush=True)


if __name__ == "__main__":
    main()
