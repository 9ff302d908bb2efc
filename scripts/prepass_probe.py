"""Time the worklist PREPASS (build_chunk_worklists) alone on the real
dumped cornell pool — the round-4 floor decomposition: the wl:floor0
skeleton measured ~19-22 ms incl the amortized sync; how much of that
is the XLA prepass (slab mega-blocks + per-tile argsort) vs the Pallas
dispatch skeleton?

python scripts/prepass_probe.py [--pool /tmp/pool_r3.npz] [--tile 4096]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pool", default="/tmp/pool_r3.npz")
    ap.add_argument("--tile", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=16)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    sys.argv = ["x"]
    from scripts.compact_probe import _pack, _scene_rays
    from logipathtracer_tpu.ops.pallas.cluster_intersect import \
        chunk_world_bounds
    from logipathtracer_tpu.ops.pallas.compact_intersect import \
        build_chunk_worklists

    scene, cfg, _, _ = _scene_rays(64, args.tile, 256)
    z = np.load(args.pool)
    its = sorted({int(k[1:]) for k in z.files if k.startswith("o")})
    it = its[-1]
    rays8 = _pack(z[f"o{it}"], z[f"d{it}"], args.tile)

    c0 = scene.cl_tris.shape[0]
    wmin, wmax = chunk_world_bounds(scene.cl_meta, scene.cl_aabb,
                                    scene.obj_world, c0, c0, 1)

    fn = jax.jit(lambda r8: build_chunk_worklists(wmin, wmax, r8,
                                                  args.tile))

    def sync(x):
        float(jnp.sum(x[0].reshape(-1)[0:1].astype(jnp.float32)))

    out = fn(rays8)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(args.reps):
        out = fn(rays8)
    sync(out)
    dt = (time.perf_counter() - t0) / args.reps
    wl, wn = out
    print(f"prepass: {dt*1e3:.2f} ms/dispatch  (pool {rays8.shape[1]}, "
          f"C {c0}, tiles {rays8.shape[1]//args.tile}, "
          f"mean fired/tile {float(jnp.mean(wn)):.1f})")


if __name__ == "__main__":
    main()
