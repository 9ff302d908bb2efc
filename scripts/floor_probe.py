"""Split the resident worklist kernel's ~16 ms dispatch floor.

compact_probe --ablate floor0 measured 16-17 ms/1M-ray dispatch with
ZERO in-kernel cluster steps (round-3 resumed session) — half the
production intersect stage.  This times the XLA pieces around the
kernel separately on the dumped real pools:

  * build_chunk_worklists (world-slab map + argsort prepass)
  * the rays8 pack ([P, 3] origin/direction -> [8, P] + best0)
  * the full production dispatch (reference point)

python scripts/floor_probe.py [--pool /tmp/pool_r3.npz] [--it 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

for var in ("XLA_FLAGS", "AXON_LIBTPU_OVERRIDES", "LIBTPU_INIT_ARGS"):
    os.environ.pop(var, None)

import jax
import jax.numpy as jnp
import numpy as np

from logipathtracer_tpu.utils.cache import configure_compile_cache

configure_compile_cache(jax, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", ".jax_cache"), cpu=False)

from logipathtracer_tpu.config import RenderConfig
from logipathtracer_tpu.ops.pallas.cluster_intersect import chunk_world_bounds
from logipathtracer_tpu.ops.pallas.compact_intersect import (
    build_chunk_worklists, cluster_intersect_compact)
from logipathtracer_tpu.scene.compile import compile_scene
from logipathtracer_tpu.scene.gltf import load_gltf


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pool", default="/tmp/pool_r3.npz")
    ap.add_argument("--it", type=int, default=8)
    ap.add_argument("--tile", type=int, default=4096)
    ap.add_argument("--cap", type=int, default=128)
    args = ap.parse_args()

    cfg = RenderConfig(width=1024, height=1024, max_depth=10)
    scene = compile_scene(
        load_gltf("/root/reference/resources/cornell_box.gltf"), cfg)
    dat = np.load(args.pool)
    o = jnp.asarray(dat[f"o{args.it}"])
    d = jnp.asarray(dat[f"d{args.it}"])
    r = o.shape[0]
    inv_rows = scene.obj_world_inv[:, :3, :4].reshape(
        scene.num_objects, 12)
    c0 = scene.cl_tris.shape[0]
    wmin, wmax = chunk_world_bounds(scene.cl_meta, scene.cl_aabb,
                                    scene.obj_world, c0, c0, 1)
    print("device:", jax.devices()[0], " rays:", r, " C:", c0, flush=True)

    def sync(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        float(jnp.sum(leaf.reshape(-1)[0:1].astype(jnp.float32)))

    def timed(name, fn, *inputs, k=16):
        out = fn(*inputs)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn(*inputs)
        sync(out)
        dt = (time.perf_counter() - t0) / k
        print(f"  {name:18s} {dt * 1e3:7.2f} ms", flush=True)
        return out

    @jax.jit
    def pack(o, d):
        return jnp.concatenate(
            [o.T, d.T, jnp.zeros((2, r), jnp.float32)], axis=0)

    rays8 = pack(o, d)

    prepass = jax.jit(lambda r8: build_chunk_worklists(
        wmin, wmax, r8, args.tile))
    full = jax.jit(lambda r8: cluster_intersect_compact(
        scene.cl_meta, inv_rows, scene.cl_order, scene.cl_aabb,
        scene.cl_tris, r8, tile=args.tile, cap=args.cap,
        worklist=True, obj_world=scene.obj_world))

    for rep in range(2):
        print(f"rep {rep}", flush=True)
        timed("rays8 pack", pack, o, d)
        timed("prepass (wl, wn)", prepass, rays8)
        timed("full dispatch", full, rays8)


if __name__ == "__main__":
    main()
