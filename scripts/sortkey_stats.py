"""Evaluate candidate ray-sort keys by the union_128 metric (the number
of clusters the sweep kernel fires per 128-ray group — lower is less
wasted Möller-Trumbore work).

Run on CPU: python scripts/sortkey_stats.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from logipathtracer_tpu.config import RenderConfig
from logipathtracer_tpu.ops.camera import generate_ray
from logipathtracer_tpu.ops.rng import seed_from_pixel
from logipathtracer_tpu.ops.traverse import intersect_scene
from logipathtracer_tpu.render.megakernel import shade_step
from logipathtracer_tpu.scene.compile import compile_scene
from logipathtracer_tpu.scene.gltf import load_gltf
from scripts.bin_stats import slab_pass


def morton(o, lo, span, bits):
    q = np.clip(((o - lo) / span * (2 ** bits - 1)).astype(np.int64),
                0, 2 ** bits - 1)
    out = np.zeros(o.shape[0], np.int64)
    for b in range(bits):
        for ax in range(3):
            out |= ((q[:, ax] >> b) & 1) << (3 * b + ax)
    return out


def qdir(d, bits):
    q = np.clip(((d * 0.5 + 0.5) * (2 ** bits - 1)).astype(np.int64),
                0, 2 ** bits - 1)
    out = np.zeros(d.shape[0], np.int64)
    for b in range(bits):
        for ax in range(3):
            out |= ((q[:, ax] >> b) & 1) << (3 * b + ax)
    return out


def union128(ok, key):
    perm = np.argsort(key, kind="stable")
    oks = ok[perm]
    n = (oks.shape[0] // 128) * 128
    return oks[:n].reshape(-1, 128, ok.shape[1]).any(1).sum(1).mean()


def main():
    cfg = RenderConfig(width=256, height=256, max_depth=5,
                       intersect="bvh", renderer="megakernel")
    scene = compile_scene(load_gltf(
        "/root/reference/resources/cornell_box.gltf"), cfg)
    cam = scene.cameras[0]
    h = w = 256
    ys, xs = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    pix = jnp.asarray(np.stack([xs, ys], -1).reshape(-1, 2))
    seed = seed_from_pixel(jnp.asarray([48271, 16807], jnp.uint32), pix)
    origin, direction, seed = generate_ray(
        jnp.asarray(cam.world_matrix), jnp.float32(cam.yfov), pix,
        (w, h), seed)

    lo = np.asarray(scene.world_aabb[0])
    span = np.maximum(np.asarray(scene.world_aabb[1]) - lo, 1e-9)
    tri2cl = np.zeros(scene.num_triangles, np.int32)
    meta = np.asarray(scene.cl_meta)
    counts = np.asarray(scene.cl_count) if hasattr(scene, "cl_count") \
        else None
    # cl_meta rows: (obj, tri_base); recover ranges by sorting bases.
    order = np.argsort(meta[:, 1])
    bases = meta[order, 1]
    ends = np.append(bases[1:], scene.num_triangles)
    for ci, b, e in zip(order, bases, ends):
        tri2cl[b:e] = ci

    r = origin.shape[0]
    acc = jnp.zeros((r, 3)); mask = jnp.ones((r, 3))
    alive = jnp.ones((r,), bool)
    skip = jnp.zeros((r,), bool)
    src_cl = np.zeros(r, np.int64)   # cluster of the ray's origin surface

    for bounce in range(4):
        ok, _, _ = slab_pass(scene, origin, direction)
        al = np.asarray(alive)
        okl = ok[al]
        o_np = np.asarray(origin)[al]
        d_np = np.asarray(direction)[al]
        oct_ = ((d_np[:, 0] > 0).astype(np.int64) * 4
                + (d_np[:, 1] > 0).astype(np.int64) * 2
                + (d_np[:, 2] > 0).astype(np.int64))
        m5 = morton(o_np, lo, span, 5)
        m7 = morton(o_np, lo, span, 7)
        dq2 = qdir(d_np, 2)
        dq3 = qdir(d_np, 3)
        sc = src_cl[al]

        keys = {
            "A oct|m5 (current)": (oct_ << 15) | m5,
            "B oct|dq2|m5":       (((oct_ << 6) | dq2) << 15) | m5,
            "C oct|dq3|m5":       (((oct_ << 9) | dq3) << 15) | m5,
            "D m7|oct":           (m7 << 3) | oct_,
            "E srccl|oct|m5":     (((sc << 3) | oct_) << 15) | m5,
            "F oct|srccl|m5":     (((oct_ << 8) | sc) << 15) | m5,
            "G dq3|m5":           (dq3 << 15) | m5,
            "H srccl|dq2|m5":     (((sc << 6) | dq2) << 15) | m5,
        }
        line = f"bounce {bounce}: "
        for name, key in keys.items():
            line += f"{name.split()[0]}={union128(okl, key):5.2f} "
        print(line + f" (passes {okl.sum(1).mean():.2f})")

        t, obj, tri = intersect_scene(scene, origin, direction, eps=cfg.eps)
        tri_np = np.asarray(tri)
        src_cl = tri2cl[np.maximum(tri_np, 0)].astype(np.int64)
        origin, direction, acc, mask, alive, seed, skip = shade_step(
            scene, cfg, origin, direction, acc, mask, alive, seed,
            jnp.int32(bounce), t, obj, tri, prev_pdf=jnp.zeros_like(t),
            isect=intersect_scene)


if __name__ == "__main__":
    main()
