"""Cluster-sweep intersection: equivalence vs the BVH walk (the Pallas
kernel is validated here in interpret mode + via its jnp twin; the real
TPU path is exercised by bench.py on hardware)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from logipathtracer_tpu.config import RenderConfig
from logipathtracer_tpu.ops.camera import generate_ray
from logipathtracer_tpu.ops.rng import seed_from_pixel
from logipathtracer_tpu.ops.traverse import (intersect_scene,
                                             intersect_scene_sweep)
from logipathtracer_tpu.render.megakernel import render_sample
from logipathtracer_tpu.scene.clusters import build_clusters, cluster_stats


def _primary_rays(scene, h, w):
    cam = scene.cameras[0]
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    pix = jnp.stack([xs, ys], -1).reshape(-1, 2)
    seed = seed_from_pixel(jnp.array([12345, 67890], jnp.uint32), pix)
    o, d, _ = generate_ray(jnp.asarray(cam.world_matrix), cam.yfov, pix,
                           (w, h), seed)
    return o, d


def test_cluster_build(cornell_gltf):
    # Exactly-once tiling + whole-triangle containment hold only
    # WITHOUT spatial splits (SBVH duplicates straddling triangles;
    # tests/test_sbvh.py covers those invariants).
    from logipathtracer_tpu.scene.compile import compile_scene
    cornell_scene = compile_scene(cornell_gltf,
                                  RenderConfig(bvh_spatial_splits=False))
    cs = build_clusters(cornell_scene)
    stats = cluster_stats(cs)
    assert stats["clusters"] > 0
    # Every triangle covered exactly once, in order.
    spans = sorted(zip(cs.cl_tri_base.tolist(),
                       (cs.cl_tri_base + cs.cl_count).tolist()))
    cursor = 0
    for a, b in spans:
        assert a == cursor, "cluster ranges must tile the triangle soup"
        cursor = b
    assert cursor == cornell_scene.num_triangles
    # AABBs contain their triangles (object space).
    tris = np.asarray(cornell_scene.vtx_pos).reshape(-1, 3, 3)
    for i in range(cs.num_clusters):
        block = tris[cs.cl_tri_base[i]:cs.cl_tri_base[i] + cs.cl_count[i]]
        assert (block.min(axis=(0, 1)) >= cs.cl_aabb[i, 0:3] - 1e-4).all()
        assert (block.max(axis=(0, 1)) <= cs.cl_aabb[i, 3:6] + 1e-4).all()


@pytest.mark.parametrize("backend", ["jnp", "interpret"])
def test_sweep_matches_bvh(cornell_scene, backend):
    s = cornell_scene
    o, d = _primary_rays(s, 16, 16)
    tb, ob, rb = jax.jit(intersect_scene)(s, o, d)
    ts, os_, rs = intersect_scene_sweep(s, o, d, backend=backend)
    np.testing.assert_allclose(np.asarray(tb), np.asarray(ts), rtol=2e-6,
                           atol=1e-6)
    tie = np.abs(np.asarray(tb) - np.asarray(ts)) <= 2e-6 * np.abs(np.asarray(tb))
    diff = (np.asarray(rb) != np.asarray(rs)) | (np.asarray(ob) != np.asarray(os_))
    assert (tie | ~diff).all()


def test_sweep_random_rays(cornell_scene, rng):
    s = cornell_scene
    n = 128
    o = jnp.asarray(rng.uniform(-1, 1, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    tb, ob, rb = jax.jit(intersect_scene)(s, o, d)
    ts, os_, rs = intersect_scene_sweep(s, o, d, backend="jnp")
    np.testing.assert_allclose(np.asarray(tb), np.asarray(ts), rtol=2e-6,
                           atol=1e-6)


def test_render_with_sweep_matches_bvh(cornell_scene):
    cfg_b = RenderConfig(width=16, height=16, max_depth=4, intersect="bvh")
    cfg_s = cfg_b.replace(intersect="sweep_jnp")
    cam = cornell_scene.cameras[0]
    args = (jnp.asarray(cam.world_matrix), jnp.float32(cam.yfov),
            jnp.asarray([48271, 16807], jnp.uint32))
    a = np.asarray(render_sample(cornell_scene, cfg_b, *args))
    b = np.asarray(render_sample(cornell_scene, cfg_s, *args))
    # Same hits -> same RNG consumption -> same radiance, EXCEPT where a
    # t near-tie on a shared edge picks a different (coplanar) triangle
    # and the stochastic path diverges.  Allow <=1% such pixels.
    close = np.isclose(a, b, rtol=1e-4, atol=1e-6).all(axis=-1)
    assert close.mean() > 0.99, f"{(~close).sum()} divergent pixels"
