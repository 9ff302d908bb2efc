"""BVH builder invariants (SURVEY.md §4 unit-test plan): leaf ranges
partition primitives, child AABBs within parent, bounded leaf size,
and fused-layout integrity."""

import numpy as np
import pytest

from logipathtracer_tpu.scene.bvh import build_bvh, build_triangle_bvh, validate_bvh


def _random_aabbs(rng, n):
    mn = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    mx = mn + rng.uniform(0.01, 2.0, (n, 3)).astype(np.float32)
    return mn, mx


@pytest.mark.parametrize("n", [1, 2, 3, 7, 100, 1000])
def test_bvh_invariants(rng, n):
    mn, mx = _random_aabbs(rng, n)
    bvh = build_bvh(mn, mx, leaf_size=4)
    validate_bvh(bvh, mn, mx)
    # Leaf size bound (required by the fixed-width leaf test in traversal).
    meta = bvh.nodes_meta
    leaves = meta[meta[:, 0] == 1]
    assert (leaves[:, 2] - leaves[:, 1] <= 4).all()


def test_bvh_identical_centroids(rng):
    # All primitives at the same spot: median-index fallback must split.
    mn = np.zeros((20, 3), np.float32)
    mx = np.ones((20, 3), np.float32)
    bvh = build_bvh(mn, mx, leaf_size=4)
    validate_bvh(bvh, mn, mx)


def test_bvh_leaf_size_one(rng):
    mn, mx = _random_aabbs(rng, 11)
    bvh = build_bvh(mn, mx, leaf_size=1)
    validate_bvh(bvh, mn, mx)
    meta = bvh.nodes_meta
    leaves = meta[meta[:, 0] == 1]
    assert (leaves[:, 2] - leaves[:, 1] == 1).all()
    assert leaves.shape[0] == 11


def test_triangle_bvh(rng):
    tris = rng.uniform(-5, 5, (500, 3, 3)).astype(np.float32)
    bvh = build_triangle_bvh(tris, leaf_size=4)
    validate_bvh(bvh, tris.min(axis=1), tris.max(axis=1))
    assert bvh.max_depth < 40


def test_sah_quality(rng):
    # A uniform grid of boxes should give a reasonably balanced tree.
    g = 8
    xs, ys, zs = np.meshgrid(np.arange(g), np.arange(g), np.arange(g))
    mn = np.stack([xs, ys, zs], -1).reshape(-1, 3).astype(np.float32)
    mx = mn + 0.9
    bvh = build_bvh(mn, mx, leaf_size=4)
    validate_bvh(bvh, mn, mx)
    assert bvh.max_depth <= 12  # 512 prims / leaf 4 -> ~7 levels ideal


def test_fused_layout(cornell_scene):
    s = cornell_scene
    meta = np.asarray(s.fused_meta)
    m = meta.shape[0]
    t = s.num_triangles
    inner = meta[meta[:, 0] == 0]
    leaf = meta[meta[:, 0] == 1]
    # Inner children are valid global node ids.
    assert (inner[:, 1] >= 0).all() and (inner[:, 1] < m).all()
    assert (inner[:, 2] >= 0).all() and (inner[:, 2] < m).all()
    # Leaf ranges are valid global triangle ranges.
    assert (leaf[:, 1] >= 0).all() and (leaf[:, 2] <= t).all()
    assert (leaf[:, 1] < leaf[:, 2]).all()
    # Every leaf is tagged with a real object.
    assert (leaf[:, 3] >= 0).all() and (leaf[:, 3] < s.num_objects).all()

    # Walking from the root must reach every triangle exactly once.
    seen = np.zeros(t, bool)
    stack = [0]
    visited = 0
    while stack:
        idx = stack.pop()
        visited += 1
        kind, a, b, obj = meta[idx]
        if kind == 1:
            assert not seen[a:b].any()
            seen[a:b] = True
        else:
            stack.extend((int(a), int(b)))
    assert seen.all()


def test_fused_aabbs_contain_triangles(cornell_gltf):
    # Strict whole-triangle containment only holds WITHOUT spatial
    # splits (SBVH leaves hold clipped fragments covered by duplicate
    # references; tests/test_sbvh.py checks that weaker invariant).
    from logipathtracer_tpu.config import RenderConfig
    from logipathtracer_tpu.scene.compile import compile_scene
    s = compile_scene(cornell_gltf, RenderConfig(bvh_spatial_splits=False))
    meta = np.asarray(s.fused_meta)
    fmin = np.asarray(s.fused_min)
    fmax = np.asarray(s.fused_max)
    pos = np.asarray(s.vtx_pos).reshape(-1, 3, 3)
    for idx in range(meta.shape[0]):
        kind, a, b, obj = meta[idx]
        if kind == 1:
            tri = pos[a:b]
            assert (tri.min(axis=(0, 1)) >= fmin[idx] - 1e-4).all()
            assert (tri.max(axis=(0, 1)) <= fmax[idx] + 1e-4).all()
