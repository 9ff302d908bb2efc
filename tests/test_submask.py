"""Sub-AABB submask prepass for the cluster-granular stream sweep.

The kernel gates each fired cluster's Möller-Trumbore per 128-lane
triangle sub-group on a 4-bit frustum submask packed above the cluster
id in the worklist entry (ops/pallas/stream_cluster.py).  Skipping a
clear bit is bit-identical by containment: an accepted MT hit lies
inside the triangle hull, which lies inside the sub-group AABB, so the
exact per-ray slab vs that sub-AABB passes, so the (superset, padded)
frustum bit is set.  These tests pin that chain on CPU:

  1. the compile-time local sub bounds actually contain their
     sub-group's triangles (the containment premise);
  2. the frustum sub bits are a superset of the exact per-ray
     sub-slab fired set (the superset premise);
  3. the sm>0 whole-visit cull and the bit packing never drop a
     cluster any exact ray-sub pass needs.

The in-kernel gate itself is TPU-only (manual-DMA kernel); its
bit-identity vs the ungated kernel is covered by tests/test_tpu.py.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from logipathtracer_tpu.config import RenderConfig
from logipathtracer_tpu.scene.compile import compile_scene
from logipathtracer_tpu.scene.gltf import load_gltf

CORNELL = "/root/reference/resources/cornell_box.gltf"


@pytest.fixture(scope="module")
def scene():
    sc = compile_scene(load_gltf(CORNELL),
                       RenderConfig(width=64, height=64))
    if getattr(sc, "cl_sub_aabb", None) is None:
        pytest.skip("sub-AABB submask not landed yet")
    return sc


def _np_slab_many(o, d, amin, amax):
    """Vectorized slab, best=inf: o, d [N, 3]; amin/amax [3]."""
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = 1.0 / d
        n = (amin[None] - o) * inv
        f = (amax[None] - o) * inv
    t0 = np.minimum(n, f).max(axis=1)
    t1 = np.maximum(n, f).min(axis=1)
    return (t0 <= t1) & (((t0 > 0.0)) | ((t0 <= 0.0) & (t1 > 0.0)))


def test_cl_sub_bounds_cover_triangles(scene):
    tris = np.asarray(scene.cl_tris)            # [C, 9, S]
    sub = np.asarray(scene.cl_sub_aabb)         # [C, ns, 6]
    C, _, S = tris.shape
    ns = sub.shape[1]
    assert ns == S // 128
    v0 = tris[:, 0:3]
    v1 = v0 + tris[:, 3:6]
    v2 = v0 + tris[:, 6:9]
    valid = np.abs(tris[:, 3:9]).max(axis=1) > 0            # [C, S]
    pts = np.stack([v0, v1, v2], axis=1)                    # [C, 3, 3, S]
    for c in range(C):
        for sb in range(ns):
            sl = slice(sb * 128, (sb + 1) * 128)
            m = valid[c, sl]
            if not m.any():
                assert (sub[c, sb, 0:3] > sub[c, sb, 3:6]).all(), \
                    "empty sub-group must have inverted (never-fire) bounds"
                continue
            p = pts[c, :, :, sl][:, :, m]                   # [3, 3, k]
            lo, hi = p.min(axis=(0, 2)), p.max(axis=(0, 2))
            assert (sub[c, sb, 0:3] <= lo + 1e-6).all()
            assert (sub[c, sb, 3:6] >= hi - 1e-6).all()


def _scene_rays(scene, rng, r):
    tris = np.asarray(scene.cl_tris)
    v0 = tris[:, 0:3].transpose(0, 2, 1).reshape(-1, 3)
    lo, hi = v0.min(axis=0) - 1.0, v0.max(axis=0) + 1.0
    o = rng.uniform(lo, hi, (r, 3)).astype(np.float32)
    d = rng.standard_normal((r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, d


def test_submask_bits_superset(scene, rng):
    from logipathtracer_tpu.ops.frustum import frustum_cluster_mask
    from logipathtracer_tpu.ops.pallas.stream_cluster import \
        _sub_world_bounds
    tile, r = 256, 1024
    o, d = _scene_rays(scene, rng, r)
    rays8 = np.zeros((8, r), np.float32)
    rays8[0:3] = o.T
    rays8[3:6] = d.T

    sub = np.asarray(scene.cl_sub_aabb)
    meta = np.asarray(scene.cl_meta)
    inv = np.asarray(scene.obj_world_inv)
    C, ns, _ = sub.shape
    ws_min, ws_max = _sub_world_bounds(
        jnp.asarray(meta), jnp.asarray(sub), jnp.asarray(scene.obj_world))
    bits = np.asarray(frustum_cluster_mask(
        jnp.asarray(rays8), ws_min, ws_max, tile)).reshape(-1, C, ns)

    tiles = r // tile
    for t in range(tiles):
        ot = o[t * tile:(t + 1) * tile]
        dt = d[t * tile:(t + 1) * tile]
        for c in range(C):
            m = inv[meta[c, 0]][:3]
            lo = ot @ m[:, :3].T + m[:, 3]
            ld = dt @ m[:, :3].T
            for sb in range(ns):
                if sub[c, sb, 0] > sub[c, sb, 3]:
                    assert not bits[t, c, sb], \
                        "empty sub-group bit must be clear"
                    continue
                exact = _np_slab_many(lo, ld, sub[c, sb, 0:3],
                                      sub[c, sb, 3:6]).any()
                if exact:
                    assert bits[t, c, sb], (
                        f"tile {t} cluster {c} sub {sb}: exact per-ray "
                        "slab passes but the frustum sub bit is clear")


def test_worklist_packing_and_cull(scene, rng):
    from logipathtracer_tpu.ops.pallas.cluster_intersect import \
        chunk_world_bounds
    from logipathtracer_tpu.ops.pallas.stream_cluster import (
        _sub_world_bounds, build_cluster_worklists)
    tile, r = 256, 1024
    o, d = _scene_rays(scene, rng, r)
    rays8 = jnp.asarray(np.concatenate([
        o.T, d.T, np.zeros((2, r), np.float32)]).astype(np.float32))

    meta = jnp.asarray(np.asarray(scene.cl_meta))
    C = np.asarray(scene.cl_meta).shape[0]
    wmin, wmax = chunk_world_bounds(
        meta, jnp.asarray(scene.cl_aabb), jnp.asarray(scene.obj_world),
        C, C, 1)
    sub_bounds = _sub_world_bounds(
        meta, jnp.asarray(scene.cl_sub_aabb),
        jnp.asarray(scene.obj_world))

    wl0, wn0 = build_cluster_worklists(wmin, wmax, rays8, tile)
    wl1, wn1 = build_cluster_worklists(wmin, wmax, rays8, tile,
                                       sub_bounds=sub_bounds)
    wl0, wn0 = np.asarray(wl0), np.asarray(wn0)
    wl1, wn1 = np.asarray(wl1), np.asarray(wn1)
    ns = np.asarray(scene.cl_sub_aabb).shape[1]
    for t in range(wl0.shape[0]):
        jc = wl1[t, :wn1[t]] & 0xFFFF
        sm = wl1[t, :wn1[t]] >> 16
        assert (jc < C).all() and (jc >= 0).all()
        assert (sm > 0).all() and (sm < (1 << ns)).all(), \
            "every visited cluster must have at least one live sub bit"
        # the submask worklist is the plain one minus sm==0 clusters
        assert set(jc.tolist()) <= set(wl0[t, :wn0[t]].tolist())
        # visit order (front-to-back key) is preserved on the kept set
        kept = [c for c in wl0[t, :wn0[t]].tolist() if c in set(jc.tolist())]
        assert kept == jc.tolist()
