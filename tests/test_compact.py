"""Compaction-sweep intersection (ops/pallas/compact_intersect.py):
equivalence vs the BVH walk / jnp twin in interpret mode, t_max shadow
semantics, and a full render.  The real-TPU path (incl. the one-hot
HIGHEST matmul bit-exactness it relies on) is exercised by
scripts/compact_probe.py and bench.py on hardware."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from logipathtracer_tpu.config import RenderConfig
from logipathtracer_tpu.ops.traverse import (intersect_scene,
                                             intersect_scene_sweep)
from logipathtracer_tpu.render.megakernel import render_sample


def _rays(scene, n, rng):
    o = jnp.asarray(rng.uniform(-0.8, 0.8, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, jnp.asarray(d)


@pytest.mark.parametrize("cap,mxu,worklist", [(128, False, False),
                                              (256, False, False),
                                              (128, True, False),
                                              (128, False, True),
                                              (128, True, True)])
def test_compact_matches_bvh(cornell_scene, rng, cap, mxu, worklist):
    s = cornell_scene
    o, d = _rays(s, 512, rng)
    tb, ob, rb = jax.jit(intersect_scene)(s, o, d)
    tc, oc, rc = intersect_scene_sweep(s, o, d, backend="compact_interpret",
                                       tile=256, cap=cap, mxu=mxu,
                                       worklist=worklist)
    # The bilinear MXU form reassociates the MT arithmetic (centroid-
    # localized): slightly looser tolerance than the elementwise form.
    rtol = 1e-5 if mxu else 2e-6
    np.testing.assert_allclose(np.asarray(tb), np.asarray(tc), rtol=rtol,
                               atol=1e-5 if mxu else 1e-6)
    # tri/obj may differ only where t is a near-tie (coplanar geometry).
    tie = np.abs(np.asarray(tb) - np.asarray(tc)) \
        <= rtol * np.abs(np.asarray(tb)) + 1e-6
    diff = (np.asarray(rb) != np.asarray(rc)) \
        | (np.asarray(ob) != np.asarray(oc))
    assert (tie | ~diff).all()


@pytest.mark.parametrize("batch", [2, 3, 4])
def test_compact_worklist_batched_bit_identical(cornell_scene, rng, batch):
    """batch > 1 unrolls the worklist loop (visiting a few unfired /
    duplicate clusters at the ragged tail) — the hits must be
    BIT-identical to batch=1: unfired clusters fail the exact slab
    (zero compaction blocks) and duplicate visits are best-merge
    idempotent."""
    s = cornell_scene
    o, d = _rays(s, 512, rng)
    t1, o1, r1 = intersect_scene_sweep(s, o, d,
                                       backend="compact_interpret",
                                       tile=256, worklist=True)
    tb, ob, rb = intersect_scene_sweep(s, o, d,
                                       backend="compact_interpret",
                                       tile=256, worklist=True,
                                       batch=batch)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(tb))
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(ob))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(rb))


def test_compact_worklist_pair_bit_identical(cornell_scene, rng):
    """pair mode interleaves TWO cluster update chains per block body
    (the per-sequence latency-wall lever).  Hits must be BIT-identical
    to the serial worklist: B's slab gate uses the pre-pair best_t (a
    superset of admitted lanes), but the strict-< merge still picks
    the same winners, A-then-B merge order preserves the serial
    tie-break, and the odd tail's duplicate visit is idempotent."""
    s = cornell_scene
    o, d = _rays(s, 512, rng)
    t1, o1, r1 = intersect_scene_sweep(s, o, d,
                                       backend="compact_interpret",
                                       tile=256, worklist=True,
                                       rank_mode="roll")
    tp, op_, rp = intersect_scene_sweep(s, o, d,
                                        backend="compact_interpret",
                                        tile=256, worklist=True,
                                        rank_mode="roll", pair=True)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(tp))
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(op_))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(rp))


@pytest.mark.parametrize("tmax", [False, True])
def test_compact_worklist_pair_tiles_bit_identical(cornell_scene, rng,
                                                   tmax):
    """pair_tiles mode processes TWO ray tiles per grid step, each
    walking its own fired-cluster worklist against its own best
    buffer.  Hits must be BIT-identical to the serial worklist: the
    chains are fully independent (live per-tile slab gates, separate
    merges); only the loop trip and per-visit block counts are maxed,
    and the masked/clamped tail contributes zero blocks."""
    s = cornell_scene
    o, d = _rays(s, 512, rng)
    dist = (jnp.asarray(rng.uniform(0.1, 2.0, 512).astype(np.float32))
            if tmax else None)
    t1, o1, r1 = intersect_scene_sweep(s, o, d,
                                       backend="compact_interpret",
                                       tile=256, worklist=True,
                                       rank_mode="roll", t_max=dist)
    tp, op_, rp = intersect_scene_sweep(s, o, d,
                                        backend="compact_interpret",
                                        tile=256, worklist=True,
                                        rank_mode="roll", t_max=dist,
                                        pair_tiles=True)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(tp))
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(op_))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(rp))


@pytest.mark.parametrize("worklist", [False, True])
def test_compact_tmax_shadow(cornell_scene, rng, worklist):
    """t_max queries must produce the same visibility predicate as the
    full closest-hit query (the NEE shadow-ray contract)."""
    s = cornell_scene
    o, d = _rays(s, 256, rng)
    dist = jnp.asarray(rng.uniform(0.1, 2.0, 256).astype(np.float32))
    t_full, _, _ = jax.jit(intersect_scene)(s, o, d)
    t_lim, _, _ = intersect_scene_sweep(s, o, d, backend="compact_interpret",
                                        tile=256, t_max=dist,
                                        worklist=worklist)
    vis_full = np.asarray(t_full) >= np.asarray(dist)
    vis_lim = np.asarray(t_lim) >= np.asarray(dist)
    np.testing.assert_array_equal(vis_full, vis_lim)


def test_nee_render_with_compact_matches_bvh(cornell_scene):
    """NEE shadow queries through the compaction backend: missed/dead
    lanes carry t=INF, and their unparked ~3.4e38 shadow origins used
    to NaN-poison the one-hot gather (0 * NaN sums into every compacted
    column), silently leaking light.  The parked shadow query must
    reproduce the BVH-walk image."""
    cfg_b = RenderConfig(width=16, height=16, max_depth=3, intersect="bvh",
                         nee=True)
    cfg_c = cfg_b.replace(intersect="compact_interpret", compact_tile=256)
    cam = cornell_scene.cameras[0]
    args = (jnp.asarray(cam.world_matrix), jnp.float32(cam.yfov),
            jnp.asarray([48271, 16807], jnp.uint32))
    a = np.asarray(render_sample(cornell_scene, cfg_b, *args))
    b = np.asarray(render_sample(cornell_scene, cfg_c, *args))
    assert np.isfinite(b).all()
    close = np.isclose(a, b, rtol=1e-4, atol=1e-6).all(axis=-1)
    assert close.mean() > 0.99, f"{(~close).sum()} divergent pixels"


def test_render_with_compact_matches_bvh(cornell_scene):
    cfg_b = RenderConfig(width=16, height=16, max_depth=4, intersect="bvh")
    cfg_c = cfg_b.replace(intersect="compact_interpret", compact_tile=256)
    cam = cornell_scene.cameras[0]
    args = (jnp.asarray(cam.world_matrix), jnp.float32(cam.yfov),
            jnp.asarray([48271, 16807], jnp.uint32))
    a = np.asarray(render_sample(cornell_scene, cfg_b, *args))
    b = np.asarray(render_sample(cornell_scene, cfg_c, *args))
    # Same hits -> same radiance, except t near-ties on coplanar edges
    # where the stochastic path diverges (same bound as test_sweep).
    close = np.isclose(a, b, rtol=1e-4, atol=1e-6).all(axis=-1)
    assert close.mean() > 0.99, f"{(~close).sum()} divergent pixels"


def test_mt_feature_algebra(cornell_scene, rng):
    """build_mt_features: F @ G must reproduce the elementwise MT
    quantities (det, u, v, t) on random rays — pure numpy, no kernel."""
    s = cornell_scene
    cl_tris = np.asarray(s.cl_tris)
    cl_aabb = np.asarray(s.cl_aabb)
    g = np.asarray(s.cl_mt)
    c, _, lanes = cl_tris.shape
    ci = int(rng.integers(0, c))
    n = 32
    o = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    center = 0.5 * (cl_aabb[ci, 0:3] + cl_aabb[ci, 3:6])
    ol = o - center
    m = np.cross(ol, d)
    f = np.concatenate([d, m, ol, np.ones((n, 1), np.float32),
                        np.zeros((n, 6), np.float32)], axis=1)  # [n, 16]
    prod = f.astype(np.float64) @ g[ci].astype(np.float64)      # [n, 4S]
    det_b = prod[:, 0:lanes]
    u_b = prod[:, lanes:2 * lanes] / np.where(det_b == 0, 1, det_b)
    t_b = prod[:, 3 * lanes:4 * lanes] / np.where(det_b == 0, 1, det_b)

    v0 = cl_tris[ci, 0:3].T
    e1 = cl_tris[ci, 3:6].T
    e2 = cl_tris[ci, 6:9].T
    real = np.abs(cl_tris[ci]).max(axis=0) > 0
    p = np.cross(d[:, None, :], e2[None])                       # [n, S, 3]
    det_e = np.sum(e1[None] * p, axis=-1)
    tvec = o[:, None, :] - v0[None]
    u_e = np.sum(tvec * p, axis=-1) / np.where(det_e == 0, 1, det_e)
    q = np.cross(tvec, e1[None])
    t_e = np.sum(e2[None] * q, axis=-1) / np.where(det_e == 0, 1, det_e)

    np.testing.assert_allclose(det_b[:, real], det_e[:, real],
                               rtol=1e-4, atol=1e-5)
    ok = np.abs(det_e[:, real]) > 1e-4   # well-conditioned pairs
    np.testing.assert_allclose(u_b[:, real][ok], u_e[:, real][ok],
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(t_b[:, real][ok], t_e[:, real][ok],
                               rtol=1e-3, atol=1e-3)
