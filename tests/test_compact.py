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


@pytest.mark.parametrize("cap,worklist", [(128, False),
                                          (256, False),
                                          (128, True)])
def test_compact_matches_bvh(cornell_scene, rng, cap, worklist):
    s = cornell_scene
    o, d = _rays(s, 512, rng)
    tb, ob, rb = jax.jit(intersect_scene)(s, o, d)
    tc, oc, rc = intersect_scene_sweep(s, o, d, backend="compact_interpret",
                                       tile=256, cap=cap,
                                       worklist=worklist)
    rtol = 2e-6
    np.testing.assert_allclose(np.asarray(tb), np.asarray(tc), rtol=rtol,
                               atol=1e-6)
    # tri/obj may differ only where t is a near-tie (coplanar geometry).
    tie = np.abs(np.asarray(tb) - np.asarray(tc)) \
        <= rtol * np.abs(np.asarray(tb)) + 1e-6
    diff = (np.asarray(rb) != np.asarray(rc)) \
        | (np.asarray(ob) != np.asarray(oc))
    assert (tie | ~diff).all()


@pytest.mark.parametrize("variant", ["presplit"])
def test_compact_variants_bit_identical(cornell_scene, rng, variant):
    """CORRECT-results kernel variants must be BIT-identical to the
    baseline: 'presplit' (per-object hoisted _split3 — the same values
    read from scratch instead of recomputed per cluster).
    (A 16-bit one-hot compare variant was killed in round 4: Mosaic on
    v5e rejects bf16 AND int16 vector compares; the 'fruspre' prepass
    knob was pruned in round 5 — measured neutral, VERDICT r4 item 6.)"""
    from logipathtracer_tpu.ops.pallas.compact_intersect import \
        cluster_intersect_compact
    s = cornell_scene
    o, d = _rays(s, 1024, rng)
    rays8 = jnp.zeros((8, 1024), jnp.float32)
    rays8 = rays8.at[0:3].set(o.T).at[3:6].set(jnp.asarray(d).T)
    # A t_max variant exercises the frustum prepass's per-tile t cap.
    rays8_tmax = rays8.at[6].set(
        jnp.asarray(rng.uniform(0.1, 3.0, 1024).astype(np.float32)))
    inv_rows = s.obj_world_inv[:, :3, :4].reshape(s.num_objects, 12)

    def run(v, worklist=False, r8=rays8, has_tmax=False):
        return cluster_intersect_compact(
            s.cl_meta, inv_rows, s.cl_order, s.cl_aabb, s.cl_tris,
            r8, tile=1024, cap=128, interpret=True, worklist=worklist,
            obj_world=s.obj_world if worklist else None, variant=v,
            has_tmax=has_tmax)

    for wl in (False, True):
        for r8, ht in ((rays8, False), (rays8_tmax, True)):
            base = run("", wl, r8, ht)
            got = run(variant, wl, r8, ht)
            for a, b in zip(base, got):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


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
    # any_hit=True (round 4): blocked lanes may report t=-BIG instead
    # of the closest hit, but the occlusion predicate must be EXACTLY
    # the closest-hit one (any occluder < t_max == closest < t_max).
    t_any, _, _ = intersect_scene_sweep(s, o, d,
                                        backend="compact_interpret",
                                        tile=256, t_max=dist,
                                        worklist=worklist, any_hit=True)
    vis_any = np.asarray(t_any) >= np.asarray(dist)
    np.testing.assert_array_equal(vis_full, vis_any)


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
