"""Real-TPU invariant tests (run on hardware only):

    LPT_TPU_TESTS=1 python -m pytest tests -m tpu

The default suite forces the CPU backend (conftest.py) and deselects
the ``tpu`` marker; setting LPT_TPU_TESTS=1 keeps the axon TPU backend
so these re-verify, on demand, the hardware invariants the production
kernels rest on (VERDICT r2 weak item 7):

  * one-hot f32 matmuls at HIGHEST are bit-exact selections up to the
    documented ~3e-5 bf16x3 1-ulp tail (the compaction kernel's
    load-bearing trick, ops/pallas/compact_intersect.py),
  * the compact kernel matches the sub-tile-masked sweep on real
    cornell rays up to coplanar tie-breaks.

NEVER run while another TPU process is live (exclusive chip).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(jax.default_backend() != "tpu",
                       reason="needs the real TPU backend "
                              "(LPT_TPU_TESTS=1)"),
]


def test_onehot_highest_matmul_bit_exact():
    """scripts/compact_probe.py::cmd_exact as a regression test."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
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
    # Measured on v5e: exact except ~3e-5 of values (1-ulp bf16x3 tail).
    assert same >= 1.0 - 1e-3, f"bit-match only {same:.6f}"


def test_compact_matches_sweep_on_hardware(cornell_scene):
    """Compact kernel vs the sub-tile sweep on real cornell primaries:
    identical up to the rare-ulp tie-break tail (observed 32/1M rays)."""
    from logipathtracer_tpu.ops.camera import generate_ray
    from logipathtracer_tpu.ops.pallas.cluster_intersect import \
        cluster_intersect_pallas
    from logipathtracer_tpu.ops.pallas.compact_intersect import \
        cluster_intersect_compact
    from logipathtracer_tpu.ops.rng import seed_from_pixel

    scene = cornell_scene
    cam = scene.cameras[0]
    h = w = 128
    ys, xs = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    pix = jnp.asarray(np.stack([xs, ys], -1).reshape(-1, 2))
    seed = seed_from_pixel(jnp.asarray([48271, 16807], jnp.uint32), pix)
    o, d, _ = generate_ray(jnp.asarray(cam.world_matrix),
                           jnp.float32(cam.yfov), pix, (w, h), seed)
    rays8 = jnp.zeros((8, h * w)).at[0:3].set(o.T).at[3:6].set(d.T)
    inv_rows = scene.obj_world_inv[:, :3, :4].reshape(scene.num_objects, 12)

    t0, tri0, obj0 = cluster_intersect_pallas(
        scene.cl_meta, inv_rows, scene.cl_order, scene.cl_aabb,
        scene.cl_tris, rays8, tile=1024)
    t1, tri1, obj1 = cluster_intersect_compact(
        scene.cl_meta, inv_rows, scene.cl_order, scene.cl_aabb,
        scene.cl_tris, rays8, tile=1024, cap=128)
    t0, t1 = np.asarray(t0), np.asarray(t1)
    neq = int((t0 != t1).sum())
    assert neq <= max(4, t0.size // 10_000), f"{neq}/{t0.size} t mismatches"
    # Any differing rays must be 1-ulp-class ties, not wrong geometry.
    for k in np.flatnonzero(t0 != t1):
        assert abs(t0[k] - t1[k]) <= 1e-3 * abs(t0[k]) + 1e-6


def test_worklist_matches_grid_stream_on_hardware(cornell_scene):
    """Worklist-driven stream kernel (manual DMA, dynamic trip counts)
    vs the 2-D-grid stream kernel on real cornell primaries: identical
    hits (measured exactly equal on outside-scene pools too,
    scripts/worklist_probe.py).  Small tile/chunk force multi-tile
    worklists and cluster padding."""
    from logipathtracer_tpu.ops.camera import generate_ray
    from logipathtracer_tpu.ops.rng import seed_from_pixel
    from logipathtracer_tpu.ops.traverse import (intersect_scene_stream,
                                                 intersect_scene_worklist)

    scene = cornell_scene
    cam = scene.cameras[0]
    h = w = 128
    ys, xs = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    pix = jnp.asarray(np.stack([xs, ys], -1).reshape(-1, 2))
    seed = seed_from_pixel(jnp.asarray([48271, 16807], jnp.uint32), pix)
    o, d, _ = generate_ray(jnp.asarray(cam.world_matrix),
                           jnp.float32(cam.yfov), pix, (w, h), seed)

    tw, ow, rw = intersect_scene_worklist(scene, o, d, tile=1024, chunk=4,
                                          cap=128)
    tg, og, rg = intersect_scene_stream(scene, o, d, tile=1024, chunk=4,
                                        cap=128)
    tw, tg = np.asarray(tw), np.asarray(tg)
    neq = int((tw != tg).sum())
    assert neq <= max(4, tw.size // 10_000), f"{neq}/{tw.size} mismatches"
    for k in np.flatnonzero(tw != tg):
        assert abs(tw[k] - tg[k]) <= 1e-3 * abs(tw[k]) + 1e-6
    # shadow-query variant (t_max): any-hit pruning must agree too
    tmax = jnp.full((h * w,), 0.35)
    tws, _, _ = intersect_scene_worklist(scene, o, d, tile=1024, chunk=4,
                                         cap=128, t_max=tmax)
    tgs, _, _ = intersect_scene_stream(scene, o, d, tile=1024, chunk=4,
                                       cap=128, t_max=tmax)
    tws, tgs = np.asarray(tws), np.asarray(tgs)
    neq = int((tws != tgs).sum())
    assert neq <= max(4, tws.size // 10_000), f"{neq} shadow mismatches"


def test_flush_bins_matches_scatter_on_hardware(rng):
    """Dense bin-matmul flush (ops/pallas/flush.py) vs XLA scatter-add
    on a realistic pixid-sorted retired tail: identical accumulation
    up to addition-order ULPs (tested exactly, since each pixel's
    addends arrive in ascending-row order in both)."""
    from logipathtracer_tpu.ops.pallas.flush import flush_bins

    npix = 1 << 18
    fc = 1 << 16
    n_retired = 40_000
    pix = np.sort(rng.integers(0, npix, n_retired)).astype(np.int32)
    pix_tail = np.full((fc,), -1, np.int32)
    pix_tail[fc - n_retired:] = pix
    acc = rng.random((fc, 3), np.float32)
    accum0 = rng.random((npix, 3), np.float32)

    got = flush_bins(jnp.asarray(accum0), jnp.asarray(pix_tail),
                     jnp.asarray(acc))
    want = jnp.asarray(accum0).at[jnp.where(
        jnp.asarray(pix_tail) >= 0, jnp.asarray(pix_tail), 0)].add(
        jnp.where(jnp.asarray(pix_tail)[:, None] >= 0,
                  jnp.asarray(acc), 0.0), indices_are_sorted=True)
    got, want = np.asarray(got), np.asarray(want)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)
    # untouched pixels must be BIT-identical (pure copy path)
    touched = np.zeros(npix, bool)
    touched[pix] = True
    assert (got[~touched] == accum0[~touched]).all()


