"""Worklist-stream prepass (build_chunk_worklists): the XLA chunk cull
that feeds the TPU-only manual-DMA kernel (cluster_intersect_worklist).

The kernel itself has no interpreter path (make_async_copy inside
fori_loop is unsupported in interpret mode); its hit-for-hit
equivalence vs the grid stream kernel is covered on hardware by
tests/test_tpu.py::test_worklist_matches_grid_stream.  Here the
prepass — the part that decides WHICH chunks each ray tile visits,
i.e. the correctness-critical culling — is pinned against a scalar
numpy slab reference.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from logipathtracer_tpu.ops.pallas.compact_intersect import (
    BIG, build_chunk_worklists)


def _np_slab(o, d, amin, amax, best):
    inv = 1.0 / d
    n = (amin - o) * inv
    f = (amax - o) * inv
    t0 = np.minimum(n, f).max()
    t1 = np.maximum(n, f).min()
    return bool((t0 <= t1) and ((0.0 < t0 < best) or (t0 <= 0.0 < t1)))


@pytest.fixture(scope="module")
def boxes(rng):
    nc = 24
    cmin = rng.uniform(-10, 9, (nc, 3)).astype(np.float32)
    cmax = cmin + rng.uniform(0.2, 2.0, (nc, 3)).astype(np.float32)
    return cmin, cmax


def _rays8(o, d, tmax=None):
    r = o.shape[0]
    rays8 = np.zeros((8, r), np.float32)
    rays8[0:3] = o.T
    rays8[3:6] = d.T
    if tmax is not None:
        rays8[6] = tmax
    return jnp.asarray(rays8)


def test_worklists_match_numpy(rng, boxes):
    cmin, cmax = boxes
    r, tile = 512, 128
    o = rng.uniform(-12, 12, (r, 3)).astype(np.float32)
    d = rng.standard_normal((r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    wl, wn = build_chunk_worklists(jnp.asarray(cmin), jnp.asarray(cmax),
                                   _rays8(o, d), tile)
    wl, wn = np.asarray(wl), np.asarray(wn)
    tiles = r // tile
    for t in range(tiles):
        fired_ref = set()
        for c in range(cmin.shape[0]):
            for i in range(t * tile, (t + 1) * tile):
                if _np_slab(o[i], d[i], cmin[c], cmax[c], BIG):
                    fired_ref.add(c)
                    break
        assert wn[t] == len(fired_ref)
        assert set(wl[t, :wn[t]].tolist()) == fired_ref


def test_frustum_mask_superset(rng, boxes):
    """frustum_cluster_mask must be a SUPERSET of the exact per-ray
    world slab fired set (its bit-identity argument): any cluster it
    culls has no live ray whose slab passes.  Exercised on octant-pure
    sorted-ish tiles (the production shape), scrambled tiles (worst
    case for the interval bounds — mask may be loose but never wrong),
    parked lanes, and t_max pools."""
    from logipathtracer_tpu.ops.frustum import frustum_cluster_mask
    cmin, cmax = boxes
    r, tile = 512, 128
    o = rng.uniform(-12, 12, (r, 3)).astype(np.float32)
    d = rng.standard_normal((r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    # Octant-sort half the pool (production tiles are octant-pure);
    # park a scattering of lanes.
    octant = (d[:, 0] > 0) * 4 + (d[:, 1] > 0) * 2 + (d[:, 2] > 0)
    order = np.argsort(octant[: r // 2], kind="stable")
    o[: r // 2] = o[order]
    d[: r // 2] = d[order]
    parked = rng.uniform(size=r) < 0.1
    o[parked] = 1e30
    d[parked] = 1.0
    tmax = rng.uniform(0.5, 30.0, r).astype(np.float32)

    for hint in (None, tmax):
        mask = np.asarray(frustum_cluster_mask(
            _rays8(o, d, tmax if hint is not None else None),
            jnp.asarray(cmin), jnp.asarray(cmax), tile,
            best_hint=jnp.asarray(hint) if hint is not None else None))
        tiles = r // tile
        for t in range(tiles):
            for c in range(cmin.shape[0]):
                if mask[t, c]:
                    continue  # conservative side — nothing to check
                for i in range(t * tile, (t + 1) * tile):
                    if parked[i]:
                        continue
                    best = float(tmax[i]) if hint is not None else BIG
                    assert not _np_slab(o[i], d[i], cmin[c], cmax[c],
                                        best), (t, c, i)


def test_frustum_mask_all_parked_tile():
    """A fully-parked tile must cull every cluster (wn == 0 analog)."""
    from logipathtracer_tpu.ops.frustum import frustum_cluster_mask
    r, tile = 256, 128
    o = np.full((r, 3), 1e30, np.float32)
    d = np.ones((r, 3), np.float32)
    cmin = np.array([[-1e9, -1e9, -1e9]], np.float32)
    cmax = np.array([[1e9, 1e9, 1e9]], np.float32)
    mask = np.asarray(frustum_cluster_mask(
        _rays8(o, d), jnp.asarray(cmin), jnp.asarray(cmax), tile))
    assert not mask.any()


def test_frustum_worklists_superset_and_order(rng, boxes):
    """build_frustum_worklists (the fruspre prepass) vs the per-ray
    build_chunk_worklists: fired sets must be supersets per tile, and
    commonly-fired clusters must keep their relative front-to-back
    order (the stable-identical-key bit-identity argument)."""
    from logipathtracer_tpu.ops.pallas.compact_intersect import \
        build_frustum_worklists
    cmin, cmax = boxes
    r, tile = 512, 128
    o = rng.uniform(-12, 12, (r, 3)).astype(np.float32)
    d = rng.standard_normal((r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    # Octant-pure tiles (the production shape after the ray sort).
    octant = (d[:, 0] > 0) * 4 + (d[:, 1] > 0) * 2 + (d[:, 2] > 0)
    order = np.argsort(octant, kind="stable")
    o, d = o[order], d[order]
    tmax = rng.uniform(0.5, 30.0, r).astype(np.float32)

    for r8, ht in ((_rays8(o, d), False), (_rays8(o, d, tmax), True)):
        wl_r, wn_r = build_chunk_worklists(
            jnp.asarray(cmin), jnp.asarray(cmax), r8, tile, has_tmax=ht)
        wl_f, wn_f = build_frustum_worklists(
            jnp.asarray(cmin), jnp.asarray(cmax), r8, tile, has_tmax=ht)
        wl_r, wn_r = np.asarray(wl_r), np.asarray(wn_r)
        wl_f, wn_f = np.asarray(wl_f), np.asarray(wn_f)
        for t in range(r // tile):
            ray_set = wl_r[t, :wn_r[t]].tolist()
            fru_list = wl_f[t, :wn_f[t]].tolist()
            assert set(ray_set) <= set(fru_list), (t, ray_set, fru_list)
            # Relative order of the common clusters is preserved.
            common_in_fru = [c for c in fru_list if c in set(ray_set)]
            assert common_in_fru == ray_set, (t, ray_set, fru_list)


def test_worklists_front_to_back(rng, boxes):
    """Within a tile, listed chunks are ordered by mean-direction
    projection of their centroids (ascending = near first for rays
    moving that way)."""
    cmin, cmax = boxes
    r, tile = 256, 256
    o = rng.uniform(-12, 12, (r, 3)).astype(np.float32)
    d = np.tile(np.asarray([[0.6, 0.0, 0.8]], np.float32), (r, 1))
    wl, wn = build_chunk_worklists(jnp.asarray(cmin), jnp.asarray(cmax),
                                   _rays8(o, d), tile)
    wl, wn = np.asarray(wl), np.asarray(wn)
    cen = 0.5 * (cmin + cmax)
    n = wn[0]
    assert n > 0
    keys = cen[wl[0, :n]] @ np.asarray([0.6, 0.0, 0.8], np.float32)
    assert (np.diff(keys) >= -1e-3).all()


def test_worklists_parked_and_tmax(rng, boxes):
    cmin, cmax = boxes
    r, tile = 256, 128
    o = np.full((r, 3), 1e30, np.float32)
    d = np.zeros((r, 3), np.float32)
    d[:, 2] = 1.0
    wl, wn = build_chunk_worklists(jnp.asarray(cmin), jnp.asarray(cmax),
                                   _rays8(o, d), tile)
    assert (np.asarray(wn) == 0).all()

    # t_max = 0 kills every forward hit whose entry is positive; rays
    # inside a box (t0 <= 0 < t1) still fire.  Check against numpy.
    o2 = rng.uniform(-12, 12, (r, 3)).astype(np.float32)
    d2 = rng.standard_normal((r, 3)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    wl2, wn2 = build_chunk_worklists(jnp.asarray(cmin), jnp.asarray(cmax),
                                     _rays8(o2, d2, tmax=1e-6), tile,
                                     has_tmax=True)
    wl2, wn2 = np.asarray(wl2), np.asarray(wn2)
    for t in range(r // tile):
        fired_ref = set()
        for c in range(cmin.shape[0]):
            for i in range(t * tile, (t + 1) * tile):
                if _np_slab(o2[i], d2[i], cmin[c], cmax[c], 1e-6):
                    fired_ref.add(c)
                    break
        assert set(wl2[t, :wn2[t]].tolist()) == fired_ref
