"""Cluster-granular worklist stream sweep (ops/pallas/stream_cluster).

The kernel is TPU-only (manual DMA in a fori_loop — no interpreter
path); its hit-for-hit equivalence vs the grid stream kernel runs on
hardware (the ``tpu``-marked test below).  The prepass — the frustum
fired-cluster lists that decide WHICH clusters each ray tile visits,
i.e. the correctness-critical culling — is pinned on CPU against a
scalar numpy slab reference, mirroring tests/test_worklist.py.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import jax

from logipathtracer_tpu.ops.pallas.compact_intersect import BIG
from logipathtracer_tpu.ops.pallas.stream_cluster import (
    build_cluster_worklists)


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


def _exact_union(o, d, cmin, cmax, tile, best=None):
    """Per-tile exact fired-cluster sets (any live ray's slab passes)."""
    r = o.shape[0]
    sets = []
    for t in range(r // tile):
        fired = set()
        for c in range(cmin.shape[0]):
            for i in range(t * tile, (t + 1) * tile):
                if np.abs(o[i]).max() >= 1e29:
                    continue
                b = BIG if best is None else best[i]
                if _np_slab(o[i], d[i], cmin[c], cmax[c], b):
                    fired.add(c)
                    break
        sets.append(fired)
    return sets


@pytest.mark.parametrize("chunk_gate", [0, 4])
def test_cluster_worklists_superset(rng, boxes, chunk_gate):
    """The fired-cluster lists must be a SUPERSET of the exact per-ray
    union (bit-identity of the kernel's skips), front-to-back sorted,
    and consistent (wn fired entries lead wl)."""
    cmin, cmax = boxes
    r, tile = 512, 128
    # octant-pure-ish tiles (the production post-sort shape) plus a
    # scrambled half: conservatism must hold for both
    o = rng.uniform(-12, 12, (r, 3)).astype(np.float32)
    d = rng.standard_normal((r, 3)).astype(np.float32)
    d[:256] = np.abs(d[:256])
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    wl, wn = build_cluster_worklists(
        jnp.asarray(cmin), jnp.asarray(cmax), _rays8(o, d), tile,
        chunk_gate=chunk_gate)
    wl, wn = np.asarray(wl), np.asarray(wn)
    exact = _exact_union(o, d, cmin, cmax, tile)
    for t in range(r // tile):
        fired = set(wl[t, :wn[t]].tolist())
        assert exact[t] <= fired, (
            f"tile {t}: underfires {exact[t] - fired}")


def test_chunk_gate_tightens(rng, boxes):
    """frustum AND per-ray-chunk is a subset of frustum alone (never
    looser), and still a superset of exact."""
    cmin, cmax = boxes
    r, tile = 512, 128
    o = rng.uniform(-12, 12, (r, 3)).astype(np.float32)
    d = rng.standard_normal((r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays8 = _rays8(o, d)
    args = (jnp.asarray(cmin), jnp.asarray(cmax), rays8, tile)
    wl0, wn0 = (np.asarray(a) for a in
                build_cluster_worklists(*args, chunk_gate=0))
    wl1, wn1 = (np.asarray(a) for a in
                build_cluster_worklists(*args, chunk_gate=1))
    exact = _exact_union(o, d, cmin, cmax, tile)
    for t in range(r // tile):
        f0 = set(wl0[t, :wn0[t]].tolist())
        f1 = set(wl1[t, :wn1[t]].tolist())
        assert f1 <= f0
        assert exact[t] <= f1
    # chunk_gate=1 (per-ray, per-cluster) is the exact union itself
    for t in range(r // tile):
        assert set(wl1[t, :wn1[t]].tolist()) == exact[t]


def test_cluster_worklists_parked_and_tmax(rng, boxes):
    cmin, cmax = boxes
    r, tile = 256, 128
    o = rng.uniform(-12, 12, (r, 3)).astype(np.float32)
    d = rng.standard_normal((r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    # park the whole second tile
    o[128:] = 1e30
    d[128:] = 1.0
    wl, wn = build_cluster_worklists(
        jnp.asarray(cmin), jnp.asarray(cmax), _rays8(o, d), tile)
    assert int(np.asarray(wn)[1]) == 0

    # t_max pools: short rays fire fewer clusters, never fewer than
    # the exact t_max-bounded union
    tmax = np.full((r,), 0.7, np.float32)
    wl2, wn2 = build_cluster_worklists(
        jnp.asarray(cmin), jnp.asarray(cmax), _rays8(o, d, tmax), tile,
        has_tmax=True)
    exact = _exact_union(o, d, cmin, cmax, tile, best=tmax)
    f = set(np.asarray(wl2)[0, :int(np.asarray(wn2)[0])].tolist())
    assert exact[0] <= f


@pytest.mark.tpu
@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="needs the real TPU backend (LPT_TPU_TESTS=1)")
def test_cluster_wl_matches_grid_stream_on_hardware(cornell_scene):
    """Cluster-granular worklist kernel vs the 2-D-grid stream kernel
    on real cornell primaries: identical hits up to cross-cluster
    near-ties (visit order differs)."""
    from logipathtracer_tpu.ops.camera import generate_ray
    from logipathtracer_tpu.ops.pallas.stream_cluster import (
        cluster_intersect_stream_cl)
    from logipathtracer_tpu.ops.rng import seed_from_pixel
    from logipathtracer_tpu.ops.traverse import (_pack_rays8,
                                                 intersect_scene_stream)

    scene = cornell_scene
    cam = scene.cameras[0]
    h = w = 128
    ys, xs = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    pix = jnp.asarray(np.stack([xs, ys], -1).reshape(-1, 2))
    seed = seed_from_pixel(jnp.asarray([48271, 16807], jnp.uint32), pix)
    o, d, _ = generate_ray(jnp.asarray(cam.world_matrix),
                           jnp.float32(cam.yfov), pix, (w, h), seed)

    inv_rows = scene.obj_world_inv[:, :3, :4].reshape(
        scene.num_objects, 12)
    for cg in (0, 16):
        rays8, r = _pack_rays8(o, d, 1024, None, False)
        tc, rc, oc = cluster_intersect_stream_cl(
            scene.cl_meta, inv_rows, scene.cl_aabb, scene.cl_tris,
            scene.obj_world, rays8, tile=1024, cap=128, chunk_gate=cg)
        tg, og, rg = intersect_scene_stream(scene, o, d, tile=1024,
                                            chunk=4, cap=128)
        tc = np.asarray(tc)[:o.shape[0]]
        tg = np.asarray(tg)
        neq = int((tc != tg).sum())
        assert neq <= max(4, tc.size // 10_000), (
            f"chunk_gate={cg}: {neq}/{tc.size} mismatches")
        for k in np.flatnonzero(tc != tg):
            assert abs(tc[k] - tg[k]) <= 1e-3 * abs(tg[k]) + 1e-6
