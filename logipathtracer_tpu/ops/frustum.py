"""Per-tile conservative cluster culling for the streamed sweep.

The worklist stream kernel's prepass culls at CHUNK granularity (16
clusters): per ray tile it visits every member cluster of every fired
chunk — measured 861 cluster visits/tile against 165.6 per-ray-exact
fired clusters on the outside-class scene (ROADMAP round 3), each visit
paying a _local_ray + slab (~0.2 us).  An exact per-ray cluster-level
prepass would cost 16x the chunk prepass (~13 ms — dead), but a
per-TILE test is nearly free: sorted tiles are octant-pure and
spatially coherent, so the tile's ray set is tightly bounded by an
origin box x direction box, and interval arithmetic gives a
conservative ray-box-vs-AABB slab ([tiles, C] in one vectorized XLA
pass, ~50 flops per pair).

Conservative means: a cluster this test culls has NO ray in the tile
whose world-space slab test could pass, so the kernel's exact per-ray
local slab would have found hit == false anyway — skipping the visit
is BIT-IDENTICAL, not approximate.

Reference analog: the coarse-level rejection of the two-level BVH
traversal (shaders/path_tracing.comp:130-209), re-expressed at the
tile granularity the TPU sweep dispatches at.
"""

from __future__ import annotations

import jax.numpy as jnp

_PARK = 1e29   # origins at the 1e30 park exceed this
_BIG = 1e30


def tile_ray_bounds(rays8, tile: int):
    """Masked per-tile bounds of the live rays.

    rays8: [8, R] f32 (rows 0:3 origin, 3:6 direction; parked lanes
    carry origin 1e30).  Returns (o_lo, o_hi, d_lo, d_hi) each
    [tiles, 3], with empty tiles (all lanes parked) marked by
    o_lo > o_hi.
    """
    r = rays8.shape[1]
    tiles = r // tile
    o = rays8[0:3].reshape(3, tiles, tile)
    d = rays8[3:6].reshape(3, tiles, tile)
    live = jnp.abs(o).max(axis=0) < _PARK            # [tiles, tile]
    o_lo = jnp.where(live, o, _BIG).min(axis=2).T    # [tiles, 3]
    o_hi = jnp.where(live, o, -_BIG).max(axis=2).T
    d_lo = jnp.where(live, d, _BIG).min(axis=2).T
    d_hi = jnp.where(live, d, -_BIG).max(axis=2).T
    return o_lo, o_hi, d_lo, d_hi


def _imul(a_lo, a_hi, b_lo, b_hi):
    """Interval product bounds."""
    p1 = a_lo * b_lo
    p2 = a_lo * b_hi
    p3 = a_hi * b_lo
    p4 = a_hi * b_hi
    lo = jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4))
    hi = jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4))
    return lo, hi


def frustum_cluster_mask(rays8, cluster_min, cluster_max, tile: int,
                         best_hint=None):
    """Conservative [tiles, C] bool: may ANY live ray of the tile hit
    the cluster's world AABB with t in (0, t_cap)?

    cluster_min/max: [C, 3] world AABBs.  ``best_hint``: optional [R]
    upper bound on accepted t (e.g. t_max rows for shadow pools) —
    reduced per tile to its max; None uses +inf.

    Interval-arithmetic slab: per axis, t0_a/t1_a bounds are computed
    over the tile's (origin x direction) box product — a superset of
    the real ray set, so the returned mask is a superset of the exact
    per-ray fired set (proved in tests/test_worklist.py against the
    per-ray slab on random and production-like pools).
    """
    o_lo, o_hi, d_lo, d_hi = tile_ray_bounds(rays8, tile)
    tiles = o_lo.shape[0]
    empty = o_lo[:, 0] > o_hi[:, 0]                  # all-parked tiles

    # Inverted boxes (min > max) are the never-fire convention for
    # empty/padded slots.  They must be killed
    # EXPLICITLY: the min/max-normalizing slab below treats an
    # inverted box as a huge one and would fire it on every tile.
    dead_box = (cluster_min > cluster_max).any(axis=1)   # [C]

    # Interval arithmetic in f32 rounds to nearest, not outward; pad
    # the cluster AABBs by ~1e-5 relative so a boundary ray the
    # kernel's own (differently-ordered, also-rounded) slab would
    # accept can never be culled here.  Overfires a hair, never
    # underfires.
    pad = 1e-5 * (jnp.abs(cluster_min) + jnp.abs(cluster_max) + 1.0)
    cluster_min = cluster_min - pad
    cluster_max = cluster_max + pad

    if best_hint is None:
        t_cap = jnp.full((tiles,), _BIG)
    else:
        r = rays8.shape[1]
        t_cap = jnp.minimum(
            best_hint.reshape(tiles, tile).max(axis=1), _BIG)

    # Reciprocal-direction interval per axis; a sign-straddling
    # direction interval makes the axis unconstraining (t in (-inf,
    # inf)) — sorted tiles are octant-pure so this is rare (mixed
    # park-direction (1,1,1) lanes are excluded by the live mask).
    t0_lo = jnp.full((tiles, 1), -_BIG)
    t1_hi = jnp.full((tiles, 1), _BIG)
    for a in range(3):
        dl = d_lo[:, a:a + 1]                        # [tiles, 1]
        dh = d_hi[:, a:a + 1]
        safe = (dl > 0.0) | (dh < 0.0)
        # Clamp away from 0 to keep the reciprocals finite; the
        # unsafe-axis result is discarded below.
        dl_s = jnp.where(safe, dl, 1.0)
        dh_s = jnp.where(safe, dh, 1.0)
        i_lo = jnp.minimum(1.0 / dl_s, 1.0 / dh_s)
        i_hi = jnp.maximum(1.0 / dl_s, 1.0 / dh_s)
        # n = (bmin - o), f = (bmax - o) intervals vs every cluster.
        n_lo = cluster_min[None, :, a] - o_hi[:, a:a + 1]  # [tiles, C]
        n_hi = cluster_min[None, :, a] - o_lo[:, a:a + 1]
        f_lo = cluster_max[None, :, a] - o_hi[:, a:a + 1]
        f_hi = cluster_max[None, :, a] - o_lo[:, a:a + 1]
        na_lo, na_hi = _imul(n_lo, n_hi, i_lo, i_hi)
        fa_lo, fa_hi = _imul(f_lo, f_hi, i_lo, i_hi)
        # Per ray t0_a = min(na, fa), t1_a = max(na, fa): bound them.
        a0_lo = jnp.minimum(na_lo, fa_lo)
        a1_hi = jnp.maximum(na_hi, fa_hi)
        a0_lo = jnp.where(safe, a0_lo, -_BIG)
        a1_hi = jnp.where(safe, a1_hi, _BIG)
        t0_lo = jnp.maximum(t0_lo, a0_lo)
        t1_hi = jnp.minimum(t1_hi, a1_hi)

    # Exists-ray-may-hit: the slab interval can be non-empty with a
    # positive far hit below the tile's t cap.  (The kernel's exact
    # test also admits t0 <= 0 < t1 — origin inside — which t1_hi > 0
    # covers.)
    ok = (t0_lo <= t1_hi) & (t1_hi > 0.0) & (t0_lo < t_cap[:, None])
    return ok & ~empty[:, None] & ~dead_box[None, :]
