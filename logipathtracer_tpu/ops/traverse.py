"""Two-level BVH traversal, restructured for a vector machine.

The reference walks an object BVH whose leaves recursively walk
per-mesh BVHs with the ray transformed to object space
(shaders/path_tracing.comp:130-209, explicit per-thread stacks).  Here
both levels are fused into ONE node array (scene/types.py) so a single
vectorized stack walk serves every ray in lockstep:

  * one [R, S] stack of global node ids (S = scene.max_stack, a static
    bound computed from the tree depth at compile time — the analog of
    INTERSECTION_STACK_SIZE 20),
  * each node carries the object whose local space its AABB lives in;
    the lane's local ray is produced by gathering that object's
    inverse world matrix (identity row for world-space nodes),
  * leaves hold at most ``leaf_size`` triangles (builder-enforced), so
    the triangle test is a statically unrolled masked loop.

Traversal order differs from the reference (order never affects the
min-t result; ties broken by strict < are measure-zero).  AABB tests
for spliced mesh roots use the object-space box — tighter than the
reference's world-space object AABB, so strictly fewer false entries.

Intersection semantics (acceptance gate t > EPS, strict min) match
path_tracing.comp:152 exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from logipathtracer_tpu.ops.intersect import (INF, matvec3, ray_aabb_test,
                                              ray_triangle)


def _local_ray(inv_rows, origin, direction):
    """Transform world ray by gathered inverse matrices.

    inv_rows: [..., 3, 4] (rows of the object's worldMatrixInverse;
    row 0..2 of the 4x4). Returns (o_local, d_local); direction is NOT
    normalized (reference keeps world-parameterized t,
    path_tracing.comp:136-137).
    """
    rot = inv_rows[..., :3, :3]
    trans = inv_rows[..., :3, 3]
    o = matvec3(rot, origin) + trans
    d = matvec3(rot, direction)
    return o, d


def intersect_scene(scene, origin, direction, eps: float = 1e-4,
                    t_max=None, any_hit: bool = False):
    """Closest-hit query for a batch of world-space rays.

    origin, direction: [R, 3] float32.  t_max (optional [R]): ignore
    hits at or beyond it — shadow rays pass the light distance so the
    walk prunes everything behind the light (any-hit analog).
    Returns (t [R] f32 — INF on miss, obj [R] i32, tri [R] i32 global
    triangle index; -1 where missed).

    ``any_hit`` (API parity with the sweep backends): callers only need
    the occlusion predicate t < t_max; this walk ignores the flag (its
    closest-hit answer yields the identical predicate), the compaction
    sweeps use it to park blocked lanes early.
    """
    r = origin.shape[0]
    s = scene.max_stack
    leaf_size = scene.leaf_width

    fused_min = scene.fused_min
    fused_max = scene.fused_max
    fused_meta = scene.fused_meta
    # [O+1, 3, 4] inverse-matrix rows; slot 0 = identity (world space).
    inv_all = _padded_inverses(scene)
    vtx = scene.vtx_pos

    stack = jnp.zeros((r, s), jnp.int32)
    sp = jnp.ones((r,), jnp.int32)  # root (node 0) pre-pushed
    best_t = jnp.full((r,), INF) if t_max is None else t_max
    best_obj = jnp.full((r,), -1, jnp.int32)
    best_tri = jnp.full((r,), -1, jnp.int32)

    lanes = jnp.arange(r)

    def cond(state):
        _, sp, *_ = state
        return jnp.any(sp > 0)

    def body(state):
        stack, sp, best_t, best_obj, best_tri = state
        live = sp > 0
        top = jnp.maximum(sp - 1, 0)
        idx = stack[lanes, top]
        sp = jnp.where(live, sp - 1, sp)

        meta = jnp.take(fused_meta, idx, axis=0)  # [R, 4]
        kind, a, b = meta[..., 0], meta[..., 1], meta[..., 2]
        is_inner = live & (kind == 0)
        is_leaf = live & (kind == 1)

        # ---- inner: test both children, push survivors ---------------
        def test_child(child):
            cobj = jnp.take(fused_meta[:, 3], child, axis=0)
            inv = jnp.take(inv_all, cobj + 1, axis=0)
            o_loc, d_loc = _local_ray(inv, origin, direction)
            cmin = jnp.take(fused_min, child, axis=0)
            cmax = jnp.take(fused_max, child, axis=0)
            return ray_aabb_test(o_loc, 1.0 / d_loc, cmin, cmax, best_t)

        for child in (a, b):
            push = is_inner & test_child(child)
            slot = jnp.minimum(sp, s - 1)
            cur = stack[lanes, slot]
            stack = stack.at[lanes, slot].set(jnp.where(push, child, cur))
            sp = sp + push.astype(jnp.int32)

        # ---- leaf: masked fixed-width triangle tests ------------------
        lobj = meta[..., 3]
        inv = jnp.take(inv_all, jnp.where(is_leaf, lobj + 1, 0), axis=0)
        o_loc, d_loc = _local_ray(inv, origin, direction)
        for k in range(leaf_size):
            tri = a + k
            valid = is_leaf & (tri < b)
            vbase = 3 * jnp.where(valid, tri, 0)
            v0 = jnp.take(vtx, vbase, axis=0)
            v1 = jnp.take(vtx, vbase + 1, axis=0)
            v2 = jnp.take(vtx, vbase + 2, axis=0)
            t = ray_triangle(o_loc, d_loc, v0, v1, v2)
            accept = valid & (t > eps) & (t < best_t)
            best_t = jnp.where(accept, t, best_t)
            best_obj = jnp.where(accept, lobj, best_obj)
            best_tri = jnp.where(accept, tri, best_tri)

        return stack, sp, best_t, best_obj, best_tri

    state = (stack, sp, best_t, best_obj, best_tri)
    state = jax.lax.while_loop(cond, body, state)
    _, _, best_t, best_obj, best_tri = state
    if t_max is not None:
        best_t = jnp.where(best_tri >= 0, best_t, INF)
    return best_t, best_obj, best_tri


def _padded_inverses(scene):
    """[O+1, 3, 4] f32: identity row 0, then each object's inverse."""
    inv = scene.obj_world_inv[:, :3, :4]
    ident = jnp.eye(3, 4, dtype=inv.dtype)[None]
    return jnp.concatenate([ident, inv], axis=0)


def _pack_rays8(origin, direction, tile: int, t_max, cm: bool):
    """Tile-padded [8, Rp] component-major ray block.  ``cm``: the rays
    already arrive as [3, R] rows (cfg.pool_cm) — the pack is then two
    row copies instead of two transposes."""
    r = origin.shape[1] if cm else origin.shape[0]
    rp = ((r + tile - 1) // tile) * tile
    rays8 = jnp.zeros((8, rp), jnp.float32)
    rays8 = rays8.at[5, :].set(1.0)  # benign padding direction
    rays8 = rays8.at[0:3, :r].set(origin if cm else origin.T)
    rays8 = rays8.at[3:6, :r].set(direction if cm else direction.T)
    if t_max is not None:
        rays8 = rays8.at[6, :].set(INF)
        rays8 = rays8.at[6, :r].set(t_max)
    return rays8, r


def intersect_scene_sweep(scene, origin, direction, eps: float = 1e-4,
                          tile: int = 1024, backend: str = "pallas",
                          t_max=None, cap: int = 128,
                          worklist: bool = False, cm: bool = False,
                          any_hit: bool = False):
    """Closest hit via the gather-free cluster sweep
    (ops/pallas/cluster_intersect.py) or, with backend="compact", the
    per-cluster ray-compaction sweep (ops/pallas/compact_intersect.py;
    ``cap`` = compacted MT block width).  Same contract as
    intersect_scene: returns (t, obj, tri)."""
    from logipathtracer_tpu.ops.pallas.cluster_intersect import (
        cluster_intersect_jnp, cluster_intersect_pallas)

    rays8, r = _pack_rays8(origin, direction, tile, t_max, cm)
    inv_rows = scene.obj_world_inv[:, :3, :4].reshape(scene.num_objects, 12)
    if backend == "jnp":
        t, tri, obj = cluster_intersect_jnp(
            scene.cl_meta, inv_rows, scene.cl_aabb, scene.cl_tris, rays8,
            eps=eps, t_max=None if t_max is None else rays8[6, :])
    elif backend in ("compact", "compact_interpret"):
        from logipathtracer_tpu.ops.pallas.compact_intersect import \
            cluster_intersect_compact
        t, tri, obj = cluster_intersect_compact(
            scene.cl_meta, inv_rows, scene.cl_order, scene.cl_aabb,
            scene.cl_tris, rays8, tile=tile,
            cap=cap, eps=eps,
            interpret=(backend == "compact_interpret"),
            has_tmax=t_max is not None,
            worklist=worklist,
            obj_world=scene.obj_world if worklist else None,
            any_hit=any_hit and t_max is not None)
    else:
        t, tri, obj = cluster_intersect_pallas(
            scene.cl_meta, inv_rows, scene.cl_order, scene.cl_aabb,
            scene.cl_tris, rays8, tile=tile, eps=eps,
            interpret=(backend == "interpret"),
            has_tmax=t_max is not None)
    return t[:r], obj[:r], tri[:r]


def intersect_scene_stream(scene, origin, direction, eps: float = 1e-4,
                           tile: int = 2048, chunk: int = 16,
                           backend: str = "pallas", t_max=None,
                           cap: int = 0, cm: bool = False,
                           any_hit: bool = False):
    """Closest hit via the HBM-streamed cluster sweep — scenes whose
    cluster data exceeds the resident kernel's VMEM budget
    (ops/pallas/cluster_intersect.py::cluster_intersect_stream).  Same
    contract as intersect_scene."""
    from logipathtracer_tpu.ops.pallas.cluster_intersect import \
        cluster_intersect_stream

    rays8, r = _pack_rays8(origin, direction, tile, t_max, cm)
    inv_rows = scene.obj_world_inv[:, :3, :4].reshape(scene.num_objects, 12)
    t, tri, obj = cluster_intersect_stream(
        scene.cl_meta, inv_rows, scene.cl_aabb, scene.cl_tris,
        scene.obj_world, rays8, tile=tile, chunk=chunk, eps=eps,
        interpret=(backend == "interpret"), has_tmax=t_max is not None,
        cap=cap, any_hit=any_hit and t_max is not None)
    return t[:r], obj[:r], tri[:r]


def intersect_scene_worklist(scene, origin, direction, eps: float = 1e-4,
                             tile: int = 4096, chunk: int = 16,
                             t_max=None, cap: int = 128,
                             cm: bool = False, any_hit: bool = False):
    """Closest hit via the worklist-driven streamed compaction sweep
    (compact_intersect.py::cluster_intersect_worklist) — the TPU
    production path for beyond-VMEM scenes.  Same contract as
    intersect_scene_stream."""
    from logipathtracer_tpu.ops.pallas.compact_intersect import \
        cluster_intersect_worklist

    rays8, r = _pack_rays8(origin, direction, tile, t_max, cm)
    inv_rows = scene.obj_world_inv[:, :3, :4].reshape(scene.num_objects, 12)
    t, tri, obj = cluster_intersect_worklist(
        scene.cl_meta, inv_rows, scene.cl_aabb, scene.cl_tris,
        scene.obj_world, rays8, tile=tile, chunk=chunk, eps=eps,
        has_tmax=t_max is not None, cap=cap,
        any_hit=any_hit and t_max is not None)
    return t[:r], obj[:r], tri[:r]


def intersect_scene_cluster_wl(scene, origin, direction, eps: float = 1e-4,
                               tile: int = 4096, t_max=None, cap: int = 32,
                               cm: bool = False, any_hit: bool = False,
                               nbuf: int = 4, chunk_gate: int = 0):
    """Closest hit via the cluster-granular worklist stream sweep
    (ops/pallas/stream_cluster.py) — the TPU production path for
    beyond-VMEM scenes (cfg.stream_granularity="cluster").  Same
    contract as intersect_scene_stream; TPU-only (manual-DMA loop)."""
    from logipathtracer_tpu.ops.pallas.stream_cluster import \
        cluster_intersect_stream_cl

    rays8, r = _pack_rays8(origin, direction, tile, t_max, cm)
    inv_rows = scene.obj_world_inv[:, :3, :4].reshape(scene.num_objects, 12)
    t, tri, obj = cluster_intersect_stream_cl(
        scene.cl_meta, inv_rows, scene.cl_aabb, scene.cl_tris,
        scene.obj_world, rays8, tile=tile, eps=eps,
        has_tmax=t_max is not None, cap=cap,
        any_hit=any_hit and t_max is not None, nbuf=nbuf,
        chunk_gate=chunk_gate)
    return t[:r], obj[:r], tri[:r]


def intersect_bruteforce(scene, origin, direction, eps: float = 1e-4,
                         chunk: int = 4096):
    """Oracle: test every triangle of every object (no BVH).

    Used by tests to validate the traversal (SURVEY.md §4 golden plan).
    origin/direction [R, 3]. O(R x T) — tiny scenes only.
    """
    import numpy as np
    meta = np.asarray(scene.fused_meta)
    # Owning object of every triangle, from leaf metadata.
    t_total = int(np.asarray(scene.vtx_pos).shape[0] // 3)
    tri_obj = np.zeros(t_total, np.int32)
    leaves = meta[meta[:, 0] == 1]
    for a, b, obj in zip(leaves[:, 1], leaves[:, 2], leaves[:, 3]):
        tri_obj[a:b] = obj
    tri_obj = jnp.asarray(tri_obj)

    inv_all = _padded_inverses(scene)
    vtx = scene.vtx_pos.reshape(-1, 3, 3)

    r = origin.shape[0]
    best_t = jnp.full((r,), INF)
    best_obj = jnp.full((r,), -1, jnp.int32)
    best_tri = jnp.full((r,), -1, jnp.int32)
    for start in range(0, t_total, chunk):
        end = min(start + chunk, t_total)
        objs = tri_obj[start:end]
        inv = inv_all[objs + 1]  # [C, 3, 4]
        o_loc = (matvec3(inv[None, :, :, :3], origin[:, None, :])
                 + inv[None, :, :, 3])
        d_loc = matvec3(inv[None, :, :, :3], direction[:, None, :])
        tri = vtx[start:end]
        t = ray_triangle(o_loc, d_loc, tri[None, :, 0], tri[None, :, 1],
                         tri[None, :, 2])  # [R, C]
        t = jnp.where(t > eps, t, INF)
        k = jnp.argmin(t, axis=1)
        tk = jnp.take_along_axis(t, k[:, None], axis=1)[:, 0]
        accept = tk < best_t
        best_t = jnp.where(accept, tk, best_t)
        best_obj = jnp.where(accept, objs[k], best_obj)
        best_tri = jnp.where(accept, (start + k).astype(jnp.int32), best_tri)
    return best_t, best_obj, best_tri
