"""Intersection math unit tests (hand-computed cases per SURVEY.md §4)
plus BVH-traversal equivalence against brute force."""

import jax
import jax.numpy as jnp
import numpy as np

from logipathtracer_tpu.ops.camera import generate_ray
from logipathtracer_tpu.ops.intersect import (INF, barycentric,
                                              ray_aabb_test, ray_triangle)
from logipathtracer_tpu.ops.rng import seed_from_pixel
from logipathtracer_tpu.ops.traverse import (intersect_bruteforce,
                                             intersect_scene)


def _r(o, d):
    return jnp.asarray([o], jnp.float32), jnp.asarray([d], jnp.float32)


def test_triangle_hit():
    o, d = _r([0, 0, -5], [0, 0, 1])
    t = ray_triangle(o, d, jnp.array([[-1, -1, 0.]]), jnp.array([[1, -1, 0.]]),
                     jnp.array([[0, 1, 0.]]))
    assert np.allclose(np.asarray(t), 5.0)


def test_triangle_miss():
    o, d = _r([5, 5, -5], [0, 0, 1])
    t = ray_triangle(o, d, jnp.array([[-1, -1, 0.]]), jnp.array([[1, -1, 0.]]),
                     jnp.array([[0, 1, 0.]]))
    assert np.asarray(t)[0] >= 3e38


def test_triangle_no_backface_cull():
    # Hit from behind must also register (reference has no culling).
    o, d = _r([0, 0, 5], [0, 0, -1])
    t = ray_triangle(o, d, jnp.array([[-1, -1, 0.]]), jnp.array([[1, -1, 0.]]),
                     jnp.array([[0, 1, 0.]]))
    assert np.allclose(np.asarray(t), 5.0)


def test_triangle_negative_t():
    # Triangle behind the origin: MT returns negative t (not INF) —
    # the acceptance gate (t > EPS) rejects it downstream.
    o, d = _r([0, 0, 5], [0, 0, 1])
    t = ray_triangle(o, d, jnp.array([[-1, -1, 0.]]), jnp.array([[1, -1, 0.]]),
                     jnp.array([[0, 1, 0.]]))
    assert np.asarray(t)[0] < 0


def test_degenerate_triangle_rejected():
    o, d = _r([0, 0, -5], [0, 0, 1])
    z = jnp.zeros((1, 3))
    t = ray_triangle(o, d, z, z, z)
    tt = np.asarray(t)[0]
    accept = (tt > 1e-4) & (tt < 3e38)
    assert not accept  # NaN/inf must not be accepted


def test_aabb_outside_hit():
    o = jnp.array([[0, 0, -5.]])
    d = jnp.array([[0, 0, 1.]])
    hit = ray_aabb_test(o, 1.0 / d, jnp.array([[-1, -1, -1.]]),
                        jnp.array([[1, 1, 1.]]), jnp.array([INF]))
    assert bool(np.asarray(hit)[0])


def test_aabb_behind_miss():
    o = jnp.array([[0, 0, 5.]])
    d = jnp.array([[0, 0, 1.]])
    hit = ray_aabb_test(o, 1.0 / d, jnp.array([[-1, -1, -1.]]),
                        jnp.array([[1, 1, 1.]]), jnp.array([INF]))
    assert not bool(np.asarray(hit)[0])


def test_aabb_inside_hit():
    o = jnp.array([[0, 0, 0.]])
    d = jnp.array([[0, 0, 1.]])
    hit = ray_aabb_test(o, 1.0 / d, jnp.array([[-1, -1, -1.]]),
                        jnp.array([[1, 1, 1.]]), jnp.array([INF]))
    assert bool(np.asarray(hit)[0])


def test_aabb_distance_pruning():
    # Box starts at t=4; an existing hit at t=2 must prune it.
    o = jnp.array([[0, 0, -5.]])
    d = jnp.array([[0, 0, 1.]])
    hit = ray_aabb_test(o, 1.0 / d, jnp.array([[-1, -1, -1.]]),
                        jnp.array([[1, 1, 1.]]), jnp.array([2.0]))
    assert not bool(np.asarray(hit)[0])


def test_barycentric_vertices():
    v0 = jnp.array([[0, 0, 0.]])
    v1 = jnp.array([[1, 0, 0.]])
    v2 = jnp.array([[0, 1, 0.]])
    assert np.allclose(np.asarray(barycentric(v0, v0, v1, v2))[0], [1, 0, 0],
                       atol=1e-6)
    assert np.allclose(np.asarray(barycentric(v1, v0, v1, v2))[0], [0, 1, 0],
                       atol=1e-6)
    mid = (v0 + v1 + v2) / 3.0
    assert np.allclose(np.asarray(barycentric(mid, v0, v1, v2))[0],
                       [1 / 3] * 3, atol=1e-6)


def test_traversal_matches_bruteforce(cornell_scene):
    s = cornell_scene
    cam = s.cameras[0]
    h = w = 16
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    pix = jnp.stack([xs, ys], -1).reshape(-1, 2)
    seed = seed_from_pixel(jnp.array([12345, 67890], jnp.uint32), pix)
    o, d, _ = generate_ray(jnp.asarray(cam.world_matrix), cam.yfov, pix,
                           (w, h), seed)
    tb, ob, rb = intersect_bruteforce(s, o, d)
    tt, ot, rt = jax.jit(intersect_scene)(s, o, d)
    _assert_hits_equal(tb, ob, rb, tt, ot, rt)


def _assert_hits_equal(tb, ob, rb, tt, ot, rt):
    """Hits must agree up to FMA-contraction ULPs: t within 1e-6
    relative; where the chosen primitive differs, the two t values must
    be a genuine near-tie."""
    tb, tt = np.asarray(tb), np.asarray(tt)
    ob, ot = np.asarray(ob), np.asarray(ot)
    rb, rt = np.asarray(rb), np.asarray(rt)
    np.testing.assert_allclose(tb, tt, rtol=1e-5, atol=1e-7)
    diff = (rb != rt) | (ob != ot)
    ties = np.abs(tb - tt) <= 1e-5 * np.abs(tb) + 1e-7
    assert (ties | ~diff).all(), "primitive mismatch without a t tie"


def test_traversal_random_directions(cornell_scene, rng):
    s = cornell_scene
    n = 256
    o = jnp.asarray(rng.uniform(-1, 1, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    tb, ob, rb = intersect_bruteforce(s, o, d)
    tt, ot, rt = jax.jit(intersect_scene)(s, o, d)
    _assert_hits_equal(tb, ob, rb, tt, ot, rt)
