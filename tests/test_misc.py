"""Small-surface coverage: config staticness, camera rays, sort keys."""

import jax
import jax.numpy as jnp
import numpy as np

from logipathtracer_tpu.config import RenderConfig
from logipathtracer_tpu.ops.camera import generate_ray
from logipathtracer_tpu.ops.rng import seed_from_pixel
from logipathtracer_tpu.render.megakernel import ray_sort_key


def test_config_is_hashable_static_arg():
    a = RenderConfig(width=8, height=8)
    b = RenderConfig(width=8, height=8)
    assert hash(a) == hash(b) and a == b  # jit cache-key requirement
    assert a.replace(max_depth=3) != a
    assert a.render_width == 8 and a.replace(render_scale=2).render_width == 16


def test_generate_ray_directions_unit_and_forward(cornell_scene):
    cam = cornell_scene.cameras[0]
    h = w = 8
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    pix = jnp.stack([xs, ys], -1).reshape(-1, 2)
    seed = seed_from_pixel(jnp.asarray([3, 5], jnp.uint32), pix)
    o, d, seed2 = generate_ray(jnp.asarray(cam.world_matrix), cam.yfov,
                               pix, (w, h), seed)
    d = np.asarray(d)
    assert np.allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-6)
    # Camera looks down -X into the box; all rays share that hemisphere.
    assert (d[:, 0] < 0).all()
    # Origin is the camera position for every ray.
    assert np.allclose(np.asarray(o), cam.world_matrix[:3, 3], atol=1e-6)
    # Exactly two rands consumed per ray.
    assert (np.asarray(seed2) == np.asarray(seed) + 2).all()


def test_ray_sort_key_octant_major(cornell_scene):
    o = jnp.zeros((8, 3), jnp.float32)
    dirs = np.zeros((8, 3), np.float32)
    for i in range(8):
        dirs[i] = [1 if i & 4 else -1, 1 if i & 2 else -1,
                   1 if i & 1 else -1]
    keys = np.asarray(ray_sort_key(cornell_scene, o, jnp.asarray(dirs)))
    # Distinct octants produce distinct, octant-ordered key groups.
    assert len(set(keys >> 15)) == 8
    assert (np.argsort(keys) == np.arange(8)).all()


def test_ray_sort_key_locality(cornell_scene):
    # Nearby origins with the same direction sort near each other.
    rng = np.random.default_rng(0)
    o = rng.uniform(-1, 1, (256, 3)).astype(np.float32)
    d = np.tile(np.asarray([[0.0, 0.0, 1.0]], np.float32), (256, 1))
    keys = np.asarray(ray_sort_key(cornell_scene, jnp.asarray(o),
                                   jnp.asarray(d)))
    order = np.argsort(keys, kind="stable")
    so = o[order]
    # Mean hop distance after sorting is well below random ordering.
    hop_sorted = np.linalg.norm(np.diff(so, axis=0), axis=1).mean()
    hop_random = np.linalg.norm(np.diff(o, axis=0), axis=1).mean()
    assert hop_sorted < 0.6 * hop_random
