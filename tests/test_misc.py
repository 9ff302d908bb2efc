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


def test_checkpoint_path_normalized(tmp_path, cornell_scene):
    """Extension-less checkpoint paths resolve to the .npz file np.savez
    actually writes, so resume finds its own checkpoints."""
    import os

    from logipathtracer_tpu.render.progressive import ProgressiveRenderer

    cfg = RenderConfig(width=8, height=8, max_depth=1, renderer="megakernel")
    r = ProgressiveRenderer(cornell_scene, cfg, host_seed=3)
    r.step(1)
    p = str(tmp_path / "ckpt")          # no extension
    r.checkpoint(p)
    assert os.path.exists(r.checkpoint_path(p))
    r2 = ProgressiveRenderer(cornell_scene, cfg, host_seed=99)
    r2.restore(p)
    assert r2.sample_count == 1
    np.testing.assert_array_equal(np.asarray(r2.accum), np.asarray(r.accum))


def test_signed_normalized_accessor_clamps_to_minus_one():
    """glTF signed-normalized decode: max(v/maxval, -1) per the spec, so
    int16 -32768 is exactly -1.0, not -1.00003."""
    import base64

    from logipathtracer_tpu.scene.gltf import _read_accessor

    vals = np.array([-32768, -16384, 0, 32767], np.int16)
    doc = {
        "bufferViews": [{"buffer": 0, "byteOffset": 0}],
        "accessors": [{"componentType": 5122, "type": "SCALAR",
                       "count": 4, "bufferView": 0, "normalized": True}],
    }
    out = _read_accessor(doc, [vals.tobytes()], 0)
    assert out[0] == -1.0
    assert out[-1] == 1.0
    assert (out >= -1.0).all() and (out <= 1.0).all()


def test_fused_stack_bound_is_validated(cornell_scene):
    """The compile-time stack guard: exact traversal need never exceeds
    the static max_stack the device walk allocates."""
    from logipathtracer_tpu.scene.compile import _exact_stack_need

    need = _exact_stack_need(np.asarray(cornell_scene.fused_meta))
    assert need <= cornell_scene.max_stack
