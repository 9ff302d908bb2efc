"""Progressive session: accumulate/reset protocol, camera motion,
checkpoint/resume (SURVEY.md §3.5, §5.4)."""

import os
import tempfile

import numpy as np

from logipathtracer_tpu.config import RenderConfig
from logipathtracer_tpu.render.progressive import ProgressiveRenderer

CFG = RenderConfig(width=16, height=16, max_depth=3, intersect="bvh",
                   renderer="megakernel")


def test_accumulation_reduces_variance(cornell_scene):
    r = ProgressiveRenderer(cornell_scene, CFG, host_seed=1)
    r.step(1)
    one = r.radiance()
    r.step(7)
    eight = r.radiance()
    assert r.sample_count == 8
    # Monte Carlo averaging: the 8-spp image differs and is not a
    # single-sample copy.
    assert (one != eight).any()
    assert np.isfinite(eight).all()


def test_camera_move_resets(cornell_scene):
    r = ProgressiveRenderer(cornell_scene, CFG, host_seed=1)
    r.step(3)
    assert r.sample_count == 3
    r.translate(2, -0.1)  # W key (src/Main.cpp:57-59)
    r.step(1)
    assert r.sample_count == 1  # reset protocol fired
    r.rotate(1, 0.05)
    r.step(1)
    assert r.sample_count == 1


def test_rotation_keeps_orthonormal(cornell_scene):
    r = ProgressiveRenderer(cornell_scene, CFG, host_seed=1)
    for _ in range(20):
        r.rotate(1, 0.1)
        r.rotate(0, -0.05)
    rot = r.camera_world[:3, :3]
    assert np.allclose(rot @ rot.T, np.eye(3), atol=1e-4)


def test_checkpoint_resume_bit_exact(cornell_scene):
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "ck.npz")
        a = ProgressiveRenderer(cornell_scene, CFG, host_seed=9)
        a.step(2)
        a.checkpoint(path)
        a.step(2)
        want = np.asarray(a.accum)

        b = ProgressiveRenderer(cornell_scene, CFG, host_seed=123)
        b.restore(path)
        assert b.sample_count == 2
        b.step(2)
        np.testing.assert_array_equal(np.asarray(b.accum), want)


def test_missing_camera_raises():
    import dataclasses
    import pytest
    scene = None
    from logipathtracer_tpu.scene.procedural import make_box_scene
    from logipathtracer_tpu.scene.compile import compile_scene
    gltf = make_box_scene(spheres=1, subdiv=0)
    gltf.cameras = []
    scene = compile_scene(gltf, CFG)
    with pytest.raises(ValueError, match="no camera"):
        ProgressiveRenderer(scene, CFG)


def test_step_nosync_matches_step(cornell_scene):
    """step_nosync defers only the counter fetches: radiance, sample
    count, and the settled ray totals must match step() exactly (same
    seeds => same chunks).  Uses the wavefront path, where the deferred
    bookkeeping lives."""
    cfg = RenderConfig(width=16, height=16, max_depth=3, intersect="bvh",
                       renderer="wavefront", pool_size=128)
    a = ProgressiveRenderer(cornell_scene, cfg, host_seed=3)
    b = ProgressiveRenderer(cornell_scene, cfg, host_seed=3)
    a.step(2)
    b.step_nosync(2)
    # Stats access settles the deferred counters.
    assert b.total_rays == a.total_rays
    assert b.sample_count == a.sample_count
    np.testing.assert_array_equal(a.radiance(), b.radiance())
    # Another chunk each way (mixed sync modes keep the totals linear).
    a.step_nosync(1)
    b.step(1)
    assert b.total_rays == a.total_rays
    np.testing.assert_array_equal(a.radiance(), b.radiance())


def test_image_u8_matches_host_quantization(cornell_scene):
    """image_u8 (device-side RGBA quantization, the viewer present
    path) must equal the host-side to_uint8(image()) + alpha fill."""
    from logipathtracer_tpu.film.image import to_uint8
    r = ProgressiveRenderer(cornell_scene, CFG, host_seed=2)
    r.step(2)
    host = to_uint8(np.asarray(r.image()))
    dev = np.asarray(r.image_u8())
    assert dev.shape == host.shape[:2] + (4,)
    np.testing.assert_array_equal(dev[..., :3], host)
    assert (dev[..., 3] == 255).all()
