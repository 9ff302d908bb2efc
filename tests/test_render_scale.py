"""renderScale supersampling (RendererConfiguration.renderScale,
src/RendererPT.cpp:254-255,532-533)."""

import numpy as np

from logipathtracer_tpu.config import RenderConfig
from logipathtracer_tpu.render.progressive import ProgressiveRenderer


def test_render_scale_dimensions(cornell_scene):
    cfg = RenderConfig(width=8, height=8, render_scale=2, max_depth=2,
                       intersect="bvh", renderer="megakernel")
    # NOTE: cornell_scene was compiled independent of cfg resolution —
    # scene SoA has no resolution dependence.
    r = ProgressiveRenderer(cornell_scene, cfg, host_seed=3)
    r.step(1)
    assert r.accum.shape == (16, 16, 3)       # supersampled buffer
    img = np.asarray(r.image())
    assert img.shape == (8, 8, 3)             # window-size display
    assert np.isfinite(img).all()


def test_render_scale_reduces_alias_noise(cornell_scene):
    base = RenderConfig(width=8, height=8, max_depth=2, intersect="bvh",
                        renderer="megakernel")
    r1 = ProgressiveRenderer(cornell_scene, base, host_seed=3)
    r1.step(1)
    r2 = ProgressiveRenderer(cornell_scene, base.replace(render_scale=2),
                             host_seed=3)
    r2.step(1)
    a = np.asarray(r1.image())
    b = np.asarray(r2.image())
    assert a.shape == b.shape
    assert (a != b).any()
