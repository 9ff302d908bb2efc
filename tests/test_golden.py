"""Golden-image regression (SURVEY.md §4: tiny deterministic scenes with
fixed seeds, per-pixel RMSE thresholds at equal spp)."""

import os

import numpy as np

from logipathtracer_tpu.config import RenderConfig
from logipathtracer_tpu.film.image import rmse
from logipathtracer_tpu.render.progressive import ProgressiveRenderer
from logipathtracer_tpu.scene.compile import compile_scene

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                      "cornell_64x64_4spp.npz")


def test_cornell_golden(cornell_gltf):
    cfg = RenderConfig(width=64, height=64, max_depth=10, intersect="bvh",
                       renderer="megakernel")
    scene = compile_scene(cornell_gltf, cfg, use_native=False)
    data = np.load(GOLDEN)
    r = ProgressiveRenderer(scene, cfg, host_seed=int(data["host_seed"]))
    r.step(int(data["sample_count"]))
    got = r.radiance()
    want = data["radiance"]
    err = rmse(got, want)
    # Same seeds, same tree: only cross-version transcendental ULP
    # drift is tolerable. MC noise at 4 spp is ~0.1; this is far below.
    assert err < 1e-3, f"golden RMSE {err}"


def test_golden_is_sane():
    data = np.load(GOLDEN)
    rad = data["radiance"]
    assert rad.shape == (64, 64, 3)
    assert np.isfinite(rad).all()
    assert 0.05 < rad.mean() < 0.5
    assert rad.max() > 1.0  # emissive panel
