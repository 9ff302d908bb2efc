"""Next-event estimation (cfg.nee — beyond the reference): unbiasedness
vs BSDF-only sampling and variance reduction."""

import jax.numpy as jnp
import numpy as np

from logipathtracer_tpu.config import RenderConfig
from logipathtracer_tpu.render.megakernel import render_sample
from logipathtracer_tpu.render.wavefront import render_wavefront


def _render_many(scene, cfg, n, seed0=100):
    cam = scene.cameras[0]
    imgs = []
    for i in range(n):
        imgs.append(np.asarray(render_sample(
            scene, cfg, jnp.asarray(cam.world_matrix),
            jnp.float32(cam.yfov),
            jnp.asarray([seed0 + 7 * i, seed0 + 13 * i], jnp.uint32))))
    return np.stack(imgs)


def test_light_table(cornell_scene):
    s = cornell_scene
    assert s.num_lights > 0
    assert s.total_light_area > 0
    lt = np.asarray(s.light_tris)
    assert (lt[:s.num_lights, 12] > 0).all()
    cdf = np.asarray(s.light_cdf)
    assert abs(cdf[s.num_lights - 1] - 1.0) < 1e-5


def test_nee_unbiased_and_lower_variance(cornell_scene):
    base = RenderConfig(width=12, height=12, max_depth=4, intersect="bvh")
    n = 24
    off = _render_many(cornell_scene, base, n)
    on = _render_many(cornell_scene, base.replace(nee=True), n)
    mean_off = off.mean(axis=0)
    mean_on = on.mean(axis=0)
    # Unbiasedness: the two estimators agree within MC error on the
    # image mean (loose tolerance; n is small).
    assert abs(mean_on.mean() - mean_off.mean()) < 0.25 * mean_off.mean()
    # Variance reduction on diffusely lit pixels (image-average).
    var_off = off.var(axis=0).mean()
    var_on = on.var(axis=0).mean()
    assert var_on < var_off, (var_on, var_off)


def test_nee_wavefront_matches_megakernel(cornell_scene):
    cfg = RenderConfig(width=16, height=16, max_depth=3, intersect="bvh",
                       nee=True)
    cam = cornell_scene.cameras[0]
    seeds = [[31, 47]]
    wf, _ = render_wavefront(
        cornell_scene, cfg, jnp.asarray(cam.world_matrix),
        jnp.float32(cam.yfov), jnp.asarray(seeds, jnp.uint32), pool=256)
    mk = np.asarray(render_sample(
        cornell_scene, cfg, jnp.asarray(cam.world_matrix),
        jnp.float32(cam.yfov), jnp.asarray(seeds[0], jnp.uint32)))
    close = np.isclose(np.asarray(wf), mk, rtol=1e-4, atol=1e-6).all(axis=-1)
    assert close.mean() > 0.99
