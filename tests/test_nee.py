"""Next-event estimation with MIS (cfg.nee — beyond the reference):
consistency vs BSDF-only sampling and variance reduction.

The balance heuristic is EXACT for the basic BSDF mode (cosine-sampled
diffuse; f implied by the reference's weight F0*cos) and approximate
for the Heitz multiple-scattering diffuse (documented in shade_step)."""

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
    # Consistency: the two estimators agree within MC error on the
    # image mean (loose tolerance; n is small, and the Heitz-mode light
    # sample is a documented Lambert approximation).
    assert abs(mean_on.mean() - mean_off.mean()) < 0.25 * mean_off.mean()
    # Variance reduction on diffusely lit pixels (image-average).
    var_off = off.var(axis=0).mean()
    var_on = on.var(axis=0).mean()
    assert var_on < var_off, (var_on, var_off)


def _three_estimators(scene, base, n, seed0=900):
    off = _render_many(scene, base, n, seed0=seed0)
    pure = _render_many(scene, base.replace(nee=True, nee_mis=False), n,
                        seed0=seed0)
    mis = _render_many(scene, base.replace(nee=True), n, seed0=seed0)
    return off, pure, mis


def test_mis_basic_mode_consistent_and_best(cornell_scene):
    """Basic BSDF mode, cornell: the MIS math is exact — the three
    estimators (pure BSDF, classic NEE, MIS) agree on the mean; MIS
    strictly beats pure BSDF sampling and never does meaningfully worse
    than classic NEE (which is near-optimal for cornell's panel light —
    MIS's strict win over NEE is shown on the close-light scene below;
    VERDICT r1 item 9)."""
    base = RenderConfig(width=12, height=12, max_depth=4, intersect="bvh",
                        use_microfacet=False)
    off, pure, mis = _three_estimators(cornell_scene, base, 32)
    m_off, m_pure, m_mis = (x.mean() for x in (off, pure, mis))
    # All three unbiased in basic mode: means agree within MC error.
    assert abs(m_pure - m_off) < 0.2 * m_off, (m_pure, m_off)
    assert abs(m_mis - m_off) < 0.2 * m_off, (m_mis, m_off)
    v_off = off.var(axis=0).mean()
    v_pure = pure.var(axis=0).mean()
    v_mis = mis.var(axis=0).mean()
    assert v_mis < v_off, (v_mis, v_off)
    assert v_mis < 1.05 * v_pure, (v_mis, v_pure)


def test_mis_beats_classic_nee_on_close_light():
    """Large light close to the receiver: the light-sample estimator is
    high-variance (contribution swings with 1/dist^2 and grazing
    cosines across the light's area) while BSDF cosine sampling is
    smooth — classic NEE throws the smooth estimator away, MIS keeps
    it.  MIS must strictly beat classic NEE here."""
    from logipathtracer_tpu.scene.compile import compile_scene
    from logipathtracer_tpu.scene.gltf import (CameraNode, Gltf, Material,
                                               MeshNode, Primitive)
    from logipathtracer_tpu.scene.procedural import _look_at, _quad

    materials = [
        Material(name="white",
                 base_color_factor=np.array([0.8, 0.8, 0.8, 1],
                                            np.float32),
                 metallic_factor=0.0, roughness_factor=0.5),
        Material(name="light",
                 emissive_factor=np.array([6, 6, 6], np.float32),
                 metallic_factor=0.0, roughness_factor=1.0),
    ]
    nodes = []
    for nm, center, size, mat in [("floor", (0, 0, 0), 8.0, 0),
                                  ("lamp", (0, 0.4, 0), 6.0, 1)]:
        tris, nrm, uvs = _quad(center, size, 1)
        nodes.append(MeshNode(name=nm,
                              world_matrix=np.eye(4, dtype=np.float32),
                              primitives=[Primitive(tris, nrm, uvs, mat)]))
    cam = CameraNode(name="camera",
                     world_matrix=_look_at((0, 0.2, 2.0), (0, 0.0, 0)),
                     yfov=0.9)
    gltf = Gltf(mesh_nodes=nodes, cameras=[cam], materials=materials,
                textures=[], name="closelight")
    scene = compile_scene(gltf)

    base = RenderConfig(width=10, height=10, max_depth=3, intersect="bvh",
                        use_microfacet=False)
    off, pure, mis = _three_estimators(scene, base, 32, seed0=500)
    v_pure = pure.var(axis=0).mean()
    v_mis = mis.var(axis=0).mean()
    assert v_mis < v_pure, (v_mis, v_pure)
    m_off, m_pure, m_mis = (x.mean() for x in (off, pure, mis))
    assert abs(m_mis - m_off) < 0.25 * m_off, (m_mis, m_off)
    assert abs(m_pure - m_off) < 0.25 * m_off, (m_pure, m_off)


def test_nee_wavefront_matches_megakernel(cornell_scene):
    cfg = RenderConfig(width=16, height=16, max_depth=3, intersect="bvh",
                       nee=True)
    cam = cornell_scene.cameras[0]
    seeds = [[31, 47]]
    wf, _, _ = render_wavefront(
        cornell_scene, cfg, jnp.asarray(cam.world_matrix),
        jnp.float32(cam.yfov), jnp.asarray(seeds, jnp.uint32), pool=256)
    mk = np.asarray(render_sample(
        cornell_scene, cfg, jnp.asarray(cam.world_matrix),
        jnp.float32(cam.yfov), jnp.asarray(seeds[0], jnp.uint32)))
    close = np.isclose(np.asarray(wf), mk, rtol=1e-4, atol=1e-6).all(axis=-1)
    assert close.mean() > 0.99


def test_shadow_tmax_matches_full_query(cornell_scene):
    """The t_max shadow query must agree with the plain closest-hit
    query on the visibility predicate."""
    import jax

    from logipathtracer_tpu.ops.traverse import intersect_scene

    rng = np.random.default_rng(11)
    n = 256
    o = jnp.asarray(rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    dist = jnp.asarray(rng.uniform(0.1, 2.0, n).astype(np.float32))
    t_full, _, _ = jax.jit(intersect_scene)(cornell_scene, o, d)
    t_lim, _, _ = jax.jit(intersect_scene)(cornell_scene, o, d,
                                           t_max=dist)
    vis_full = np.asarray(t_full) >= np.asarray(dist)
    vis_lim = np.asarray(t_lim) >= np.asarray(dist)
    np.testing.assert_array_equal(vis_full, vis_lim)
