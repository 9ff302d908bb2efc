"""Fused Pallas shading kernel vs the jnp oracle path.

The kernel (ops/pallas/shade.py) must reproduce shade_step exactly for
the configuration it covers (untextured, non-NEE, Heitz): same RNG
stream consumption, same radiance, same scattered rays.  Run here in
interpret mode on the CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from logipathtracer_tpu.config import RenderConfig
from logipathtracer_tpu.ops.camera import generate_ray
from logipathtracer_tpu.ops.rng import seed_from_pixel
from logipathtracer_tpu.ops.traverse import intersect_scene
from logipathtracer_tpu.render.megakernel import shade_step


def _hit_state(scene, n=512, seed0=7):
    cfg = RenderConfig(width=64, height=64, max_depth=5,
                       intersect="bvh", renderer="megakernel")
    h = w = 64
    ys, xs = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    pix = jnp.asarray(np.stack([xs, ys], -1).reshape(-1, 2)[:n])
    seed = seed_from_pixel(jnp.asarray([48271, 16807], jnp.uint32), pix)
    origin, direction, seed = generate_ray(
        jnp.asarray(scene.cameras[0].world_matrix),
        jnp.float32(scene.cameras[0].yfov), pix, (w, h), seed)
    t, obj, tri = intersect_scene(scene, origin, direction, eps=cfg.eps)
    return cfg, origin, direction, seed, t, obj, tri


@pytest.mark.parametrize("parity", [True, False])
def test_shade_kernel_matches_jnp(cornell_scene, parity):
    scene = cornell_scene
    n = 512
    cfg0, origin, direction, seed, t, obj, tri = _hit_state(scene, n)
    acc = jnp.zeros((n, 3))
    mask = jnp.ones((n, 3))
    alive = jnp.asarray(np.random.default_rng(3).random(n) < 0.9)
    prev_pdf = jnp.zeros((n,), jnp.float32)
    bounce = jnp.asarray(
        np.random.default_rng(5).integers(0, 8, n), jnp.int32)

    outs = {}
    for mode in ("jnp", "shade_interpret"):
        cfg = cfg0.replace(shade=mode, parity_rng=parity, shade_tile=256)
        outs[mode] = shade_step(scene, cfg, origin, direction, acc, mask,
                                alive, seed, bounce, t, obj, tri,
                                prev_pdf=prev_pdf)

    names = ("origin", "direction", "acc", "mask", "alive", "seed",
             "prev_pdf")
    ordered = {n: (np.asarray(a), np.asarray(b)) for n, a, b in zip(
        names, outs["jnp"], outs["shade_interpret"])}
    # Hard invariants first: identical RNG streams and masks (these
    # encode the control flow — any drift here is a real bug).
    for name in ("seed", "alive", "prev_pdf"):
        np.testing.assert_array_equal(*ordered[name], err_msg=name)
    # Floats: 3-term dot products associate differently between the
    # fused kernel and jnp.sum, and the 16-order walk amplifies the
    # ULPs; require closeness and a tiny mismatch fraction.
    for name in ("origin", "direction", "acc", "mask"):
        a, b = ordered[name]
        close = np.isclose(a, b, rtol=2e-5, atol=2e-6)
        assert close.mean() > 0.995, (
            f"{name}: {(~close).mean():.2%} mismatched")
        np.testing.assert_allclose(a, b, rtol=2e-2, atol=1e-4,
                                   err_msg=name)


def test_shade_kernel_scalar_bounce(cornell_scene):
    """The megakernel loop passes a scalar bounce index."""
    scene = cornell_scene
    n = 256
    cfg0, origin, direction, seed, t, obj, tri = _hit_state(scene, n)
    acc = jnp.zeros((n, 3))
    mask = jnp.ones((n, 3))
    alive = jnp.ones((n,), bool)
    for mode in ("jnp", "shade_interpret"):
        cfg = cfg0.replace(shade=mode, shade_tile=256)
        out = shade_step(scene, cfg, origin, direction, acc, mask,
                         alive, seed, jnp.int32(4), t, obj, tri)
        assert np.isfinite(np.asarray(out[2])).all()


@pytest.mark.parametrize("mis", [True, False])
def test_shade_kernel_nee_matches_jnp(cornell_scene, mis):
    """Round-3: the fused kernel covers NEE (in-kernel light sampling,
    shadow setup, walk eval hook, MIS emission weighting).  Same RNG
    streams and radiance as the jnp NEE path."""
    scene = cornell_scene
    n = 512
    cfg0, origin, direction, seed, t, obj, tri = _hit_state(scene, n)
    acc = jnp.zeros((n, 3))
    mask = jnp.ones((n, 3))
    alive = jnp.asarray(np.random.default_rng(3).random(n) < 0.9)
    prev_pdf = jnp.asarray(
        np.random.default_rng(11).random(n).astype(np.float32) * 0.3)
    bounce = jnp.asarray(
        np.random.default_rng(5).integers(0, 8, n), jnp.int32)
    from logipathtracer_tpu.ops.traverse import intersect_scene

    def isect(s, o, d, eps, t_max=None, any_hit=False):
        return intersect_scene(s, o, d, eps=eps, t_max=t_max,
                               any_hit=any_hit)

    outs = {}
    for mode in ("jnp", "shade_interpret"):
        cfg = cfg0.replace(shade=mode, nee=True, nee_mis=mis,
                           shade_tile=256)
        outs[mode] = shade_step(scene, cfg, origin, direction, acc, mask,
                                alive, seed, bounce, t, obj, tri,
                                prev_pdf=prev_pdf, isect=isect)

    names = ("origin", "direction", "acc", "mask", "alive", "seed",
             "prev_pdf")
    ordered = {n_: (np.asarray(a), np.asarray(b)) for n_, a, b in zip(
        names, outs["jnp"], outs["shade_interpret"])}
    for name in ("seed", "alive"):
        np.testing.assert_array_equal(*ordered[name], err_msg=name)
    for name in ("origin", "direction", "acc", "mask", "prev_pdf"):
        a, b = ordered[name]
        close = np.isclose(a, b, rtol=2e-5, atol=2e-6)
        assert close.mean() > 0.99, (
            f"{name}: {(~close).mean():.2%} mismatched")
        np.testing.assert_allclose(a, b, rtol=2e-2, atol=1e-4,
                                   err_msg=name)


def test_shade_kernel_textured_matches_jnp():
    """Round-3: textured configs run the fused kernel with an XLA
    texture-resolution prologue (base/emissive/metallic-roughness/
    transmission taps + normal map).  Identical RNG streams and
    matching radiance vs the jnp path."""
    import numpy as np

    from logipathtracer_tpu.scene.compile import compile_scene
    from logipathtracer_tpu.scene.gltf import (CameraNode, Gltf, Material,
                                               MeshNode, Primitive,
                                               TextureData)
    from logipathtracer_tpu.scene.procedural import _look_at, _quad

    rng = np.random.default_rng(0)
    checker = np.zeros((8, 8, 4), np.uint8)
    checker[..., 3] = 255
    checker[::2, ::2, 0] = 255
    checker[1::2, 1::2, 2] = 255
    # Mid-grey-biased random normal map (z-heavy, valid directions).
    nm = np.stack([rng.integers(96, 160, (8, 8)),
                   rng.integers(96, 160, (8, 8)),
                   rng.integers(200, 256, (8, 8)),
                   np.full((8, 8), 255)], axis=-1).astype(np.uint8)
    mr_tex = np.zeros((4, 4, 4), np.uint8)
    mr_tex[..., 1] = 180  # roughness channel
    mr_tex[..., 2] = 90   # metallic channel
    mr_tex[..., 3] = 255

    tris, nrm, uvs = _quad((0, 0, 0), 2.0, 2)
    mats = [Material(name="tex", base_color_factor=np.ones(4, np.float32),
                     metallic_factor=0.4, roughness_factor=0.5,
                     base_color_texture=0, normal_texture=1,
                     metallic_roughness_texture=2)]
    node = MeshNode(name="quad", world_matrix=np.eye(4, dtype=np.float32),
                    primitives=[Primitive(tris, nrm, uvs, 0)])
    cam = CameraNode(name="cam",
                     world_matrix=_look_at((0.3, 0.2, 3), (0, 0, 0)),
                     yfov=0.9)
    gltf = Gltf(mesh_nodes=[node], cameras=[cam], materials=mats,
                textures=[TextureData(pixels=checker),
                          TextureData(pixels=nm),
                          TextureData(pixels=mr_tex)],
                name="textured_quad")
    scene = compile_scene(gltf, RenderConfig(width=32, height=32))
    assert scene.has_textures

    n = 512
    cfg0, origin, direction, seed, t, obj, tri = _hit_state(scene, n)
    acc = jnp.zeros((n, 3))
    mask = jnp.ones((n, 3))
    alive = jnp.asarray(np.random.default_rng(3).random(n) < 0.9)
    bounce = jnp.asarray(
        np.random.default_rng(5).integers(0, 8, n), jnp.int32)

    outs = {}
    for mode in ("jnp", "shade_interpret"):
        cfg = cfg0.replace(shade=mode, shade_tile=256)
        outs[mode] = shade_step(scene, cfg, origin, direction, acc, mask,
                                alive, seed, bounce, t, obj, tri)
    names = ("origin", "direction", "acc", "mask", "alive", "seed",
             "prev_pdf")
    ordered = {n_: (np.asarray(a), np.asarray(b)) for n_, a, b in zip(
        names, outs["jnp"], outs["shade_interpret"])}
    for name in ("seed", "alive"):
        np.testing.assert_array_equal(*ordered[name], err_msg=name)
    for name in ("origin", "direction", "acc", "mask"):
        a, b = ordered[name]
        close = np.isclose(a, b, rtol=2e-5, atol=2e-6)
        assert close.mean() > 0.99, (
            f"{name}: {(~close).mean():.2%} mismatched")
        np.testing.assert_allclose(a, b, rtol=2e-2, atol=1e-4,
                                   err_msg=name)


def test_shade_tri_sel_matches_gather(monkeypatch):
    """The in-kernel shade-table selection (shade.py tri_sel: exact
    one-hot matmul against the VMEM-resident split table) must be
    BIT-identical to the [R, 64] XLA gather form it replaces — every
    output including RNG state.  Needs a genuinely small scene (the
    cornell fixture's 13k tris exceed the SHADE_SEL_MAX_TRIS gate)."""
    import logipathtracer_tpu.render.megakernel as mk
    from logipathtracer_tpu.scene.compile import compile_scene
    from logipathtracer_tpu.scene.procedural import make_box_scene

    scene = compile_scene(make_box_scene(spheres=1, subdiv=1))
    assert 0 < scene.tri_shade.shape[0] <= mk.SHADE_SEL_MAX_TRIS
    n = 512
    cfg0, origin, direction, seed, t, obj, tri = _hit_state(scene, n)
    cfg = cfg0.replace(shade="shade_interpret", shade_tile=256)
    acc = jnp.zeros((n, 3))
    mask = jnp.ones((n, 3))
    alive = jnp.asarray(np.random.default_rng(3).random(n) < 0.9)
    prev_pdf = jnp.zeros((n,), jnp.float32)
    bounce = jnp.asarray(
        np.random.default_rng(5).integers(0, 8, n), jnp.int32)

    args = (scene, cfg, origin, direction, acc, mask, alive, seed,
            bounce, t, obj, tri)
    out_sel = shade_step(*args, prev_pdf=prev_pdf)
    monkeypatch.setattr(mk, "SHADE_SEL_MAX_TRIS", 0)  # force gather form
    out_gather = shade_step(*args, prev_pdf=prev_pdf)
    for name, a, b in zip(("origin", "direction", "acc", "mask", "alive",
                           "seed", "prev_pdf"), out_sel, out_gather):
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype.kind == "f":
            assert (a.view(np.int32) == b.view(np.int32)).all(), name
        else:
            np.testing.assert_array_equal(a, b, err_msg=name)
