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
