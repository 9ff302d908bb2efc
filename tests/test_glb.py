"""GLB (binary glTF) container support."""

import json
import struct

import numpy as np

from logipathtracer_tpu.scene.gltf import load_gltf


def _build_glb(tmp_path):
    """One triangle, embedded BIN chunk."""
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    nrm = np.tile(np.array([[0, 0, 1]], np.float32), (3, 1))
    blob = pos.tobytes() + nrm.tobytes()
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0, "name": "tri"}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "NORMAL": 1}, "material": 0}]}],
        "materials": [{"pbrMetallicRoughness": {
            "baseColorFactor": [1, 0, 0, 1], "metallicFactor": 0.0,
            "roughnessFactor": 0.5}}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3,
             "type": "VEC3", "min": [0, 0, 0], "max": [1, 1, 0]},
            {"bufferView": 1, "componentType": 5126, "count": 3,
             "type": "VEC3"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 36},
        ],
        "buffers": [{"byteLength": len(blob)}],
    }
    js = json.dumps(doc).encode()
    js += b" " * (-len(js) % 4)
    blob += b"\0" * (-len(blob) % 4)
    out = (struct.pack("<III", 0x46546C67, 2,
                       12 + 8 + len(js) + 8 + len(blob))
           + struct.pack("<II", len(js), 0x4E4F534A) + js
           + struct.pack("<II", len(blob), 0x004E4942) + blob)
    p = tmp_path / "tri.glb"
    p.write_bytes(out)
    return str(p)


def test_glb_roundtrip(tmp_path):
    path = _build_glb(tmp_path)
    g = load_gltf(path)
    assert g.triangle_count == 1
    prim = g.mesh_nodes[0].primitives[0]
    assert np.allclose(prim.positions[0, 1], [1, 0, 0])
    assert np.allclose(prim.normals[0, 0], [0, 0, 1])
    assert g.materials[0].base_color_factor[0] == 1.0
