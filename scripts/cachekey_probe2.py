"""Is the REAL bench program's serialized module stable cross-process?

Lowers the production wavefront_chunk (cornell bench shapes) on the
axon backend — no compile — serializes the module exactly the way the
cache key does, and prints its hash.  Run twice, diff.  Writes the
serialized bytes to the given path for byte-level diffing when the
hashes differ.

python scripts/cachekey_probe2.py /tmp/wfmod_a.bin
"""

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

for var in ("XLA_FLAGS", "AXON_LIBTPU_OVERRIDES", "LIBTPU_INIT_ARGS"):
    os.environ.pop(var, None)

import jax
import jax.numpy as jnp
import numpy as np

from logipathtracer_tpu.config import RenderConfig
from logipathtracer_tpu.render.wavefront import (wavefront_chunk,
                                                 wavefront_pool_state)
from logipathtracer_tpu.scene.compile import compile_scene
from logipathtracer_tpu.scene.gltf import load_gltf


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/wfmod.bin"
    cfg = RenderConfig(width=1024, height=1024, max_depth=10)
    scene = compile_scene(
        load_gltf("/root/reference/resources/cornell_box.gltf"), cfg)
    ubo = jnp.asarray(np.random.default_rng(12345).integers(
        1, 2 ** 31, (16, 2)), jnp.uint32)
    state = wavefront_pool_state(cfg.pool_size, 1024 * 1024)
    cam = scene.cameras[0]
    lowered = wavefront_chunk.lower(
        scene, cfg, jnp.asarray(cam.world_matrix),
        jnp.float32(cam.yfov), ubo, state)
    txt = lowered.as_text()
    open(out_path + ".txt", "w").write(txt)
    print("mlir text", len(txt),
          hashlib.sha256(txt.encode()).hexdigest()[:16], flush=True)
    # The exact bytes _hash_computation feeds the key (canonicalized IR).
    from jax._src import cache_key as ck
    mod = lowered._lowering.stablehlo()
    ser = ck._serialize_ir(mod, ck.IgnoreCallbacks.NO)
    open(out_path, "wb").write(ser)
    print("serialized ir", len(ser),
          hashlib.sha256(ser).hexdigest()[:16], flush=True)


if __name__ == "__main__":
    main()
