"""Hash the lowered MLIR of the production jit graphs (CPU tracing).

Used to prove that a refactor (e.g. dead-knob pruning) leaves every
default-config traced graph BYTE-IDENTICAL: identical StableHLO means
identical behavior on every backend AND identical persistent-cache
keys (the axon cache key is blake3(mlir || compile_options)), so a
warm TPU cache stays warm across the refactor.

Run before and after, diff the output:

  python scripts/graph_hash.py > /tmp/hashes_before.txt
  ... refactor ...
  python scripts/graph_hash.py > /tmp/hashes_after.txt
  diff /tmp/hashes_before.txt /tmp/hashes_after.txt

Graphs covered (the shapes bench.py + the viewer compile):
  cornell 1024^2 wavefront chunk + drain, ray-query intersect jit,
  outside-class 512^2 chunk, nee+textured 512^2 chunk, megakernel
  render_sample 128^2 (the graft entry).
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402


def h(name, fn, *args, static_argnums=()):
    """Hash the closed jaxpr of fn(*args) (Pallas kernels cannot LOWER
    on the CPU backend, but tracing to jaxpr works and captures the
    full program, including pallas_call kernel jaxprs and params —
    identical jaxpr => identical MLIR => identical cache key)."""
    jaxpr = jax.make_jaxpr(fn, static_argnums=static_argnums)(*args)
    text = jaxpr.pretty_print()
    print(f"{name}: {hashlib.sha256(text.encode()).hexdigest()[:24]}  "
          f"({len(text)} chars)", flush=True)


def main() -> int:
    from logipathtracer_tpu.config import RenderConfig
    from logipathtracer_tpu.render.megakernel import (pick_intersect,
                                                      render_sample,
                                                      sorted_intersect)
    from logipathtracer_tpu.render.wavefront import (wavefront_chunk,
                                                     wavefront_drain,
                                                     wavefront_pool_state)
    from logipathtracer_tpu.scene.compile import compile_scene
    from logipathtracer_tpu.scene.gltf import load_gltf
    from logipathtracer_tpu.scene.procedural import (make_box_scene,
                                                     make_outside_scene)

    gltf = load_gltf("/root/reference/resources/cornell_box.gltf")

    # TPU-production knobs forced on a CPU trace: what bench compiles.
    def tpu_cfg(**kw):
        kw.setdefault("shade", "pallas")
        return RenderConfig(renderer="wavefront", intersect="compact",
                            **kw)

    configs = [
        ("cornell_1024", tpu_cfg(width=1024, height=1024, max_depth=10),
         gltf, 16),
        ("outside_512", tpu_cfg(width=512, height=512, max_depth=10),
         make_outside_scene(), 16),
        ("nee_tex_512", tpu_cfg(width=512, height=512, max_depth=10,
                                nee=True, shade="auto"),
         make_box_scene(spheres=6, subdiv=3, textured=True), 16),
    ]
    for name, cfg, g, chunk in configs:
        scene = compile_scene(g, cfg)
        npix = cfg.render_width * cfg.render_height
        pool = min(cfg.pool_size, npix)
        state = wavefront_pool_state(pool, npix, cm=cfg.pool_cm)
        cam = jnp.asarray(scene.cameras[0].world_matrix)
        fov = jnp.float32(scene.cameras[0].yfov)
        seeds = jnp.ones((chunk, 2), jnp.uint32)
        h(f"{name}_chunk", wavefront_chunk, scene, cfg, cam, fov,
          seeds, state, static_argnums=(1,))
        h(f"{name}_drain", wavefront_drain, scene, cfg, state,
          static_argnums=(1,))

    # Ray query (bench headline extra).
    cfg = tpu_cfg(width=1024, height=1024, max_depth=10)
    scene = compile_scene(gltf, cfg)
    r = cfg.render_width * cfg.render_height
    o = jnp.ones((r, 3), jnp.float32)
    d = jnp.ones((r, 3), jnp.float32)
    isect = pick_intersect(cfg, scene)
    h("ray_query",
      lambda oo, dd: sorted_intersect(isect, scene, oo, dd,
                                      cfg.eps)[0].sum()[None], o, d)

    # Graft entry (megakernel render_sample 128^2, CPU-default path).
    cfg = RenderConfig(width=128, height=128, max_depth=10)
    scene = compile_scene(gltf, cfg)
    h("entry_128", render_sample, scene, cfg,
      jnp.asarray(scene.cameras[0].world_matrix),
      jnp.float32(scene.cameras[0].yfov),
      jnp.asarray([48271, 16807], jnp.uint32), static_argnums=(1,))
    return 0


if __name__ == "__main__":
    sys.exit(main())
