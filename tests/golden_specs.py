"""Shared spec table for the production-path goldens (VERDICT r3
item 5): used by scripts/make_goldens.py to generate and by
tests/test_golden.py to verify.  Each spec re-renders on the CPU
backend with fixed seeds; the compact worklist sweep runs its
interpret twin (tied to the TPU kernel by tests/test_tpu.py
bit-identity)."""

HOST_SEED = 7


def golden_specs():
    from logipathtracer_tpu.config import RenderConfig
    from logipathtracer_tpu.scene.gltf import load_gltf
    from logipathtracer_tpu.scene.procedural import (make_box_scene,
                                                     make_outside_scene)

    cornell = lambda: load_gltf(
        "/root/reference/resources/cornell_box.gltf")
    return {
        # Production wavefront: compact worklist sweep (interpret twin
        # of the TPU kernel), pooled regen/sort/flush, carryover across
        # two 2-spp chunks.
        "wavefront_cornell_64x64_4spp": dict(
            scene=cornell,
            cfg=RenderConfig(width=64, height=64, max_depth=10,
                             renderer="wavefront",
                             intersect="compact_interpret",
                             compact_tile=1024, compact_worklist=True,
                             pool_size=4096),
            chunks=(2, 2)),
        "cornell_nee_64x64_4spp": dict(
            scene=cornell,
            cfg=RenderConfig(width=64, height=64, max_depth=10,
                             renderer="wavefront", nee=True,
                             pool_size=4096),
            chunks=(4,)),
        "box_textured_64x64_2spp": dict(
            scene=lambda: make_box_scene(spheres=6, subdiv=3,
                                         textured=True),
            cfg=RenderConfig(width=64, height=64, max_depth=10,
                             renderer="wavefront", pool_size=4096),
            chunks=(2,)),
        "outside_64x64_2spp": dict(
            scene=make_outside_scene,
            cfg=RenderConfig(width=64, height=64, max_depth=10,
                             renderer="wavefront", pool_size=4096),
            chunks=(2,)),
    }
