"""TPU-native progressive Monte Carlo path tracer.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
PrimozLavric/LogiPathTracer (C++17 / Vulkan / GLSL): a progressive,
unidirectional path tracer for glTF 2.0 scenes with a two-level BVH,
Heitz multiple-scattering microfacet BSDFs, and interactive progressive
accumulation.  The reference's two GPU backends (compute megakernel +
RTX pipeline) collapse here into one TPU wavefront architecture; the
Vulkan host runtime is replaced by the XLA runtime + jit.

Reference layer map: see SURVEY.md.
"""

from logipathtracer_tpu.config import RenderConfig
from logipathtracer_tpu.scene.gltf import load_gltf
from logipathtracer_tpu.scene.compile import compile_scene

__version__ = "0.1.0"

__all__ = ["RenderConfig", "load_gltf", "compile_scene", "__version__"]
