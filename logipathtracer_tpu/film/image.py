"""Film / display transform.

Reimplements the reference's fullscreen tonemap pass
(shaders/tex_to_quad.frag:21-33): divide the RGBA32F accumulation by the
sample count, exposure-map 1 - exp(-hdr * 1.5), gamma 1/2.2, and flip
vertically (the frag shader samples uv = (u, 1 - v)).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def tonemap(accum: jnp.ndarray, sample_count: float,
            exposure: float = 1.5, gamma: float = 2.2,
            flip: bool = True) -> jnp.ndarray:
    """accum: [H, W, 3] float32 radiance sums → [H, W, 3] float32 in [0,1]."""
    hdr = accum * (1.0 / sample_count)
    mapped = 1.0 - jnp.exp(-hdr * exposure)
    mapped = jnp.power(jnp.maximum(mapped, 0.0), 1.0 / gamma)
    if flip:
        mapped = mapped[::-1]
    return mapped


def to_uint8(img) -> np.ndarray:
    arr = np.asarray(img)
    return np.clip(arr * 255.0 + 0.5, 0, 255).astype(np.uint8)


def srgb_to_linear(c: jnp.ndarray) -> jnp.ndarray:
    """Piecewise sRGB EOTF (shaders/common/util.glsl:4-16).

    The reference applies this to base color after factor x texture
    (path_tracing.comp:263).
    """
    return jnp.where(c <= 0.04045, c / 12.92,
                     jnp.power((c + 0.055) / 1.055, 2.4))


def linear_to_srgb(c: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(c <= 0.0031308, c * 12.92,
                     1.055 * jnp.power(jnp.maximum(c, 1e-12), 1 / 2.4) - 0.055)


def rmse(a, b) -> float:
    """Per-pixel RMSE between two images (the BASELINE.json parity metric)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.sqrt(np.mean((a - b) ** 2)))
