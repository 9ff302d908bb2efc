"""Counter-style RNG streams.

Two generators:

* ``rand_parity`` — bit-faithful reimplementation of the reference's
  GLSL hash (shaders/common/random.glsl:9-15): a per-pixel uvec2 state
  advanced by (1,1) per draw, hashed through two LCG-style multiplies.
  Needed for equal-seed comparisons against the reference renderer,
  including its quirks (pixel rows/columns whose seed component is 0
  produce degenerate streams — SURVEY.md §2.2 RNG row).

* threefry via jax.random — the default high-quality path for
  non-parity rendering (config.parity_rng=False).

Parity state layout: uint32 array [..., 2] (the GLSL uvec2). Every
draw returns (value_f32, new_state). Masked draws advance only the
lanes where mask is True — the vectorized equivalent of the scalar
control flow deciding whether rand() is called at all.
"""

from __future__ import annotations

import jax.numpy as jnp

_MUL = jnp.uint32(1103515245)
# float(0xffffffffu) rounds to 4.2949673e9 in f32; the reference divides
# by it (random.glsl:14).
_INV = jnp.float32(1.0) / jnp.float32(4294967295.0)


def seed_from_pixel(ubo_seed: jnp.ndarray, pixel_xy: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel stream seed: ubo.seed * pixel.xy with u32 wraparound
    (path_tracing.comp:341, rtx/raygen.rgen:35)."""
    return (ubo_seed.astype(jnp.uint32) * pixel_xy.astype(jnp.uint32))


def rand_parity(state: jnp.ndarray):
    """One draw: state [..., 2] u32 → (value [...] f32 in [0,1], state')."""
    state = state + jnp.uint32(1)
    sx, sy = state[..., 0], state[..., 1]
    qx = _MUL * ((sx >> jnp.uint32(1)) ^ sy)
    qy = _MUL * ((sy >> jnp.uint32(1)) ^ sx)
    n = _MUL * (qx ^ (qy >> jnp.uint32(3)))
    return n.astype(jnp.float32) * _INV, state


def rand_parity_masked(state: jnp.ndarray, mask: jnp.ndarray):
    """Draw for all lanes but advance state only where mask is True."""
    value, new_state = rand_parity(state)
    keep = mask[..., None]
    return value, jnp.where(keep, new_state, state)
