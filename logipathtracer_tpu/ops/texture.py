"""Texture atlas sampling.

The reference binds up to 512 separate combined image samplers
(shaders/path_tracing.comp:105) and lets fixed-function hardware do
bilinear filtering.  TPU has no samplers: all images live in one padded
atlas (scene/compile.py:_pack_textures) and filtering is four gathers +
a lerp.  No mipmapping — the reference samples at implicit LOD 0 from a
compute shader, so this matches.
"""

from __future__ import annotations

import jax.numpy as jnp

WRAP_REPEAT = 10497
WRAP_CLAMP = 33071
WRAP_MIRROR = 33648


def _wrap(coord, size, mode):
    """Apply wrap mode to unnormalized texel coordinates [..,] int32."""
    sizef = size.astype(jnp.float32)
    c = coord
    repeat = jnp.mod(c, size)
    clamp = jnp.clip(c, 0, size - 1)
    period = 2 * size
    m = jnp.mod(jnp.mod(c, period) + period, period)
    mirror = jnp.where(m < size, m, period - 1 - m)
    return jnp.where(mode == WRAP_CLAMP, clamp,
                     jnp.where(mode == WRAP_MIRROR, mirror, repeat))


def sample_atlas(atlas, table, tex_id, uv):
    """Bilinear texture fetch.

    atlas:  [AH, AW, 4] f32.
    table:  [NT, 6] i32 (x, y, w, h, wrap_s, wrap_t).
    tex_id: [...] int32 (callers mask out id < 0 themselves).
    uv:     [..., 2] f32.
    Returns [..., 4] f32.
    """
    safe_id = jnp.maximum(tex_id, 0)
    entry = jnp.take(table, safe_id, axis=0)  # [..., 6]
    x0, y0 = entry[..., 0], entry[..., 1]
    w, h = entry[..., 2], entry[..., 3]
    ws, wt = entry[..., 4], entry[..., 5]

    # GL linear filtering: sample point at uv*size - 0.5.
    fx = uv[..., 0] * w.astype(jnp.float32) - 0.5
    fy = uv[..., 1] * h.astype(jnp.float32) - 0.5
    ix = jnp.floor(fx)
    iy = jnp.floor(fy)
    ax = (fx - ix)[..., None]
    ay = (fy - iy)[..., None]
    ix = ix.astype(jnp.int32)
    iy = iy.astype(jnp.int32)

    aw = atlas.shape[1]

    def fetch(px, py):
        px = _wrap(px, w, ws) + x0
        py = _wrap(py, h, wt) + y0
        flat = py * aw + px
        return jnp.take(atlas.reshape(-1, 4), flat, axis=0)

    c00 = fetch(ix, iy)
    c10 = fetch(ix + 1, iy)
    c01 = fetch(ix, iy + 1)
    c11 = fetch(ix + 1, iy + 1)
    top = c00 * (1 - ax) + c10 * ax
    bot = c01 * (1 - ax) + c11 * ax
    return top * (1 - ay) + bot * ay
