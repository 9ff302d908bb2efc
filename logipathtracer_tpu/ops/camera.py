"""Camera ray generation (shaders/path_tracing.comp:107-127).

Pinhole camera from the camera node's world matrix columns + vertical
FOV, with a tent-filter sub-pixel jitter (2 rands per ray).  Pixel
coordinates follow gl_GlobalInvocationID: x = column, y = row counted
from the top; the display transform flips vertically
(tex_to_quad.frag:25).
"""

from __future__ import annotations

import jax.numpy as jnp

from logipathtracer_tpu.ops.rng import rand_parity_masked


def generate_ray(cam_world, fov_y, pixel_xy, resolution, seed, active=None,
                 rand=rand_parity_masked):
    """Tent-jittered primary rays.

    cam_world: [4, 4] camera world matrix (column-vector convention;
      GLSL worldMatrix[i] is column i).
    pixel_xy:  [..., 2] float32 pixel indices (x=col, y=row).
    resolution: (width, height) python ints.
    seed: [..., 2] uint32 parity-RNG state. Consumes 2 rands.

    Returns (origin [..., 3], direction [..., 3], seed').
    """
    if active is None:
        active = jnp.ones(pixel_xy.shape[:-1], bool)
    res = jnp.asarray(resolution, jnp.float32)

    r1, seed = rand(seed, active)
    r2, seed = rand(seed, active)
    r1 = 2.0 * r1
    r2 = 2.0 * r2
    jx = jnp.where(r1 < 1.0, jnp.sqrt(r1) - 1.0, 1.0 - jnp.sqrt(2.0 - r1))
    jy = jnp.where(r2 < 1.0, jnp.sqrt(r2) - 1.0, 1.0 - jnp.sqrt(2.0 - r2))
    jitter = jnp.stack([jx, jy], -1) / (res * 0.5)

    uv = 2.0 * pixel_xy / res - 1.0 + jitter
    aspect = res[0] / res[1]
    tan_half = jnp.tan(fov_y / 2.0)
    ux = uv[..., 0] * aspect * tan_half
    uy = uv[..., 1] * tan_half

    # GLSL columns: worldMatrix[0/1/2].xyz = right/up/backward,
    # worldMatrix[3].xyz = position (path_tracing.comp:118-124).
    right = cam_world[:3, 0]
    up = cam_world[:3, 1]
    back = cam_world[:3, 2]
    origin = jnp.broadcast_to(cam_world[:3, 3], uv.shape[:-1] + (3,))

    direction = ux[..., None] * right + uy[..., None] * up - back
    direction = direction / jnp.linalg.norm(direction, axis=-1, keepdims=True)
    return origin, direction, seed
