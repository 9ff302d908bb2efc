"""Multi-chip parallel rendering over a jax.sharding.Mesh.

The reference is strictly single-GPU (SURVEY.md §2.4: no multi-device
code of any kind); distribution is introduced fresh here, the TPU way:

  * 2-D device mesh ``(samples, tiles)``:
      - the ``samples`` axis is sample-parallel (each slice renders the
        same pixels with different per-sample host seeds — the
        progressive loop unrolled across chips; zero communication
        during rendering, one reduction when the image is fetched);
      - the ``tiles`` axis is tile-parallel (disjoint row slabs of the
        frame; zero communication, concatenation at fetch).
  * the scene SoA is replicated (cornell ~1.6 MB ≪ HBM per chip);
  * collectives: a single psum over ``samples`` inside the sharded
    image-fetch, riding ICI.  No custom comm layer is warranted for an
    embarrassingly parallel renderer (SURVEY.md §5.8).

Pixel RNG streams are keyed by absolute pixel coordinates and the
per-sample ubo seed, so every (sample, tile) shard computes exactly the
pixels a single-device progressive run would — sharding changes wall
clock, not radiance.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from logipathtracer_tpu.config import RenderConfig
from logipathtracer_tpu.render.megakernel import render_rows


def make_mesh(devices=None, samples: int | None = None,
              tiles: int | None = None) -> Mesh:
    """Build a (samples, tiles) mesh from the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if samples is None and tiles is None:
        tiles = 1
        samples = n
    elif samples is None:
        samples = n // tiles
    elif tiles is None:
        tiles = n // samples
    assert samples * tiles == n, (samples, tiles, n)
    arr = np.array(devices).reshape(samples, tiles)
    return Mesh(arr, ("samples", "tiles"))


class MeshRenderer:
    """Progressive accumulation sharded over a 2-D mesh.

    State: accum [S, H, W, 3] with the S axis sharded over ``samples``
    and H over ``tiles``.  Every step() renders S more samples (one per
    sample-slice)."""

    def __init__(self, scene, config: RenderConfig, mesh: Mesh,
                 camera=None, host_seed: int = 0):
        self.mesh = mesh
        self.scene = scene
        self.config = config
        cam = camera or scene.cameras[0]
        self.camera_world = np.asarray(cam.world_matrix, np.float32)
        self.fov_y = float(cam.yfov)
        self._host_rng = np.random.default_rng(host_seed)
        s = mesh.shape["samples"]
        t = mesh.shape["tiles"]
        h, w = config.render_height, config.render_width
        assert h % t == 0, f"height {h} not divisible by tile axis {t}"
        self.sample_count = 0
        sharding = NamedSharding(mesh, P("samples", "tiles"))
        self.accum = jax.device_put(jnp.zeros((s, h, w, 3), jnp.float32),
                                    sharding)
        self._step = _build_step(mesh, config, scene)

    def step(self, reset: bool = False):
        s = self.mesh.shape["samples"]
        seeds = jnp.asarray(
            self._host_rng.integers(1, 2 ** 31, (s, 2), dtype=np.int64),
            jnp.uint32)
        if reset:
            self.sample_count = 0
        self.accum, rays = self._step(
            self.scene, jnp.asarray(self.camera_world),
            jnp.float32(self.fov_y), seeds, self.accum,
            jnp.asarray(reset or self.sample_count == 0))
        self.sample_count += s
        return rays

    def radiance(self) -> np.ndarray:
        """Mean radiance [H, W, 3]: psum over the samples axis."""
        total = jnp.sum(self.accum, axis=0)  # GSPMD inserts the reduce
        return np.asarray(total) / max(self.sample_count, 1)


def _build_step(mesh: Mesh, cfg: RenderConfig, scene):
    """Jitted sharded step: (scene, cam, fov, seeds[S,2],
    accum[S,H,W,3], reset) -> (accum', rays).

    Each (sample, tile) shard renders its row slab via the megakernel;
    with a pure sample-parallel mesh (tiles == 1) and the wavefront
    renderer selected, shards run the pooled wavefront instead."""
    t = mesh.shape["tiles"]
    rows_local = cfg.render_height // t
    use_wavefront = (cfg.renderer == "wavefront"
                     or (cfg.renderer == "auto"
                         and jax.default_backend() == "tpu")) and t == 1

    scene_specs = jax.tree.map(lambda _: P(), scene)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(scene_specs, P(), P(), P("samples"),
                       P("samples", "tiles"), P()),
             out_specs=(P("samples", "tiles"), P("samples")),
             check_vma=False)
    def sharded(scene, cam, fov, seeds, accum, reset):
        if use_wavefront:
            from logipathtracer_tpu.render.wavefront import render_wavefront
            img, rays = render_wavefront.__wrapped__(
                scene, cfg, cam, fov, seeds,
                pool=min(cfg.pool_size,
                         cfg.render_width * cfg.render_height))
        else:
            tile = jax.lax.axis_index("tiles")
            y0 = (tile * rows_local).astype(jnp.int32)
            img, rays = render_rows(scene, cfg, cam, fov, seeds[0], y0,
                                    rows_local)
        new = jnp.where(reset, img[None], accum + img[None])
        return new, rays[None]

    return jax.jit(sharded, donate_argnums=(4,))
