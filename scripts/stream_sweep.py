"""(tile, chunk) sweep of the streamed compact kernel on a real
outside-scene bounce pool (dumped by stage_profile --dump).

Each config is a fresh kernel compile (~2-5 min on axon); run with
run_in_background.  python scripts/stream_sweep.py
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", "tests",
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from logipathtracer_tpu.config import RenderConfig
from logipathtracer_tpu.ops.traverse import intersect_scene_stream
from logipathtracer_tpu.scene.compile import compile_scene
from logipathtracer_tpu.scene.procedural import make_outside_scene


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pool", default="/tmp/outside_pool.npz")
    ap.add_argument("--it", type=int, default=3)
    ap.add_argument("--configs",
                    default="4096:16:128,4096:32:128,4096:64:128,"
                            "2048:32:128,8192:32:128,4096:32:256")
    args = ap.parse_args()

    cfg = RenderConfig()
    scene = compile_scene(make_outside_scene(), cfg)
    dat = np.load(args.pool)
    o_b = jnp.asarray(dat[f"o{args.it}"])
    d_b = jnp.asarray(dat[f"d{args.it}"])
    r = o_b.shape[0]

    base = None
    for spec in args.configs.split(","):
        tile, chunk, cap = (int(x) for x in spec.split(":"))
        f = jax.jit(lambda oo, dd, t=tile, ch=chunk, cp=cap:
                    intersect_scene_stream(scene, oo, dd, eps=cfg.eps,
                                           tile=t, chunk=ch, cap=cp))
        t0 = time.perf_counter()
        bt, _, _ = f(o_b, d_b)
        s0 = float(np.asarray(jnp.sum(jnp.where(bt < 1e29, bt, 0))))
        comp = time.perf_counter() - t0
        n = 5
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(o_b, d_b)
        float(np.asarray(out[0])[0])
        dt = (time.perf_counter() - t0) / n
        if base is None:
            base = s0
        tag = "OK" if abs(s0 - base) / max(abs(base), 1) < 1e-4 else \
            f"SUM DRIFT {s0} vs {base}"
        print(f"tile={tile} chunk={chunk} cap={cap}: {dt * 1e3:7.1f} ms "
              f"({r / dt / 1e6:5.2f} Mrays/s)  compile {comp:.0f}s  {tag}",
              flush=True)


if __name__ == "__main__":
    main()
