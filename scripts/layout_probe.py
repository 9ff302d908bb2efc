"""Quantify the [P, 3] vs [3, P] layout tax of the wavefront pool.

The pool carries ray state as [P, 3] f32 arrays; TPU vector tiles are
(8, 128), so a 3-wide minor dim either pads 42x or forces relayouts at
every consumer (the shade prologue builds component-major [K, R] rows
via ~10 transposes measured at 3.4 ms/Mray; rays8 pays two more).
This probe times the primitive costs on hardware so the pool-layout
refactor decision is a measurement, not a guess:

  * transpose [P,3] -> [3,P] (what the shade/isect prologues do),
  * where-select on [P,3] vs [3,P] (the park/regen ops),
  * variadic-sort column slice origin[:, i] vs row slice [3,P][i],
  * a fused chain (select + scale + sum) in both layouts.

python scripts/layout_probe.py [--pool 20]  (log2 pool size)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / n
    print(f"  {name:34s} {dt*1e3:8.3f} ms", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pool", type=int, default=20)
    args = ap.parse_args()
    p = 1 << args.pool
    rng = np.random.default_rng(0)
    a_pm = jnp.asarray(rng.normal(size=(p, 3)).astype(np.float32))
    a_cm = jnp.asarray(np.asarray(a_pm).T.copy())
    b_pm = jnp.asarray(rng.normal(size=(p, 3)).astype(np.float32))
    b_cm = jnp.asarray(np.asarray(b_pm).T.copy())
    m = jnp.asarray(rng.random(p) < 0.5)
    print("device:", jax.devices()[0], " pool:", p, flush=True)

    t = jax.jit(lambda x: x.T + 0.0)
    timeit("transpose [P,3]->[3,P] (+0)", t, a_pm)
    t2 = jax.jit(lambda x: x.T + 0.0)
    timeit("transpose [3,P]->[P,3] (+0)", t2, a_cm)

    w_pm = jax.jit(lambda a, b, mm: jnp.where(mm[:, None], a, b))
    w_cm = jax.jit(lambda a, b, mm: jnp.where(mm[None, :], a, b))
    timeit("where-select [P,3]", w_pm, a_pm, b_pm, m)
    timeit("where-select [3,P]", w_cm, a_cm, b_cm, m)

    s_pm = jax.jit(lambda a: (a[:, 0] + a[:, 1] * 2.0 + a[:, 2]).sum())
    s_cm = jax.jit(lambda a: (a[0] + a[1] * 2.0 + a[2]).sum())
    timeit("column combine [P,3]", s_pm, a_pm)
    timeit("row combine    [3,P]", s_cm, a_cm)

    # the shade-prologue shape: concat K component rows from N [P,3]
    # arrays vs from N [3,P] arrays
    c_pm = jax.jit(lambda a, b: jnp.concatenate([a.T, b.T], axis=0) + 0.0)
    c_cm = jax.jit(lambda a, b: jnp.concatenate([a, b], axis=0) + 0.0)
    timeit("rows build from [P,3] x2", c_pm, a_pm, b_pm)
    timeit("rows build from [3,P] x2", c_cm, a_cm, b_cm)

    # full chain analog: park + select + pack
    f_pm = jax.jit(lambda a, b, mm: jnp.concatenate(
        [jnp.where(mm[:, None], 1e30, a).T,
         jnp.where(mm[:, None], 1.0, b).T], axis=0).sum())
    f_cm = jax.jit(lambda a, b, mm: jnp.concatenate(
        [jnp.where(mm[None, :], 1e30, a),
         jnp.where(mm[None, :], 1.0, b)], axis=0).sum())
    timeit("park+pack [P,3]", f_pm, a_pm, b_pm, m)
    timeit("park+pack [3,P]", f_cm, a_cm, b_cm, m)


if __name__ == "__main__":
    main()
