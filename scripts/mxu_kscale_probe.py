"""Does MXU matmul cost scale with K (contraction dim <= 128)?

Decides whether block-diagonal K-packing of the bilinear MT form is a
real round-3 lever: if [T,16]@[16,N] costs the same as [T,128]@[128,N]
(weight-stationary array, idle K rows ride free), then K=16 is already
optimal and packing is pointless; if cost grows with K, packing is
strictly worse.  Either way the measured number replaces the 'K=10
wastes 92%' guess.

python scripts/mxu_kscale_probe.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _time(f, *args, n=30):
    r = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(r)[0].reshape(-1)[0:1]))
    return (time.perf_counter() - t0) / n


def kernel(a_ref, b_ref, out_ref, *, reps, prec):
    def body(i, acc):
        p = jax.lax.dot_general(
            a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
            precision=prec, preferred_element_type=jnp.float32)
        return acc + p[0:1, 0:128]

    out_ref[...] = jax.lax.fori_loop(0, reps, body, jnp.zeros((1, 128)))


def main():
    rng = np.random.default_rng(0)
    T, N, reps, grid = 1024, 1024, 64, 16
    for prec_name, prec in (("default", jax.lax.Precision.DEFAULT),
                            ("highest", jax.lax.Precision.HIGHEST)):
        for K in (8, 16, 32, 64, 128, 256):
            a = jnp.asarray(rng.normal(size=(T, K)).astype(np.float32))
            b = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32))
            f = pl.pallas_call(
                functools.partial(kernel, reps=reps, prec=prec),
                grid=(grid,),
                in_specs=[pl.BlockSpec((T, K), lambda i: (0, 0)),
                          pl.BlockSpec((K, N), lambda i: (0, 0))],
                out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0)),
                out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32))
            dt = _time(f, a, b)
            mm = grid * reps
            print(f"{prec_name:7s} K={K:3d}: {dt*1e3:7.2f} ms "
                  f"({dt/mm*1e6:6.2f} us/matmul, "
                  f"{mm*T*N*K/dt/1e12:6.2f} Tmac/s)", flush=True)


if __name__ == "__main__":
    main()
