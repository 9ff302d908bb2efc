"""Probe: Möller-Trumbore as an MXU matmul vs the VPU elementwise form.

MT is bilinear in (ray features, triangle features):
  det   = d·(e2×e1)
  u_num = m·e2 − d·(e2×v0)          with m = o×d
  v_num = −m·e1 − d·(v0×e1)
  t_num = o·(e1×e2) − v0·(e1×e2)
so [det|u|v|t] for a whole (rays × tris) block is F[R,10] @ G[10,4T]
(ray features [d, m, o, 1]) — MXU work instead of ~50 VPU ops, at K=10
utilization.  This script measures both forms in isolated Pallas
kernels at sweep-kernel shapes, plus matmul precision variants.

python scripts/mxu_mt_probe.py
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

from logipathtracer_tpu.ops.pallas.cluster_intersect import _mt_cluster

INF = 3.4e38


def _time(f, *args, n=20):
    r = jax.block_until_ready(f(*args))
    # one-element fetch sync (axon relay)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    leaf = jax.tree_util.tree_leaves(r)[0]
    float(jnp.sum(leaf.reshape(-1)[0:1]))
    return (time.perf_counter() - t0) / n


def vpu_kernel(rays_ref, tris_ref, out_ref, *, reps, T, S):
    acc = jnp.zeros((T, 128), jnp.float32)

    def body(i, acc):
        t = _mt_cluster(rays_ref[0], rays_ref[1], rays_ref[2],
                        rays_ref[3], rays_ref[4], rays_ref[5],
                        tris_ref[i], 1e-4)
        tm = jnp.min(jnp.where(t > 0, t, INF), axis=1)
        return acc + tm.reshape(T // 128, 128).sum(0)[None, :] * 0 \
            + tm.reshape(T, 128 // 128 * 1)[:, :1] * 0 \
            if False else acc + tm.reshape(T, 1)[:, 0:1] * jnp.ones((T, 128))

    # simpler: accumulate min-t into acc
    def body2(i, acc):
        t = _mt_cluster(rays_ref[0], rays_ref[1], rays_ref[2],
                        rays_ref[3], rays_ref[4], rays_ref[5],
                        tris_ref[i], 1e-4)
        tm = jnp.min(jnp.where(t > 0, t, INF), axis=1)  # [T]
        return acc + tm.reshape(T // 128, 128)[:1, :]

    acc = jax.lax.fori_loop(0, reps, body2, jnp.zeros((1, 128)))
    out_ref[...] = acc


def mxu_kernel(feat_ref, g_ref, out_ref, *, reps, T, S, prec):
    def body(i, acc):
        # [T, 16] @ [16, 4S] -> det | u_num | v_num | t_num blocks
        prod = jax.lax.dot_general(
            feat_ref[...], g_ref[i],
            (((1,), (0,)), ((), ())),
            precision=prec, preferred_element_type=jnp.float32)
        det = prod[:, 0:S]
        un = prod[:, S:2 * S]
        vn = prod[:, 2 * S:3 * S]
        tn = prod[:, 3 * S:4 * S]
        inv = 1.0 / det
        u = un * inv
        v = vn * inv
        t = tn * inv
        miss = (u < 0.0) | (u > 1.0) | (v < 0.0) | (u + v > 1.0)
        t = jnp.where(miss, INF, t)
        tm = jnp.min(jnp.where(t > 0, t, INF), axis=1)
        return acc + tm.reshape(T // 128, 128)[:1, :]

    acc = jax.lax.fori_loop(0, reps, body, jnp.zeros((1, 128)))
    out_ref[...] = acc


def main():
    rng = np.random.default_rng(0)
    S = 256
    C = 64
    reps = C
    for T in (128, 512, 1024):
        rays = jnp.asarray(rng.normal(size=(6, T)).astype(np.float32))
        tris = jnp.asarray(rng.normal(size=(C, 9, S)).astype(np.float32))
        f = pl.pallas_call(
            functools.partial(vpu_kernel, reps=reps, T=T, S=S),
            grid=(32,),
            in_specs=[pl.BlockSpec((6, T), lambda i: (0, 0)),
                      pl.BlockSpec((C, 9, S), lambda i: (0, 0, 0))],
            out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32))
        dt = _time(f, rays, tris)
        pairs = 32 * reps * T * S
        print(f"VPU  T={T:5d} S={S}: {dt*1e3:7.2f} ms  "
              f"{pairs/dt/1e9:7.1f} Gpairs/s", flush=True)

        feat = jnp.asarray(rng.normal(size=(T, 16)).astype(np.float32))
        g = jnp.asarray(rng.normal(size=(C, 16, 4 * S)).astype(np.float32))
        for prec in ("highest", "default"):
            pv = (jax.lax.Precision.HIGHEST if prec == "highest"
                  else jax.lax.Precision.DEFAULT)
            fm = pl.pallas_call(
                functools.partial(mxu_kernel, reps=reps, T=T, S=S, prec=pv),
                grid=(32,),
                in_specs=[pl.BlockSpec((T, 16), lambda i: (0, 0)),
                          pl.BlockSpec((C, 16, 4 * S),
                                       lambda i: (0, 0, 0))],
                out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0)),
                out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32))
            dt = _time(fm, feat, g)
            print(f"MXU({prec:7s}) T={T:5d}: {dt*1e3:7.2f} ms  "
                  f"{pairs/dt/1e9:7.1f} Gpairs/s", flush=True)


if __name__ == "__main__":
    main()
