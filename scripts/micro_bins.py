"""Microbenchmarks for the binning pipeline building blocks (on TPU).

Measures, at bench scale (R=1M rays, C=81 clusters):
  * slab prepass [R, C] elementwise,
  * jnp.cumsum([R, C], axis=0) rank computation,
  * per-ray K-slot extraction (K one-hot passes over [R, C]),
  * scatter of R*K pair slots (mostly dropped) into a P-sized array,
  * scatter-min / gather of P pair results back to rays.

Usage: python scripts/micro_bins.py  (runs on the default TPU device)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

R = 1 << 20
C = 81
K = 8
PCAP = 4 * R


def _scalarize(fn):
    """Wrap fn so the jitted graph reduces outputs to one scalar —
    otherwise timings measure the axon host-tunnel fetch, not compute."""
    @jax.jit
    def wrapped(*args):
        out = fn(*args)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
    return wrapped


def timeit(name, fn, *args, n=5):
    fs = _scalarize(fn)
    float(np.asarray(fs(*args)))  # compile + sync
    t0 = time.perf_counter()
    for _ in range(n):
        r = fs(*args)
    float(np.asarray(r))
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:34s} {dt:8.2f} ms")
    return fn(*args)


def main():
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.uniform(-5, 5, (R, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32))
    inv12 = jnp.asarray(rng.normal(size=(C, 12)).astype(np.float32))
    aabb = jnp.asarray(
        np.concatenate([rng.uniform(-6, 0, (C, 3)),
                        rng.uniform(0, 6, (C, 3))], 1).astype(np.float32))

    def slab(o, d, inv12, aabb):
        ox, oy, oz = o[:, 0:1], o[:, 1:2], o[:, 2:3]
        dx, dy, dz = d[:, 0:1], d[:, 1:2], d[:, 2:3]
        m = [inv12[:, i][None, :] for i in range(12)]
        lox = m[0] * ox + m[1] * oy + m[2] * oz + m[3]
        loy = m[4] * ox + m[5] * oy + m[6] * oz + m[7]
        loz = m[8] * ox + m[9] * oy + m[10] * oz + m[11]
        ldx = m[0] * dx + m[1] * dy + m[2] * dz
        ldy = m[4] * dx + m[5] * dy + m[6] * dz
        ldz = m[8] * dx + m[9] * dy + m[10] * dz
        ix, iy, iz = 1.0 / ldx, 1.0 / ldy, 1.0 / ldz
        nx = (aabb[None, :, 0] - lox) * ix
        fx = (aabb[None, :, 3] - lox) * ix
        ny = (aabb[None, :, 1] - loy) * iy
        fy = (aabb[None, :, 4] - loy) * iy
        nz = (aabb[None, :, 2] - loz) * iz
        fz = (aabb[None, :, 5] - loz) * iz
        t0 = jnp.maximum(jnp.maximum(jnp.minimum(nx, fx),
                                     jnp.minimum(ny, fy)),
                         jnp.minimum(nz, fz))
        t1 = jnp.minimum(jnp.minimum(jnp.maximum(nx, fx),
                                     jnp.maximum(ny, fy)),
                         jnp.maximum(nz, fz))
        return (t0 <= t1) & ((t0 > 0.0) | (t1 > 0.0))

    mask = timeit("slab prepass [R,C]", slab, o, d, inv12, aabb)
    mask = jax.jit(slab)(o, d, inv12, aabb)
    print("  mean passes/ray:", float(np.asarray(
        jnp.sum(mask.astype(jnp.float32)))) / R)

    def rank_cumsum(mask):
        return jnp.cumsum(mask.astype(jnp.int32), axis=0)

    timeit("cumsum [R,C] axis0 i32", rank_cumsum, mask)

    def extract_k(mask):
        crank = jnp.cumsum(mask.astype(jnp.int32), axis=1) - mask
        cid = jnp.arange(C, dtype=jnp.int32)[None, :]
        outs = []
        for k in range(K):
            sel = mask & (crank == k)
            outs.append(jnp.sum(jnp.where(sel, cid, 0), axis=1)
                        + jnp.where(jnp.any(sel, axis=1), 0, C))
        return jnp.stack(outs, 1)

    timeit("K-slot extract [R,K]", extract_k, mask)

    dest = jnp.asarray(
        rng.integers(0, PCAP, (R, K)).astype(np.int32))
    valid = jnp.asarray(rng.random((R, K)) < 0.22)
    vals = jnp.asarray(rng.integers(0, R, (R, K)).astype(np.int32))

    def scatter_pairs(dest, valid, vals):
        dd = jnp.where(valid, dest, PCAP).reshape(-1)
        return jnp.full((PCAP,), R, jnp.int32).at[dd].set(
            vals.reshape(-1), mode="drop")

    timeit("scatter R*K pair slots", scatter_pairs, dest, valid, vals)

    P = 2 * R
    pray = jnp.asarray(rng.integers(0, R, (P,)).astype(np.int32))
    pt = jnp.asarray(rng.random((P,)).astype(np.float32))

    def scatter_min(pray, pt):
        return jnp.full((R + 1,), np.inf, jnp.float32).at[pray].min(pt)

    timeit("scatter-min P->R", scatter_min, pray, pt)

    def gather_pairs(o, d, pray):
        oo = jnp.take(o, pray, axis=0)
        dd = jnp.take(d, pray, axis=0)
        return oo + dd

    timeit("gather P pair rays [P,6]", gather_pairs, o, d, pray)

    key = jnp.asarray(rng.integers(0, 1 << 22, (R,)).astype(np.int32))

    def full_sort(key):
        return jax.lax.sort_key_val(key, jnp.arange(R, dtype=jnp.int32))

    timeit("lax.sort 1M keys (ref)", full_sort, key)


if __name__ == "__main__":
    main()
