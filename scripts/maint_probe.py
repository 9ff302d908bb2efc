"""Primitive costs behind the wavefront maintenance passes (v5e).

Measures, at pool sizes 2^20 and 2^18:
  1. key compute + lax.sort_key_val (i32 key, i32 perm)
  2. row gather jnp.take of [P, 17] / [P, 7] / [P, 4]
  3. scatter-add accum.at[pixid].add(3 cols) at P, P/4, P/8 rows
  4. Pallas GROUP permutation: move [128, 17] blocks via a
     scalar-prefetched group perm (pure DMA pipeline)
  5. 4 + in-kernel within-group row sort (compare-rank + split3
     one-hot matmul rows, bit-exact)

The numbers decide whether round 3's maintenance fusion is worth a
group-granular sort (VERDICT #2): XLA's row-granular gather/scatter
floors (~10-90 ns/row) vs block-DMA movement at HBM bandwidth.

python scripts/maint_probe.py [--pool 1048576]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", "tests",
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(f, *a, n=10):
    out = f(*a)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0]
          .astype(np.float32))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*a)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0]
          .astype(np.float32))
    return (time.perf_counter() - t0) / n


def group_permute(x, perm, groups_per_block: int = 8):
    """Permute 128-row groups of x [P, C] by perm [P/128] (DMA only)."""
    p, c = x.shape
    g = p // 128
    gb = groups_per_block

    def kern(perm_ref, x_ref, o_ref):
        o_ref[...] = x_ref[...]

    # one group per grid step (input block index from the prefetched
    # perm; Pallas double-buffers the block DMAs along the grid)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(g,),
            in_specs=[pl.BlockSpec((128, c), lambda i, pr: (pr[i], 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((128, c), lambda i, pr: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((p, c), x.dtype),
    )(perm, x)


def group_permute_sorted(x, keys, perm, blk_groups: int = 8):
    """Group DMA permute + within-group row sort by keys (bit-exact
    split3 one-hot rows).  keys [P] i32 arrive pre-permuted per group
    alongside x; each [blk*128] block sorts rows within each of its
    128-row groups independently."""
    from logipathtracer_tpu.ops.pallas.compact_intersect import _dot_onehot

    p, c = x.shape
    g = p // 128
    rows = blk_groups * 128

    def kern(perm_ref, x_ref, k_ref, o_ref):
        k = k_ref[...].reshape(blk_groups, 128)
        # rank of each row within its group (stable: index tie-break)
        ki = k[:, :, None]
        kj = k[:, None, :]
        idx = jax.lax.broadcasted_iota(jnp.int32, (1, 128, 128), 1)
        idxj = jax.lax.broadcasted_iota(jnp.int32, (1, 128, 128), 2)
        less = (kj < ki) | ((kj == ki) & (idxj < idx))
        rank = jnp.sum(less.astype(jnp.int32), axis=2)      # [B, 128]
        # one-hot [B, 128, 128]: out row r takes input row with rank r
        out_iota = jax.lax.broadcasted_iota(jnp.int32, (blk_groups, 128, 128), 1)
        oh = (rank[:, None, :] == out_iota).astype(jnp.float32)
        xb = x_ref[...].reshape(blk_groups, 128, c)
        acc = jnp.zeros((blk_groups, 128, c), jnp.float32)
        for b in range(blk_groups):
            acc = acc.at[b].set(_dot_onehot(oh[b], xb[b]))
        o_ref[...] = acc.reshape(rows, c)

    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(g // blk_groups,),
            in_specs=[
                pl.BlockSpec((rows, c), lambda i, pr: (pr[i], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rows,), lambda i, pr: (pr[i],),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((rows, c), lambda i, pr: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((p, c), x.dtype),
    )(perm, x, keys)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pools", default="1048576,262144")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    for p in [int(x) for x in args.pools.split(",")]:
        print(f"\n== pool {p} ==", flush=True)
        key = jnp.asarray(rng.integers(0, 1 << 18, p), jnp.int32)
        x17 = jnp.asarray(rng.standard_normal((p, 17)), jnp.float32)
        pixid = jnp.asarray(rng.integers(0, p, p), jnp.int32)
        accum = jnp.zeros((p, 3), jnp.float32)
        acc3 = jnp.asarray(rng.standard_normal((p, 3)), jnp.float32)

        f_sort = jax.jit(lambda k: jax.lax.sort_key_val(
            k, jnp.arange(p, dtype=jnp.int32))[1])
        perm = f_sort(key)
        dt = timeit(f_sort, key)
        print(f"sort_key_val i32:       {dt * 1e3:7.2f} ms "
              f"({dt / p * 1e9:5.1f} ns/row)", flush=True)

        for c in (17, 7, 4):
            f_g = jax.jit(lambda pr, x: jnp.take(x[:, :c], pr, axis=0))
            dt = timeit(f_g, perm, x17)
            print(f"row gather [P,{c:2d}]:      {dt * 1e3:7.2f} ms "
                  f"({dt / p * 1e9:5.1f} ns/row)", flush=True)

        for frac, nm in ((1, "P"), (4, "P/4"), (8, "P/8")):
            n = p // frac
            f_s = jax.jit(lambda a, pid, v: a.at[pid[:n]].add(v[:n]))
            dt = timeit(f_s, accum, pixid, acc3)
            print(f"scatter-add {nm:4s} rows:  {dt * 1e3:7.2f} ms "
                  f"({dt / n * 1e9:5.1f} ns/row)", flush=True)

        g = p // 128
        gperm = jnp.asarray(rng.permutation(g), jnp.int32)
        f_gp = jax.jit(lambda pr, x: group_permute(x, pr))
        dt = timeit(f_gp, gperm, x17)
        print(f"group DMA permute [P,17]: {dt * 1e3:5.2f} ms "
              f"({dt / p * 1e9:5.1f} ns/row, "
              f"{2 * p * 17 * 4 / dt / 2**30:.0f} GiB/s)", flush=True)

        gperm8 = jnp.asarray(rng.permutation(g // 8), jnp.int32)
        f_gs = jax.jit(lambda pr, x, k: group_permute_sorted(x, k, pr))
        dt = timeit(f_gs, gperm8, x17, key)
        print(f"group permute + in-sort:  {dt * 1e3:5.2f} ms "
              f"({dt / p * 1e9:5.1f} ns/row)", flush=True)

        # correctness of the in-kernel sort (one block)
        out = np.asarray(f_gs(gperm8, x17, key))
        kk = np.asarray(key).reshape(-1, 128)
        xx = np.asarray(x17)
        b0 = int(np.asarray(gperm8)[0])
        for gi in range(8):
            src = b0 * 8 + gi
            order = np.argsort(kk[src], kind="stable")
            ref = xx[src * 128:(src + 1) * 128][order]
            got = out[gi * 128:(gi + 1) * 128]
            assert np.array_equal(ref, got), f"group {gi} mismatch"
        print("in-kernel sort bit-exact: OK", flush=True)


if __name__ == "__main__":
    main()
