"""Primitive costs behind the wavefront maintenance passes (v5e).

Measures, at pool sizes 2^20 and 2^18:
  1. key compute + lax.sort_key_val (i32 key, i32 perm)
  2. row gather jnp.take of [P, 17] / [P, 7] / [P, 4]
  3. scatter-add accum.at[pixid].add(3 cols) at P, P/4, P/8 rows
  4. Pallas GROUP permutation: move [128, 17] blocks via a
     scalar-prefetched group perm (pure DMA pipeline)
  (an in-kernel within-group row-sort variant was abandoned:
   Mosaic rejects the rank-3 broadcasts it wants, and the BlockSpec-
   indexed group DMA underneath it is the slow part anyway)

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

        # Variadic sort: key + 17 payload columns in ONE lax.sort —
        # the candidate replacement for sort_key_val + wide row gather
        # (production sort stage).  Also measured on a nearly-sorted
        # key (the steady-state pool is close to sorted already).
        cols17 = tuple(x17[:, i] for i in range(17))
        f_vs = jax.jit(lambda k, *cs: jax.lax.sort(
            (k,) + cs, num_keys=1))
        dt = timeit(f_vs, key, *cols17)
        print(f"variadic sort 1k+17v:   {dt * 1e3:7.2f} ms "
              f"({dt / p * 1e9:5.1f} ns/row)", flush=True)
        key_ns = jnp.sort(key) + jnp.asarray(
            rng.integers(0, 2, p), jnp.int32)  # nearly sorted
        dt = timeit(f_vs, key_ns, *cols17)
        print(f"  (near-sorted key):    {dt * 1e3:7.2f} ms "
              f"({dt / p * 1e9:5.1f} ns/row)", flush=True)
        f_g17 = jax.jit(lambda pr, x: jnp.take(x, pr, axis=0))
        perm_ns = f_sort(key_ns)
        dt = timeit(f_g17, perm_ns, x17)
        print(f"row gather near-sorted: {dt * 1e3:7.2f} ms "
              f"({dt / p * 1e9:5.1f} ns/row)", flush=True)

        # Block-granularity gather: permute 8-row blocks as single
        # [136]-wide rows (the block-sort candidate: 8x fewer rows).
        xb = x17.reshape(p // 8, 8 * 17)
        bperm = jnp.asarray(rng.permutation(p // 8), jnp.int32)
        f_bg = jax.jit(lambda pr, x: jnp.take(x, pr, axis=0))
        dt = timeit(f_bg, bperm, xb)
        print(f"block gather [P/8,136]: {dt * 1e3:7.2f} ms "
              f"({dt / p * 1e9:5.1f} ns/pool-row)", flush=True)

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

        # sorted-index scatter (the production flush tail after the
        # round-3 pixid-keyed retired sort): sparse ascending indices
        n = p // 8
        pixid_sorted = jnp.sort(pixid[:n])
        f_ss = jax.jit(lambda a, pid, v: a.at[pid].add(
            v[:n], indices_are_sorted=True))
        dt = timeit(f_ss, accum, pixid_sorted, acc3)
        print(f"scatter-add P/8 SORTED:  {dt * 1e3:7.2f} ms "
              f"({dt / n * 1e9:5.1f} ns/row)", flush=True)
        f_su = jax.jit(lambda a, pid, v: a.at[pid].add(v[:n]))
        dt = timeit(f_su, accum, pixid_sorted, acc3)
        print(f"  (same data, no promise): {dt * 1e3:6.2f} ms "
              f"({dt / n * 1e9:5.1f} ns/row)", flush=True)

        g = p // 128
        gperm = jnp.asarray(rng.permutation(g), jnp.int32)
        f_gp = jax.jit(lambda pr, x: group_permute(x, pr))
        dt = timeit(f_gp, gperm, x17)
        print(f"group DMA permute [P,17]: {dt * 1e3:5.2f} ms "
              f"({dt / p * 1e9:5.1f} ns/row, "
              f"{2 * p * 17 * 4 / dt / 2**30:.0f} GiB/s)", flush=True)

        # bin-matmul flush kernel vs the P/8-row sorted scatter above
        if jax.default_backend() == "tpu":
            from logipathtracer_tpu.ops.pallas.flush import flush_bins
            fc = p // 4
            nret = p // 8
            pixs = jnp.concatenate([
                jnp.full((fc - nret,), -1, jnp.int32),
                jnp.sort(pixid[:nret])])
            f_fb = jax.jit(lambda a, pid, v: flush_bins(a, pid, v[:fc]))
            dt = timeit(f_fb, accum, pixs, acc3)
            print(f"flush_bins P/8 rows:     {dt * 1e3:7.2f} ms "
                  f"({dt / nret * 1e9:5.1f} ns/row)", flush=True)


if __name__ == "__main__":
    main()
