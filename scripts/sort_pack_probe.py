"""A/B the sort-permute formulations on hardware.

The shade_gather_probe discovery: XLA row gathers price per ROW
(~5 ns/row, flat in width up to 64 cols), while the variadic payload
sort pays ~0.6 ms per operand column per 1M rows.  If packing the 15
state columns into ONE [P, 16] matrix (and unpacking after) costs less
than the ~4 ms the gathers would save, the sort wall shrinks.

Variants (synthetic but realistically-keyed 1M pool):
  variadic   — production: lax.sort with 15 payload operands
  kv_wide    — sort_key_val on iota + ONE wide [P, 16] gather, with
               transpose-based pack/unpack ([16, P] -> [P, 16])
  kv_wide_nt — same but pack/unpack cost EXCLUDED (the floor: keysort
               + perm-apply only) — bounds what better pack kernels
               could reach
  transpose  — the [16, P] <-> [P, 16] transposes alone
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


P = 1 << 20
NCOL = 15


def main():
    rng = np.random.default_rng(0)
    cols = jnp.asarray(rng.standard_normal((NCOL, P), dtype=np.float32))
    key = jnp.asarray(
        rng.integers(0, 1 << 18, size=P, dtype=np.int32))

    @jax.jit
    def variadic(key, cols):
        ops = (key,) + tuple(cols[i] for i in range(NCOL))
        out = jax.lax.sort(ops, num_keys=1)
        return out[0], jnp.stack(out[1:], axis=0)

    @jax.jit
    def kv_wide(key, cols):
        _, perm = jax.lax.sort_key_val(
            key, jnp.arange(P, dtype=jnp.int32))
        packed = cols.T                          # [P, NCOL] (transpose)
        packed = jnp.take(packed, perm, axis=0)  # one wide gather
        return key, packed.T                     # transpose back

    @jax.jit
    def kv_perm_only(key, packed):
        _, perm = jax.lax.sort_key_val(
            key, jnp.arange(P, dtype=jnp.int32))
        return jnp.take(packed, perm, axis=0)

    @jax.jit
    def transpose_rt(cols):
        return cols.T.T + 0.0  # force both directions to materialize

    @jax.jit
    def transpose_once(cols):
        return (cols.T + 0.0)

    packed_pre = jnp.asarray(np.ascontiguousarray(
        np.asarray(cols).T))

    def run(name, fn, *args, n=32):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"  {name:12s} {dt:7.2f} ms", flush=True)

    run("variadic", variadic, key, cols)
    run("kv_wide", kv_wide, key, cols)
    run("kv_perm_only", kv_perm_only, key, packed_pre)
    run("transp_once", transpose_once, cols)
    run("transp_rt", transpose_rt, cols)


if __name__ == "__main__":
    main()
