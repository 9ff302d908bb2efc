"""Does jax.block_until_ready synchronize through the axon relay?

Round-4 evidence is contradictory: outside_e2e timed 38 wavefront
iterations (~50 ms/iter device time by stage_profile) at 0.16 s wall
with block_until_ready as the only sync (q18 item 4 — clearly not
synchronized), yet round-3 bench's _ray_query_mrays (same primitive)
produced 28.4 Mrays/s, consistent with the independently-fetch-synced
compact_probe numbers.  This probe settles it: N dispatches of a
known-cost kernel timed under (a) block_until_ready, (b) a one-element
fetch, (c) np.asarray of the result.

python scripts/sync_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    print("device:", jax.devices()[0], flush=True)

    # ~8 x [4096, 4096] f32 matmuls = ~1.1 Tflop total at HIGHEST; a
    # known multi-ms device cost per dispatch.
    @jax.jit
    def f(x):
        for _ in range(8):
            x = jnp.tanh(x @ x)
        return x

    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (4096, 4096)), jnp.float32)
    y = f(x)
    float(np.asarray(y)[0, 0])  # compile + settle

    n = 5
    t0 = time.perf_counter()
    outs = [f(x) for _ in range(n)]
    jax.block_until_ready(outs)
    dt_block = time.perf_counter() - t0

    t0 = time.perf_counter()
    outs = [f(x) for _ in range(n)]
    float(jnp.sum(outs[-1].reshape(-1)[0:1]))
    dt_fetch1 = time.perf_counter() - t0

    t0 = time.perf_counter()
    outs = [f(x) for _ in range(n)]
    np.asarray(outs[-1])
    dt_full = time.perf_counter() - t0

    print(f"{n} dispatches: block_until_ready {dt_block*1e3:8.1f} ms   "
          f"fetch-1 {dt_fetch1*1e3:8.1f} ms   "
          f"np.asarray {dt_full*1e3:8.1f} ms", flush=True)
    if dt_block < 0.5 * dt_fetch1:
        print("=> block_until_ready DOES NOT synchronize on this relay;"
              " use element fetches in every timing harness", flush=True)
    else:
        print("=> block_until_ready synchronizes (q18 item 4 anomaly "
              "needs another explanation)", flush=True)


if __name__ == "__main__":
    main()
