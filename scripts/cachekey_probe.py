"""Why does the persistent compile cache miss across processes?

Runs ONE small jit on the axon backend with jax._src.cache_key DEBUG
logging on, printing each cache-key component's hash.  Run it twice
(separate processes) and diff the output: the differing component is
the cross-process instability (VERDICT r2 weak 2 follow-up — bench.py
scrubs XLA_FLAGS/AXON_LIBTPU_OVERRIDES, yet back-to-back `python
bench.py` runs still recompiled the wavefront program: every
jit_wavefront_chunk cache entry has a distinct key hash).

python scripts/cachekey_probe.py [tag]
"""

import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

for var in ("XLA_FLAGS", "AXON_LIBTPU_OVERRIDES", "LIBTPU_INIT_ARGS"):
    os.environ.pop(var, None)

import jax
import jax.numpy as jnp

from logipathtracer_tpu.utils.cache import configure_compile_cache

configure_compile_cache(jax, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", ".jax_cache"), cpu=False)

h = logging.StreamHandler(sys.stdout)
h.setFormatter(logging.Formatter("%(message)s"))
lg = logging.getLogger("jax._src.cache_key")
lg.setLevel(logging.DEBUG)
lg.addHandler(h)


def f(x):
    return (x * 2.0 + 1.0).sum()


x = jnp.arange(512, dtype=jnp.float32)
print("=== compile 1 (unique shape per run? no - fixed) ===", flush=True)
out = jax.jit(f)(x)
print("result", float(out), flush=True)
