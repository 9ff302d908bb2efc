"""Persistent-compile-cache policy.

The persistent compilation cache is TPU-only in this repo.  XLA:CPU
executable (de)serialization is intermittently unsafe on this host:
``executable.serialize()`` segfaulted during a cache write
(jax compilation_cache.py put_executable_and_time) and
``backend.deserialize_executable`` segfaulted/SIGABRTed on reads —
observed repeatedly on fresh, same-host, single-process cache dirs, so
it is the native serializer, not corruption or host mismatch.  CPU
runs (tests, --cpu bench/CLI) therefore run with NO persistent cache
and pay in-process jit compiles only.

axon/TPU executables are remote-compiled and host-independent; the
shared TPU dir is load-bearing for warm driver benches (CLAUDE.md: the
cache key folds XLA_FLAGS / AXON_LIBTPU_OVERRIDES from the env — scrub
them so every invocation hits one key universe).

Traceback locations are stripped from lowering
(jax_traceback_in_locations_limit = 0): the Pallas kernels' serialized
Mosaic payloads otherwise embed CALL-STACK source locations, so editing
any file in the call chain (bench.py, a probe script) shifts line
numbers and silently changes every cache key downstream — measured
round 5 as byte-different twin entries for identical programs (the
round-4 driver-bench recompiles and the "cache-key drift" mystery).
With the limit at 0 the lowered module is byte-identical under caller
line shifts, so keys depend only on the traced computation.
"""

from __future__ import annotations


def configure_compile_cache(jax_mod, base: str, cpu: bool) -> None:
    """Point jax at the persistent cache for TPU runs; leave the cache
    disabled for CPU runs (see module docstring).  Always strip
    traceback locations from lowering so cache keys are stable under
    caller-side edits."""
    jax_mod.config.update("jax_traceback_in_locations_limit", 0)
    if cpu:
        return
    jax_mod.config.update("jax_compilation_cache_dir", base)
    jax_mod.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
