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
"""

from __future__ import annotations


def configure_compile_cache(jax_mod, base: str, cpu: bool) -> None:
    """Point jax at the persistent cache for TPU runs; leave the cache
    disabled for CPU runs (see module docstring)."""
    if cpu:
        return
    jax_mod.config.update("jax_compilation_cache_dir", base)
    jax_mod.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
