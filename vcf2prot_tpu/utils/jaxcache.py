"""Persistent XLA compilation cache.

On this environment XLA compiles remotely through the forwarded device link
and big fused kernels (dense neoantigen scoring over 32M lanes, multi-operand
sorts) take 1-5 MINUTES each to compile (CLAUDE.md). Nothing amortizes those
compiles across processes unless the persistent compilation cache is on, so
every device entry point (TpuEngine, DeviceNeoantigenEngine, the batched
scorer, the sharded executor, the Pallas validator) calls
:func:`enable_persistent_cache` before building its first jit.

Cache dir resolution: ``VCF2PROT_JAX_CACHE`` env var, else
``<repo>/.jax_cache`` (gitignored; survives across bench invocations and
build rounds on the same checkout), else the tempdir. ``VCF2PROT_JAX_CACHE=0``
disables. Enabling is idempotent and never raises: an unwritable directory or
a backend whose executables cannot be serialized silently degrades to
uncached compilation, which is correct behavior, just slower.
"""
from __future__ import annotations

import os

_DONE = False


def default_cache_dir() -> str:
    env = os.environ.get("VCF2PROT_JAX_CACHE")
    if env:
        return env
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    if os.access(repo, os.W_OK):
        return os.path.join(repo, ".jax_cache")
    import tempfile

    return os.path.join(tempfile.gettempdir(), "vcf2prot_jax_cache")


def enable_persistent_cache() -> None:
    """Idempotently point JAX's compilation cache at a persistent directory."""
    global _DONE
    if _DONE or os.environ.get("VCF2PROT_JAX_CACHE") == "0":
        _DONE = True
        return
    _DONE = True
    try:
        import jax

        # CPU-backend runs (the test suite, virtual meshes) skip the cache:
        # XLA:CPU AOT cache entries are machine-feature-pinned and reloading
        # them warns (or worse, SIGILLs) across toolchain drift, while the
        # compiles the cache exists to amortize -- the multi-minute REMOTE
        # TPU compiles -- only happen on the device backend.
        if jax.default_backend() == "cpu":
            return
        path = default_cache_dir()
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything: the multi-minute remote compiles this exists for
        # are exactly the ones a size/time floor would admit anyway, and the
        # small ones are cheap to keep
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        try:
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        except Exception:
            pass  # older jax: keep the default floor
    except Exception:
        pass
