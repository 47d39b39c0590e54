"""Persistent-compile-cache plumbing (utils/jaxcache.py)."""
import importlib
import os

import vcf2prot_tpu.utils.jaxcache as jaxcache


def _fresh():
    return importlib.reload(jaxcache)


def test_env_override_wins(monkeypatch):
    mod = _fresh()
    monkeypatch.setenv("VCF2PROT_JAX_CACHE", "/tmp/some_cache_dir")
    assert mod.default_cache_dir() == "/tmp/some_cache_dir"


def test_default_is_repo_local(monkeypatch):
    mod = _fresh()
    monkeypatch.delenv("VCF2PROT_JAX_CACHE", raising=False)
    d = mod.default_cache_dir()
    assert d.endswith(".jax_cache")
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(jaxcache.__file__))))
    assert d.startswith(repo)


def test_enable_is_idempotent_and_skips_cpu(monkeypatch):
    """On the CPU backend (this suite), enabling must be a no-op: XLA:CPU
    AOT cache entries are machine-feature-pinned (reload warnings/SIGILL
    risk), and the multi-minute remote compiles the cache amortizes only
    happen on the device backend."""
    mod = _fresh()
    monkeypatch.delenv("VCF2PROT_JAX_CACHE", raising=False)
    import jax

    before = jax.config.jax_compilation_cache_dir
    mod.enable_persistent_cache()
    mod.enable_persistent_cache()  # idempotent
    assert jax.config.jax_compilation_cache_dir == before
    assert mod._DONE


def test_disable_via_env(monkeypatch):
    mod = _fresh()
    monkeypatch.setenv("VCF2PROT_JAX_CACHE", "0")
    mod.enable_persistent_cache()
    import jax

    # "0" disables: config untouched even before the backend check
    assert jax.config.jax_compilation_cache_dir in (None, "")
    assert mod._DONE
