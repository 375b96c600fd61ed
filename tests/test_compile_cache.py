"""Persistent XLA compilation cache wiring (utils/compile_cache.py).

Entry points enable the cache at startup so bucketed executables
survive across processes (full-model compiles through the TPU tunnel
take minutes; deserialization is sub-second)."""

import importlib

import jax
import pytest

import isubgvqa_tpu.utils.compile_cache as cc


@pytest.fixture(autouse=True)
def _restore_jax_cache_config():
    """These tests point ``jax_compilation_cache_dir`` at pytest tmp
    dirs; leaving it set poisons the rest of the suite (later tests
    deserialize stale CPU executables from a deleted dir — observed as
    a hard abort in test_parallel).  Snapshot and restore the knobs."""
    saved = {k: getattr(jax.config, k) for k in (
        "jax_compilation_cache_dir",
        "jax_persistent_cache_min_compile_time_secs",
        "jax_persistent_cache_min_entry_size_bytes")}
    yield
    for k, v in saved.items():
        jax.config.update(k, v)
    importlib.reload(cc)


def _fresh(monkeypatch):
    mod = importlib.reload(cc)
    return mod


def test_enable_sets_jax_config(tmp_path, monkeypatch):
    monkeypatch.delenv("ISUBGVQA_COMPILE_CACHE", raising=False)
    mod = _fresh(monkeypatch)
    d = str(tmp_path / "xla")
    got = mod.enable_compilation_cache(d)
    assert got == d
    assert jax.config.jax_compilation_cache_dir == d
    # idempotent: a second call returns the already-enabled dir and
    # does not re-point the cache
    assert mod.enable_compilation_cache(str(tmp_path / "other")) == d


def test_env_opt_out(monkeypatch):
    monkeypatch.setenv("ISUBGVQA_COMPILE_CACHE", "0")
    mod = _fresh(monkeypatch)
    assert mod.enable_compilation_cache() is None


def test_env_path_override(tmp_path, monkeypatch):
    d = str(tmp_path / "envcache")
    monkeypatch.setenv("ISUBGVQA_COMPILE_CACHE", d)
    mod = _fresh(monkeypatch)
    assert mod.enable_compilation_cache() == d
    assert jax.config.jax_compilation_cache_dir == d


def test_jit_populates_cache(tmp_path, monkeypatch):
    """End-to-end on CPU: a jit with the persistence thresholds at zero
    writes an executable to the cache directory."""
    monkeypatch.delenv("ISUBGVQA_COMPILE_CACHE", raising=False)
    mod = _fresh(monkeypatch)
    d = tmp_path / "xla_e2e"
    mod.enable_compilation_cache(str(d))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    try:
        import jax.numpy as jnp

        @jax.jit
        def f(x):
            return jnp.tanh(x @ x) + 1.0

        f(jnp.ones((64, 64))).block_until_ready()
        assert any(d.iterdir()), "compilation cache dir stayed empty"
    finally:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                          256 * 1024)
