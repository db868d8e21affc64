"""Compilation-cache helper tests."""

import os

import jax

from ddnerf_tpu.utils.cache import enable_compilation_cache


def test_cache_dir_configured(tmp_path, monkeypatch):
    d = str(tmp_path / "xla_cache")
    monkeypatch.setenv("DDNERF_CACHE_DIR", d)
    enable_compilation_cache()
    assert os.path.isdir(d)
    assert jax.config.jax_compilation_cache_dir == d


def test_cache_disabled_by_empty(monkeypatch):
    monkeypatch.setenv("DDNERF_CACHE_DIR", "")
    before = jax.config.jax_compilation_cache_dir
    enable_compilation_cache()
    assert jax.config.jax_compilation_cache_dir == before
