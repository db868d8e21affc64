"""Numerical-safety tooling tests (utils/debug.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddnerf_tpu.utils.debug import assert_finite_tree, checkify_step, nan_debug_mode


def test_checkify_catches_nan():
    def bad(x):
        return jnp.log(x)  # log(-1) -> nan

    checked = checkify_step(bad)
    err, out = checked(jnp.asarray(-1.0))
    with pytest.raises(Exception):
        err.throw()

    err, out = checked(jnp.asarray(1.0))
    err.throw()  # no error
    assert float(out) == 0.0


def test_nan_debug_mode_restores_flag():
    prev = jax.config.jax_debug_nans
    with nan_debug_mode(True):
        assert jax.config.jax_debug_nans
    assert jax.config.jax_debug_nans == prev


def test_assert_finite_tree():
    assert_finite_tree({"a": jnp.ones(3)})
    with pytest.raises(AssertionError):
        assert_finite_tree({"a": jnp.asarray([1.0, np.nan])})


def test_throughput_counter():
    import time

    from ddnerf_tpu.utils.profiling import Throughput

    t = Throughput(warmup_steps=1)
    t.step(100)  # warmup
    time.sleep(0.05)
    t.step(100)
    t.step(100)
    rate = t.rays_per_sec
    assert rate > 0
