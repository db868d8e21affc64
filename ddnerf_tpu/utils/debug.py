"""Numerical-safety tooling (SURVEY.md §5 "race detection / sanitizers").

The reference's only sanitizers are ``pdb.set_trace()`` NaN traps buried in
dead loss code (loss.py:235, 287, 477) and a comment warning that sin/cos NaN
on TPU (math_utils.py:155-166).  Here the equivalents are first-class:

* :func:`nan_debug_mode` — context manager enabling ``jax_debug_nans`` so any
  NaN produced under jit raises at the producing op (CI mode);
* :func:`checkify_step` — wraps a step function with ``checkify`` error
  checking for the realistic NaN sources (erfinv/log/div), returning
  (err, out) so production code can surface failures without crashing;
* :func:`assert_finite_tree` — host-side pytree finiteness assert for tests.
"""

from __future__ import annotations

import contextlib

import jax
import numpy as np


@contextlib.contextmanager
def nan_debug_mode(enable: bool = True):
    """Enable jax_debug_nans within the scope (slower; re-runs offending
    computations un-jitted to localize the NaN)."""
    if not enable:
        yield
        return
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def checkify_step(fn):
    """checkify-wrap ``fn``: returns ``checked(args) -> (error, out)``.

    Catches float errors (nan/inf from the erfinv inverse-CDF and log paths,
    cf. samplers.py:204, dd_utils.py:76) and index OOB without killing the
    run; call ``error.throw()`` to escalate."""
    from jax.experimental import checkify

    errors = checkify.float_checks | checkify.index_checks
    return checkify.checkify(fn, errors=errors)


def assert_finite_tree(tree, name: str = "tree") -> None:
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            keys = "/".join(str(p) for p in path)
            raise AssertionError(f"non-finite values in {name}:{keys}")
