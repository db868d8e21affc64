"""Per-compile XLA options for the hot jitted programs.

The fused train kernels' 2048-row blocks need ~16 MB of scoped VMEM in
the forward stash kernel — 2 KiB over XLA:TPU's default 16 MiB scoped
cap, which is a *flag* (``xla_tpu_scoped_vmem_limit_kib``), not a
hardware limit (v5e has 128 MiB of VMEM).  Raising it per-compile via
``jax.jit(..., compiler_options=...)`` unlocked the 2048-row block:
+4.5% rays/s over 1024 with bit-identical loss (PERF.md round-4,
benchmarks/ab_vmem2048.py).  Deployment knob: ``parallel.
scoped_vmem_limit_kib`` (0 = leave XLA's default cap).

TPU-only: the CPU/GPU PJRT compilers reject unknown option overrides
with INVALID_ARGUMENT, so the helper returns ``None`` off-TPU (where the
cap is meaningless anyway — interpret-mode Pallas has no VMEM).
"""

from __future__ import annotations


def step_compiler_options(cfg) -> dict | None:
    """``compiler_options`` for jitting train/eval step programs under
    ``cfg`` (None when no override applies — safe to pass straight to
    ``jax.jit``)."""
    kib = getattr(cfg.parallel, "scoped_vmem_limit_kib", 0)
    if not kib:
        return None
    import jax

    if jax.default_backend() != "tpu":
        return None
    return {"xla_tpu_scoped_vmem_limit_kib": str(int(kib))}
