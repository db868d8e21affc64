"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh — the standard JAX trick for testing
pjit/shard_map sharding without a TPU pod (SURVEY.md §4).

The ambient environment may point JAX at a real TPU through the axon PJRT
plugin (a sitecustomize registers the plugin and sets
``jax_platforms="axon,cpu"``).  Tests must never contend for the chip
(backend init costs ~70s and serializes on the tunnel), so we force the
platform back to CPU *before any backend initializes* — plugin registration
is lazy, so this is free.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# Overrides the axon sitecustomize's jax.config platform selection.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Test programs are identical run-to-run; the persistent compilation cache
# makes every suite run after the first start warm (the single-core CPU
# otherwise spends most of the suite compiling).
from ddnerf_tpu.utils.cache import enable_compilation_cache  # noqa: E402

os.environ.setdefault(
    "DDNERF_CACHE_DIR", os.path.join("/tmp", "ddnerf_tpu_test_xla_cache")
)
enable_compilation_cache()

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_PATH = "/root/reference"


def reference_available() -> bool:
    """The torch reference repo, used only as a golden oracle in parity
    tests — never imported by the framework itself."""
    try:
        import torch  # noqa: F401
    except Exception:
        return False
    return os.path.isdir(REFERENCE_PATH)
