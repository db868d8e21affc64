"""Micro-benchmark: MLP fwd+bwd through XLA vs the fused Pallas kernels.

Isolates the network cost at the flagship shape (2048 rays x 33 samples per
network) with a dummy scalar loss, so kernel-level changes can be measured
without the rest of the train step.

Run:  python benchmarks/bench_mlp_bwd.py [--rays 2048] [--samples 33]
      [--block 1024] [--iters 30]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from ddnerf_tpu.utils.platform import honor_env_platforms

    honor_env_platforms()
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=2048)
    ap.add_argument("--samples", type=int, default=33)
    ap.add_argument("--block", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--depth-head", action="store_true", default=True)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ddnerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import ddnerf_tpu.kernels.fused_mlp_bwd as fmb
    from ddnerf_tpu.kernels.fused_mlp_bwd import fused_mlp_train_apply
    from ddnerf_tpu.models.mlp import DepthMipMLP

    fmb.BWD_BLOCK_ROWS = args.block

    n, s = args.rays, args.samples
    m = n * s
    rng = np.random.default_rng(0)
    ipe3 = jnp.asarray(rng.standard_normal((n, s, 96)).astype(np.float32))
    dirs_ray = jnp.asarray(rng.standard_normal((n, 27)).astype(np.float32))
    module = DepthMipMLP(hidden_size=256, dtype=jnp.bfloat16)
    params = module.init(jax.random.PRNGKey(0), ipe3, dirs_ray[:, None, :])[
        "params"
    ]

    def loss_xla(p):
        out = module.apply({"params": p}, ipe3, dirs_ray[:, None, :])
        return jnp.sum(out * out)

    ipe_flat = ipe3.reshape(m, 96)
    dirs_flat = jnp.broadcast_to(dirs_ray[:, None, :], (n, s, 27)).reshape(
        m, 27
    )

    def loss_fused(p):
        out = fused_mlp_train_apply(p, ipe_flat, dirs_flat, True, False)
        return jnp.sum(out * out)

    grad_xla = jax.jit(jax.grad(loss_xla))
    grad_fused = jax.jit(jax.grad(loss_fused))

    def timeit(fn, label):
        g = fn(params)  # compile
        jax.block_until_ready(g)
        # value-fetch sync (relay backend can return early)
        float(jax.tree_util.tree_leaves(g)[0].sum())
        t0 = time.perf_counter()
        for _ in range(args.iters):
            g = fn(params)
        float(jax.tree_util.tree_leaves(g)[0].sum())
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{label}: {dt * 1e3:.3f} ms/call  "
              f"({m / dt / 1e6:.1f} M samples/s)")
        return g, dt

    g_x, t_x = timeit(grad_xla, "XLA   fwd+bwd")
    g_f, t_f = timeit(grad_fused, f"Pallas fwd+bwd (block={args.block})")
    print(f"speedup: {t_x / t_f:.3f}x")

    # numeric cross-check (bf16 paths differ slightly)
    errs = jax.tree_util.tree_map(
        lambda a, b: float(
            jnp.max(jnp.abs(a - b) / (jnp.abs(b).max() + 1e-6))
        ),
        g_f, g_x,
    )
    worst = max(jax.tree_util.tree_leaves(errs))
    print(f"max relative grad diff vs XLA: {worst:.2e}")


if __name__ == "__main__":
    main()
