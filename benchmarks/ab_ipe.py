"""Device-time A/B of the kernel-path IPE assembly variants.

The fused-kernel render path must MATERIALIZE the [N, 96] IPE feature
array in HBM (XLA cannot fuse a prologue into a ``pallas_call``), and the
round-5 trace digest shows the shipped stack+reshape+concat assembly
lowering to ~105 ms of relayout copies in a 612 ms 800x800 render.  This
bench times cast_rays -> IPE -> (bf16) materialization alone at the
render chunk shape (16384 rays x s=33), per variant:

  stack_da        shipped: double-angle recurrence, stack+reshape+concat,
                  f32 assembly, astype(bf16) after (the production path)
  stack_da_early  same with the per-degree early cast (ipe_early_cast)
  direct          reference direct form (double_angle=False), astype after
  fused           integrated_pos_enc_fused: concat-free broadcast form,
                  cast folded into the one output fusion (NEW)
  fused_f32       same, astype after (isolates the cast folding)
  floor           write a [N, 96] bf16 array from a trivial broadcast
                  fusion — the pure-bandwidth lower bound

Run:  python benchmarks/ab_ipe.py [--rays 16384] [--iters 8] [--rounds 5]
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
    ap.add_argument("--rays", type=int, default=16384)
    ap.add_argument("--samples", type=int, default=33)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ddnerf_tpu.core import math as mmath
    from ddnerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    n, s = args.rays, args.samples
    rng = np.random.default_rng(0)
    t_vals = jnp.asarray(
        np.sort(rng.uniform(2.0, 6.0, (n, s + 1)).astype(np.float32), axis=-1)
    )
    origins = jnp.asarray(rng.uniform(-1, 1, (n, 3)).astype(np.float32))
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    directions = jnp.asarray(d)
    radii = jnp.asarray(np.full((n, 1), 0.002, np.float32))
    cdt = jnp.bfloat16

    def rays_to_mc(tv, ro, rd, rr):
        means, covs = mmath.cast_rays(tv, ro, rd, rr)
        return means.reshape(n * s, 3), covs.reshape(n * s, 3)

    def v_stack_da(tv, ro, rd, rr):
        mc = rays_to_mc(tv, ro, rd, rr)
        return mmath.integrated_pos_enc(mc, double_angle=True).astype(cdt)

    def v_stack_da_early(tv, ro, rd, rr):
        mc = rays_to_mc(tv, ro, rd, rr)
        return mmath.integrated_pos_enc(mc, double_angle=True, out_dtype=cdt)

    def v_direct(tv, ro, rd, rr):
        mc = rays_to_mc(tv, ro, rd, rr)
        return mmath.integrated_pos_enc(mc, double_angle=False).astype(cdt)

    def v_fused(tv, ro, rd, rr):
        mc = rays_to_mc(tv, ro, rd, rr)
        return mmath.integrated_pos_enc_fused(mc, out_dtype=cdt)

    def v_fused_f32(tv, ro, rd, rr):
        mc = rays_to_mc(tv, ro, rd, rr)
        return mmath.integrated_pos_enc_fused(mc).astype(cdt)

    def v_floor(tv, ro, rd, rr):
        m, _ = rays_to_mc(tv, ro, rd, rr)
        return jnp.broadcast_to(m[:, :1], (n * s, 96)).astype(cdt)

    variants = {
        "stack_da": v_stack_da,
        "stack_da_early": v_stack_da_early,
        "direct": v_direct,
        "fused": v_fused,
        "fused_f32": v_fused_f32,
        "floor": v_floor,
    }
    fns = {k: jax.jit(f) for k, f in variants.items()}

    # correctness cross-check (on the bench shape, before timing)
    ref = np.asarray(fns["stack_da"](t_vals, origins, directions, radii),
                     np.float32)
    for k in ("direct", "fused", "fused_f32", "stack_da_early"):
        got = np.asarray(fns[k](t_vals, origins, directions, radii),
                         np.float32)
        err = float(np.max(np.abs(got - ref)))
        print(f"max|{k} - stack_da| = {err:.3e}")
    fu = np.asarray(fns["fused"](t_vals, origins, directions, radii))
    di = np.asarray(fns["direct"](t_vals, origins, directions, radii))
    print("fused == direct bitwise:", bool(np.array_equal(fu, di)))

    def time_once(fn):
        t0 = time.perf_counter()
        out = None
        for _ in range(args.iters):
            out = fn(t_vals, origins, directions, radii)
        # value fetch (not block_until_ready) — reliable sync on the relay
        np.asarray(out[0, 0])
        return (time.perf_counter() - t0) / args.iters

    for k, f in fns.items():  # warm / compile
        np.asarray(f(t_vals, origins, directions, radii)[0, 0])

    results = {k: [] for k in fns}
    for r in range(args.rounds):
        for k, f in fns.items():  # interleaved rounds
            results[k].append(time_once(f))
    print(f"\n[{n} rays x s={s} = {n*s} rows, {args.iters} it x "
          f"{args.rounds} rounds, median ms/call]")
    for k, ts in results.items():
        ms = 1e3 * float(np.median(ts))
        print(f"  {k:16s} {ms:8.3f} ms   "
              f"(all: {' '.join(f'{1e3*t:.2f}' for t in ts)})")


if __name__ == "__main__":
    main()
