"""Device-time A/B of the resampler's section fetch at the render shape.

The round-5 render digest shows the fetch stack costing ~55 ms of the
562 ms device step: the one-hot mask build (compare_convert 16.4 ms —
materializing [n, 33, 32] f32, which HBM tile-padding inflates ~4x) plus
the [M, S] @ [S, 8] batched contraction (33.2 ms at 0.4 TF/s — MXU
utilization of a 33x33 tile is ~7%).  The one-hot-matmul form won the
round-3 A/Bs on the TRAIN step (where the backward needs the transposed
contraction anyway); forward-only rendering has no such constraint, so
this bench races it against real gathers:

  onehot    interval_one_hot + fetch_sections (mixed) — production
  gather    index = sum of comparisons; ONE take_along_axis on the
            stacked [.., S, K] values
  gather_k  same index; K separate take_along_axis calls

All three are exact (the mixed one-hot contraction is gather-exact,
PERF.md round-4).  Run: python benchmarks/ab_fetch.py [--rays 16384]
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
    ap.add_argument("--sections", type=int, default=33)
    ap.add_argument("--draws", type=int, default=33)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--rounds", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ddnerf_tpu.core import sampling as S
    from ddnerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    n, s, m, k = args.rays, args.sections, args.draws, args.k
    rng = np.random.default_rng(0)
    fences = np.sort(rng.uniform(0, 1, (n, s + 1)).astype(np.float32), -1)
    fences[:, 0], fences[:, -1] = 0.0, 1.0
    u = rng.uniform(0.001, 0.999, (n, m)).astype(np.float32)
    vals = [rng.standard_normal((n, s)).astype(np.float32) for _ in range(k)]
    fences_j, u_j = jnp.asarray(fences), jnp.asarray(u)
    vals_j = [jnp.asarray(v) for v in vals]

    def f_onehot(fences, u, *vals):
        oh = S.interval_one_hot(u, fences)
        return S.fetch_sections(oh, *vals, precision="mixed")

    def _index(fences, u):
        inner = fences[..., None, 1:-1]
        c = u[..., :, None] >= inner
        return jnp.sum(c.astype(jnp.int32), axis=-1)  # [n, m] in [0, s-1]

    def f_gather(fences, u, *vals):
        idx = _index(fences, u)
        stacked = jnp.stack(vals, axis=-1)  # [n, s, k]
        out = jnp.take_along_axis(stacked, idx[..., None], axis=-2)
        return tuple(out[..., j] for j in range(len(vals)))

    def f_gather_k(fences, u, *vals):
        idx = _index(fences, u)
        return tuple(jnp.take_along_axis(v, idx, axis=-1) for v in vals)

    fns = {name: jax.jit(f) for name, f in
           (("onehot", f_onehot), ("gather", f_gather),
            ("gather_k", f_gather_k))}

    ref = fns["onehot"](fences_j, u_j, *vals_j)
    for name in ("gather", "gather_k"):
        got = fns[name](fences_j, u_j, *vals_j)
        for a, b in zip(got, ref):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=name)
    print("all variants exact vs one-hot (bitwise)")

    def time_once(f):
        t0 = time.perf_counter()
        out = None
        for _ in range(args.iters):
            out = f(fences_j, u_j, *vals_j)
        np.asarray(out[0][0, 0])  # value-fetch sync
        return (time.perf_counter() - t0) / args.iters

    for f in fns.values():
        np.asarray(f(fences_j, u_j, *vals_j)[0][0, 0])  # warm

    results = {name: [] for name in fns}
    for _ in range(args.rounds):
        for name, f in fns.items():
            results[name].append(time_once(f))
    print(f"[{n} rays, {s} sections, {m} draws, k={k}; "
          f"{args.iters} it x {args.rounds} rounds]")
    for name, ts in results.items():
        ms = 1e3 * float(np.median(ts))
        print(f"  {name:9s} {ms:7.3f} ms/call  "
              f"(all: {' '.join(f'{1e3*t:.2f}' for t in ts)})")


if __name__ == "__main__":
    main()
