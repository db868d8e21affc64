"""One-off A/B: 2048-row fused-kernel blocks with a raised scoped-VMEM cap.

The 2048-row block previously recorded as "fails to compile in Mosaic"
(PERF.md round-3) is actually a scoped-VMEM *stack* OOM — root-caused from
the round-4 AOT error: ``Scoped allocation with size 16.00M and limit
16.00M exceeded scoped vmem limit by 2.0K`` at the forward stash kernel.
The fix is not a kernel change but the XLA TPU flag
``xla_tpu_scoped_vmem_limit_kib`` (v5e has 128 MB of VMEM; the default cap
is 16 MB), which jit forwards per-compile via ``compiler_options`` — so a
bigger block is a *deployment* choice, not a new kernel.

Run:  python benchmarks/ab_vmem2048.py [--rounds 6] [--iters 12] [--scan 8]
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
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--scan", type=int, default=8)
    ap.add_argument("--vmem-kib", type=int, default=32768)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from benchmarks.ab import flagship_cfg
    from ddnerf_tpu.data.assembly import get_datasets
    from ddnerf_tpu.models.nerf import NerfPipeline
    from ddnerf_tpu.train.state import create_train_state
    from ddnerf_tpu.train.step import make_scan_train_step
    from ddnerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    cfg = flagship_cfg()
    train_ds, _, cfg = get_datasets(cfg)
    store = jnp.asarray(train_ds.device_store())

    variants = {}
    for name, block, opts in [
        ("base1024", 0, None),
        ("blk2048", 2048,
         {"xla_tpu_scoped_vmem_limit_kib": str(args.vmem_kib)}),
    ]:
        vcfg = cfg.merge_from_list(
            ["parallel.pallas_mlp", "train",
             "parallel.bwd_block_rows", str(block)]
        )
        pipe = NerfPipeline(vcfg)
        state = create_train_state(vcfg, pipe, jax.random.PRNGKey(0))
        fn = jax.jit(make_scan_train_step(vcfg, pipe, args.scan),
                     compiler_options=opts)
        try:
            _, metrics = fn(state, store)
        except Exception as e:  # compile failure is the experiment's answer
            print(f"{name}: COMPILE FAILED: {type(e).__name__}: "
                  f"{str(e)[:500]}", flush=True)
            continue
        print(name, "warm loss", float(metrics["loss"]), flush=True)
        variants[name] = (fn, state)

    results = {k: [] for k in variants}
    for r in range(args.rounds):
        for name, (fn, state) in variants.items():
            t0 = time.perf_counter()
            s = state
            for _ in range(args.iters):
                s, metrics = fn(s, store)
            float(metrics["loss"])
            dt = time.perf_counter() - t0
            rps = args.iters * args.scan * cfg.nerf.train.num_random_rays / dt
            results[name].append(rps)
            print(f"round {r} {name:10s} {rps:,.0f} rays/s", flush=True)

    for name, vals in results.items():
        vals = sorted(vals)
        print(f"{name:10s} median {vals[len(vals) // 2]:,.0f}  "
              f"best {vals[-1]:,.0f}")


if __name__ == "__main__":
    main()
