"""Capture a device trace of the flagship train step and print the digest.

Companion to bench.py: same flagship workload (2048 rays x 32+32+1, DDNeRF,
bf16), profiled with jax.profiler and summarized via utils.trace_summary.

Run:  python benchmarks/profile_step.py [--steps 30] [--scan 8] [--top 25]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from ddnerf_tpu.utils.platform import honor_env_platforms

    honor_env_platforms()
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--scan", type=int, default=8)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--logdir", default="/tmp/ddnerf_profile")
    ap.add_argument("--flags", default="",
                    help="comma-separated MODULE.FLAG=VALUE trace-time "
                         "switches (same syntax as benchmarks/ab.py)")
    ap.add_argument("--set", nargs="*", default=[],
                    help="config overrides as 'dot.path value' pairs, e.g. "
                         "--set parallel.pallas_mlp off")
    args = ap.parse_args()

    if args.flags:
        import importlib

        for item in filter(None, (s.strip() for s in args.flags.split(","))):
            target, _, value = item.partition("=")
            modname, _, flag = target.rpartition(".")
            setattr(importlib.import_module(modname), flag, eval(value))

    import jax
    import jax.numpy as jnp

    from ddnerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from ddnerf_tpu.config import Config
    from ddnerf_tpu.data.assembly import get_datasets
    from ddnerf_tpu.models.nerf import NerfPipeline
    from ddnerf_tpu.train.state import create_train_state
    from ddnerf_tpu.utils.compile import step_compiler_options
    from ddnerf_tpu.train.step import (
        make_scan_train_step,
        make_train_step_from_store,
    )
    from ddnerf_tpu.utils.profiling import trace as profiler_trace

    cfg = Config.from_dict(
        {
            "experiment": {"train_iters": 200001},
            "nerf": {
                "type": "DDNerfModel",
                "coarse_hidden_size": 256,
                "fine_hidden_size": 256,
                "train": {
                    "num_coarse": 32,
                    "num_fine": 32,
                    "num_random_rays": 2048,
                    "radiance_field_noise_std": 1.0,
                },
                "validation": {"num_coarse": 32, "num_fine": 32, "perturb": False},
            },
            "dataset": {
                "type": "blender",
                "synthetic": True,
                "near": 2.0,
                "far": 6.0,
                "single_image_mode": True,
            },
            # Production path (all shipped configs and bench.py); profile
            # the XLA path deliberately via --set parallel.pallas_mlp=off.
            "parallel": {"compute_dtype": "bfloat16", "pallas_mlp": "train"},
        }
    ).resolved()
    for k, v in zip(args.set[::2], args.set[1::2]):
        cfg = cfg.merge_from_list([k, v])

    train_ds, _, cfg = get_datasets(cfg)
    pipe = NerfPipeline(cfg)
    state = create_train_state(cfg, pipe, jax.random.PRNGKey(0))
    store = jnp.asarray(train_ds.device_store())

    if args.scan > 1:
        step_fn = jax.jit(make_scan_train_step(cfg, pipe, args.scan),
                          donate_argnums=0,
                          compiler_options=step_compiler_options(cfg))
    else:
        step_fn = jax.jit(make_train_step_from_store(cfg, pipe),
                          donate_argnums=0,
                          compiler_options=step_compiler_options(cfg))

    state, metrics = step_fn(state, store)
    float(metrics["loss"])  # warm

    n_calls = max(1, args.steps // max(args.scan, 1))
    with profiler_trace(args.logdir):
        for _ in range(n_calls):
            state, metrics = step_fn(state, store)
        float(metrics["loss"])

    from ddnerf_tpu.utils import trace_summary

    sys.argv = [
        "trace_summary",
        args.logdir,
        "--steps",
        str(n_calls * max(args.scan, 1)),
        "--top",
        str(args.top),
    ]
    trace_summary.main()


if __name__ == "__main__":
    main()
