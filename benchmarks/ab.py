"""Interleaved A/B of trace-time switches on the flagship train step.

Each variant is a comma-separated list of MODULE.FLAG=VALUE assignments
applied before tracing (empty string = current defaults).  All variants are
traced into separate jitted scan-step programs in ONE process, then timed in
alternating rounds so chip-level variance (clock, relay load) hits both
equally.

Run:
  python benchmarks/ab.py \
    --variant base "" \
    --variant fold "ddnerf_tpu.models.mlp.SKIP_FOLD_TRUNK0=True" \
    [--rounds 6] [--iters 12] [--scan 8]
"""

import argparse
import importlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def flagship_cfg():
    from ddnerf_tpu.config import Config

    return Config.from_dict(
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
            "parallel": {"compute_dtype": "bfloat16"},
        }
    ).resolved()


def apply_flags(spec: str):
    """Apply 'pkg.mod.FLAG=value' assignments; returns an undo list."""
    undo = []
    for item in filter(None, (s.strip() for s in spec.split(","))):
        target, _, value = item.partition("=")
        modname, _, flag = target.rpartition(".")
        mod = importlib.import_module(modname)
        undo.append((mod, flag, getattr(mod, flag)))
        setattr(mod, flag, eval(value))  # flags are bools/ints/floats
    return undo


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", nargs=2, action="append", metavar=("NAME", "FLAGS"),
                    required=True)
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--scan", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ddnerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from ddnerf_tpu.data.assembly import get_datasets
    from ddnerf_tpu.models.nerf import NerfPipeline
    from ddnerf_tpu.train.state import create_train_state
    from ddnerf_tpu.train.step import make_scan_train_step

    cfg = flagship_cfg()
    train_ds, _, cfg = get_datasets(cfg)
    store = jnp.asarray(train_ds.device_store())

    variants = {}
    for name, spec in args.variant:
        undo = apply_flags(spec)
        pipe = NerfPipeline(cfg)
        state = create_train_state(cfg, pipe, jax.random.PRNGKey(0))
        fn = jax.jit(make_scan_train_step(cfg, pipe, args.scan))
        _, metrics = fn(state, store)  # compile + warm
        print(name, "warm loss", float(metrics["loss"]), flush=True)
        variants[name] = (fn, state)
        for mod, flag, old in reversed(undo):
            setattr(mod, flag, old)

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
            print(f"round {r} {name:13s} {rps:,.0f} rays/s", flush=True)

    for name, vals in results.items():
        vals = sorted(vals)
        print(f"{name:13s} median {vals[len(vals) // 2]:,.0f}  "
              f"best {vals[-1]:,.0f}")


if __name__ == "__main__":
    main()
