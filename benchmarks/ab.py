"""Interleaved A/B of numerics/perf switches on the flagship train step.

Each variant is a comma-separated list of KEY=VALUE assignments applied
before tracing (empty string = current defaults).  Two kinds of key:

* a CONFIG path (``experiment.`` / ``train_params.`` / ``dataset.`` /
  ``optimizer.`` / ``nerf.`` / ``parallel.`` prefix) — applied via
  ``Config.merge_from_list`` per variant, e.g. ``parallel.remat_ipe=False``.
  This is the production surface: the same key in a YAML/CLI override
  reproduces the variant, and the config snapshot records it;
* a MODULE flag (full dotted module path) — setattr'd for the variant's
  trace, e.g. ``ddnerf_tpu.models.mlp.SKIP_FOLD_TRUNK0=True``.  These are
  the trace-time overrides (None = follow config) kept for switches with
  no config field.

All variants are traced into separate jitted scan-step programs in ONE
process, then timed in alternating rounds so chip-level variance (clock,
relay load) hits both equally.

Run:
  python benchmarks/ab.py \
    --variant base "" \
    --variant noremat "parallel.remat_ipe=False" \
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
            # pallas_mlp="train" = the PRODUCTION path (all shipped configs
            # and bench.py).  A/B deltas measured on the XLA path do not
            # transfer: the non-kernel tail is a different fraction of the
            # step there.  Use parallel.pallas_mlp=off in a variant spec to
            # measure the XLA path deliberately.
            "parallel": {"compute_dtype": "bfloat16", "pallas_mlp": "train"},
        }
    ).resolved()


_CFG_SECTIONS = ("experiment.", "train_params.", "dataset.", "optimizer.",
                 "nerf.", "parallel.")


def apply_flags(spec: str, cfg):
    """Apply a variant spec; returns (variant cfg, module-flag undo list)."""
    undo = []
    cfg_opts = []
    for item in filter(None, (s.strip() for s in spec.split(","))):
        target, _, value = item.partition("=")
        if target.startswith(_CFG_SECTIONS):
            cfg_opts += [target, value]
            continue
        modname, _, flag = target.rpartition(".")
        mod = importlib.import_module(modname)
        undo.append((mod, flag, getattr(mod, flag)))
        setattr(mod, flag, eval(value))  # flags are bools/ints/floats
    if cfg_opts:
        cfg = cfg.merge_from_list(cfg_opts)
    return cfg, undo


def main():
    from ddnerf_tpu.utils.platform import honor_env_platforms

    honor_env_platforms()
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
        vcfg, undo = apply_flags(spec, cfg)
        pipe = NerfPipeline(vcfg)
        state = create_train_state(vcfg, pipe, jax.random.PRNGKey(0))
        from ddnerf_tpu.utils.compile import step_compiler_options
        fn = jax.jit(make_scan_train_step(vcfg, pipe, args.scan),
                     compiler_options=step_compiler_options(vcfg))
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
