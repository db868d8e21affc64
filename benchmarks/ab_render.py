"""Interleaved A/B of trace-time switches on the whole-image render path.

Same idea as benchmarks/ab.py but for ImageRenderer.render_image_from_pose:
each variant gets its own renderer (separate jit cache), timed in
alternating rounds.  FLAGS syntax: comma-separated MODULE.FLAG=VALUE, with
the extra pseudo-flag cfg.parallel.pallas_mlp=True to flip the config knob.

Run:
  python benchmarks/ab_render.py --variant base "" \
      --variant noremat "ddnerf_tpu.models.nerf._REMAT_IPE=False" \
      [--size 800] [--rounds 4]

NOTE: the base config leaves ``parallel.pallas_mlp`` unset (off) = the pure
XLA render path.  The shipped production policy is ``pallas_mlp: auto``
(fused forward kernel, variant "mlp", on the whole-image paths — measured
+21.9% median over XLA at 800x800 on v5e, PERF.md round-4 sixth pass); A/B
it against XLA with
  --variant mlpvar "cfg.parallel.pallas_mlp='render',cfg.parallel.render_kernel_variant='mlp'"
"""

import argparse
import importlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from ddnerf_tpu.utils.platform import honor_env_platforms

    honor_env_platforms()
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", nargs=2, action="append",
                    metavar=("NAME", "FLAGS"), required=True)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--size", default="800")
    ap.add_argument("--chunk", type=int, default=16384)
    args = ap.parse_args()

    import jax
    import numpy as np

    from ddnerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from ddnerf_tpu.config import Config
    from ddnerf_tpu.data.synthetic import pose_spherical
    from ddnerf_tpu.models.nerf import NerfPipeline, ScheduleValues
    from ddnerf_tpu.render.renderer import ImageRenderer
    from ddnerf_tpu.train.state import create_train_state

    if "x" in args.size:
        w, h = (int(v) for v in args.size.split("x"))
    else:
        w = h = int(args.size)
    focal = 0.5 * w / np.tan(0.5 * 0.6911)
    pose = pose_spherical(30.0, -30.0, 4.0)

    def build(spec):
        cfg_extra = {}
        undo = []
        for item in filter(None, (s.strip() for s in spec.split(","))):
            target, _, value = item.partition("=")
            if target.startswith("cfg."):
                d = cfg_extra
                keys = target[4:].split(".")
                for k in keys[:-1]:
                    d = d.setdefault(k, {})
                d[keys[-1]] = eval(value)
                continue
            modname, _, flag = target.rpartition(".")
            mod = importlib.import_module(modname)
            undo.append((mod, flag, getattr(mod, flag)))
            setattr(mod, flag, eval(value))
        from benchmarks.common import flagship_render_cfg_dict

        base = flagship_render_cfg_dict(args.chunk)

        def deep_merge(dst, src):
            for k, v in src.items():
                if isinstance(v, dict) and isinstance(dst.get(k), dict):
                    deep_merge(dst[k], v)
                else:
                    dst[k] = v

        deep_merge(base, cfg_extra)
        cfg = Config.from_dict(base).resolved()
        pipe = NerfPipeline(cfg)
        state = create_train_state(cfg, pipe, jax.random.PRNGKey(0))
        sched = ScheduleValues.for_eval(cfg)
        renderer = ImageRenderer(cfg, pipe, mode="render")
        for mod, flag, old in reversed(undo):
            setattr(mod, flag, old)
        return renderer, state, sched, [(m, f) for m, f, _ in undo], spec

    def run(renderer, state, sched, spec):
        # re-apply module flags for this trace/call window
        undo = []
        for item in filter(None, (s.strip() for s in spec.split(","))):
            target, _, value = item.partition("=")
            if target.startswith("cfg."):
                continue
            modname, _, flag = target.rpartition(".")
            mod = importlib.import_module(modname)
            undo.append((mod, flag, getattr(mod, flag)))
            setattr(mod, flag, eval(value))
        try:
            out = renderer.render_image_from_pose(
                state.params, pose, h, w, focal, jax.random.PRNGKey(0), sched
            )
        finally:
            for mod, flag, old in reversed(undo):
                setattr(mod, flag, old)
        return out

    variants = {}
    for name, spec in args.variant:
        renderer, state, sched, _, spec = build(spec)
        t0 = time.perf_counter()
        run(renderer, state, sched, spec)  # compile + warm
        print(f"{name}: compiled+warm in {time.perf_counter() - t0:.1f}s",
              flush=True)
        variants[name] = (renderer, state, sched, spec)

    results = {k: [] for k in variants}
    for r in range(args.rounds):
        for name, (renderer, state, sched, spec) in variants.items():
            t0 = time.perf_counter()
            run(renderer, state, sched, spec)
            dt = time.perf_counter() - t0
            results[name].append(dt)
            print(f"round {r} {name:10s} {dt:.3f} s/image "
                  f"({h * w / dt:,.0f} rays/s)", flush=True)

    for name, vals in results.items():
        vals = sorted(vals)
        med = vals[len(vals) // 2]
        print(f"{name:10s} median {med:.3f} s  ({h * w / med:,.0f} rays/s)")


if __name__ == "__main__":
    main()
