"""Device-trace the whole-image render path and print the digest + roofline.

Companion to benchmarks/bench_render.py: same flagship model, renders one
WxH image from a pose through ImageRenderer's jitted lax.map program while
jax.profiler captures, then summarizes with utils.trace_summary.

Run:  python benchmarks/profile_render.py [--size 800] [--chunk 16384]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from ddnerf_tpu.utils.platform import honor_env_platforms

    honor_env_platforms()
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="800")
    ap.add_argument("--chunk", type=int, default=16384)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--logdir", default="/tmp/ddnerf_profile_render")
    ap.add_argument(
        "--pallas-mlp", default="auto",
        help="kernel policy for the profiled renderer (production: auto)",
    )
    ap.add_argument(
        "--flags", default="",
        help="comma-separated variant spec, same syntax as ab_render.py: "
             "MODULE.FLAG=VALUE module globals and cfg.path.key=VALUE "
             "config overrides, applied before building the renderer",
    )
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
    from ddnerf_tpu.utils.profiling import trace as profiler_trace

    from benchmarks.common import flagship_render_cfg_dict

    import importlib

    base = flagship_render_cfg_dict(args.chunk, pallas_mlp=args.pallas_mlp)
    for item in filter(None, (s.strip() for s in args.flags.split(","))):
        target, _, value = item.partition("=")
        if target.startswith("cfg."):
            d = base
            keys = target[4:].split(".")
            for k in keys[:-1]:
                d = d.setdefault(k, {})
            d[keys[-1]] = eval(value)
            continue
        modname, _, flag = target.rpartition(".")
        setattr(importlib.import_module(modname), flag, eval(value))
    cfg = Config.from_dict(base).resolved()
    pipe = NerfPipeline(cfg)
    state = create_train_state(cfg, pipe, jax.random.PRNGKey(0))
    sched = ScheduleValues.for_eval(cfg)
    renderer = ImageRenderer(cfg, pipe, mode="render")

    pose = pose_spherical(30.0, -30.0, 4.0)
    if "x" in args.size:
        w, h = (int(v) for v in args.size.split("x"))
    else:
        w = h = int(args.size)
    focal = 0.5 * w / np.tan(0.5 * 0.6911)

    import time

    def render():
        # Returns per-cycle dicts of fetched numpy maps — the np.asarray
        # fetch inside forces the full device sync, same as render_image.
        return renderer.render_image_from_pose(
            state.params, pose, h, w, focal, jax.random.PRNGKey(0), sched
        )

    render()  # compile + warm
    t0 = time.perf_counter()
    with profiler_trace(args.logdir):
        render()
    dt = time.perf_counter() - t0
    n_rays = w * h
    print(f"{w}x{h}: {dt:.2f} s traced-run wall, {n_rays / dt:,.0f} rays/s")

    from ddnerf_tpu.utils import trace_summary as ts

    trace = ts.find_latest_trace(args.logdir)
    ops = ts.load_device_ops(trace)
    print(ts.format_summary(ts.summarize(ops, steps=1), args.top))
    print()
    print(ts.roofline(ops, steps=1, top=args.top))


if __name__ == "__main__":
    main()
