"""Render-path benchmark (companion to the train-path bench.py).

Measures whole-image rendering throughput for the flagship DDNeRF model at
several image sizes, via the on-device lax.map renderer.  Prints one JSON
line per size.

Run:  python benchmarks/bench_render.py [--sizes 400 800 1920x1080]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from ddnerf_tpu.utils.platform import honor_env_platforms

    honor_env_platforms()
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", nargs="*", default=["800", "1920x1080"])
    ap.add_argument("--chunk", type=int, default=16384)
    args = ap.parse_args()

    import jax

    from ddnerf_tpu.config import Config
    from ddnerf_tpu.core.rays import get_ray_bundle
    from ddnerf_tpu.data.synthetic import pose_spherical
    from ddnerf_tpu.models.nerf import NerfPipeline, ScheduleValues
    from ddnerf_tpu.render.renderer import ImageRenderer
    from ddnerf_tpu.train.state import create_train_state

    cfg = Config.from_dict(
        {
            "nerf": {
                "type": "DDNerfModel",
                "coarse_hidden_size": 256,
                "fine_hidden_size": 256,
                "train": {"num_coarse": 32, "num_fine": 32},
                "validation": {"num_coarse": 32, "num_fine": 32, "perturb": False,
                               "chunksize": args.chunk},
            },
            "dataset": {"type": "blender", "synthetic": True},
            "parallel": {"compute_dtype": "bfloat16"},
        }
    ).resolved()
    pipe = NerfPipeline(cfg)
    state = create_train_state(cfg, pipe, jax.random.PRNGKey(0))
    sched = ScheduleValues.for_eval(cfg)
    renderer = ImageRenderer(cfg, pipe, mode="render")

    pose = pose_spherical(30.0, -30.0, 4.0)
    for size in args.sizes:
        if "x" in size:
            w, h = (int(v) for v in size.split("x"))
        else:
            w = h = int(size)
        focal = 0.5 * w / np.tan(0.5 * 0.6911)
        ro, rd, radii = get_ray_bundle(h, w, focal, pose)
        renderer.render_image(state.params, ro, rd, radii, sched=sched)  # warm
        t0 = time.time()
        renderer.render_image(state.params, ro, rd, radii, sched=sched)
        dt = time.time() - t0
        print(
            json.dumps(
                {
                    "metric": f"DDNeRF render {w}x{h} (s/image)",
                    "value": round(dt, 2),
                    "unit": "sec/image",
                    "rays_per_sec": round(h * w / dt),
                }
            )
        )


if __name__ == "__main__":
    main()
