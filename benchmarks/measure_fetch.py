"""Pure-wire measurement of the packed render-map fetch (verdict r4 #4).

The shipped 800x800 pipelined render measured 0.71 s/img against a 0.62 s
device floor (round 4); this bench separates the residual: it dispatches
the production pose program ONCE, then times repeated host fetches of the
same packed wire buffer — no device compute in the timed region — giving
the relay's effective B/s for exactly the production transfer.  If
bytes/B_s accounts for the gap, the residual is transfer-bandwidth-bound
(irreducible without a narrower wire); if fetches are much faster, the
gap is pipeline depth (fixable with deeper lookahead).

Run:  python benchmarks/measure_fetch.py [--size 800] [--reps 8]
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
    ap.add_argument("--size", default="800")
    ap.add_argument("--chunk", type=int, default=16384)
    ap.add_argument("--reps", type=int, default=8)
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

    from benchmarks.common import flagship_render_cfg_dict

    cfg = Config.from_dict(
        flagship_render_cfg_dict(args.chunk, pallas_mlp="auto")
    ).resolved()
    pipe = NerfPipeline(cfg)
    state = create_train_state(cfg, pipe, jax.random.PRNGKey(0))
    sched = ScheduleValues.for_eval(cfg)
    renderer = ImageRenderer(cfg, pipe, mode="render")

    if "x" in args.size:
        w, h = (int(v) for v in args.size.split("x"))
    else:
        w = h = int(args.size)
    focal = 0.5 * w / np.tan(0.5 * 0.6911)
    pose = pose_spherical(30.0, -30.0, 4.0)

    # One DISTINCT dispatch per rep: np.asarray of the same jax.Array is
    # answered from its cached host copy after the first fetch, so reusing
    # one buffer would time a memcpy, not the wire.
    outs = [renderer._dispatch_pose(state.params, pose, h, w, focal, None,
                                    sched)[0][0] for _ in range(args.reps)]
    jax.block_until_ready(outs)  # device compute done; only the wire next
    packed = outs[0]
    nbytes = packed.size * packed.dtype.itemsize
    print(f"packed wire buffer: {packed.shape} {packed.dtype} "
          f"= {nbytes / 1e6:.1f} MB")

    times = []
    for r, buf in enumerate(outs):
        t0 = time.perf_counter()
        np.asarray(buf)
        dt = time.perf_counter() - t0
        times.append(dt)
        print(f"fetch {r}: {dt * 1e3:.1f} ms  ({nbytes / dt / 1e6:,.0f} MB/s)",
              flush=True)
    med = sorted(times)[len(times) // 2]
    print(f"median fetch: {med * 1e3:.1f} ms = {nbytes / med / 1e6:,.0f} MB/s "
          f"({h}x{w} image)")

    # Full per-image wall on the pipelined path for the same session, so
    # the gap decomposition uses one link state.
    poses = [pose_spherical(30.0 + 10 * i, -30.0, 4.0) for i in range(6)]
    for _ in renderer.render_images_from_poses(state.params, poses[:1], h, w,
                                               focal, sched=sched):
        pass  # warm
    t0 = time.perf_counter()
    for _ in renderer.render_images_from_poses(state.params, poses, h, w,
                                               focal, sched=sched):
        pass
    wall = (time.perf_counter() - t0) / len(poses)
    print(f"pipelined wall this session: {wall:.3f} s/img "
          f"(fetch share {med / wall * 100:.0f}%)")


if __name__ == "__main__":
    main()
