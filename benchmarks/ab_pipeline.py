"""Serial vs dispatch-pipelined multi-image render (eval/video workload).

render_images_from_poses dispatches image i+1's device program before
fetching image i's maps, so device compute overlaps the device->host map
transfer (which otherwise strictly serializes with it: a TPU program and
a host fetch of its outputs cannot overlap for the SAME image).  The f32
all-maps fetch at 800x800 is comparable to device time on relayed links,
so the overlap is worth ~+50% multi-image throughput there (PERF.md
round-4 tenth pass); on fast PCIe hosts the win shrinks to the fetch
share but never reverses — per-image outputs are identical either way.

Run:  python benchmarks/ab_pipeline.py [--size 800] [--images 6] [--rounds 3]
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
    ap.add_argument("--images", type=int, default=6)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--chunk", type=int, default=16384)
    ap.add_argument(
        "--fetch-ab", default=None, metavar="DTYPE",
        help="alias for --cfg-ab parallel.fetch_dtype=DTYPE: interleave a "
             "second renderer with that wire dtype against the shipped "
             "config's wire, pipelined runs only",
    )
    ap.add_argument(
        "--pack-ab", action="store_true",
        help="interleave packed (one wire array per image) vs unpacked "
             "(one buffer per map) fetch on the production wire dtype",
    )
    ap.add_argument(
        "--cfg-ab", default=None, metavar="PATH=VALUE",
        help="interleave a second renderer with one config override "
             "(e.g. parallel.ipe_transposed=False) against the shipped "
             "config, pipelined runs only",
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
    poses = [pose_spherical(30.0 + 10 * i, -30.0, 4.0)
             for i in range(args.images)]
    m = args.images

    renderer.render_image_from_pose(
        state.params, poses[0], h, w, focal, sched=sched
    )  # compile + warm

    if args.pack_ab:
        # Packed vs unpacked fetch, interleaved.  PACKED_FETCH is read at
        # trace time, so each renderer is warmed (traced) under its flag.
        from ddnerf_tpu.render import renderer as rmod

        rmod.PACKED_FETCH = False
        unpacked = ImageRenderer(cfg, pipe, mode="render")
        unpacked.render_image_from_pose(
            state.params, poses[0], h, w, focal, sched=sched)
        rmod.PACKED_FETCH = True

        def run(rd):
            t0 = time.perf_counter()
            for _ in rd.render_images_from_poses(state.params, poses, h, w,
                                                 focal, sched=sched):
                pass
            return time.perf_counter() - t0

        for r in range(args.rounds):
            pk, up = run(renderer), run(unpacked)
            print(
                f"round {r}: packed {pk / m:.3f} s/img "
                f"({h * w * m / pk:,.0f} rays/s) | unpacked {up / m:.3f} "
                f"s/img ({h * w * m / up:,.0f} rays/s)",
                flush=True,
            )
        return

    if args.fetch_ab and not args.cfg_ab:
        # --fetch-ab is the wire-dtype special case of the generic config
        # A/B; delegate instead of maintaining a second timing harness.
        args.cfg_ab = f"parallel.fetch_dtype={args.fetch_ab!r}"

    if args.cfg_ab:
        # Interleaved A/B of one config switch on the PIPELINED path (the
        # production eval/video fetch overlap, where device time is the
        # per-image bound): shipped config vs the override.
        path, _, raw = args.cfg_ab.partition("=")
        cfg_b = cfg.replace_at(path, eval(raw))
        pipe_b = NerfPipeline(cfg_b)
        other = ImageRenderer(cfg_b, pipe_b, mode="render")
        other.render_image_from_pose(
            state.params, poses[0], h, w, focal, sched=sched
        )  # compile + warm

        def run_r(rd):
            t0 = time.perf_counter()
            for _ in rd.render_images_from_poses(state.params, poses, h, w,
                                                 focal, sched=sched):
                pass
            return time.perf_counter() - t0

        ships, others = [], []
        for r in range(args.rounds):
            a, b = run_r(renderer), run_r(other)
            ships.append(a)
            others.append(b)
            print(
                f"round {r}: ship {a / m:.3f} s/img "
                f"({h * w * m / a:,.0f} rays/s) | {args.cfg_ab} {b / m:.3f} "
                f"s/img ({h * w * m / b:,.0f} rays/s)",
                flush=True,
            )
        med = sorted(ships)[len(ships) // 2]
        medo = sorted(others)[len(others) // 2]
        print(f"ship median {med / m:.3f} s/img | {args.cfg_ab} median "
              f"{medo / m:.3f} s/img")
        return

    for r in range(args.rounds):
        t0 = time.perf_counter()
        for p in poses:
            renderer.render_image_from_pose(state.params, p, h, w, focal,
                                            sched=sched)
        serial = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in renderer.render_images_from_poses(state.params, poses, h, w,
                                                   focal, sched=sched):
            pass
        piped = time.perf_counter() - t0
        print(
            f"round {r}: serial {serial / m:.3f} s/img "
            f"({h * w * m / serial:,.0f} rays/s) | pipelined "
            f"{piped / m:.3f} s/img ({h * w * m / piped:,.0f} rays/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
