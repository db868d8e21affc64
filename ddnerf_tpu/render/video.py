"""Video rendering driver.

Rewrite of ``/root/reference/render_video.py:17-106``: loads config +
checkpoint from a logdir, renders the dataset's spiral/spherical render-pose
path, and writes a side-by-side rgb|disparity video at 24fps (+ optional
per-frame PNGs).
"""

from __future__ import annotations

import os
import time

import numpy as np

import jax

from ddnerf_tpu.data.assembly import get_datasets
from ddnerf_tpu.models.nerf import NerfPipeline, ScheduleValues
from ddnerf_tpu.render.renderer import ImageRenderer
from ddnerf_tpu.train import checkpoint as ckpt
from ddnerf_tpu.train.state import create_train_state


def render_model_video(basedir: str, save_images: bool = False, fps: int = 24,
                       max_frames: int = 0, checkpoint_step: int = None):
    # Pod hygiene: all processes render (sharded compute), process 0 writes.
    primary = jax.process_index() == 0
    savedir = os.path.join(basedir, "video")
    if primary:
        os.makedirs(savedir, exist_ok=True)

    cfg = ckpt.load_config_snapshot(basedir)
    _, val_ds, cfg = get_datasets(cfg)

    pipeline = NerfPipeline(cfg)
    state = create_train_state(cfg, pipeline, jax.random.PRNGKey(0))
    state = ckpt.CheckpointManager(
        basedir, max_to_keep=cfg.experiment.max_keep_ckpts
    ).restore(state, step=checkpoint_step)
    sched = ScheduleValues.for_eval(cfg)

    # Video frames need only the fine rgb + disparity — fetching fewer maps
    # halves the device->host transfer per frame.
    from ddnerf_tpu.parallel.mesh import maybe_mesh

    renderer = ImageRenderer(cfg, pipeline, maybe_mesh(cfg), mode="render",
                             extract_keys=("rgb", "disp"))
    h, w = val_ds.H, val_ds.W

    import cv2

    writer = None
    if primary:
        writer = cv2.VideoWriter(
            os.path.join(savedir, "video.avi"),
            cv2.VideoWriter_fourcc(*"DIVX"),
            fps,
            (2 * w, h),
        )

    n = len(val_ds.render_poses)
    if max_frames:
        n = min(n, max_frames)
    times = []
    # Ray generation AND uint8 quantization run on device: the frame
    # upload is one [4,4] pose, the download two uint8 maps; frames are
    # dispatched with one frame of lookahead so frame idx+1 renders while
    # the host encodes frame idx (renderer.render_video_frames_from_poses).
    frames = iter(renderer.render_video_frames_from_poses(
        state.params, [val_ds.render_poses[i] for i in range(n)], h, w,
        val_ds.focal, sched=sched,
    ))
    for idx in range(n):
        t0 = time.time()
        rgb, disp = next(frames)
        times.append(time.time() - t0)
        disp3 = np.stack([disp] * 3, axis=-1)
        frame = np.concatenate([rgb, disp3], axis=1)  # H, 2W, 3
        if writer is not None:
            writer.write(frame[..., ::-1])  # cv2 expects BGR

        if save_images and primary:
            import imageio.v2 as imageio

            imageio.imwrite(os.path.join(savedir, f"frame_{idx:04d}.png"), frame)
        print(f"frame {idx}/{n} ({times[-1]:.2f}s)")

    if writer is not None:
        writer.release()
        print(f"avg render time per frame: {np.mean(times):.2f}s")
        print(f"video written to {os.path.join(savedir, 'video.avi')}")
