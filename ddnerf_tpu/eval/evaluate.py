"""Model evaluation driver.

Rewrite of ``/root/reference/eval_nerf.py:20-165``: loads config + checkpoint
from a logdir, renders up to MAX_VALIDATION_IMAGES validation views, computes
PSNR (coarse/fine), SSIM (two variants), LPIPS (when weights are available),
optionally extracts a point cloud (``xyz = rd*depth + ro``), saves image dumps
and the depth-analysis figures, and writes ``validation/results.txt``.
"""

from __future__ import annotations

import os
import pickle
import time
from collections import defaultdict

import numpy as np

import jax

from ddnerf_tpu.data.assembly import get_datasets
from ddnerf_tpu.eval import metrics as M
from ddnerf_tpu.eval.depth_analysis import run_depth_analysis
from ddnerf_tpu.models.nerf import NerfPipeline, ScheduleValues
from ddnerf_tpu.render.renderer import ImageRenderer
from ddnerf_tpu.train import checkpoint as ckpt
from ddnerf_tpu.train.state import create_train_state
from ddnerf_tpu.viz.visualization import (
    get_density_distribution_plots,
    save_validation_images,
    write_dicts_to_a_file,
)

MAX_VALIDATION_IMAGES = 10  # eval_nerf.py:18


def eval_model(
    basedir: str,
    extract_ptc: bool = False,
    save_images: bool = True,
    lpips_weights: str = None,
    max_images: int = MAX_VALIDATION_IMAGES,
    torch_checkpoint: str = None,
    checkpoint_step: int = None,
):
    """``torch_checkpoint``: path to a reference ``checkpoint.ckpt`` to
    evaluate instead of the logdir's orbax checkpoint (migration path —
    train/torch_compat.py).  ``checkpoint_step`` selects a retained orbax
    step (reference ``--checkpoint``, eval_nerf.py:173-178); default latest."""
    # Pod hygiene: every process participates in the sharded render compute,
    # but only process 0 writes the shared artifacts.
    primary = jax.process_index() == 0
    savedir = os.path.join(basedir, "validation")
    if primary:
        os.makedirs(savedir, exist_ok=True)
    results_file = os.path.join(savedir, "results.txt")

    cfg = ckpt.load_config_snapshot(basedir)
    _, val_ds, cfg = get_datasets(cfg)

    pipeline = NerfPipeline(cfg)
    state = create_train_state(cfg, pipeline, jax.random.PRNGKey(0))
    if torch_checkpoint:
        from ddnerf_tpu.train.torch_compat import load_torch_checkpoint

        loaded = load_torch_checkpoint(torch_checkpoint)
        state = state.replace(params=loaded["params"])
    else:
        manager = ckpt.CheckpointManager(
            basedir, max_to_keep=cfg.experiment.max_keep_ckpts
        )
        state = manager.restore(state, step=checkpoint_step)

    sched = ScheduleValues.for_eval(cfg)  # eval-time fixup (eval_nerf.py:53-55)
    # Multi-chip: pixels shard over the mesh (render-tile parallelism), same
    # as the train loop's validation renderer.
    from ddnerf_tpu.parallel.mesh import maybe_mesh

    # Quality-acceptance metrics are computed from full-precision renders
    # (the reference computes PSNR/SSIM/LPIPS on f32 maps,
    # eval_nerf.py:128-160), so eval ALWAYS uses the exact f32 fetch wire
    # regardless of ``parallel.fetch_dtype`` — results.txt must not depend
    # on a transfer-speed knob.  The half-width wire stays for train-loop
    # validation previews and video frames, where it only feeds uint8 dumps.
    renderer = ImageRenderer(
        cfg.replace_at("parallel.fetch_dtype", "float32"),
        pipeline, maybe_mesh(cfg), mode="render",
    )

    # Depth-analysis pass (eval_nerf.py:66-89).
    if cfg.train_params.depth_analysis_rays and primary:
        ray_plots_dir = os.path.join(savedir, "rays")
        os.makedirs(ray_plots_dir, exist_ok=True)
        da_o, da_d, da_r, da_depth, _ = val_ds.load_depth_analysis_rays(cfg)
        da_out = run_depth_analysis(cfg, pipeline, state.params, da_o, da_d, da_r, sched)
        import imageio.v2 as imageio

        for j in range(len(da_depth)):
            img = get_density_distribution_plots(
                da_out, j, da_depth, cfg.dataset.near, cfg.dataset.far,
                tb_mode=False,
            )
            imageio.imwrite(
                os.path.join(ray_plots_dir, f"ray_{j}.png"),
                img.transpose(1, 2, 0),
            )
        with open(os.path.join(savedir, "ray_dict.pkl"), "wb") as f:
            pickle.dump(
                {k: {kk: np.asarray(vv) for kk, vv in v.items()}
                 for k, v in da_out.items()},
                f,
            )

    lpips = M.Lpips(lpips_weights)

    summary = defaultdict(list)
    per_image = {}
    n_images = min(max_images, len(val_ds))
    model_time = []

    # Collect the round-robin poses up front so the renderer can pipeline:
    # image i+1's device program is dispatched before image i's maps are
    # fetched (render_images_from_poses), overlapping compute with the
    # host transfer.  Per-image results are identical to the serial loop.
    poses_gts = [val_ds.get_next_validation_pose() for _ in range(n_images)]
    outs = iter(renderer.render_images_from_poses(
        state.params, [p for p, _ in poses_gts], val_ds.H, val_ds.W,
        val_ds.focal, sched=sched,
    ))
    for i, (pose, gt) in enumerate(poses_gts):
        t0 = time.time()
        out = next(outs)  # waits on dispatch + this image's map fetch
        model_time.append(time.time() - t0)

        if extract_ptc and primary:
            # xyz = rd * depth + ro (eval_nerf.py:113-122); the point cloud
            # uses the same (possibly NDC-projected) rays the render used,
            # re-bundled on host for this pose.
            ro, rd, _ = val_ds._bundle(pose)
            xyz = rd * out[1]["depth"][..., None] + ro
            rgbs = np.clip(out[1]["rgb"], 0, 1)
            ptc = np.concatenate([xyz.reshape(-1, 3), rgbs.reshape(-1, 3)], axis=-1)
            np.save(os.path.join(savedir, f"ptc_{i}.npy"), ptc)

        if save_images and primary:
            img_dir = os.path.join(savedir, str(i))
            save_validation_images(out, img_dir)
            import imageio.v2 as imageio

            imageio.imwrite(
                os.path.join(img_dir, "gt.png"),
                (np.clip(gt, 0, 1) * 255).astype(np.uint8),
            )

        res = {
            "psnr_coarse": M.psnr(out[0]["rgb"], gt),
            "psnr_fine": M.psnr(out[1]["rgb"], gt),
        }
        ssim_c = M.calc_ssim(out[0]["rgb"], gt)
        ssim_f = M.calc_ssim(out[1]["rgb"], gt)
        res["ssim_v1_coarse"], res["ssim_v2_coarse"] = ssim_c
        res["ssim_v1_fine"], res["ssim_v2_fine"] = ssim_f
        if lpips.available:
            res["lpips_coarse"] = lpips(out[0]["rgb"], gt)
            res["lpips_fine"] = lpips(out[1]["rgb"], gt)

        per_image[i] = res
        for k, v in res.items():
            summary[k].append(v)
        print(f"image {i}: " + " ".join(f"{k}={v:.4f}" for k, v in res.items()))

    summary["model_time_sec"] = model_time
    if primary:
        write_dicts_to_a_file(summary, per_image, results_file)
    print(f"avg model time per image: {np.mean(model_time):.2f}s")
    print(f"results written to {results_file}")
    return summary, per_image
