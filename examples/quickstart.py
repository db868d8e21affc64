"""Quickstart: train DDNeRF on the built-in synthetic scene, evaluate, and
render a short video — no dataset required.

    python examples/quickstart.py [--iters 2000] [--logdir logs/quickstart]

For real data, point configs/blender_dd.yml's dataset.basedir at a
NeRF-synthetic scene (or configs/ff_dd.yml at an LLFF capture) and use the
CLI entry points instead (README "Usage").
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from ddnerf_tpu.utils.platform import honor_env_platforms

    honor_env_platforms()  # JAX_PLATFORMS beats ambient forced platform
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--logdir", default="logs/quickstart")
    args = ap.parse_args()

    from ddnerf_tpu.config import Config
    from ddnerf_tpu.eval.evaluate import eval_model
    from ddnerf_tpu.render.video import render_model_video
    from ddnerf_tpu.train.loop import train
    from ddnerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    cfg = Config.from_dict(
        {
            "experiment": {
                "id": "quickstart",
                "logdir": args.logdir,
                "train_iters": args.iters + 1,
                "validate_every": max(args.iters // 4, 1),
                "save_every": max(args.iters // 2, 1),
                "print_every": max(args.iters // 20, 1),
            },
            "train_params": {
                "max_pdf_pad_iters": args.iters // 2,
                "finnish_smooth": args.iters,
            },
            "dataset": {"type": "blender", "synthetic": True,
                        "single_image_mode": False},
            "nerf": {
                "type": "DDNerfModel",
                "coarse_hidden_size": 256,
                "fine_hidden_size": 256,
                "train": {"num_coarse": 32, "num_fine": 32,
                          "num_random_rays": 2048,
                          "radiance_field_noise_std": 1.0},
                "validation": {"num_coarse": 32, "num_fine": 32,
                               "perturb": False, "chunksize": 16384},
            },
            "parallel": {"compute_dtype": "bfloat16"},
        }
    ).resolved()

    print(f"Training DDNeRF for {args.iters} iterations ...")
    state, logdir = train(cfg)
    print(f"\nEvaluating (PSNR/SSIM -> {logdir}/validation/results.txt) ...")
    eval_model(logdir, save_images=True, max_images=2)
    print("\nRendering a short spherical-path video ...")
    render_model_video(logdir, max_frames=10)
    print(f"\nDone. Artifacts under {logdir}/")


if __name__ == "__main__":
    main()
