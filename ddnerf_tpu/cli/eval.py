"""CLI: evaluation.  Mirrors ``python eval_nerf.py --logdir ...
[--save_images --extract_ptc]`` (reference eval_nerf.py:168-181)."""

import argparse

from ddnerf_tpu.eval.evaluate import eval_model


def main():
    from ddnerf_tpu.utils.platform import honor_env_platforms

    honor_env_platforms()  # JAX_PLATFORMS beats ambient forced platform
    from ddnerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--logdir", type=str, required=True,
                        help="Experiment logdir (contains config.yml + checkpoint).")
    parser.add_argument("--save_images", action="store_true")
    parser.add_argument("--extract_ptc", action="store_true",
                        help="Extract a point cloud per validation image.")
    parser.add_argument("--lpips-weights", type=str, default=None,
                        help="Path to local AlexNet-LPIPS weights (.npz).")
    parser.add_argument("--max-images", type=int, default=10,
                        help="Cap on validation images (reference "
                             "MAX_VALIDATION_IMAGES=10).")
    parser.add_argument("--torch-checkpoint", type=str, default=None,
                        help="Evaluate a reference torch checkpoint.ckpt "
                             "instead of the logdir's orbax checkpoint.")
    parser.add_argument("--checkpoint", type=int, default=None,
                        help="Evaluate a specific retained checkpoint step "
                             "(reference eval_nerf.py:173-178; default: "
                             "latest).")
    args = parser.parse_args()

    eval_model(
        args.logdir,
        extract_ptc=args.extract_ptc,
        save_images=args.save_images,
        lpips_weights=args.lpips_weights,
        max_images=args.max_images,
        torch_checkpoint=args.torch_checkpoint,
        checkpoint_step=args.checkpoint,
    )


if __name__ == "__main__":
    main()
