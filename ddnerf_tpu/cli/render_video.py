"""CLI: video rendering.  Mirrors ``python render_video.py --logdir ...
[--save_images]`` (reference render_video.py:109-122)."""

import argparse

from ddnerf_tpu.render.video import render_model_video


def main():
    from ddnerf_tpu.utils.platform import honor_env_platforms

    honor_env_platforms()  # JAX_PLATFORMS beats ambient forced platform
    from ddnerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--logdir", type=str, required=True)
    parser.add_argument("--save_images", action="store_true")
    parser.add_argument("--max-frames", type=int, default=0)
    parser.add_argument("--checkpoint", type=int, default=None,
                        help="Render from a specific retained checkpoint "
                             "step (default: latest).")
    args = parser.parse_args()

    render_model_video(args.logdir, save_images=args.save_images,
                       max_frames=args.max_frames,
                       checkpoint_step=args.checkpoint)


if __name__ == "__main__":
    main()
