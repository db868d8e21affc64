"""CLI: training.  Mirrors ``python train_model.py --config X.yml
[--load-checkpoint path]`` (reference train_model.py:21-32)."""

import argparse

from ddnerf_tpu.config import load_config
from ddnerf_tpu.train.loop import train


def main():
    from ddnerf_tpu.utils.platform import honor_env_platforms

    honor_env_platforms()  # JAX_PLATFORMS beats ambient forced platform
    import os

    from ddnerf_tpu.utils.cache import enable_compilation_cache

    # Multi-host pods require jax.distributed before any backend use;
    # auto-detected on TPU pods (opt-in: the single-host default must not
    # try to reach a coordinator).
    if os.environ.get("DDNERF_MULTIHOST") == "1":
        import jax

        jax.distributed.initialize()

    enable_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True,
                        help="Path to (.yml) config file.")
    parser.add_argument("--load-checkpoint", type=str, default="",
                        help="Path to a logdir to resume from.")
    parser.add_argument("--max-iters", type=int, default=0,
                        help="Override experiment.train_iters (0 = use config).")
    parser.add_argument("--profile-steps", type=int, default=0,
                        help="Capture a jax.profiler trace of N steady-state "
                             "steps into the logdir.")
    parser.add_argument("--debug-nans", action="store_true",
                        help="Enable jax_debug_nans: raise at the op that "
                             "produces a NaN (CI/sanitizer mode, slower).")
    parser.add_argument("opts", nargs="*", default=[],
                        help="Config overrides as 'dot.path value' pairs "
                             "(reference CfgNode.merge_from_list, "
                             "cfgnode.py:208), e.g. "
                             "nerf.train.num_coarse 64 optimizer.lr_init 1e-3")
    args = parser.parse_args()

    cfg = load_config(args.config)
    if args.opts:
        cfg = cfg.merge_from_list(args.opts).resolved()
    from ddnerf_tpu.utils.debug import nan_debug_mode

    with nan_debug_mode(args.debug_nans):
        train(cfg, load_checkpoint=args.load_checkpoint,
              max_iters=args.max_iters or None,
              profile_steps=args.profile_steps)
    print("Done!")


if __name__ == "__main__":
    main()
