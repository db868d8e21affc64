"""CLI surface smoke tests: entry points parse args and fail helpfully."""

import subprocess
import sys


def _help(mod):
    return subprocess.run(
        [sys.executable, "-m", mod, "--help"],
        capture_output=True, text=True, timeout=120,
        env={"JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": "",
             "PATH": "/usr/bin:/bin:/usr/local/bin", "HOME": "/root"},
        cwd="/root/repo",
    )


def test_train_cli_help():
    r = _help("ddnerf_tpu.cli.train")
    assert r.returncode == 0
    assert "--config" in r.stdout and "--load-checkpoint" in r.stdout


def test_eval_cli_help():
    r = _help("ddnerf_tpu.cli.eval")
    assert r.returncode == 0
    assert "--logdir" in r.stdout and "--extract_ptc" in r.stdout
    assert "--torch-checkpoint" in r.stdout


def test_render_video_cli_help():
    r = _help("ddnerf_tpu.cli.render_video")
    assert r.returncode == 0
    assert "--logdir" in r.stdout and "--save_images" in r.stdout
