"""Documenter: TensorBoard event files + metrics.jsonl channels."""

import glob
import json
import os

import numpy as np
import pytest

from ddnerf_tpu.viz.documentation import Documenter
from ddnerf_tpu.viz.visualization import (
    cast_to_disparity_image,
    cast_to_image,
    write_dicts_to_a_file,
)


def _metrics(dd=True):
    m = {"loss": 0.5, "loss_coarse": 0.3, "loss_fine": 0.2,
         "psnr_coarse": 20.0, "psnr_fine": 22.0, "lr": 1e-4}
    if dd:
        m.update(dp_loss=0.1, sig_reg=0.01, sig_loss=0.2, mus_reg=0.01,
                 mus_loss=0.2)
    return m


def test_documenter_jsonl_and_tensorboard(tmp_path):
    logdir = str(tmp_path)
    doc = Documenter(logdir, use_tensorboard=True)
    doc.write_train_iter(0, _metrics())
    doc.write_train_iter(1, _metrics())

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (8, 8, 3)).astype(np.float32)
    disp = rng.uniform(0, 1, (8, 8)).astype(np.float32)
    out = {
        0: {"rgb": img, "disp": disp, "corrected_disp_map": disp,
            "mus_hist": rng.uniform(0, 1, 30), "sigmas_hist": rng.uniform(0, 1, 30),
            "smoothed_sigmas_hist": rng.uniform(0, 1, 30)},
        1: {"rgb": img, "disp": disp},
    }
    doc.write_valid_iter(1, _metrics(), out, img, is_ddnerf=True)
    doc.close()

    # jsonl channel
    lines = [json.loads(l) for l in open(os.path.join(logdir, "metrics.jsonl"))]
    assert sum(1 for l in lines if l["kind"] == "train") == 2
    assert sum(1 for l in lines if l["kind"] == "validation") == 1

    # tensorboard channel (tensorboardX availability permitting)
    events = glob.glob(os.path.join(logdir, "events.out.tfevents.*"))
    if doc.writer is not None or events:
        assert events, "no TB event file written"
        assert os.path.getsize(events[0]) > 100


def test_image_casts():
    img = np.linspace(0, 1, 8 * 8 * 3, dtype=np.float32).reshape(8, 8, 3)
    out = cast_to_image(img)
    assert out.shape == (3, 8, 8) and out.dtype == np.uint8
    assert out.max() == 255

    disp = np.linspace(2.0, 6.0, 64, dtype=np.float32).reshape(8, 8)
    dout = cast_to_disparity_image(disp)
    assert dout.shape == (1, 8, 8) and dout.dtype == np.uint8
    assert dout.min() == 0 and dout.max() == 255


def test_results_txt_format(tmp_path):
    path = os.path.join(tmp_path, "results.txt")
    write_dicts_to_a_file(
        {"psnr_fine": [30.0, 32.0]},
        {0: {"psnr_fine": 30.0}, 1: {"psnr_fine": 32.0}},
        path,
    )
    content = open(path).read()
    assert "average overall results" in content
    assert "psnr_fine: \t 31.0" in content
    assert "image 1 , psnr_fine" in content


def test_disparity_cast_handles_nan():
    disp = np.array([[1.0, np.nan], [np.inf, 2.0]], np.float32)
    out = cast_to_disparity_image(disp)
    assert out.dtype == np.uint8
    assert np.isfinite(out.astype(np.float32)).all()


def test_valid_iter_with_empty_histograms(tmp_path):
    """pdf > 0.1 can select zero sections early in training; an empty
    mu/sigma histogram must be skipped, not crash tensorboardX
    (regression: ValueError 'The input has no element.')."""
    doc = Documenter(str(tmp_path), use_tensorboard=True)
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (8, 8, 3)).astype(np.float32)
    disp = rng.uniform(0, 1, (8, 8)).astype(np.float32)
    empty = np.zeros((0,), np.float32)
    out = {
        0: {"rgb": img, "disp": disp, "corrected_disp_map": disp,
            "mus_hist": empty, "sigmas_hist": empty,
            "smoothed_sigmas_hist": empty},
        1: {"rgb": img, "disp": disp},
    }
    doc.write_valid_iter(0, _metrics(), out, img, is_ddnerf=True)
    doc.close()


def test_non_primary_documenter_is_noop(tmp_path):
    """On multi-host pods only process 0 writes the shared logdir; a
    non-primary Documenter must produce no files and accept all calls."""
    logdir = str(tmp_path / "sub")
    doc = Documenter(logdir, use_tensorboard=True, primary=False)
    doc.write_train_iter(0, _metrics())
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (4, 4, 3)).astype(np.float32)
    disp = rng.uniform(0, 1, (4, 4)).astype(np.float32)
    out = {0: {"rgb": img, "disp": disp}, 1: {"rgb": img, "disp": disp}}
    doc.write_valid_iter(0, _metrics(dd=False), out, img, is_ddnerf=False)
    doc.close()
    assert not os.path.exists(logdir)
