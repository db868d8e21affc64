"""Depth-analysis pipeline: keypoint YAML -> annotated rays -> densified
per-ray PDFs -> distribution plot image (reference train_model.py:232-236,
eval_nerf.py:66-89)."""

import os

import numpy as np
import pytest

import jax

from ddnerf_tpu.config import Config
from ddnerf_tpu.data.assembly import get_datasets
from ddnerf_tpu.eval.depth_analysis import run_depth_analysis
from ddnerf_tpu.models.nerf import NerfPipeline
from ddnerf_tpu.viz.visualization import get_density_distribution_plots


@pytest.fixture(scope="module")
def da_setup(tmp_path_factory):
    keypoints = tmp_path_factory.mktemp("kp") / "synthetic.yml"
    keypoints.write_text(
        "img_idx: 0\n"
        "resized_by: 1\n"
        "pixels_and_depth:\n"
        "  0: [10, 12, 3.1]\n"
        "  1: [40, 40, 4.0]\n"
        "  2: [55, 20, 3.5]\n"
    )
    cfg = Config.from_dict(
        {
            "train_params": {"depth_analysis_rays": True,
                             "depth_analysis_path": str(keypoints)},
            "dataset": {"type": "blender", "synthetic": True,
                        "downsample_factor": 1, "single_image_mode": False},
            "nerf": {
                "type": "DDNerfModel",
                "coarse_hidden_size": 16,
                "fine_hidden_size": 16,
                "train": {"num_coarse": 6, "num_fine": 6,
                          "radiance_field_noise_std": 0.0},
                "validation": {"num_coarse": 6, "num_fine": 6, "perturb": False,
                               "radiance_field_noise_std": 0.0},
            },
        }
    ).resolved()
    _, val_ds, cfg = get_datasets(cfg)
    return cfg, val_ds


def test_depth_analysis_rays_loaded(da_setup):
    cfg, val_ds = da_setup
    ro, rd, radii, depths, rgb = val_ds.load_depth_analysis_rays(cfg)
    assert ro.shape == (3, 3) and radii.shape == (3, 1)
    assert depths == [3.1, 4.0, 3.5]
    assert rgb.shape == (3, 3)


def test_depth_analysis_outputs_and_plot(da_setup):
    cfg, val_ds = da_setup
    pipe = NerfPipeline(cfg)
    params = pipe.init_params(jax.random.PRNGKey(0))
    ro, rd, radii, depths, _ = val_ds.load_depth_analysis_rays(cfg)

    out = run_depth_analysis(cfg, pipe, params, ro, rd, radii)
    for i in (0, 1):
        pdf = out[i]["uniform_incell_pdf"]
        assert pdf.shape == (3, 1000)
        assert np.isfinite(pdf).all()
    assert out[1]["gaussian_incell_pdf"].shape == (3, 1000)
    assert out[1]["smoothed_gaussian_incell_pdf"].shape == (3, 1000)

    img = get_density_distribution_plots(
        out, 0, depths, cfg.dataset.near, cfg.dataset.far, i=5, tb_mode=True
    )
    assert img.ndim == 3 and img.shape[0] in (3, 4)
    assert img.shape[1] > 100 and img.shape[2] > 100
