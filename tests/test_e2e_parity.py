"""End-to-end forward parity against the torch reference.

The reference DDNerfModel/GeneralMipNerfModel is instantiated with its own
CfgNode config, its weights are transplanted into our pipeline, and both run
the SAME rays through the full coarse→fine pass with deterministic sampling
(perturb off, noise off).  Outputs must agree elementwise — this covers
stratified sampling, frustum Gaussians, IPE, the MLPs, volume rendering, the
truncated-Gaussian resampler, and the dp loss in one shot.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddnerf_tpu.config import Config
from ddnerf_tpu.models.nerf import NerfPipeline, RayBatch, ScheduleValues

from conftest import REFERENCE_PATH, reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="torch reference not available"
)

N_RAYS = 24
HIDDEN = 32
NUM_COARSE = 8
NUM_FINE = 8


def _cfg_dict(nerf_type, ds_type):
    mode = {
        "num_random_rays": N_RAYS,
        "chunksize": 4096,
        "perturb": False,
        "num_coarse": NUM_COARSE,
        "num_fine": NUM_FINE,
        "white_background": False,
        "radiance_field_noise_std": 0.0,
        "lindisp": False,
    }
    return {
        "experiment": {"train_iters": 100},
        "train_params": {
            "pdf_padding": True,
            "max_pdf_pad_iters": 100,
            "gaussian_smooth_factor": 1.5,
            "final_smooth": 1.1,
            "finnish_smooth": 100,
            "dist_reg_coeficient": 0.05,
            "set_automatic_dist_reg_coeficient": False,
            "loss_coeficients": [1, 1],
            "dp_coeficient": 0.1,
            "depth_analysis_rays": False,
        },
        "dataset": {"type": ds_type, "basedir": "x", "near": 2.0, "far": 6.0,
                    "ndc_rays": False, "combined_sampling_method": False},
        "nerf": {
            "type": nerf_type,
            "coarse_hidden_size": HIDDEN,
            "fine_hidden_size": HIDDEN,
            "ray_shape": "cone",
            "train": dict(mode),
            "validation": dict(mode),
        },
    }


def _transplant(torch_model):
    """torch MLP -> flax param dict (same layout as models/mlp.py).

    ``t2j`` must COPY: ``jnp.asarray`` of a torch ``.numpy()`` view can be
    zero-copy on the CPU backend, and the co-training harnesses keep the
    transplanted tree as the pre-training snapshot while torch's Adam
    updates the parameters IN PLACE — an aliased leaf would silently turn
    the "identical initial weights" premise into "torch's trained
    weights" (observed: the snapshot checksum changed after torch
    training before this copy was forced)."""
    def t2j(t):
        return jnp.asarray(np.array(t.detach().numpy()))

    p = {}
    for i in range(8):
        p[f"trunk_{i}"] = {
            "kernel": t2j(torch_model.layers_xyz[i].weight).T,
            "bias": t2j(torch_model.layers_xyz[i].bias),
        }
    p["fc_feat"] = {"kernel": t2j(torch_model.fc_feat.weight).T,
                    "bias": t2j(torch_model.fc_feat.bias)}
    p["fc_alpha"] = {"kernel": t2j(torch_model.fc_alpha.weight).T,
                     "bias": t2j(torch_model.fc_alpha.bias)}
    p["dir_0"] = {"kernel": t2j(torch_model.layers_dir[0].weight).T,
                  "bias": t2j(torch_model.layers_dir[0].bias)}
    p["fc_rgb"] = {"kernel": t2j(torch_model.fc_rgb.weight).T,
                   "bias": t2j(torch_model.fc_rgb.bias)}
    if hasattr(torch_model, "fc_mu_sigma"):
        p["fc_mu_sigma"] = {"kernel": t2j(torch_model.fc_mu_sigma.weight).T,
                            "bias": t2j(torch_model.fc_mu_sigma.bias)}
    return p


def _rays(seed=0):
    rng = np.random.default_rng(seed)
    ro = rng.uniform(-1, 1, (N_RAYS, 3)).astype(np.float32)
    rd = rng.standard_normal((N_RAYS, 3)).astype(np.float32)
    radii = np.full((N_RAYS, 1), 0.01, np.float32)
    return ro, rd, radii


@requires_reference
@pytest.mark.parametrize("nerf_type,ds_type", [
    ("DDNerfModel", "blender"),
    ("DDNerfModel", "llff"),
    ("GeneralMipNerfModel", "blender"),
])
def test_full_forward_parity(nerf_type, ds_type):
    import sys

    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import torch
    from general_utils.cfgnode import CfgNode
    from models import models as ref_models

    d = _cfg_dict(nerf_type, ds_type)
    ref_cfg = CfgNode(d)
    torch.manual_seed(0)
    ref_model = getattr(ref_models, nerf_type)(ref_cfg)
    ref_model.eval()

    ro, rd, radii = _rays()
    with torch.no_grad():
        out_ref = ref_model.run_iter(
            torch.tensor(ro), torch.tensor(rd), torch.tensor(radii),
            mode="train", rgb_target=torch.zeros(N_RAYS, 3),
        )

    cfg = Config.from_dict(d)
    pipe = NerfPipeline(cfg)
    params = {"coarse": _transplant(ref_model.coarse)}
    if nerf_type == "DDNerfModel":
        params["fine"] = _transplant(ref_model.fine)
    sched = ScheduleValues(
        gaussian_smooth_factor=jnp.asarray(1.5), pdf_padding=jnp.asarray(True)
    )
    rays = RayBatch.create(
        jnp.asarray(ro), jnp.asarray(rd), jnp.asarray(radii), 2.0, 6.0
    )
    out = pipe.render_rays(params, rays, jax.random.PRNGKey(0), sched, "train")

    for i in (0, 1):
        for key in ("rgb", "disp", "acc", "depth"):
            np.testing.assert_allclose(
                np.asarray(out[i][key]),
                out_ref[i][key].numpy(),
                rtol=2e-3, atol=2e-4,
                err_msg=f"{nerf_type}/{ds_type} cycle {i} {key}",
            )
        np.testing.assert_allclose(
            np.asarray(out[i]["weights"]), out_ref[i]["weights"].numpy(),
            rtol=2e-3, atol=2e-4, err_msg=f"cycle {i} weights",
        )

    if nerf_type == "DDNerfModel":
        np.testing.assert_allclose(
            float(out[1]["dp_loss"]), out_ref[1]["dp_loss"].item(),
            rtol=5e-3, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(out[0]["corrected_disp_map"]),
            out_ref[0]["corrected_disp_map"].numpy(),
            rtol=2e-3, atol=2e-4,
        )
