"""Measure the torch reference's training throughput (rays/sec) on this
machine, producing BASELINE_MEASURED.json.

The reference publishes no numbers (SURVEY.md §6), so the baseline must be
measured by running it.  This drives the reference's own
``DDNerfModel.run_iter`` + loss + backward + Adam step (the train_model.py
hot loop, :152-177) on the default blender workload: 2048 rays x
(32 coarse + 32 fine + 1) samples, 256-wide MLPs, chunksize 16384.

Run:  python benchmarks/measure_reference.py [--iters N]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--rays", type=int, default=2048)
    ap.add_argument("--out", default=os.path.join(REPO, "BASELINE_MEASURED.json"))
    args = ap.parse_args()

    sys.path.insert(0, REFERENCE)
    import torch
    import yaml

    from general_utils.cfgnode import CfgNode
    from models import models as ref_models

    with open(os.path.join(REFERENCE, "configs", "config_blender.yml")) as f:
        cfg = CfgNode(yaml.safe_load(f))

    device = "cuda" if torch.cuda.is_available() else "cpu"
    model = ref_models.DDNerfModel(cfg)
    model.to(device)
    model.train()

    optims = [
        torch.optim.Adam(model.coarse.parameters(), lr=5e-4),
        torch.optim.Adam(model.fine.parameters(), lr=5e-4),
    ]

    torch.manual_seed(0)
    n = args.rays
    ro = torch.rand(n, 3, device=device) * 2 - 1
    rd = torch.randn(n, 3, device=device)
    rd = rd / rd.norm(dim=-1, keepdim=True)
    radii = torch.full((n, 1), 0.002, device=device)
    target = torch.rand(n, 3, device=device)

    def one_iter():
        output = model.run_iter(ro, rd, radii, mode="train", rgb_target=target)
        loss = torch.nn.functional.mse_loss(
            output[0]["rgb"], target
        ) + torch.nn.functional.mse_loss(output[1]["rgb"], target)
        loss += cfg.train_params.dp_coeficient * output[1]["dp_loss"].mean()
        loss.backward()
        for opt in optims:
            opt.step()
            opt.zero_grad()
        return float(loss)

    one_iter()  # warmup
    t0 = time.perf_counter()
    for _ in range(args.iters):
        one_iter()
    if device == "cuda":
        torch.cuda.synchronize()
    dt = time.perf_counter() - t0

    rays_per_sec = args.iters * n / dt
    result = {
        "metric": "train rays/sec (torch reference, DDNerfModel, 2048 rays x 32+32+1 samples)",
        "rays_per_sec": rays_per_sec,
        "sec_per_iter": dt / args.iters,
        "device": device,
        "torch_threads": torch.get_num_threads(),
        "iters_timed": args.iters,
        "note": "reference publishes no numbers (SURVEY.md §6); measured on this "
        "container via the reference's own run_iter + backward + Adam",
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
