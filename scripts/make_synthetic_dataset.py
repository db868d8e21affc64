"""Write the procedural sphere scene as a REAL on-disk blender dataset.

Produces ``transforms_{train,val,test}.json`` + RGBA PNGs in the exact
layout ``load_blender_data`` (and the reference's load_blender.py:68-145)
reads, so the dress-rehearsal pipeline exercises the real data layer —
JSON/PNG ingest, alpha compositing, split handling — instead of the
in-memory ``dataset.synthetic`` shortcut.  The day a real NeRF-synthetic
scene (lego/...) lands, the same CLI flow runs it by just changing
``dataset.basedir``.

Run:  python scripts/make_synthetic_dataset.py OUTDIR \
          [--size 800] [--train 24] [--val 2] [--test 2]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--size", type=int, default=800)
    ap.add_argument("--train", type=int, default=24)
    ap.add_argument("--val", type=int, default=2)
    ap.add_argument("--test", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import imageio.v2 as imageio

    from ddnerf_tpu.data.synthetic import generate_synthetic_blender

    n_eval = args.val + args.test
    images, poses, _, hwf, i_split = generate_synthetic_blender(
        num_train=args.train,
        num_val=n_eval,
        height=args.size,
        width=args.size,
        seed=args.seed,
    )
    h, w, focal = hwf
    camera_angle_x = 2.0 * float(np.arctan(0.5 * w / focal))

    i_train = list(i_split[0])
    i_val = list(i_split[1][: args.val])
    i_test = list(i_split[1][args.val:args.val + args.test])

    os.makedirs(args.outdir, exist_ok=True)
    for split, idxs in (("train", i_train), ("val", i_val), ("test", i_test)):
        os.makedirs(os.path.join(args.outdir, split), exist_ok=True)
        frames = []
        for j, i in enumerate(idxs):
            rel = f"./{split}/r_{j}"
            imageio.imwrite(
                os.path.join(args.outdir, f"{rel}.png"),
                (np.clip(images[i], 0, 1) * 255).astype(np.uint8),
            )
            frames.append({
                "file_path": rel,
                "transform_matrix": np.asarray(poses[i], np.float64).tolist(),
            })
        with open(os.path.join(args.outdir, f"transforms_{split}.json"),
                  "w") as fp:
            json.dump({"camera_angle_x": camera_angle_x, "frames": frames},
                      fp, indent=1)
    print(f"wrote {args.train}/{args.val}/{args.test} train/val/test views "
          f"at {args.size}x{args.size} to {args.outdir} "
          f"(camera_angle_x={camera_angle_x:.4f})")


if __name__ == "__main__":
    main()
