"""Write the procedural sphere scene as a REAL on-disk dataset.

``--format blender`` (default) produces ``transforms_{train,val,test}.json``
+ RGBA PNGs in the exact layout ``load_blender_data`` (and the reference's
load_blender.py:68-145) reads.  ``--format llff`` produces a forward-facing
capture — ``images/*.png`` + ``poses_bounds.npy`` in the bmild/LLFF layout
``load_llff_data`` reads (3x5 pose rows stored in the COLMAP [-u, r, b]
column convention the loader swaps back, llff.py:105-110) — so the
dress-rehearsal pipeline exercises the real data layers (JSON/PNG ingest,
poses_bounds parsing, bd_factor rescale, recentering, NDC projection,
spiral path) instead of the in-memory ``dataset.synthetic`` shortcut.  The
day a real scene (lego/fern) lands, the same CLI flow runs it by just
changing ``dataset.basedir``.

Run:  python scripts/make_synthetic_dataset.py OUTDIR \
          [--format blender|llff] [--size 800] [--train 24] [--val 2] [--test 2]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _write_llff(args):
    """Forward-facing capture of the sphere scene: cameras jittered on a
    plane at z ~ +4 looking down -z, traced with the same pinhole model as
    the blender generator, stored in the LLFF on-disk layout."""
    import imageio.v2 as imageio

    from ddnerf_tpu.data.synthetic import _trace

    n = args.train + args.val + args.test
    h = w = args.size
    focal = 0.5 * w / np.tan(0.5 * 0.6911)
    rng = np.random.default_rng(args.seed)

    imgdir = os.path.join(args.outdir, "images")
    os.makedirs(imgdir, exist_ok=True)

    ii, jj = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32), indexing="xy")
    dirs_cam = np.stack(
        [(ii - w * 0.5) / focal, -(jj - h * 0.5) / focal, -np.ones_like(ii)],
        axis=-1,
    )

    rows = []
    for i in range(n):
        # Camera on a jittered plane, looking at a point near the origin.
        eye = np.array([rng.uniform(-0.8, 0.8), rng.uniform(-0.6, 0.6),
                        4.0 + rng.uniform(-0.2, 0.2)], np.float32)
        target = np.array([rng.uniform(-0.2, 0.2), rng.uniform(-0.2, 0.2),
                           0.0], np.float32)
        back = eye - target
        back /= np.linalg.norm(back)
        right = np.cross(np.array([0.0, 1.0, 0.0], np.float32), back)
        right /= np.linalg.norm(right)
        up = np.cross(back, right)
        c2w = np.stack([right, up, back, eye], axis=-1)  # [3, 4], [r u b t]

        rd = np.sum(dirs_cam[..., None, :] * c2w[:3, :3], axis=-1)
        ro = np.broadcast_to(c2w[:3, -1], rd.shape)
        rgba = _trace(ro, rd)
        rgb = rgba[..., :3] * rgba[..., 3:4]  # composite on black
        imageio.imwrite(os.path.join(imgdir, f"image{i:03d}.png"),
                        (np.clip(rgb, 0, 1) * 255).astype(np.uint8))

        # Store in the COLMAP column convention the loader swaps back
        # (llff.py:105-110): loaded [c1, -c0, c2] == [r, u, b], so store
        # [-u, r, b, t]; 5th column = [H, W, focal].
        stored = np.concatenate(
            [np.stack([-up, right, back, eye], axis=-1),
             np.array([[h], [w], [focal]], np.float32)], axis=-1)
        # Conservative per-image depth bounds along -z: scene spans
        # z in [-1.1, 1.1] (synthetic._SPHERES), camera at eye[2].
        near, far = eye[2] - 1.5, eye[2] + 1.5
        rows.append(np.concatenate([stored.ravel(), [near, far]]))

    np.save(os.path.join(args.outdir, "poses_bounds.npy"),
            np.stack(rows).astype(np.float64))
    print(f"wrote {n} forward-facing views at {args.size}x{args.size} "
          f"(LLFF layout) to {args.outdir}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--format", default="blender",
                    choices=("blender", "llff"))
    ap.add_argument("--size", type=int, default=800)
    ap.add_argument("--train", type=int, default=24)
    ap.add_argument("--val", type=int, default=2)
    ap.add_argument("--test", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    if args.format == "llff":
        _write_llff(args)
        return

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
