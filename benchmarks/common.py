"""Shared benchmark fixtures.

flagship_render_cfg_dict is THE canonical whole-image render benchmark
shape (the flagship DDNeRF model on the procedural scene) used by
ab_render.py / profile_render.py / ab_pipeline.py — one copy so a change
to the canonical shape (e.g. a new parallel default) cannot silently
leave a stale twin behind.  benchmarks/ab.py's flagship_cfg is the train
twin (it additionally sets train batch/noise and experiment length).
"""


def flagship_render_cfg_dict(chunk: int = 16384, **parallel):
    return {
        "nerf": {
            "type": "DDNerfModel",
            "coarse_hidden_size": 256,
            "fine_hidden_size": 256,
            "train": {"num_coarse": 32, "num_fine": 32},
            "validation": {"num_coarse": 32, "num_fine": 32,
                           "perturb": False, "chunksize": chunk},
        },
        "dataset": {"type": "blender", "synthetic": True},
        # fetch_dtype float16 = the shipped render wire (configs/*.yml);
        # override with fetch_dtype="float32" to measure the exact wire.
        # ipe_transposed = the shipped feature-major kernel IPE (-8% render
        # device step, round-5 trace); override False for the row-major A/B.
        # render_block_rows 2048 = 48-ray kernel blocks (-1.1% device under
        # the transposed input); override 0 for the kernel default.
        "parallel": {"compute_dtype": "bfloat16", "fetch_dtype": "float16",
                     "ipe_transposed": True, "render_block_rows": 2048,
                     **parallel},
    }
