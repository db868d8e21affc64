"""Pallas TPU kernel: fused NeRF MLP evaluation.

The MLP trunk (8×Dense(256) + heads, models/mlp.py) is where all the FLOPs
are: per 2048-ray batch, [131072, 256] activations flow through 10 matmuls.
Under plain XLA each matmul's output round-trips HBM (~134 MB per layer in
f32).  This kernel evaluates the ENTIRE network for a row-block per grid step
with every intermediate held in VMEM — HBM traffic drops to inputs + weights
+ outputs, and the MXU stays fed back-to-back.

Design notes (pallas_guide.md):

* row-block grid: each program processes ``block_rows`` rows; weights are
  small (~1.4 MB bf16 total) so every program keeps the full weight set in
  VMEM via non-blocked specs;
* the skip concat at trunk layer 5 (reference base_architectures.py:27-29)
  is algebraically split into two matmuls, ``relu(x@W5x + ipe@W5i + b5)`` —
  a concat inside the kernel would force an awkward [*, 384] layout.  The
  dir-branch concat (``[feat, dirs] @ Wd``) is split the same way;
* head weights (rgb 3, alpha 1, mu_sigma 2) are packed into lane-128 padded
  matrices — TPU tiles require the last dim to be a multiple of 128, so the
  kernel emits a [block, 128] output tile whose first ``out_dim`` lanes are
  valid;
* all dots run in the compute dtype (bf16 by default) with f32 accumulation
  (``preferred_element_type``);
* backward: :func:`fused_mlp_apply` carries a ``jax.custom_vjp`` whose
  backward recomputes activations via the pure-jnp twin network — the fused
  forward is exact and gradients match the reference formulation
  (pallas_guide.md "Patterns: Custom VJP").

Feature dims are zero-padded to lane multiples (96→128 IPE, 27→128 dirs);
zero columns contribute nothing to the dots.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NUM_TRUNK = 8
SKIP_LAYER = 5
LANE = 128

# Feed the kernels raw-width inputs ([M, 96] ipe, [M, 27] dirs, [M, 4|6]
# cotangent) instead of explicitly padding their lane dim to 128.  TPU HBM
# buffers are tile-padded to 128 lanes regardless, so the explicit pads are
# pure copies (~0.3 ms/step in the trace digest: copy.978/1021/1024,
# reshape.4763); Mosaic pads non-128 lane blocks internally.  Measured on
# chip: +0.8% rays/s with bit-identical loss (PERF.md round-4), so raw
# inputs ship as the config default (parallel.raw_lane_inputs, threaded as
# the ``raw_lane`` argument).  This module global is the trace-time
# override for benchmarks/ab.py (None = follow the argument).
RAW_LANE_INPUTS = None

# Trace-time A/B override for the split h-slab stash layout (None = follow
# the ``split_h_stash`` argument / config.parallel.split_h_stash).  The
# forward-with-stash kernel writes ~558 GB/s at production shapes (268 MB
# per network in 0.48 ms) — near the HBM limit — and the combined layout
# pads the h slab to max(hidden, dir_hidden) lanes (50% of that slab
# wasted at 256/128).  Split mode stashes h at its exact width.
SPLIT_H_STASH = None


def _mm(a, w):
    return jax.lax.dot_general(
        a, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _mm_d0(a, w):
    """a[K, B] / w[K, F] -> [B, F]: contract dim 0 of both — the layer-0
    orientation for TRANSPOSED (feature-major) inputs.  Same MXU pattern
    as the backward kernel's wgrad (_mm_t in fused_mlp_bwd)."""
    return jax.lax.dot_general(
        a, w, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _ray_one_hot(rows: int, rays: int, samples: int, dtype):
    """[rows, rays] one-hot of each row's ray index (row // samples).

    Exactly 0/1, so a ``precision=HIGHEST`` contraction with it is an exact
    per-ray broadcast — the same trick as core/sampling.py's stacked fetch.
    """
    row_ray = jax.lax.broadcasted_iota(jnp.int32, (rows, rays), 0) // samples
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, rays), 1)
    return (row_ray == col).astype(dtype)


def _expand_per_ray(per_ray, rows: int, samples: int):
    """Broadcast [R, F] per-ray values to [R*samples, F] rows (exact)."""
    oh = _ray_one_hot(rows, per_ray.shape[0], samples, jnp.float32)
    return jax.lax.dot_general(
        oh, per_ray.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


# Stashed activation slabs (bf16, written by the forward kernel when
# ``stash=True``): trunk x0..x6 plus the dir-layer output h.  x7 and feat
# are deliberately NOT stashed — the backward recomputes them from x6 in two
# matmuls, keeping the forward's stash write traffic under its compute time
# (the recompute is bit-identical: same bf16 inputs, same op order).
NUM_STASH = 8
STASH_H = 7  # slab index of h

# Mosaic per-kernel VMEM budget override (None = Mosaic's default, ~3/4 of
# the scoped-vmem cap).  A/B lever for deeper double-buffering of the stash
# stream at large blocks (NOTES_NEXT round-4: expected neutral — both kernel
# directions measure compute-bound at ~96% of matmul roofline).
MOSAIC_VMEM_LIMIT_BYTES = None


def _compiler_params(**kw):
    from jax.experimental.pallas import tpu as _pltpu

    if MOSAIC_VMEM_LIMIT_BYTES is not None:
        kw["vmem_limit_bytes"] = MOSAIC_VMEM_LIMIT_BYTES
    return _pltpu.CompilerParams(**kw)


def _kernel(
    samples,
    stash,
    ipe_t,
    alpha_vpu,
    ipe_ref,
    dirs_ref,
    *refs,
):
    """One row-block through the full network.

    ``samples`` (static): 0 = ``dirs_ref`` holds per-sample rows [B, LANE];
    K > 0 = ``dirs_ref`` holds PER-RAY rows [B // K, LANE] and the dir
    projection is computed at per-ray rank then broadcast — S× fewer dir
    FLOPs and S× less dirs HBM traffic (mirrors mlp._mlp_heads' per-ray
    projection on the XLA path).

    ``stash`` (static): write the NUM_STASH activation slabs to the second
    output so the fused backward can skip its forward recompute.

    ``ipe_t`` (static): ``ipe_ref`` is TRANSPOSED [F, B] (feature-major —
    see core/math.integrated_pos_enc_t); layer 0 and the skip projection
    contract dim 0 (:func:`_mm_d0`) instead of transposing in-kernel.

    ``alpha_vpu`` (static): fc_alpha has ONE real output lane, so its MXU
    matmul pays a full [B, hidden] @ [hidden, 128] pass for 1/128 useful
    lanes.  In this mode ``wa`` is packed as the [1, hidden] row and the
    alpha dot runs on the VPU (broadcast multiply + lane reduce — the
    f32 products are exact, only the reduction order differs from the
    MXU's f32 accumulation), freeing half an MXU matmul-unit per block.

    refs = [w0..w7, w5i, b_trunk, wf, bf_wa_packed..., ...] — see the packing
    order in :func:`_pack_params`; out_ref(s) are last.
    """
    if stash == 2:  # split: trunk slabs + exact-width h slab
        out_ref, stash_ref = refs[-3], (refs[-2], refs[-1])
        w = refs[:-3]
    elif stash:
        out_ref, stash_ref = refs[-2], refs[-1]
        w = refs[:-2]
    else:
        out_ref, stash_ref = refs[-1], None
        w = refs[:-1]
    ipe = ipe_ref[:]
    rows = ipe.shape[1] if ipe_t else ipe.shape[0]
    mm_in = _mm_d0 if ipe_t else _mm
    _net_body(ipe, dirs_ref, samples, stash, alpha_vpu, mm_in, rows, w,
              out_ref, stash_ref)


def _net_body(ipe, dirs_ref, samples, stash, alpha_vpu, mm_in, rows, refs,
              out_ref, stash_ref):
    """Trunk + heads of the fused network, shared by the plain kernel
    (:func:`_kernel`, HBM-resident IPE) and the encoding kernel
    (:func:`_enc_kernel`, IPE computed in VMEM).  ``refs`` is exactly the
    :func:`_pack_params` weight list."""
    (w_trunk0, *w_trunk_rest) = refs[0:NUM_TRUNK]
    w5i = refs[NUM_TRUNK]
    b_trunk = refs[NUM_TRUNK + 1]  # [NUM_TRUNK, hidden] f32
    wf, bf = refs[NUM_TRUNK + 2], refs[NUM_TRUNK + 3]
    wa = refs[NUM_TRUNK + 4]  # [hidden, LANE], col 0 = alpha (+bias folded)
    wd_feat, wd_dirs, bd = refs[NUM_TRUNK + 5 : NUM_TRUNK + 8]
    w_heads = refs[NUM_TRUNK + 8]  # [dir_hidden, LANE]: rgb | mu_sigma packed
    b_heads = refs[NUM_TRUNK + 9]  # [1, LANE]
    b_alpha = refs[NUM_TRUNK + 10]  # [1, LANE], col 0 valid

    dtype = ipe.dtype

    x = None
    trunk = [w_trunk0, *w_trunk_rest]
    for i in range(NUM_TRUNK):
        acc = mm_in(ipe, trunk[i][:]) if i == 0 else _mm(x, trunk[i][:])
        if i == SKIP_LAYER:
            acc = acc + mm_in(ipe, w5i[:])
        x = jnp.maximum(acc + b_trunk[i, :][None, :], 0.0).astype(dtype)
        if stash and i < NUM_TRUNK - 1:
            if isinstance(stash_ref, tuple):
                # Split mode: exact-width trunk slabs (no lane padding).
                stash_ref[0][i, :, :] = x
            else:
                # Slabs are max(hidden, dir_hidden) wide; values ride the
                # first lanes (hidden < dir_hidden only in tiny models).
                stash_ref[i, :, 0 : x.shape[-1]] = x

    feat_f32 = _mm(x, wf[:]) + bf[:]
    feat = feat_f32.astype(dtype)

    if alpha_vpu:
        # wa is the [1, hidden] row; [B, 1] result (see docstring).
        alpha = (
            jnp.sum(feat.astype(jnp.float32) * wa[:].astype(jnp.float32),
                    axis=1, keepdims=True)
            + b_alpha[:, 0:1]
        )
    else:
        alpha = _mm(feat, wa[:]) + b_alpha[:]  # [block, LANE], col 0 valid

    if samples:
        dproj = _expand_per_ray(
            _mm(dirs_ref[:], wd_dirs[:]), rows, samples
        )
    else:
        dproj = _mm(dirs_ref[:], wd_dirs[:])
    h = _mm(feat, wd_feat[:]) + dproj + bd[:]
    h = jnp.maximum(h, 0.0).astype(dtype)
    if stash:
        if isinstance(stash_ref, tuple):
            stash_ref[1][:, :] = h  # exact dir_hidden width
        else:
            stash_ref[STASH_H, :, 0 : h.shape[-1]] = h

    heads = _mm(h, w_heads[:]) + b_heads[:]  # [block, LANE]: rgb(3), mu(2)

    # Assemble output lanes: [rgb(3), alpha(1), mu_sigma(2), pad...].
    out = jnp.concatenate(
        [heads[:, 0:3], alpha[:, 0:1], heads[:, 3 : LANE - 1]], axis=-1
    )
    out_ref[:] = out


_MAX_DEG = 16
_IPE_FEAT = 2 * 3 * _MAX_DEG  # 96
_TRIG_T = 100.0 * float(jnp.pi)  # core/math._TRIG_THRESHOLD


def _ipe_constants():
    """Constants for the in-kernel IPE (:func:`_enc_kernel`).

    ``rep [3, 96]``: exact 0/1 replication matrix — column ``l*3+j`` (sin
    half) and ``48+l*3+j`` (cos half) select coordinate ``j``, so a
    ``precision=HIGHEST`` contraction with it broadcasts the [B, 3]
    means/covs to the (l, dim)-ordered 96-lane layout EXACTLY (the
    one-hot-matmul trick of core/sampling.fetch_sections / _ray_one_hot).
    ``fvec [1, 96]``: per-lane frequency ``2^l``; ``b_y [1, 96]``: the
    +π/2 phase of the cos half (core/math.integrated_pos_enc direct path).
    """
    import numpy as np

    rep = np.zeros((3, _IPE_FEAT), np.float32)
    fvec = np.zeros((1, _IPE_FEAT), np.float32)
    b_y = np.zeros((1, _IPE_FEAT), np.float32)
    for l in range(_MAX_DEG):
        for j in range(3):
            rep[j, l * 3 + j] = 1.0
            rep[j, 48 + l * 3 + j] = 1.0
            fvec[0, l * 3 + j] = 2.0**l
            fvec[0, 48 + l * 3 + j] = 2.0**l
    b_y[0, 48:] = 0.5 * np.pi
    return jnp.asarray(rep), jnp.asarray(fvec), jnp.asarray(b_y)


def _mm_hi(a, b):
    """f32 HIGHEST-precision contraction — exact for the 0/1 ``rep``
    operand (the fetch-trick guarantee)."""
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _enc_kernel(samples, alpha_vpu, cdt, means_ref, covs_ref, dirs_ref,
                rep_ref, fvec_ref, b_y_ref, *refs):
    """Forward-only kernel computing the IPE in VMEM from raw [B, 3]
    means/covs — the [N, 96] feature array never exists in HBM, removing
    the XLA-side IPE assembly + both kernel-boundary relayout copies (the
    two biggest non-matmul buckets of the render digest).  The encoding is
    the reference's direct form (core/math.integrated_pos_enc,
    math_utils.py:112-144): ``exp(-0.5·4^l σ²) · safe_sin(2^l x [+ π/2])``,
    evaluated per block on the VPU where Mosaic can overlap it with the
    trunk matmuls.  No stash/backward: render/eval only."""
    out_ref = refs[-1]
    w = refs[:-1]
    means = means_ref[:].astype(jnp.float32)
    covs = covs_ref[:].astype(jnp.float32)
    f = fvec_ref[:]
    y = _mm_hi(means, rep_ref[:]) * f + b_y_ref[:]
    v = _mm_hi(covs, rep_ref[:]) * (f * f)
    y = jnp.where(jnp.abs(y) < _TRIG_T, y, y % _TRIG_T)  # safe_sin wrap
    ipe = (jnp.exp(-0.5 * v) * jnp.sin(y)).astype(cdt)
    _net_body(ipe, dirs_ref, samples, False, alpha_vpu, _mm,
              means.shape[0], w, out_ref, None)


def fused_enc_mlp_forward(
    params: dict,
    means: jax.Array,
    covs: jax.Array,
    dirs: jax.Array,
    *,
    depth_head: bool,
    samples_per_ray: int,
    rays_per_block: int = 32,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
    alpha_vpu: bool = False,
) -> jax.Array:
    """Forward pass from raw ``means/covs [N, 3]`` (f32, ray-major rows)
    and PER-RAY ``dirs [N // K, 27]`` PE features, with the IPE computed
    inside the kernel (:func:`_enc_kernel`).  Returns [N, 4 or 6] f32 —
    identical contract to :func:`fused_mlp_forward` fed
    ``integrated_pos_enc(..., double_angle=False)``.
    """
    if samples_per_ray <= 0:
        raise ValueError("fused_enc_mlp_forward requires per-ray dirs "
                         "(samples_per_ray=K)")
    n = means.shape[0]
    out_dim = 6 if depth_head else 4
    n_pad, block_rows, dirs_block = plan_blocks(
        n, samples_per_ray, 0, rays_per_block
    )
    dirs_rows = n_pad // samples_per_ray

    means_p = _pad_to(means.astype(jnp.float32), rows=n_pad)
    covs_p = _pad_to(covs.astype(jnp.float32), rows=n_pad)
    dirs_p = _pad_to(dirs.astype(compute_dtype), rows=dirs_rows)
    consts = _ipe_constants()
    packed = _pack_params(params, depth_head, compute_dtype,
                          pad_inputs=False, alpha_vpu=alpha_vpu)

    grid = (n_pad // block_rows,)

    def row_spec(rows, width):
        return pl.BlockSpec((rows, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [
        row_spec(block_rows, 3),
        row_spec(block_rows, 3),
        row_spec(dirs_block, dirs_p.shape[1]),
    ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in (*consts, *packed)]

    out = pl.pallas_call(
        functools.partial(_enc_kernel, samples_per_ray, alpha_vpu,
                          compute_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (block_rows, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, LANE), jnp.float32),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(means_p, covs_p, dirs_p, *consts, *packed)
    return out[:n, :out_dim]


def _pack_params(params, depth_head, compute_dtype, pad_inputs=True,
                 alpha_vpu=False):
    """Flax param tree -> the kernel's flat weight list (padded/packed).

    ``pad_inputs=False`` (RAW_LANE_INPUTS) keeps the input-facing weights at
    their raw contraction width (96 IPE, 27 dirs) to match unpadded inputs.
    ``alpha_vpu`` packs fc_alpha as its [1, hidden] row for the VPU dot
    instead of the lane-padded [hidden, LANE] matmul operand.
    """
    c = compute_dtype
    hidden = params["fc_feat"]["kernel"].shape[1]

    ws, bs = [], []
    w5i = None
    for i in range(NUM_TRUNK):
        k = params[f"trunk_{i}"]["kernel"]
        bs.append(params[f"trunk_{i}"]["bias"])
        if i == SKIP_LAYER:
            w5i, k = k[:96], k[96:]
        if i == 0 and pad_inputs:
            k = jnp.pad(k, ((0, LANE - k.shape[0]), (0, 0)))
        ws.append(k.astype(c))
    if pad_inputs:
        w5i = jnp.pad(w5i, ((0, LANE - 96), (0, 0)))
    w5i = w5i.astype(c)
    b_trunk = jnp.stack(bs).astype(jnp.float32)  # [NUM_TRUNK, hidden]

    wf = params["fc_feat"]["kernel"].astype(c)
    bf = params["fc_feat"]["bias"].astype(jnp.float32).reshape(1, -1)

    if alpha_vpu:
        wa = params["fc_alpha"]["kernel"].reshape(1, -1).astype(c)
    else:
        wa = jnp.pad(
            params["fc_alpha"]["kernel"], ((0, 0), (0, LANE - 1))
        ).astype(c)
    b_alpha = jnp.pad(params["fc_alpha"]["bias"], (0, LANE - 1)).astype(
        jnp.float32
    ).reshape(1, -1)

    wd = params["dir_0"]["kernel"]
    dir_in = wd.shape[0] - hidden  # 27
    wd_feat = wd[:hidden].astype(c)
    wd_dirs = wd[hidden:]
    if pad_inputs:
        wd_dirs = jnp.pad(wd_dirs, ((0, LANE - dir_in), (0, 0)))
    wd_dirs = wd_dirs.astype(c)
    bd = params["dir_0"]["bias"].astype(jnp.float32).reshape(1, -1)

    heads_w = [params["fc_rgb"]["kernel"]]
    heads_b = [params["fc_rgb"]["bias"]]
    if depth_head:
        heads_w.append(params["fc_mu_sigma"]["kernel"])
        heads_b.append(params["fc_mu_sigma"]["bias"])
    w_heads = jnp.concatenate(heads_w, axis=1)
    b_heads = jnp.concatenate(heads_b)
    w_heads = jnp.pad(w_heads, ((0, 0), (0, LANE - w_heads.shape[1]))).astype(c)
    b_heads = jnp.pad(b_heads, (0, LANE - b_heads.shape[0])).astype(
        jnp.float32
    ).reshape(1, -1)

    return [*ws, w5i, b_trunk, wf, bf, wa, wd_feat, wd_dirs, bd,
            w_heads, b_heads, b_alpha]


def _pad_to(x, rows=None, cols=None):
    pr = 0 if rows is None else rows - x.shape[0]
    pc = 0 if cols is None else cols - x.shape[1]
    return jnp.pad(x, ((0, pr), (0, pc))) if (pr or pc) else x


def plan_blocks(n: int, samples: int, block_rows: int, rays_per_block: int):
    """(padded rows, row-block size, dirs-block size) for the two dirs modes.

    Per-sample (samples == 0): rows pad to ``block_rows``; dirs rows ride
    along.  Per-ray (samples == K): blocks cover ``rays_per_block`` whole
    rays (block = R*K rows, a multiple of 16 whenever R is), rays pad to a
    multiple of R.
    """
    if not samples:
        n_pad = -(-max(n, 1) // block_rows) * block_rows
        return n_pad, block_rows, block_rows
    if n % samples:
        raise ValueError(
            f"per-ray dirs need ray-major rows: {n} rows is not a multiple "
            f"of samples_per_ray={samples}"
        )
    rays = n // samples
    rays_pad = -(-max(rays, 1) // rays_per_block) * rays_per_block
    return rays_pad * samples, rays_per_block * samples, rays_per_block


def fused_mlp_forward(
    params: dict,
    ipe: jax.Array,
    dirs: jax.Array,
    *,
    depth_head: bool,
    block_rows: int = 1024,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
    samples_per_ray: int = 0,
    rays_per_block: int = 32,
    stash: bool = False,
    raw_lane: bool = False,
    ipe_transposed: bool = False,
    alpha_vpu: bool = False,
    split_h_stash: bool = False,
):
    """Evaluate MipMLP/DepthMipMLP on [N, 96] IPE + dir features.

    ``dirs`` is per-sample [N, 27] by default; with ``samples_per_ray=K``
    it is PER-RAY [N // K, 27] (rows of ``ipe`` are ray-major) and the dir
    projection broadcasts inside the kernel.  Returns [N, 4 or 6] float32:
    (rgb, alpha[, mu, sigma]) — same layout as the flax modules.

    ``ipe_transposed=True``: ``ipe`` is feature-major [96, N] (see
    core/math.integrated_pos_enc_t) — born row-major, so no relayout copy
    at the pallas_call boundary; layer 0 contracts dim 0 in-kernel.

    ``stash=True`` additionally returns the [NUM_STASH, N_pad, hidden]
    compute-dtype activation slabs for :func:`fused_mlp_bwd` (the padded
    row count is internal — pass the array through unchanged).  With
    ``split_h_stash=True`` the stash is a TUPLE
    ``([NUM_STASH-1, N_pad, hidden] trunk, [N_pad, dir_hidden] h)`` —
    the h slab at its exact width instead of riding a
    max(hidden, dir_hidden)-wide slab, cutting the stash write+read
    traffic by dir-layer-width/total when dir_hidden < hidden.
    """
    n = ipe.shape[1] if ipe_transposed else ipe.shape[0]
    ipe_feat = ipe.shape[0] if ipe_transposed else ipe.shape[1]
    hidden = params["fc_feat"]["kernel"].shape[0]
    out_dim = 6 if depth_head else 4
    n_pad, block_rows, dirs_block = plan_blocks(
        n, samples_per_ray, block_rows, rays_per_block
    )
    dirs_rows = n_pad // samples_per_ray if samples_per_ray else n_pad

    raw = RAW_LANE_INPUTS if RAW_LANE_INPUTS is not None else raw_lane
    in_w = (ipe_feat, dirs.shape[1]) if raw else (LANE, LANE)
    if ipe_transposed:
        ipe_p = _pad_to(ipe.astype(compute_dtype), cols=n_pad,
                        rows=None if raw else LANE)
    else:
        ipe_p = _pad_to(ipe.astype(compute_dtype), rows=n_pad,
                        cols=None if raw else LANE)
    dirs_p = _pad_to(dirs.astype(compute_dtype), rows=dirs_rows,
                     cols=None if raw else LANE)
    packed = _pack_params(params, depth_head, compute_dtype,
                          pad_inputs=not raw, alpha_vpu=alpha_vpu)

    grid = (n_pad // block_rows,)
    if ipe_transposed:
        ipe_spec = pl.BlockSpec((in_w[0], block_rows), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
    else:
        ipe_spec = pl.BlockSpec((block_rows, in_w[0]), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    in_specs = [
        ipe_spec,
        pl.BlockSpec((dirs_block, in_w[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in packed]

    out_specs = pl.BlockSpec(
        (block_rows, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((n_pad, LANE), jnp.float32)
    split = SPLIT_H_STASH if SPLIT_H_STASH is not None else split_h_stash
    stash_mode = (2 if split else 1) if stash else 0
    if stash_mode == 2:
        dir_hidden = params["dir_0"]["kernel"].shape[1]
        out_specs = (
            out_specs,
            pl.BlockSpec(
                (NUM_STASH - 1, block_rows, hidden),
                lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_rows, dir_hidden), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
        )
        out_shape = (
            out_shape,
            jax.ShapeDtypeStruct(
                (NUM_STASH - 1, n_pad, hidden), compute_dtype
            ),
            jax.ShapeDtypeStruct((n_pad, dir_hidden), compute_dtype),
        )
    elif stash_mode == 1:
        dir_hidden = params["dir_0"]["kernel"].shape[1]
        stash_w = max(hidden, dir_hidden)
        out_specs = (
            out_specs,
            pl.BlockSpec(
                (NUM_STASH, block_rows, stash_w),
                lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
        )
        out_shape = (
            out_shape,
            jax.ShapeDtypeStruct(
                (NUM_STASH, n_pad, stash_w), compute_dtype
            ),
        )

    out = pl.pallas_call(
        functools.partial(_kernel, samples_per_ray, stash_mode,
                          ipe_transposed, alpha_vpu),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(ipe_p, dirs_p, *packed)
    if stash_mode == 2:
        return out[0][:n, :out_dim], (out[1], out[2])
    if stash_mode == 1:
        return out[0][:n, :out_dim], out[1]
    return out[:n, :out_dim]


# ---------------------------------------------------------------- custom vjp


def _reference_apply(params, ipe, dirs, depth_head):
    """Pure-jnp twin of the kernel (mirrors models/mlp.py exactly); used for
    the recompute-backward and as the numerical oracle in tests."""
    x = ipe
    for i in range(NUM_TRUNK):
        if i == SKIP_LAYER:
            x = jnp.concatenate([ipe, x], axis=-1)
        x = x @ params[f"trunk_{i}"]["kernel"] + params[f"trunk_{i}"]["bias"]
        x = jnp.maximum(x, 0.0)
    feat = x @ params["fc_feat"]["kernel"] + params["fc_feat"]["bias"]
    alpha = feat @ params["fc_alpha"]["kernel"] + params["fc_alpha"]["bias"]
    h = (
        jnp.concatenate([feat, dirs], axis=-1) @ params["dir_0"]["kernel"]
        + params["dir_0"]["bias"]
    )
    h = jnp.maximum(h, 0.0)
    rgb = h @ params["fc_rgb"]["kernel"] + params["fc_rgb"]["bias"]
    outs = [rgb, alpha]
    if depth_head:
        outs.append(
            h @ params["fc_mu_sigma"]["kernel"] + params["fc_mu_sigma"]["bias"]
        )
    return jnp.concatenate(outs, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_mlp_apply(params, ipe, dirs, depth_head: bool, interpret: bool = False):
    """Fused forward + jnp-recompute backward.  Drop-in replacement for the
    flax apply on flattened [N, F] inputs."""
    return fused_mlp_forward(
        params, ipe, dirs, depth_head=depth_head, interpret=interpret
    )


def _fwd(params, ipe, dirs, depth_head, interpret):
    out = fused_mlp_forward(
        params, ipe, dirs, depth_head=depth_head, interpret=interpret
    )
    return out, (params, ipe, dirs)


def _bwd(depth_head, interpret, res, g):
    params, ipe, dirs = res
    _, vjp = jax.vjp(
        lambda p, a, b: _reference_apply(p, a, b, depth_head), params, ipe, dirs
    )
    return vjp(g)


fused_mlp_apply.defvjp(_fwd, _bwd)
