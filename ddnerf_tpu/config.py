"""Configuration system for ddnerf_tpu.

The reference (``/root/reference/general_utils/cfgnode.py:36``) uses a mutable
YACS-style ``CfgNode`` that is *mutated at runtime* (annealed
``gaussian_smooth_factor``, ``pdf_padding`` flip, auto ``dist_reg_coeficient``,
pose-normalization rescale of near/far — train_model.py:121-142,
data_utils/data_utils.py:67-74).  That design is hostile to JAX: values read
inside a ``jit``-traced function must be either static (hashable, trigger
recompile on change) or explicit traced inputs.

Here the config is a tree of **frozen dataclasses** built from the same YAML
schema as the reference's six ``configs/*.yml`` files, split by role:

* everything in :class:`Config` is **static** — hashable, safe to close over
  in a jitted function;
* the runtime-mutated quantities become **pure schedules**
  (:mod:`ddnerf_tpu.core.schedules`) evaluated per-step and passed into the
  train step as traced scalars.

``Config.from_yaml`` accepts the reference YAML layout verbatim, including the
keys the reference reads through ``try/except`` defaults
(models.py:192-196, samplers.py:44-50).
"""

from __future__ import annotations

import io
from dataclasses import dataclass, field, fields, is_dataclass, replace
from typing import Any, Optional, Tuple

import yaml


def _get(d: dict, key: str, default):
    if d is None:
        return default
    v = d.get(key, default)
    return default if v is None and default is not None else v


@dataclass(frozen=True)
class ExperimentConfig:
    """Reference: ``experiment:`` block (config_blender.yml:2-16)."""

    id: str = "experiment"
    logdir: str = "logs"
    randomseed: int = 42
    train_iters: int = 200001
    validate_every: int = 2000
    save_every: int = 2000
    print_every: int = 200
    # Checkpoint retention.  1 = the reference's single rolling checkpoint
    # (train_model.py:248-263); larger keeps history so eval/video can select
    # a specific step (eval_nerf.py:173-178).
    max_keep_ckpts: int = 1
    # Train-scalar density in TB/metrics.jsonl.  0 = one point per
    # ``print_every`` (cheapest, one dispatch per step).  N >= 1 = a point
    # every N iterations via the scan-block driver: steps run in lax.scan
    # blocks that stack per-step scalars on device and flush once per
    # ``print_every`` (no per-step host sync) — near-free, and chained
    # dispatch amortizes the per-step RPC.  Default 1 = the reference's
    # every-iteration train curves (documentation.py:11-26).
    train_scalars_every: int = 1


@dataclass(frozen=True)
class TrainParamsConfig:
    """Reference: ``train_params:`` block (config_blender.yml:18-30).

    ``pdf_padding``/``gaussian_smooth_factor`` are *initial* values here; their
    per-step evolution lives in :func:`ddnerf_tpu.core.schedules`.
    """

    pdf_padding: bool = True
    max_pdf_pad_iters: int = 20000
    gaussian_smooth_factor: float = 1.7
    final_smooth: float = 1.1
    finnish_smooth: int = 150000
    depth_analysis_rays: bool = False
    depth_analysis_path: str = ""
    dist_reg_coeficient: float = 0.02
    set_automatic_dist_reg_coeficient: bool = True
    loss_coeficients: Tuple[float, ...] = (1.0, 1.0)
    dp_coeficient: float = 0.1
    # "kl" (the reference's active dd_utils loss) or "js" (the Jensen-Shannon
    # form from its experimental loss.py v6 ``mse`` branch).
    dp_loss_variant: str = "kl"


@dataclass(frozen=True)
class DatasetConfig:
    """Reference: ``dataset:`` block (config_blender.yml:32-62)."""

    type: str = "blender"
    basedir: str = ""
    single_image_mode: bool = True
    ndc_rays: bool = False
    near: float = 2.0
    far: float = 6.0
    combined_sampling_method: bool = False
    combined_split: float = 2.0
    downsample_factor: int = 4
    spherify: bool = False
    normalize_poses: bool = False
    normalize_factor: float = 5.0
    bd_factor: Optional[float] = None
    llffhold: int = 8
    half_res: bool = False
    testskip: int = 1
    # ddnerf_tpu extension: procedurally generated scene for tests/benches.
    synthetic: bool = False
    # Reference quirk fix (off = reference parity): the reference un-warps a
    # validation image's NDC depth through the NEXT image's camera (it reads
    # the round-robin index after the advance, dataset.py:137-154).  True
    # un-warps through the pose of the image actually rendered.
    fix_validation_unwarp_rays: bool = False


@dataclass(frozen=True)
class OptimizerConfig:
    """Reference: ``optimizer:`` + ``scheduler:`` blocks. The reference ignores
    its own ``scheduler`` block and hardcodes the mip-NeRF log-lerp schedule
    (train_model.py:101-107); we expose those knobs explicitly."""

    type: str = "adam"
    lr: float = 1.0e-3
    lr_init: float = 5.0e-4
    lr_final: float = 5.0e-6
    lr_delay_steps: int = 2500
    lr_delay_mult: float = 0.01


@dataclass(frozen=True)
class NerfModeConfig:
    """Reference: ``nerf.train`` / ``nerf.validation`` blocks
    (config_blender.yml:85-124)."""

    num_random_rays: int = 2048
    chunksize: int = 16384
    perturb: bool = True
    num_coarse: int = 32
    num_fine: int = 32
    white_background: bool = False
    radiance_field_noise_std: float = 1.0
    lindisp: bool = False


@dataclass(frozen=True)
class NerfConfig:
    """Reference: ``nerf:`` block (config_blender.yml:76-124)."""

    type: str = "DDNerfModel"  # or "GeneralMipNerfModel"
    coarse_hidden_size: int = 256
    fine_hidden_size: int = 256
    ray_shape: str = "cone"
    train: NerfModeConfig = field(default_factory=NerfModeConfig)
    validation: NerfModeConfig = field(
        default_factory=lambda: NerfModeConfig(perturb=False)
    )

    def mode(self, mode: str) -> NerfModeConfig:
        return self.train if mode == "train" else self.validation


@dataclass(frozen=True)
class ParallelConfig:
    """TPU-native extension (no reference equivalent; the reference is
    single-device — SURVEY.md §2). Controls the device mesh layout."""

    data_axis: str = "data"
    num_devices: int = 0  # 0 => use all available devices
    # precision policy for the MLP evaluation ("bfloat16" rides the MXU at 2x).
    compute_dtype: str = "float32"
    # Fused Pallas MLP kernel: "off" | "render" | "train" | "auto" | "all".
    # "train" = the fused *backward* kernel for training steps only
    # (kernels/fused_mlp_bwd.py: the per-network backward runs
    # block-resident in VMEM, +25% on the isolated network fwd+bwd on v5e,
    # PERF.md round-3).  "render" = the forward kernel (selected by
    # render_kernel_variant) on the whole-image validation/render paths,
    # real hardware only.  "auto" = both — the shipped default: fused
    # backward for training AND the "mlp" forward variant for rendering
    # (+21.9% on the 800x800 image A/B, PERF.md round-4 sixth pass).  Each
    # direction probe-compiles once and degrades to XLA with a warning if
    # Mosaic rejects it.  "all" = forward kernels in every mode including
    # interpret (a correctness-testing policy, not a fast path).
    pallas_mlp: str = "off"
    # legacy bool alias for pallas_mlp ("all" when True)
    use_pallas_mlp: bool = False
    donate_state: bool = True
    # Recompute the MLP forward during backward instead of saving trunk
    # residuals (jax.checkpoint).  Trades spare MXU cycles for ~1.3 GB/step
    # of HBM residual traffic at the flagship shape; measured a net loss on
    # v5e at every batch size (PERF.md batch-size study) — kept as a knob
    # for memory-bound deployments.
    remat_mlp: bool = False
    # Split each train batch into microbatches of this many rays inside the
    # jitted step (lax.scan + gradient accumulation — same math, means of
    # equal-sized chunks).  XLA picks pathological transposed-operand matmul
    # emitters once a backward matmul's row count crosses ~10^5 (PERF.md),
    # so large batches run fastest as a scan over ~2048-ray chunks.
    # 0 = no microbatching.
    microbatch_rays: int = 0
    # Per-chip HBM budget for the device-resident ray store; datasets whose
    # per-chip share exceeds it fall back to host-side sampling + per-step
    # transfer (the reference's only mode, dataset.py:50-59).
    max_store_gb: float = 6.0

    # ---- numerics/perf switches (recorded by the config snapshot so a
    # run's actual numerics are reproducible from logdir/config.yml).
    # Each has a matching trace-time module override used by the A/B
    # harness (None = follow config); the values here are the measured
    # winners from PERF.md's interleaved A/Bs.
    #
    # Recompute the IPE in the backward pass instead of saving the
    # [N,S,96] residual (jax.checkpoint around integrated_pos_enc only).
    remat_ipe: bool = True
    # Fused train kernel: forward stashes bf16 activations to HBM so the
    # backward skips its in-VMEM recompute (+14% on v5e).
    kernel_stash_acts: bool = True
    # Fused train kernel: per-ray [N, 27] dirs expanded in-kernel by an
    # exact one-hot contraction (measured negative on v5e; the trade can
    # flip where HBM is scarcer relative to VPU).
    kernel_per_ray_dirs: bool = False
    # Row-block size of the fused train kernels (both directions share the
    # plan); 0 = kernel default (fused_mlp_bwd.BWD_BLOCK_ROWS).  Applies to
    # the per-SAMPLE dirs layout only: with kernel_per_ray_dirs the block
    # is rays_per_block (32) whole rays regardless (fused_mlp.plan_blocks).
    # 2048 needs scoped_vmem_limit_kib above XLA's 16 MiB default (the
    # forward stash kernel's scratch is 2 KiB over it); measured +4.5%
    # rays/s vs 1024 on v5e with bit-identical loss (PERF.md round-4).
    # If the probe-compile rejects it (older toolchain/generation), the
    # pipeline downgrades to the kernel-default 1024 with a warning before
    # falling back to the XLA step (models/nerf._fused_train_available).
    bwd_block_rows: int = 2048
    # Scoped-VMEM cap override (KiB) forwarded to XLA:TPU per-compile via
    # jax.jit compiler_options (xla_tpu_scoped_vmem_limit_kib); 0 = XLA
    # default (16 MiB).  v5e has 128 MiB of VMEM; 32 MiB admits the
    # 2048-row fused-kernel blocks with headroom.  TPU-only (ignored on
    # CPU/GPU — utils/compile.step_compiler_options).
    scoped_vmem_limit_kib: int = 32768
    # Which kernel backs the "render"/"auto"/"all" fused policies: "mlp" =
    # fused_mlp with the IPE in XLA (the train kernel's integration recipe
    # applied forward-only; +21.9% median over the XLA render path on the
    # 800x800 whole-image A/B, v5e — PERF.md round-4 sixth pass), "ipe2" =
    # in-kernel IPE with the modern recipe (raw [N, 3] f32 means/covs in,
    # per-ray dirs, merged heads — fused_mlp.fused_enc_mlp_forward; no
    # [N, 96] feature array in HBM and no boundary relayout copies;
    # measured -16% vs "mlp" on v5e — the executable counterfactual that
    # bounds in-kernel encodes).  The older "ipe" (fused_ipe_mlp) was
    # RETIRED in round 5 after three measured negatives; PERF.md keeps the
    # post-mortem.
    render_kernel_variant: str = "mlp"
    # Row-block size for the forward-only render kernel (the "mlp"
    # variant); 0 = the kernel default (32 rays/block = 1024 rows at 32
    # samples).  The render kernel runs in per-ray dirs mode, so the value
    # is rounded down to whole rays (rays_per_block = rows // samples).
    # Independent of bwd_block_rows: no stash/backward on this path, so
    # its optimal block can differ from the train pair's.
    render_block_rows: int = 0
    # Cast the kernel-path IPE features to the compute dtype PER DEGREE,
    # before the stack/reshape/concat assembly — bit-identical to the
    # assembled-then-cast features (cast commutes with assembly; pinned by
    # test) at half the assembly/copy bytes.  Applies only where the
    # consumer is a fused Pallas kernel (which casts to bf16 regardless);
    # the XLA module paths keep f32 features.
    ipe_early_cast: bool = False
    # Stash the dir-layer activation h in its own exact-width slab instead
    # of a max(hidden, dir_hidden)-wide slab shared with the trunk slabs —
    # cuts the activation-stash write+read traffic by ~6% at 256/128
    # (kernels/fused_mlp.SPLIT_H_STASH rationale).  Bit-identical
    # gradients: the same values are stashed and read either way.
    # MEASURED NEUTRAL on v5e (6 interleaved rounds: median 473.3k vs
    # 472.0k rays/s, within chip variance; identical warm loss) — both
    # kernel directions are compute-bound at ~96% of matmul roofline, so
    # the saved stash DMA was already hidden.  Default off; kept for
    # shapes/generations where the stash traffic is exposed.
    split_h_stash: bool = False
    # relu saves its OUTPUT (bf16) as the VJP residual instead of the
    # bit-packed predicate mask (models/mlp.py rationale + measurements).
    relu_save_output: bool = True
    relu_bf16_residual: bool = True
    # Skip layer as two partial matmuls instead of a [.., 352] concat.
    split_skip_layer: bool = True
    # IPE sin/cos via the double-angle recurrence (core/math.py rationale).
    ipe_double_angle: bool = True
    # Assembly of the fused-kernel-path IPE feature array ("stack" = the
    # double-angle/direct stack+reshape+concat forms above; "fused" =
    # core/math.integrated_pos_enc_fused — direct-form features emitted by
    # ONE concat-free output fusion, cast folded in).  The kernel path must
    # MATERIALIZE [N, 96] in HBM (XLA cannot fuse a prologue into a
    # pallas_call), where assembly layout, not transcendental count, can
    # dominate; the XLA module paths are unaffected (their IPE fuses into
    # the consuming matmul prologue).  See PERF.md round-5 for the A/B.
    ipe_variant: str = "stack"
    # Hand-derived adjoint for the compositing weights (one reverse cumsum
    # instead of autodiff through the exclusive-cumprod chain — see
    # core/rendering.weights_from_alpha).  Same math (gradcheck'd vs
    # autodiff + f64); measured +0.3% on v5e (PERF.md round-4 A/B).
    composite_custom_vjp: bool = True
    # Precision of the one-hot section fetches in the resamplers and dp
    # loss (core/sampling.fetch_sections): "mixed" = per-operand
    # (DEFAULT one-hot lhs, HIGHEST values rhs) — gather-EXACT (the 0/1
    # one-hot is bf16-representable and the 3-split rhs covers all 24 f32
    # mantissa bits) at 3-pass cost; measured on v5e: exact (0 ulp vs a
    # real gather at production shapes) and speed-tied with "high"
    # (476.5k vs 476.4k median, 6 interleaved rounds), +1.3% over
    # "highest".  "highest" = both operands 3-split (6 passes, exact);
    # "high" = 3 passes with ~2^-16 relative error on the fetched values
    # (guarded by the frac clamp in sample_pdf_with_mu_sigma; passed the
    # 5k-iter quality soak — PERF.md round-4 fourth pass).
    fetch_precision: str = "mixed"
    # Feed the fused kernels a feature-major [96, N] IPE array
    # (core/math.integrated_pos_enc_t — bit-identical values): the
    # per-degree elementwise IPE work runs at full lane utilization and
    # the array is born in the default row-major layout pallas_call
    # operands require, eliminating the relayout copies the row-major
    # form shows at the kernel boundaries.  Layer 0 contracts dim 0
    # in-kernel (the wgrad orientation Mosaic already compiles).
    # MEASURED NEUTRAL on v5e (PERF.md round-4 seventh pass): the copies
    # do disappear (data formatting 0.315 -> 0.270 ms/step) but the
    # transposed input block costs the kernels about the same
    # (custom-call 3.270 -> 3.299 ms); whole-step +0.3%, within chip
    # variance.  Default off; kept as a tested option for other
    # chip generations / batch shapes.
    ipe_transposed: bool = False
    # Skip the defensive re-sort of the truncated-Gaussian resampler output
    # (already sorted by construction — see core/sampling module comment;
    # fuzz-tested, and confirmed bit-identical on chip).  +0.6% rays/s.
    skip_resampler_sort: bool = True
    # Feed the fused kernels raw-width inputs ([M, 96]/[M, 27]/[M, 4|6])
    # instead of explicitly lane-padding to 128 — Mosaic pads internally,
    # the explicit pads were pure copies.  +0.8% rays/s, bit-identical loss
    # on v5e (PERF.md round-4).
    raw_lane_inputs: bool = True
    # Wire format of the whole-image render map fetch ("float32" /
    # "float16" / "bfloat16").  The pipelined pose render is fetch-bound
    # on relayed/slow host links (PERF.md round-4 tenth pass: ~36 MB of
    # f32 maps vs 0.62 s device time at 800x800); a half-width wire dtype
    # halves the transfer.  The cast happens on device at the END of the
    # render program (all compute stays f32) and the host upcasts back to
    # f32, so consumers see the same dtypes; the maps differ from the f32
    # wire by one half-precision rounding (<= 2^-11 relative — ~0.001 dB
    # on PSNR-scale metrics).  Applies to the f32 map fetch paths
    # (on-device chunked render + pose programs, incl. the mesh pose
    # program where it also halves the all-gather); the uint8 video path
    # is narrower already and the host-chunked mesh path keeps f32.
    fetch_dtype: str = "float32"
    # Run fc_alpha's single-lane dot (and its two gradients) on the VPU
    # inside the fused kernels instead of lane-padded MXU matmuls: the
    # alpha head pays 1.5 full [B, hidden] matmul-units across fwd+bwd for
    # 1/128 useful output lanes (~5% of kernel time at the flagship
    # shapes).  MEASURED on v5e (PERF.md round-4 ninth pass): train
    # +0.15-0.7% (within chip variance), render -1.6% — Mosaic already
    # hides the thin matmuls in the MXU pipeline, and the forward-only
    # path pays for the serialized VPU reduce.  Default off; the tested
    # counterfactual that bounds the in-kernel lane-padding waste.
    alpha_vpu: bool = False


@dataclass(frozen=True)
class Config:
    experiment: ExperimentConfig = field(default_factory=ExperimentConfig)
    train_params: TrainParamsConfig = field(default_factory=TrainParamsConfig)
    dataset: DatasetConfig = field(default_factory=DatasetConfig)
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    nerf: NerfConfig = field(default_factory=NerfConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)

    # ------------------------------------------------------------------ YAML

    @classmethod
    def from_yaml(cls, path_or_stream) -> "Config":
        if hasattr(path_or_stream, "read"):
            d = yaml.safe_load(path_or_stream)
        else:
            with open(path_or_stream, "r") as f:
                d = yaml.safe_load(f)
        return cls.from_dict(d or {})

    @classmethod
    def from_dict(cls, d: dict) -> "Config":
        exp = d.get("experiment", {}) or {}
        tp = d.get("train_params", {}) or {}
        ds = d.get("dataset", {}) or {}
        opt = d.get("optimizer", {}) or {}
        nerf = d.get("nerf", {}) or {}
        par = d.get("parallel", {}) or {}

        def build(dc_cls, src: dict, **extra):
            kwargs = dict(extra)
            dc_fields = {f.name: f for f in fields(dc_cls)}
            for k, v in (src or {}).items():
                if k in dc_fields and not isinstance(v, dict):
                    if isinstance(v, list):
                        v = tuple(v)
                    # YAML 1.1 reads bare off/on/yes/no as booleans; a str
                    # field (e.g. ``pallas_mlp: off``) wants the word back.
                    if isinstance(v, bool) and dc_fields[k].type in (str, "str"):
                        v = {True: "on", False: "off"}[v]
                    kwargs[k] = v
            return dc_cls(**kwargs)

        bd = ds.get("bd_factor", None)
        if bd is False or bd == 0:
            bd = None
        ds = dict(ds)
        ds["bd_factor"] = bd

        nerf_cfg = build(
            NerfConfig,
            nerf,
            train=build(NerfModeConfig, nerf.get("train", {})),
            validation=build(NerfModeConfig, nerf.get("validation", {})),
        )
        return cls(
            experiment=build(ExperimentConfig, exp),
            train_params=build(TrainParamsConfig, tp),
            dataset=build(DatasetConfig, ds),
            optimizer=build(OptimizerConfig, opt),
            nerf=nerf_cfg,
            parallel=build(ParallelConfig, par),
        )

    def to_dict(self) -> dict:
        def conv(obj):
            if is_dataclass(obj):
                return {f.name: conv(getattr(obj, f.name)) for f in fields(obj)}
            if isinstance(obj, tuple):
                return list(obj)
            return obj

        return conv(self)

    def dump(self) -> str:
        """YAML round-trip, mirroring ``CfgNode.dump`` (cfgnode.py:167) used by
        the config-snapshot contract (train_model.py:44-46)."""
        buf = io.StringIO()
        yaml.safe_dump(self.to_dict(), buf, default_flow_style=False)
        return buf.getvalue()

    # ------------------------------------------------------------- utilities

    def replace_at(self, path: str, value: Any) -> "Config":
        """Return a new Config with ``path`` (dot-separated) replaced."""
        parts = path.split(".")

        def rec(node, parts):
            if len(parts) == 1:
                return replace(node, **{parts[0]: value})
            child = getattr(node, parts[0])
            return replace(node, **{parts[0]: rec(child, parts[1:])})

        return rec(self, parts)

    def merge_from_list(self, opts) -> "Config":
        """YACS-style CLI overrides: alternating ``key value`` pairs with
        dot-separated keys (reference ``CfgNode.merge_from_list``,
        cfgnode.py:208).  Values are YAML-parsed and coerced to the type of
        the field they replace.  Returns a new Config.
        """
        if len(opts) % 2:
            raise ValueError(f"override list must be key/value pairs: {opts}")
        cfg = self
        for key, raw in zip(opts[::2], opts[1::2]):
            node = cfg
            for part in key.split(".")[:-1]:
                node = getattr(node, part)  # raises AttributeError on typo
            leaf = key.split(".")[-1]
            old = getattr(node, leaf)
            val = yaml.safe_load(raw) if isinstance(raw, str) else raw
            if (isinstance(old, str) and isinstance(raw, str)
                    and not isinstance(val, str)):
                # YAML 1.1 coerces bare off/on/yes/no/123 — but the field
                # wants a string (e.g. ``parallel.pallas_mlp off``), so the
                # raw CLI token wins.
                val = raw
            if old is not None and val is not None:
                if isinstance(old, bool):
                    if not isinstance(val, bool):
                        raise ValueError(f"{key} expects a bool, got {raw!r}")
                elif isinstance(old, float) and isinstance(val, int):
                    val = float(val)
                elif isinstance(old, float) and isinstance(val, str):
                    # YAML 1.1 leaves "1e-3" (no dot) as a string.
                    try:
                        val = float(val)
                    except ValueError:
                        raise ValueError(
                            f"{key} expects float, got {raw!r}"
                        ) from None
                elif isinstance(old, tuple) and isinstance(val, list):
                    val = tuple(val)
                elif type(val) is not type(old):
                    raise ValueError(
                        f"{key} expects {type(old).__name__}, got {raw!r}"
                    )
            cfg = cfg.replace_at(key, val)
        return cfg

    def resolved(self) -> "Config":
        """Apply the derived-value rules the reference applies at startup:

        * auto ``dist_reg_coeficient = clip(1/num_coarse, 0.01, 0.12)``
          (train_model.py:124-126);
        * pose-normalization rescale of near/far/combined_split
          (data_utils.py:67-74) is handled in the data layer, not here, so the
          config stays the single source of truth for raw values.
        """
        cfg = self
        if cfg.train_params.set_automatic_dist_reg_coeficient:
            coef = min(max(1.0 / cfg.nerf.train.num_coarse, 0.01), 0.12)
            cfg = cfg.replace_at("train_params.dist_reg_coeficient", coef)
        return cfg

    def is_ddnerf(self) -> bool:
        return self.nerf.type == "DDNerfModel"


def load_config(path: str) -> Config:
    return Config.from_yaml(path).resolved()
