"""The coarse→fine rendering pipeline, as pure functions.

TPU-native rewrite of ``GeneralMipNerfModel`` / ``DDNerfModel``
(``/root/reference/models/models.py``).  The reference's nn.Module facade with
a serial chunk loop (models.py:53, 135-137) becomes a single traced function
over the whole ray batch: batching/sharding happens *outside* (pjit over the
ray axis), chunking for memory happens via ``jax.lax.map`` at render time only.

One pipeline call = one fused XLA program: stratified sample → cast to
frustum Gaussians → IPE → coarse MLP → composite → truncated-Gaussian
resample → fine MLP → composite → losses.  No host round-trips.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import flax.struct
import jax
import jax.numpy as jnp

from ddnerf_tpu.config import Config
from ddnerf_tpu.core import dd, rendering, sampling
from ddnerf_tpu.core import math as mmath
from ddnerf_tpu.models.mlp import DepthMipMLP, MipMLP


@flax.struct.dataclass
class RayBatch:
    """A bundle of rays: the traced equivalent of the reference's packed
    12-dim ray layout ``[ro, rd, radius, near, far, viewdirs]``
    (models.py:144-162)."""

    origins: jax.Array  # [N, 3]
    directions: jax.Array  # [N, 3]
    radii: jax.Array  # [N, 1]
    viewdirs: jax.Array  # [N, 3]
    near: jax.Array  # [N, 1]
    far: jax.Array  # [N, 1]

    @classmethod
    def create(cls, origins, directions, radii, near, far):
        origins = origins.reshape(-1, 3)
        directions = directions.reshape(-1, 3)
        radii = radii.reshape(-1, 1)
        viewdirs = directions / jnp.linalg.norm(directions, axis=-1, keepdims=True)
        ones = jnp.ones_like(directions[..., :1])
        return cls(
            origins=origins,
            directions=directions,
            radii=radii,
            viewdirs=viewdirs,
            near=near * ones,
            far=far * ones,
        )

    @property
    def num_rays(self):
        return self.origins.shape[0]


class ScheduleValues(NamedTuple):
    """Traced per-step values replacing the reference's runtime config
    mutation (train_model.py:121-142)."""

    gaussian_smooth_factor: jax.Array  # f32 scalar
    pdf_padding: jax.Array  # bool scalar

    @classmethod
    def for_eval(cls, cfg: Config):
        """Eval-time fixup mirroring eval_nerf.py:53-55: pdf_padding off and
        final smooth **only if** training passed the flip
        (``max_pdf_pad_iters < train_iters``) — a run that never reaches the
        flip evals with padding still on, exactly like the reference."""
        tp = cfg.train_params
        passed_flip = tp.max_pdf_pad_iters < cfg.experiment.train_iters
        smooth = tp.final_smooth if passed_flip else tp.gaussian_smooth_factor
        return cls(
            gaussian_smooth_factor=jnp.asarray(smooth, jnp.float32),
            pdf_padding=jnp.asarray(tp.pdf_padding and not passed_flip),
        )


# Trace-time OVERRIDES for the A/B harness (benchmarks/ab.py applies
# MODULE.FLAG=VALUE assignments before tracing).  None = follow the config
# (``cfg.parallel.*`` — the production values, recorded by the config
# snapshot so a run's numerics are reproducible from logdir/config.yml).
# The measured rationale for each default lives on its config field
# (config.py ParallelConfig) and in PERF.md:
#
# * _REMAT_IPE -> cfg.parallel.remat_ipe
# * _KERNEL_PER_RAY_DIRS -> cfg.parallel.kernel_per_ray_dirs (negative on
#   v5e: 368.0k vs 389.6k rays/s — the per-block iota/compare +
#   HIGHEST-precision expand costs more than the 34 MB/step of dirs traffic
#   it saves; the trade can flip where HBM is scarcer relative to VPU)
# * _KERNEL_STASH_ACTS -> cfg.parallel.kernel_stash_acts (+14% on v5e;
#   ~277 MB of HBM per network at the flagship batch; gradients
#   bit-comparable to recompute mode)
# * _RENDER_KERNEL_VARIANT -> cfg.parallel.render_kernel_variant
_REMAT_IPE = None
_FORCE_PALLAS_POLICY = None  # overrides cfg.parallel.pallas_mlp
_KERNEL_PER_RAY_DIRS = None
_KERNEL_STASH_ACTS = None
_RENDER_KERNEL_VARIANT = None
_COMPOSITE_CUSTOM_VJP = None  # -> cfg.parallel.composite_custom_vjp
_IPE_TRANSPOSED = None  # -> cfg.parallel.ipe_transposed
_IPE_VARIANT = None  # -> cfg.parallel.ipe_variant


def _ov(override, cfg_value):
    """Trace-time module override beats config; None follows config."""
    return cfg_value if override is None else override


def _dtype_of(cfg: Config):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
        cfg.parallel.compute_dtype
    ]


class NerfPipeline:
    """Config-selected pair of MLPs + the pure rendering functions.

    This object holds only *static* configuration (hashable) — parameters
    live in a separate pytree, so ``render_rays`` closes over nothing traced.
    """

    def __init__(self, cfg: Config):
        self.cfg = cfg
        # Validate the config-reachable kernel/IPE selectors UP FRONT: a
        # bad value surfacing later inside the render-kernel probe would be
        # swallowed by _fused_render_available's backend-fallback guard and
        # misattributed to "kernel unavailable" (silent 22%-slower XLA
        # renders).  The trace-time module overrides (_RENDER_KERNEL_VARIANT
        # / _IPE_VARIANT, incl. the measurement-only "floor") bypass this
        # deliberately — they are A/B-harness levers, not config.
        par = cfg.parallel
        if par.render_kernel_variant not in ("mlp", "ipe2"):
            raise ValueError(
                f"parallel.render_kernel_variant="
                f"{par.render_kernel_variant!r}: expected mlp | ipe2 "
                "(the 'ipe' fused_ipe_mlp kernel was retired in round 5 — "
                "PERF.md)"
            )
        if par.ipe_variant not in ("stack", "fused"):
            raise ValueError(
                f"parallel.ipe_variant={par.ipe_variant!r}: expected "
                "stack | fused"
            )
        if par.ipe_variant == "fused" and par.ipe_transposed:
            raise ValueError(
                "parallel.ipe_variant='fused' measures the row-major "
                "assembly and is unreachable under ipe_transposed=true "
                "(the transposed branch takes precedence) — set "
                "ipe_transposed: false for that A/B"
            )
        dtype = _dtype_of(cfg)
        mlp_kw = dict(
            dtype=dtype,
            relu_save_output=cfg.parallel.relu_save_output,
            relu_bf16_residual=cfg.parallel.relu_bf16_residual,
            split_skip_layer=cfg.parallel.split_skip_layer,
        )
        if cfg.is_ddnerf():
            self.coarse = DepthMipMLP(
                hidden_size=cfg.nerf.coarse_hidden_size, **mlp_kw
            )
            self.fine = MipMLP(hidden_size=cfg.nerf.fine_hidden_size, **mlp_kw)
            self.shared_net = False
        else:
            self.coarse = MipMLP(
                hidden_size=cfg.nerf.coarse_hidden_size, **mlp_kw
            )
            self.fine = None  # one shared net for both cycles (models.py:28)
            self.shared_net = True

        ds = cfg.dataset
        self._eps_mask_pdf = ds.type.lower() == "blender" or ds.basedir.endswith(
            "segmented"
        )
        self._filter_empty = ds.type.lower() == "blender"
        # The Pallas kernel runs in interpreter mode on CPU (tests/CI).
        # Resolved LAZILY (see property below): probing the default backend
        # initializes it, and doing that in the constructor turned "chip
        # temporarily unavailable" into a crash before a single step ran
        # (BENCH_r03's failure mode — the relayed backend serializes client
        # handshakes for 70-700 s, PERF.md operational notes).
        self._pallas_interpret_cached: bool | None = None

        # Probe-compile result of the fused train kernels (None = not yet
        # probed; see _fused_train_available).  _bwd_rows_downgraded is set
        # when the configured block size fails to compile but the kernel
        # default (1024) succeeds — the middle rung of the fallback ladder.
        self._fused_train_ok: bool | None = None
        self._bwd_rows_downgraded: int | None = None
        # Same idea for the forward-only render kernel ("render"/"auto"
        # policies; see _fused_render_available).
        self._fused_render_ok: bool | None = None

    @property
    def _pallas_interpret(self) -> bool:
        if self._pallas_interpret_cached is None:
            self._pallas_interpret_cached = jax.default_backend() == "cpu"
        return self._pallas_interpret_cached

    # ----------------------------------------------------- kernel availability

    def _fused_train_available(self) -> bool:
        """Probe-compile the fused train kernels once (tiny batch, the real
        backend) and cache the outcome.  On failure — e.g. a TPU generation
        or Mosaic toolchain that rejects the kernel's block shape
        (fused_mlp_bwd.BWD_BLOCK_ROWS is the only size known to compile on
        v5e) — warn and fall back to the XLA train step instead of crashing
        the CLI: all shipped configs default ``pallas_mlp: train``, and this
        build must never be *less* runnable than its slow path (cf. the
        reference's unconditional CPU fallback, train_model.py:54-57)."""
        if self._fused_train_ok is None:
            import warnings

            from ddnerf_tpu.kernels.fused_mlp_bwd import BWD_BLOCK_ROWS

            def _reraise_if_transient(e: Exception) -> str:
                # TRANSIENT backend trouble (busy relay, lost connection)
                # must not be cached as "kernels don't compile" — that would
                # silently lock the whole run onto the ~80%-speed XLA path.
                # Re-raise those; the caller's retry machinery (bench
                # supervisor, operator rerun) owns them.
                msg = f"{type(e).__name__}: {e}"
                if any(
                    m in msg
                    for m in ("UNAVAILABLE", "DEADLINE_EXCEEDED",
                              "Unable to initialize backend",
                              "Socket closed", "Connection reset")
                ):
                    raise e
                return msg

            try:
                self._probe_fused_train()
                self._fused_train_ok = True
                return True
            except Exception as e:  # Mosaic/compile errors are not typed
                msg = _reraise_if_transient(e)
            # Middle rung: the configured block size failed — retry at the
            # kernel default (1024, the size every supported toolchain is
            # known to compile) before abandoning the kernels entirely.
            rows = self.cfg.parallel.bwd_block_rows
            if rows and rows != BWD_BLOCK_ROWS:
                warnings.warn(
                    f"fused train kernels rejected bwd_block_rows={rows} "
                    f"({msg[:300]}); retrying at the kernel default "
                    f"{BWD_BLOCK_ROWS}"
                )
                try:
                    self._bwd_rows_downgraded = BWD_BLOCK_ROWS
                    self._probe_fused_train()
                    self._fused_train_ok = True
                    return True
                except Exception as e2:
                    msg = _reraise_if_transient(e2)
                    self._bwd_rows_downgraded = None
            warnings.warn(
                "fused Pallas train kernels unavailable on this backend "
                f"({msg[:300]}); falling back to the XLA train step "
                "(pallas_mlp: off semantics, ~80% of the fused speed)"
            )
            self._fused_train_ok = False
        return self._fused_train_ok

    def _fused_render_available(self) -> bool:
        """Probe-compile the forward-only render kernel once (the selected
        ``render_kernel_variant``, production statics) and cache the
        outcome.  Mirrors :meth:`_fused_train_available`: Mosaic rejection
        warns and falls back to the XLA render path instead of crashing —
        the "auto" policy ships in every config, so a toolchain that
        rejects the forward kernel must still render."""
        if self._fused_render_ok is None:
            import warnings

            try:
                self._probe_fused_render()
                self._fused_render_ok = True
                return True
            except Exception as e:  # Mosaic/compile errors are not typed
                msg = f"{type(e).__name__}: {e}"
                if any(
                    m in msg
                    for m in ("UNAVAILABLE", "DEADLINE_EXCEEDED",
                              "Unable to initialize backend",
                              "Socket closed", "Connection reset")
                ):
                    raise  # transient — never cache as "doesn't compile"
            warnings.warn(
                "fused Pallas render kernel unavailable on this backend "
                f"({msg[:300]}); falling back to the XLA render path"
            )
            self._fused_render_ok = False
        return self._fused_render_ok

    def _probe_fused_render(self) -> None:
        """One tiny forward through the selected render kernel per distinct
        network shape, with the exact validation-mode statics (sample
        count, compute dtype, raw-lane mode).  Runs in a fresh thread for
        a clean trace state — see :meth:`_probe_fused_train`."""
        import threading

        box: list[BaseException] = []

        def run_probe():
            from ddnerf_tpu.utils.compile import step_compiler_options

            par = self.cfg.parallel
            cdt = _dtype_of(self.cfg)
            variant = _ov(_RENDER_KERNEL_VARIANT, par.render_kernel_variant)
            params = self.init_params(jax.random.PRNGKey(0))
            vc = self.cfg.nerf.validation
            nets = [("coarse", isinstance(self.coarse, DepthMipMLP),
                     vc.num_coarse + 1)]
            if not self.shared_net:
                nets.append(("fine", False, vc.num_fine + 1))
            n = 32  # one dirs block of rays
            opts = step_compiler_options(self.cfg)
            for key, depth, s in nets:
                p = params[key]
                if variant == "mlp":
                    from ddnerf_tpu.kernels.fused_mlp import fused_mlp_forward

                    ipe_t = self._ipe_transposed()
                    ipe = jnp.zeros((96, n * s) if ipe_t else (n * s, 96),
                                    cdt)
                    dirs = jnp.zeros((n, 27), cdt)

                    kw = self._render_kw(s)

                    def f(pp, ipe=ipe, dirs=dirs, depth=depth, s=s,
                          ipe_t=ipe_t, kw=kw):
                        return fused_mlp_forward(
                            pp, ipe, dirs, depth_head=depth,
                            compute_dtype=cdt, interpret=False,
                            samples_per_ray=s,
                            raw_lane=par.raw_lane_inputs,
                            ipe_transposed=ipe_t,
                            alpha_vpu=par.alpha_vpu,
                            **kw,
                        )
                elif variant == "ipe2":
                    from ddnerf_tpu.kernels.fused_mlp import (
                        fused_enc_mlp_forward,
                    )

                    means = jnp.zeros((n * s, 3), jnp.float32)
                    covs = jnp.full((n * s, 3), 1e-4, jnp.float32)
                    dirs = jnp.zeros((n, 27), cdt)
                    kw = self._render_kw(s)

                    def f(pp, means=means, covs=covs, dirs=dirs,
                          depth=depth, s=s, kw=kw):
                        return fused_enc_mlp_forward(
                            pp, means, covs, dirs, depth_head=depth,
                            samples_per_ray=s, compute_dtype=cdt,
                            alpha_vpu=par.alpha_vpu, **kw,
                        )
                else:
                    # "ipe" (fused_ipe_mlp) was retired in round 5 after
                    # three measured negatives for in-kernel encodes
                    # (PERF.md); "ipe2" remains the executable
                    # counterfactual at the strongest integration.
                    raise ValueError(
                        f"render_kernel_variant={variant!r}: expected "
                        "mlp | ipe2"
                    )

                probe = jax.jit(f, compiler_options=opts)
                jax.block_until_ready(probe(p))

        def target():
            try:
                run_probe()
            except BaseException as e:  # reraised in the caller below
                box.append(e)

        t = threading.Thread(target=target, name="fused-render-probe")
        t.start()
        t.join()
        if box:
            raise box[0]

    def _render_kw(self, s: int) -> dict:
        """Extra kwargs for the forward-only render kernel, derived from
        ``parallel.render_block_rows`` (empty = the kernel default).  The
        render path runs in per-ray dirs mode, where the row block is
        rays_per_block whole rays (fused_mlp.plan_blocks); the ray count is
        kept a multiple of 16 (floor, min 16) so the row block stays a
        multiple of the bf16 sublane tile even when s is odd (validation
        s = num_coarse + 1 = 33) — a non-multiple block would make the
        Mosaic probe reject the kernel and silently fall back to XLA.
        Used identically by the probe and the dispatch so both compile the
        same kernel."""
        rows = self.cfg.parallel.render_block_rows
        if not rows:
            return {}
        rpb = rows // s
        return {"rays_per_block": max(16, rpb - rpb % 16)}

    def _train_block_rows(self) -> int:
        """The fused train kernels' row-block size actually in effect:
        the config value unless the probe ladder downgraded it."""
        if self._bwd_rows_downgraded is not None:
            return self._bwd_rows_downgraded
        return self.cfg.parallel.bwd_block_rows

    def _probe_fused_train(self) -> None:
        """One tiny fwd+bwd through ``fused_mlp_train_apply`` per distinct
        network shape, with the exact static kernel config production will
        use (stash / per-ray dirs / block rows / compute dtype) — Mosaic
        compilation depends only on those statics, not the row count, so
        this one-block probe is representative.  Jitted with the step's
        ``compiler_options`` (the raised scoped-VMEM cap is part of what
        makes the 2048-row block compile, so probing without it would
        reject a config production accepts)."""
        # The probe is usually reached while the OUTER train step is being
        # traced (_run_network's kernel-policy branch): there, a plain jit
        # would be nested (rejects compiler_options) and even input
        # creation (jnp.zeros) yields tracers of the ambient trace.  A
        # fresh thread has a clean trace state, so everything below —
        # inputs, jit, execution — is genuinely top-level and compiles
        # exactly as production will (same statics + compiler options).
        import threading

        box: list[BaseException] = []

        def run_probe():
            from ddnerf_tpu.kernels import fused_mlp_bwd as fk
            from ddnerf_tpu.utils.compile import step_compiler_options

            par = self.cfg.parallel
            cdt = _dtype_of(self.cfg)
            per_ray = _ov(_KERNEL_PER_RAY_DIRS, par.kernel_per_ray_dirs)
            stash = _ov(_KERNEL_STASH_ACTS, par.kernel_stash_acts)
            params = self.init_params(jax.random.PRNGKey(0))
            tp = self.cfg.nerf.train
            nets = [("coarse", isinstance(self.coarse, DepthMipMLP),
                     tp.num_coarse + 1)]
            if not self.shared_net:
                nets.append(("fine", False, tp.num_fine + 1))
            n = 32  # one dirs block of rays; rows pad to one kernel block
            for key, depth, s in nets:
                # s = the PRODUCTION samples-per-ray: in per-ray mode the
                # block shape is rays_per_block * s, so probing any other s
                # would compile a different kernel than training will.
                p = params[key]
                if per_ray:
                    dirs, spr = jnp.zeros((n, 27), cdt), s
                else:
                    dirs, spr = jnp.zeros((n * s, 27), cdt), 0
                ipe_t = self._ipe_transposed()
                ipe = jnp.zeros((96, n * s) if ipe_t else (n * s, 96), cdt)

                def f(pp, ipe=ipe, dirs=dirs, depth=depth, spr=spr,
                      ipe_t=ipe_t):
                    out = fk.fused_mlp_train_apply(
                        pp, ipe, dirs, depth, self._pallas_interpret, cdt,
                        spr, stash, self._train_block_rows(),
                        par.raw_lane_inputs, ipe_t, par.alpha_vpu,
                        par.split_h_stash,
                    )
                    return jnp.sum(out.astype(jnp.float32))

                probe = jax.jit(
                    jax.grad(f),
                    compiler_options=step_compiler_options(self.cfg),
                )
                jax.block_until_ready(probe(p))

        def target():
            try:
                run_probe()
            except BaseException as e:  # reraised in the caller below
                box.append(e)

        t = threading.Thread(target=target, name="fused-kernel-probe")
        t.start()
        t.join()
        if box:
            raise box[0]

    # ------------------------------------------------------------------ init

    def init_params(self, rng) -> Dict[str, Any]:
        ipe = jnp.zeros((1, 1, 96), jnp.float32)
        dirs = jnp.zeros((1, 1, 27), jnp.float32)
        rc, rf = jax.random.split(rng)
        params = {"coarse": self.coarse.init(rc, ipe, dirs)["params"]}
        if not self.shared_net:
            params["fine"] = self.fine.init(rf, ipe, dirs)["params"]
        return params

    # --------------------------------------------------------------- network

    def _pallas_policy(self) -> str:
        if _FORCE_PALLAS_POLICY is not None:
            return _FORCE_PALLAS_POLICY
        policy = self.cfg.parallel.pallas_mlp
        if self.cfg.parallel.use_pallas_mlp:  # legacy bool alias
            policy = "all"
        return policy

    def _use_pallas(self, mode: str) -> bool:
        policy = self._pallas_policy()
        if policy == "all":
            return True
        # "render"/"auto": forward kernel on the whole-image paths, only on
        # real hardware (interpret mode is a correctness tool, not a fast
        # path) and only if the kernel probe-compiles (fallback = XLA).
        return (
            policy in ("render", "auto")
            and mode in ("validation", "render")
            and not self._pallas_interpret
            and self._fused_render_available()
        )

    def _analytic_weights_vjp(self) -> bool:
        return _ov(_COMPOSITE_CUSTOM_VJP, self.cfg.parallel.composite_custom_vjp)

    def _ipe(self, means, covs):
        """IPE with the config-selected sin/cos path (core/math.py)."""
        return mmath.integrated_pos_enc(
            (means, covs), double_angle=self.cfg.parallel.ipe_double_angle
        )

    def _ipe_transposed(self) -> bool:
        return _ov(_IPE_TRANSPOSED, self.cfg.parallel.ipe_transposed)

    def _kernel_ipe(self, means, covs, n, s):
        """The fused kernels' IPE input: flattened [n*s, 96], or
        feature-major [96, n*s] when ``parallel.ipe_transposed`` (see
        core/math.integrated_pos_enc_t — bit-identical values, no
        relayout copies at the pallas_call boundary)."""
        out_dtype = (_dtype_of(self.cfg)
                     if self.cfg.parallel.ipe_early_cast else None)
        # Variant checks run BEFORE the transposed branch so the module
        # override (the A/B lever) is never silently shadowed now that the
        # shipped configs set ipe_transposed; config-reachable values are
        # validated at pipeline construction ("stack"/"fused" only, and
        # "fused" is rejected together with ipe_transposed).
        variant = _ov(_IPE_VARIANT, self.cfg.parallel.ipe_variant)
        if variant == "fused":
            # Concat-free direct-form assembly, cast folded into the one
            # output fusion (core/math.integrated_pos_enc_fused rationale).
            return mmath.integrated_pos_enc_fused(
                (means.reshape(n * s, 3), covs.reshape(n * s, 3)),
                out_dtype=_dtype_of(self.cfg),
            )
        if variant == "floor":
            # MEASUREMENT-ONLY (module-override A/B value, not a config
            # value): a trivially-written feature array with the right
            # shape/dtype — bounds the achievable win of any IPE-assembly
            # change by removing the entire encode+assembly cost.  Row-major
            # form: pair with cfg.parallel.ipe_transposed=False in the
            # harness flags (the round-5 floor trace did).
            return jnp.broadcast_to(
                means.reshape(n * s, 3).mean(-1, keepdims=True), (n * s, 96)
            ).astype(_dtype_of(self.cfg))
        if self._ipe_transposed():
            return mmath.integrated_pos_enc_t(
                (means.reshape(n * s, 3), covs.reshape(n * s, 3)),
                double_angle=self.cfg.parallel.ipe_double_angle,
                out_dtype=out_dtype,
            )
        return mmath.integrated_pos_enc(
            (means.reshape(n * s, 3), covs.reshape(n * s, 3)),
            double_angle=self.cfg.parallel.ipe_double_angle,
            out_dtype=out_dtype,
        )

    def _run_network(self, module, params, rays: RayBatch, t_vals, mode="train"):
        """cast_rays → IPE → viewdir PE → MLP (reference models.py:117-142).

        The MLP runs through the fused Pallas kernel when the policy allows
        (forward-only rendering by default — see kernels/fused_mlp.py and
        PERF.md), else through the flax module (XLA)."""
        means, covs = mmath.cast_rays(
            t_vals, rays.origins, rays.directions, rays.radii, self.cfg.nerf.ray_shape
        )
        if (
            self._pallas_policy() in ("train", "auto")
            and mode == "train"
            and self._fused_train_available()
        ):
            # Fused-backward train kernel: the whole per-network backward
            # (relu masks, dgrad chain, all weight/bias grads) runs in VMEM
            # per row-block with the forward recomputed in-block — no
            # activation slab ever round-trips HBM (kernels/fused_mlp_bwd.py).
            from ddnerf_tpu.kernels.fused_mlp_bwd import fused_mlp_train_apply

            depth_head = isinstance(module, DepthMipMLP)
            out_dim = 6 if depth_head else 4
            n, s = means.shape[0], means.shape[1]
            # Flatten BEFORE the IPE so the big [N*S, 96] feature array is
            # born in the kernel's row-major layout (no post-hoc reshape).
            ipe = self._kernel_ipe(means, covs, n, s)
            dirs_enc = mmath.positional_encoding(rays.viewdirs, num_freqs=4)
            cdt = _dtype_of(self.cfg)
            if _ov(_KERNEL_PER_RAY_DIRS, self.cfg.parallel.kernel_per_ray_dirs):
                dirs_in, spr = dirs_enc, s
            else:
                dirs_in = jnp.broadcast_to(
                    dirs_enc[:, None, :], (n, s, dirs_enc.shape[-1])
                ).reshape(n * s, -1)
                spr = 0
            # Cast the kernel inputs up front so the VJP residuals are the
            # compute-dtype arrays (half the HBM of f32 residuals); the
            # kernel's own casts then no-op.  stop_gradient on the inputs
            # keeps AD from building an IPE backward over the op's
            # zeros_like input cotangents (their grads are structurally
            # zero: t_vals are stop-gradient'd upstream, viewdirs are
            # data).  Measured neutral on chip (388.6k vs 389.6k, within
            # variance) — XLA was already folding the zero chains — but it
            # guards that independence from future graph changes for free.
            sg = jax.lax.stop_gradient
            flat = fused_mlp_train_apply(
                params,
                sg(ipe.astype(cdt)),
                sg(dirs_in.astype(cdt)),
                depth_head,
                self._pallas_interpret,
                cdt,
                spr,
                _ov(_KERNEL_STASH_ACTS, self.cfg.parallel.kernel_stash_acts),
                self._train_block_rows(),
                self.cfg.parallel.raw_lane_inputs,
                self._ipe_transposed(),
                self.cfg.parallel.alpha_vpu,
                self.cfg.parallel.split_h_stash,
            )
            return flat.reshape(n, s, out_dim)
        if self._use_pallas(mode):
            depth_head = isinstance(module, DepthMipMLP)
            out_dim = 6 if depth_head else 4
            n, s = means.shape[0], means.shape[1]
            variant = _ov(_RENDER_KERNEL_VARIANT,
                          self.cfg.parallel.render_kernel_variant)
            if variant == "mlp":
                # fused_mlp with the IPE in XLA (flatten-first) and PER-RAY
                # dirs — the train kernel's integration recipe applied to
                # the forward-only path.
                from ddnerf_tpu.kernels.fused_mlp import fused_mlp_forward

                ipe = self._kernel_ipe(means, covs, n, s)
                dirs_enc = mmath.positional_encoding(
                    rays.viewdirs, num_freqs=4
                )
                cdt = _dtype_of(self.cfg)
                kw = self._render_kw(s)
                flat = fused_mlp_forward(
                    params,
                    ipe.astype(cdt),
                    dirs_enc.astype(cdt),
                    depth_head=depth_head,
                    compute_dtype=cdt,
                    interpret=self._pallas_interpret,
                    samples_per_ray=s,
                    raw_lane=self.cfg.parallel.raw_lane_inputs,
                    ipe_transposed=self._ipe_transposed(),
                    alpha_vpu=self.cfg.parallel.alpha_vpu,
                    **kw,
                )
                # NOTE the [n*s, out] -> [n, s, out] reshape below lowers
                # to a ~17 ms/cycle relayout copy at 800x800 (round-5
                # digest) because any narrow-lane array is tile-padded to
                # 128 lanes in HBM.  Deferring the lane slice past the
                # reshape ("wide_output") was measured WORSE (644 vs 612
                # ms device: XLA materializes the full 128-lane rank-3
                # array instead) — the copy is layout-floor-bound, not
                # removable by reordering.
                return flat.reshape(n, s, out_dim)
            if variant == "ipe2":
                # In-kernel IPE with the modern recipe: raw [N, 3] f32
                # means/covs in (no [N, 96] feature array in HBM, no
                # boundary relayout copies), per-ray dirs PE, merged heads
                # (kernels/fused_mlp.fused_enc_mlp_forward).  The measured
                # counterpoint to the retired fused_ipe_mlp, whose loss
                # traced to [N, 128]-padded f32 inputs + per-sample dirs.
                from ddnerf_tpu.kernels.fused_mlp import fused_enc_mlp_forward

                dirs_enc = mmath.positional_encoding(
                    rays.viewdirs, num_freqs=4
                )
                cdt = _dtype_of(self.cfg)
                kw = self._render_kw(s)
                flat = fused_enc_mlp_forward(
                    params,
                    means.reshape(n * s, 3),
                    covs.reshape(n * s, 3),
                    dirs_enc.astype(cdt),
                    depth_head=depth_head,
                    samples_per_ray=s,
                    compute_dtype=cdt,
                    interpret=self._pallas_interpret,
                    alpha_vpu=self.cfg.parallel.alpha_vpu,
                    **kw,
                )
                return flat.reshape(n, s, out_dim)
            # "ipe" (the v2 fused_ipe_mlp kernel) was retired in round 5:
            # third measured negative for in-kernel encodes (PERF.md).
            raise ValueError(
                f"render_kernel_variant={variant!r}: expected mlp | ipe2"
            )

        def net(params, means, covs, viewdirs):
            if _ov(_REMAT_IPE, self.cfg.parallel.remat_ipe):
                # Recompute the IPE in the backward instead of saving it:
                # the saved [N,S,96] residual otherwise needs a slow
                # cross-dim relayout for trunk_0's wgrad (a 0.35 ms kLoop
                # copy in the trace digest), while recomputing it is ~0.05 ms
                # of VPU work emitted directly in the consumer's layout.
                ipe = jax.checkpoint(self._ipe)(means, covs)
            else:
                ipe = self._ipe(means, covs)  # [N, S, 96]
            dirs_enc = mmath.positional_encoding(viewdirs, num_freqs=4)  # [N, 27]
            # Keep the [N, S, C] form: measured ~9% faster than flattening
            # to [N*S, C] at the flagship batch (XLA layout choice).  Large
            # batches where the 3-D form picks pathological backward-matmul
            # emitters are handled by parallel.microbatch_rays instead.
            # dirs stay per-ray [N, 1, 27]: the MLP projects them once per
            # ray and broadcasts the projection over samples (mlp._mlp_heads)
            # instead of materializing [N, S, 27].
            return module.apply({"params": params}, ipe, dirs_enc[:, None, :])

        if self.cfg.parallel.remat_mlp:
            # Rematerialize IPE + MLP in the backward pass: the saved trunk
            # residuals (~10 x [N*S, 256] per net) otherwise round-trip HBM,
            # which is what caps large-batch throughput (PERF.md).  Recompute
            # is MXU work the chip has spare capacity for.  No-op for
            # forward-only (eval/render) calls.
            net = jax.checkpoint(net)
        return net(params, means, covs, rays.viewdirs)

    # ---------------------------------------------------------------- render

    def render_rays(
        self,
        params: Dict[str, Any],
        rays: RayBatch,
        rng: jax.Array,
        sched: ScheduleValues,
        mode: str = "train",
    ) -> Dict[int, Dict[str, jax.Array]]:
        """Full coarse→fine pass.  Returns ``{0: coarse dict, 1: fine dict}``
        mirroring the reference ``ret_dict`` (models.py:108, 297)."""
        if self.cfg.is_ddnerf():
            return self._render_dd(params, rays, rng, sched, mode)
        return self._render_mipnerf(params, rays, rng, sched, mode)

    def _first_cycle_tvals(self, rng, rays: RayBatch, mc):
        ds = self.cfg.dataset
        return sampling.sample_first_cycle(
            rng,
            rays.near,
            rays.far,
            mc.num_coarse,
            lindisp=mc.lindisp,
            perturb=mc.perturb,
            combined=ds.combined_sampling_method,
            combined_near=ds.near,
            combined_split=ds.combined_split,
        )

    def _render_mipnerf(self, params, rays, rng, sched, mode):
        """GeneralMipNerfModel.predict (models.py:75-114): one shared net,
        plain inverse-CDF resampling."""
        cfg = self.cfg
        mc = cfg.nerf.mode(mode)
        r_strat, r_n0, r_resample, r_n1 = jax.random.split(rng, 4)

        ret: Dict[int, Dict[str, jax.Array]] = {}

        t_vals = self._first_cycle_tvals(r_strat, rays, mc)
        for i in range(2):
            if i == 1:
                t_vals = sampling.sample_pdf(
                    r_resample,
                    t_vals,
                    weights,
                    mc.num_fine + 1,
                    pdf_padding=sched.pdf_padding,
                    det=not mc.perturb,
                    fetch_precision=cfg.parallel.fetch_precision,
                )
                t_vals = jax.lax.stop_gradient(t_vals)

            raw = self._run_network(self.coarse, params["coarse"], rays, t_vals, mode)
            out = rendering.volume_render(
                raw[..., :3],
                raw[..., 3],
                t_vals,
                rays.directions,
                rng=r_n0 if i == 0 else r_n1,
                noise_std=mc.radiance_field_noise_std,
                white_background=mc.white_background,
                eps_mask_pdf=self._eps_mask_pdf,
                analytic_weights_vjp=self._analytic_weights_vjp(),
            )
            weights = out.weights
            ret[i] = {
                "rgb": out.rgb,
                "disp": out.disp,
                "acc": out.acc,
                "weights": out.weights,
                "depth": out.depth,
                "t_vals": t_vals,
            }
        return ret

    def _render_dd(self, params, rays, rng, sched, mode):
        """DDNerfModel.predict (models.py:207-322)."""
        cfg = self.cfg
        mc = cfg.nerf.mode(mode)
        tp = cfg.train_params
        r_strat, r_n0, r_resample, r_n1 = jax.random.split(rng, 4)

        # ---- cycle 0: coarse with depth-distribution head
        t0 = self._first_cycle_tvals(r_strat, rays, mc)
        raw0 = self._run_network(self.coarse, params["coarse"], rays, t0, mode)  # [N,S,6]

        raw_mus, raw_sigmas = raw0[..., 4], raw0[..., 5]
        mus = jax.nn.sigmoid(raw_mus)
        sigmas = jax.nn.sigmoid(raw_sigmas) + 0.001

        # L2 regularizers on the raw heads (models.py:248-252): per-ray sums
        # averaged over rays.
        n_rays = raw_mus.shape[0]
        sig_loss = jnp.sum(raw_sigmas**2) / n_rays
        mus_loss = jnp.sum(raw_mus**2) / n_rays
        mus_reg = tp.dist_reg_coeficient * mus_loss
        sig_reg = tp.dist_reg_coeficient * sig_loss

        left_tail, part_inside = mmath.truncated_gaussian_tails(mus, sigmas)

        out0 = rendering.volume_render(
            raw0[..., :3],
            raw0[..., 3],
            t0,
            rays.directions,
            rng=r_n0,
            noise_std=mc.radiance_field_noise_std,
            white_background=mc.white_background,
            mus=mus,
            eps_mask_pdf=self._eps_mask_pdf,
            analytic_weights_vjp=self._analytic_weights_vjp(),
        )

        # Smooth the in-cell distribution before resampling (models.py:266-273)
        smoothed_sigmas = sigmas * sched.gaussian_smooth_factor
        s_left_tail, s_part_inside = mmath.truncated_gaussian_tails(
            mus, smoothed_sigmas
        )

        # ---- cycle 1: fine
        t1 = sampling.sample_pdf_with_mu_sigma(
            r_resample,
            t0,
            out0.weights,
            mus,
            smoothed_sigmas,
            s_part_inside,
            s_left_tail,
            mc.num_fine + 1,
            near=cfg.dataset.near,
            far=cfg.dataset.far,
            pdf_padding=sched.pdf_padding,
            det=not mc.perturb,
            fetch_precision=cfg.parallel.fetch_precision,
            skip_sort=cfg.parallel.skip_resampler_sort,
        )
        # The reference wraps samples in nn.Parameter, which detaches them
        # from the sampling graph (samplers.py:215) — stop_gradient is the
        # honest equivalent.
        t1 = jax.lax.stop_gradient(t1)

        raw1 = self._run_network(self.fine, params["fine"], rays, t1, mode)  # [N,M,4]
        out1 = rendering.volume_render(
            raw1[..., :3],
            raw1[..., 3],
            t1,
            rays.directions,
            rng=r_n1,
            noise_std=mc.radiance_field_noise_std,
            white_background=mc.white_background,
            eps_mask_pdf=self._eps_mask_pdf,
            analytic_weights_vjp=self._analytic_weights_vjp(),
        )

        if mode == "render":
            # Pure image synthesis (video frames, eval image dumps): the dp
            # loss and diagnostics are not consumed — skipping them removes a
            # full [N, S, M] interval search from every frame.
            return {
                0: {
                    "rgb": out0.rgb, "disp": out0.disp, "acc": out0.acc,
                    "weights": out0.weights, "depth": out0.depth,
                    "corrected_disp_map": out0.corrected_disp, "t_vals": t0,
                },
                1: {
                    "rgb": out1.rgb, "disp": out1.disp, "acc": out1.acc,
                    "weights": out1.weights, "depth": out1.depth, "t_vals": t1,
                },
            }

        # ---- depth-prediction KL loss (models.py:284-289)
        sg = jax.lax.stop_gradient
        dp = dd.estimate_dp_loss(
            t1,
            sg(t0),
            sg(out1.weights),
            out0.weights,
            mus,
            sigmas,
            sg(left_tail),
            sg(part_inside),
            filter_empty_rays=self._filter_empty,
            variant=tp.dp_loss_variant,
            fetch_precision=cfg.parallel.fetch_precision,
        ) * (t1.shape[-1] - 1)
        dp_loss = dp + mus_reg + sig_reg

        ret0 = {
            "rgb": out0.rgb,
            "disp": out0.disp,
            "acc": out0.acc,
            "weights": out0.weights,
            "depth": out0.depth,
            "corrected_disp_map": out0.corrected_disp,
            "mus": mus,
            "sigmas": sigmas,
            "smoothed_sigmas": smoothed_sigmas,
            "mus_loss": mus_loss,
            "sig_loss": sig_loss,
            "mus_reg": mus_reg,
            "sig_reg": sig_reg,
            "t_vals": t0,
        }
        ret1 = {
            "rgb": out1.rgb,
            "disp": out1.disp,
            "acc": out1.acc,
            "weights": out1.weights,
            "depth": out1.depth,
            "dp_loss": dp_loss,
            "t_vals": t1,
        }
        return {0: ret0, 1: ret1}


def create_pipeline(cfg: Config) -> NerfPipeline:
    """Factory mirroring ``getattr(models, cfg.nerf.type)(cfg)``
    (train_model.py:70)."""
    if cfg.nerf.type not in ("DDNerfModel", "GeneralMipNerfModel"):
        raise ValueError(f"unknown nerf.type {cfg.nerf.type!r}")
    return NerfPipeline(cfg)
