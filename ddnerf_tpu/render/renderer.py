"""Whole-image / video rendering: tiled over a fixed-size jitted eval step.

Replaces the reference's serial chunk loop + concat inside the model
(``/root/reference/models/models.py:53-72``) and the per-pose loop of
``render_video.py:73-104``.  The eval step is compiled ONCE for a fixed chunk
shape (the last chunk is padded), so rendering any number of pixels reuses a
single XLA program; with a mesh, each chunk's ray axis is sharded across
devices (render-tile parallelism, BASELINE.json config 5).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ddnerf_tpu.config import Config
from ddnerf_tpu.models.nerf import NerfPipeline, ScheduleValues
from ddnerf_tpu.train.step import make_eval_step


DEFAULT_KEYS = ("rgb", "disp", "acc", "depth", "corrected_disp_map")

# Pack all fetched maps of a render program into ONE wire array (single
# host transfer instead of one round-trip per map — 10 buffers for the
# default keys; exact by construction).  Trace-time escape hatch / A/B
# lever (benchmarks/ab_pipeline.py --pack-ab); no correctness reason to
# disable.
PACKED_FETCH = True


def _split_maps_scalars(out, extract_keys):
    """Trace-time walk shared by the packed-fetch render programs: split
    the per-cycle output dicts into packable map blocks ([k, chunk(, C)]),
    per-chunk scalars ([k]), and the column layout entries
    ``(cycle, name, width, had_channel_dim)``."""
    maps, scalars, entries = [], {}, []
    for i in (0, 1):
        for name in extract_keys:
            v = out[i].get(name)
            if v is None:
                continue
            if v.ndim == 1:  # per-chunk scalar [k]
                scalars[f"{i}/{name}"] = v
            elif v.ndim == 2:  # [k, chunk]
                entries.append((i, name, 1, False))
                maps.append(v[..., None])
            else:  # [k, chunk, C]
                entries.append((i, name, v.shape[-1], True))
                maps.append(v)
    return maps, scalars, entries


class ImageRenderer:
    def __init__(self, cfg: Config, pipeline: NerfPipeline, mesh=None,
                 extract_keys=DEFAULT_KEYS, mode: str = "validation"):
        """``mode="render"`` skips loss diagnostics per chunk (video / image
        dumps); ``"validation"`` keeps them (dp_loss feeds val metrics)."""
        self.cfg = cfg
        self.pipeline = pipeline
        self.chunk = cfg.nerf.validation.chunksize
        self.mesh = mesh
        self.extract_keys = extract_keys
        try:
            # Wire dtype of the f32 map fetch (parallel.fetch_dtype): the
            # cast runs on device at the end of the render program and the
            # host upcasts after the transfer, so consumers always see f32.
            self._fetch_dtype = {
                "float32": None,
                "float16": jnp.float16,
                "bfloat16": jnp.bfloat16,
            }[cfg.parallel.fetch_dtype]
        except KeyError:
            raise ValueError(
                f"parallel.fetch_dtype={cfg.parallel.fetch_dtype!r}: "
                "expected float32 | float16 | bfloat16"
            ) from None
        self._eval_fn = make_eval_step(cfg, pipeline, mode=mode)
        self._ondevice_cache = {}
        # Packed-fetch column layouts per cached program, recorded at
        # trace time (None = program traced unpacked).
        self._packed_layouts = {}
        if mesh is not None:
            from ddnerf_tpu.parallel.mesh import make_sharded_eval_step

            self._step = make_sharded_eval_step(cfg, pipeline, mesh, mode=mode)
            self._shard = self._make_sharder(mesh)
        else:
            self._step = jax.jit(self._eval_fn)
            self._shard = lambda b: b

    def _make_sharder(self, mesh):
        from ddnerf_tpu.parallel.mesh import shard_batch

        return lambda b: shard_batch(mesh, b)

    # ------------------------------------------------- fetch wire dtype

    def _cast_for_fetch(self, tree):
        """Narrow f32 leaves to the wire dtype INSIDE the jitted render
        program (device-side, after all compute) — see parallel.fetch_dtype.
        Identity when the wire format is float32."""
        dt = self._fetch_dtype
        if dt is None:
            return tree
        return jax.tree.map(
            lambda x: x.astype(dt) if x.dtype == jnp.float32 else x, tree
        )

    def _host_f32(self, arr: np.ndarray) -> np.ndarray:
        """Upcast a fetched map back to f32 on host (no-op on the f32 wire),
        so downstream consumers see identical dtypes either way."""
        if self._fetch_dtype is not None and arr.dtype != np.float32:
            return arr.astype(np.float32)
        return arr

    def _unpack_flat(self, out, layout, k, chunk, n):
        """Fetch + unpack a packed render output to flat per-cycle maps
        ([n(, C)] arrays + weighted-mean scalars): ONE host transfer for
        all maps, column-split per the trace-time layout (exact — the
        concat/split round-trips bit-for-bit)."""
        packed, scalars = out
        valid = np.full(k, chunk, np.float64)
        valid[-1] = n - (k - 1) * chunk
        result: Dict[int, Dict[str, np.ndarray]] = {0: {}, 1: {}}
        arr = self._host_f32(np.asarray(packed))  # [k, chunk, C_total]
        flat = arr.reshape(k * chunk, arr.shape[-1])[:n]
        col = 0
        for i, name, width, had_channels in layout:
            block = flat[:, col:col + width]
            col += width
            result[i][name] = block if had_channels else block[:, 0]
        for tag, v in scalars.items():  # per-chunk scalar -> weighted mean
            i, name = tag.split("/", 1)
            result[int(i)][name] = np.sum(np.asarray(v) * valid) / n
        return result

    # -------------------------------------------------- on-device chunking

    def _ondevice_render(self, params, origins, directions, radii, rng, sched):
        """All chunks in ONE jitted program via ``lax.map`` over the chunk
        axis: one dispatch, one fetch.  The host-streaming path pays an RPC
        round-trip per chunk, which dominates on relayed backends (measured
        ~2x on 800x800 images)."""
        n = origins.shape[0]
        chunk = min(self.chunk, n)
        k = -(-n // chunk)

        def pad_reshape(x):
            padn = k * chunk - n
            if padn:
                x = np.concatenate([x, np.repeat(x[-1:], padn, axis=0)], axis=0)
            return jnp.asarray(x.reshape(k, chunk, x.shape[-1]))

        key = (k, chunk)
        if key not in self._ondevice_cache:
            eval_fn = self._eval_fn
            cast = self._cast_for_fetch
            extract_keys = self.extract_keys
            packed_mode = PACKED_FETCH
            layout: list = []

            @jax.jit
            def render_all(params, ro, rd, rr, keys, sched):
                def body(args):
                    ro_c, rd_c, rr_c, key_c = args
                    return eval_fn(
                        params,
                        {"origins": ro_c, "directions": rd_c, "radii": rr_c},
                        key_c,
                        sched,
                    )

                out = jax.lax.map(body, (ro, rd, rr, keys))
                if not packed_mode:
                    return cast(out)
                maps, scalars, entries = _split_maps_scalars(out, extract_keys)
                layout[:] = entries
                packed = (jnp.concatenate(maps, axis=-1) if maps
                          else jnp.zeros((k, chunk, 0), jnp.float32))
                return cast(packed), scalars

            self._ondevice_cache[key] = render_all
            self._packed_layouts[key] = layout if packed_mode else None

        keys = jax.random.split(rng, k)
        out = self._ondevice_cache[key](
            params,
            pad_reshape(origins),
            pad_reshape(directions),
            pad_reshape(radii),
            keys,
            sched,
        )

        # The tail chunk is padded with duplicates of the last ray; per-chunk
        # scalars are therefore combined with valid-ray weights so the result
        # matches the reference's concat-then-mean over rays
        # (models.py:57-61, train_model.py:218) up to the pad duplicates.
        layout = self._packed_layouts[key]
        if layout is not None:
            return self._unpack_flat(out, layout, k, chunk, n)
        valid = np.full(k, chunk, np.float64)
        valid[-1] = n - (k - 1) * chunk
        result: Dict[int, Dict[str, np.ndarray]] = {0: {}, 1: {}}
        for i in (0, 1):
            for name in self.extract_keys:
                if name not in out[i] or out[i][name] is None:
                    continue
                arr = self._host_f32(np.asarray(out[i][name]))  # [k, chunk, ...]
                if arr.ndim == 1:  # per-chunk scalar -> valid-weighted mean
                    result[i][name] = np.sum(arr * valid) / n
                else:
                    result[i][name] = arr.reshape(k * chunk, *arr.shape[2:])[:n]
        return result

    # -------------------------------------------------- video fast path

    def render_video_frame(self, params, origins, directions, radii,
                           rng=None, sched: Optional[ScheduleValues] = None):
        """Render one video frame as ``(rgb_u8 [H,W,3], disp_u8 [H,W])``
        with the uint8 quantization done ON DEVICE — the host fetch shrinks
        ~4x vs pulling f32 maps (matters on slow links; video frames are
        quantized anyway).  Reproduces viz.cast_to_image /
        cast_to_disparity_image bit-for-bit (same clip/minmax/truncation).

        Single-device only; with a mesh this falls back to the f32 path +
        host casts (a real slice has fast host links).
        """
        from ddnerf_tpu.viz.visualization import (
            cast_to_disparity_image,
            cast_to_image,
        )

        h, w = origins.shape[:2]
        if self.mesh is not None:
            out = self.render_image(params, origins, directions, radii,
                                    rng=rng, sched=sched)
            return (
                cast_to_image(out[1]["rgb"]).transpose(1, 2, 0),
                cast_to_disparity_image(out[1]["disp"]).squeeze(),
            )

        if sched is None:
            sched = ScheduleValues.for_eval(self.cfg)
        if rng is None:
            rng = jax.random.PRNGKey(0)
        origins = np.asarray(origins, np.float32).reshape(-1, 3)
        directions = np.asarray(directions, np.float32).reshape(-1, 3)
        radii = np.asarray(radii, np.float32).reshape(-1, 1)
        n = origins.shape[0]
        chunk = min(self.chunk, n)
        k = -(-n // chunk)

        def pad_reshape(x):
            padn = k * chunk - n
            if padn:
                x = np.concatenate([x, np.repeat(x[-1:], padn, axis=0)], axis=0)
            return jnp.asarray(x.reshape(k, chunk, x.shape[-1]))

        key = ("video", k, chunk)
        if key not in self._ondevice_cache:
            eval_fn = self._eval_fn

            @jax.jit
            def render_frame(params, ro, rd, rr, keys, sched):
                def body(args):
                    ro_c, rd_c, rr_c, key_c = args
                    return eval_fn(
                        params,
                        {"origins": ro_c, "directions": rd_c, "radii": rr_c},
                        key_c,
                        sched,
                    )

                out = jax.lax.map(body, (ro, rd, rr, keys))
                rgb = out[1]["rgb"].reshape(-1, 3)
                disp = out[1]["disp"].reshape(-1)
                # Quantization identical to the host casts.  The padded tail
                # duplicates the last valid ray, so the disparity min/max
                # over the padded array equals the valid-region min/max.
                rgb_u8 = (jnp.clip(rgb, 0.0, 1.0) * 255).astype(jnp.uint8)
                d = jnp.nan_to_num(disp, nan=0.0, posinf=0.0, neginf=0.0)
                lo = jnp.min(d)
                span = jnp.max(d) - lo
                norm = (d - lo) / jnp.where(span > 0, span, 1.0)
                disp_u8 = (jnp.clip(norm, 0.0, 1.0) * 255).astype(jnp.uint8)
                return rgb_u8, disp_u8

            self._ondevice_cache[key] = render_frame

        keys = jax.random.split(rng, k)
        rgb_u8, disp_u8 = self._ondevice_cache[key](
            params,
            pad_reshape(origins),
            pad_reshape(directions),
            pad_reshape(radii),
            keys,
            sched,
        )
        return (
            np.asarray(rgb_u8)[:n].reshape(h, w, 3),
            np.asarray(disp_u8)[:n].reshape(h, w),
        )

    def _pose_program(self, h, w, quantize: bool):
        """Build (and cache) the jitted pose->maps program shared by
        :meth:`render_image_from_pose` / :meth:`render_video_frame_from_pose`.

        Ray generation (incl. the NDC projection), ``lax.map`` chunking and
        — for ``quantize`` — the uint8 cast all run inside ONE program, so
        the per-frame upload is the pose and the fetch is uint8.  With a
        mesh, the chunk's ray axis carries a sharding constraint over the
        data axis (render-tile parallelism): the SAME pose-only/uint8 wins
        apply pod-scale (BASELINE.json config 5), where round 2 fell back to
        host ray bundling + f32 fetches.  Returns ``(fn, k, chunk)``.
        """
        from ddnerf_tpu.core.rays import get_ray_bundle_device, ndc_mipnerf_rays

        n = h * w
        chunk = min(self.chunk, n)
        if self.mesh is not None:
            # Sharded chunks must divide evenly over the mesh width.
            width = int(self.mesh.devices.size)
            chunk = -(-chunk // width) * width
        k = -(-n // chunk)
        ndc = self.cfg.dataset.ndc_rays
        key = ("pose", h, w, k, chunk, ndc, quantize)
        if key in self._ondevice_cache:
            return self._ondevice_cache[key], k, chunk
        # Map layout of the packed fetch, recorded at trace time:
        # (cycle, name, width, had_channel_dim) per packed column block.
        # None = unpacked (PACKED_FETCH disabled for this program).
        packed_mode = PACKED_FETCH and not quantize
        layout: list = []

        eval_fn = self._eval_fn
        cast = self._cast_for_fetch
        extract_keys = self.extract_keys
        mesh = self.mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rays_sharded = NamedSharding(mesh, P(None, mesh.axis_names[0]))
            repl = NamedSharding(mesh, P())

        def program(params, pose, focal, keys, sched):
            ro, rd, radii = get_ray_bundle_device(h, w, focal, pose)
            if ndc:
                ro, rd, radii = ndc_mipnerf_rays(h, w, focal, ro, rd, xp=jnp)
                radii = radii[..., None]

            def flat_pad(x):
                x = x.reshape(n, x.shape[-1])
                padn = k * chunk - n
                if padn:
                    x = jnp.concatenate(
                        [x, jnp.broadcast_to(x[-1], (padn, x.shape[-1]))],
                        axis=0,
                    )
                x = x.reshape(k, chunk, x.shape[-1])
                if mesh is not None:
                    x = jax.lax.with_sharding_constraint(x, rays_sharded)
                return x

            def body(args):
                ro_c, rd_c, rr_c, key_c = args
                return eval_fn(
                    params,
                    {"origins": ro_c, "directions": rd_c, "radii": rr_c},
                    key_c,
                    sched,
                )

            out = jax.lax.map(
                body, (flat_pad(ro), flat_pad(rd), flat_pad(radii), keys)
            )
            if not quantize and not packed_mode:
                return cast(out)
            if not quantize:
                # Pack every fetched map into ONE wire array (exact by
                # construction: concat on device / column-split on host),
                # so the per-image fetch is a single transfer instead of
                # one round-trip per map (10 buffers for the default
                # keys), and narrow the wire dtype (parallel.fetch_dtype)
                # — with a mesh this also shrinks the replicating
                # all-gather to one gather.  Per-chunk scalars (e.g.
                # dp_loss) stay separate tiny buffers.
                maps, scalars, entries = _split_maps_scalars(out, extract_keys)
                layout[:] = entries
                packed = (jnp.concatenate(maps, axis=-1) if maps
                          else jnp.zeros((k, chunk, 0), jnp.float32))
                return cast(packed), scalars
            rgb = out[1]["rgb"].reshape(-1, 3)
            disp = out[1]["disp"].reshape(-1)
            # Quantization identical to the host casts
            # (viz.cast_to_image / cast_to_disparity_image).  The padded
            # tail duplicates the last valid ray, so the disparity min/max
            # over the padded array equals the valid-region min/max.
            rgb_u8 = (jnp.clip(rgb, 0.0, 1.0) * 255).astype(jnp.uint8)
            d = jnp.nan_to_num(disp, nan=0.0, posinf=0.0, neginf=0.0)
            lo = jnp.min(d)
            span = jnp.max(d) - lo
            norm = (d - lo) / jnp.where(span > 0, span, 1.0)
            disp_u8 = (jnp.clip(norm, 0.0, 1.0) * 255).astype(jnp.uint8)
            return rgb_u8, disp_u8

        if mesh is not None:
            # Replicated in/out: the pose upload is tiny, and uint8/packed
            # maps are all-gathered on device so every host can read them
            # locally.
            fn = jax.jit(
                program,
                in_shardings=(repl, repl, repl, repl, repl),
                out_shardings=repl,
            )
        else:
            fn = jax.jit(program)
        self._ondevice_cache[key] = fn
        self._packed_layouts[key] = layout if packed_mode else None
        return fn, k, chunk

    def render_video_frame_from_pose(self, params, pose, h, w, focal,
                                     rng=None, sched=None):
        """Like :meth:`render_video_frame` but the whole frame is produced
        from a [4,4] camera pose: ray generation (incl. NDC projection for
        forward-facing scenes) runs inside the jitted program, so the
        per-frame host->device upload is 64 bytes instead of H*W*7 floats
        (~58 MB at 1080p), and the fetch is uint8.  Works identically on a
        mesh (rows sharded over the data axis).
        """
        out = self._dispatch_video_pose(params, pose, h, w, focal, rng, sched)
        return self._fetch_video_frame(out, h, w)

    def _dispatch_video_pose(self, params, pose, h, w, focal, rng, sched):
        if sched is None:
            sched = ScheduleValues.for_eval(self.cfg)
        if rng is None:
            rng = jax.random.PRNGKey(0)
        fn, k, _chunk = self._pose_program(h, w, quantize=True)
        keys = jax.random.split(rng, k)
        return fn(
            params, jnp.asarray(pose, jnp.float32),
            jnp.asarray(focal, jnp.float32), keys, sched,
        )

    def _fetch_video_frame(self, out, h, w):
        rgb_u8, disp_u8 = out
        n = h * w
        return (
            np.asarray(rgb_u8)[:n].reshape(h, w, 3),
            np.asarray(disp_u8)[:n].reshape(h, w),
        )

    def render_video_frames_from_poses(self, params, poses, h, w, focal,
                                       sched=None):
        """Yield ``(rgb_u8, disp_u8)`` frames for each pose with one frame
        of dispatch lookahead (see :meth:`_pipelined`): frame i+1 computes
        on device while the host fetches/encodes frame i."""
        return self._pipelined(
            poses,
            lambda p: self._dispatch_video_pose(params, p, h, w, focal,
                                                None, sched),
            lambda pend: self._fetch_video_frame(pend, h, w),
        )

    # ------------------------------------------------------------ flat rays

    def render_flat(
        self,
        params,
        origins,
        directions,
        radii,
        rng=None,
        sched: Optional[ScheduleValues] = None,
    ) -> Dict[int, Dict[str, np.ndarray]]:
        """Render N rays -> per-cycle dicts of host numpy arrays."""
        if sched is None:
            sched = ScheduleValues.for_eval(self.cfg)
        if rng is None:
            rng = jax.random.PRNGKey(0)

        origins = np.asarray(origins, np.float32).reshape(-1, 3)
        directions = np.asarray(directions, np.float32).reshape(-1, 3)
        radii = np.asarray(radii, np.float32).reshape(-1, 1)
        n = origins.shape[0]
        if self.mesh is None:
            return self._ondevice_render(params, origins, directions, radii,
                                         rng, sched)
        chunk = min(self.chunk, n) if n else self.chunk
        # Sharded chunks must divide evenly over the mesh; round up and let
        # the per-chunk padding absorb the remainder.
        width = int(self.mesh.devices.size)
        chunk = -(-chunk // width) * width

        outs: Dict[int, Dict[str, list]] = {0: {}, 1: {}}
        for start in range(0, n, chunk):
            end = min(start + chunk, n)
            pad = chunk - (end - start)
            sl = slice(start, end)

            def prep(x):
                x = x[sl]
                if pad:
                    x = np.concatenate([x, np.repeat(x[-1:], pad, axis=0)], axis=0)
                return jnp.asarray(x)

            batch = self._shard(
                {
                    "origins": prep(origins),
                    "directions": prep(directions),
                    "radii": prep(radii),
                }
            )
            rng, sub = jax.random.split(rng)
            out = self._step(params, batch, sub, sched)
            # Keep device arrays here: all chunks are DISPATCHED before any
            # result is fetched, so device compute overlaps host transfers
            # (a serial fetch-per-chunk halves large-image throughput).
            for i in (0, 1):
                for key in self.extract_keys:
                    if key not in out[i] or out[i][key] is None:
                        continue
                    outs[i].setdefault(key, []).append((out[i][key], end - start))

        def fetch(chunks):
            arrs = []
            for dev, valid in chunks:
                arr = np.asarray(dev)
                if arr.ndim and arr.shape[0] != valid:
                    arr = arr[:valid]
                arrs.append(arr)
            # Scalars (e.g. dp_loss): valid-ray-weighted mean over chunks —
            # the reference's concat-then-mean over rays (models.py:57-61,
            # train_model.py:218); equal chunk weight would bias toward the
            # padded tail chunk.
            if arrs[0].ndim == 0:
                valids = np.array([v for _, v in chunks], np.float64)
                return np.sum(np.array(arrs) * valids) / np.sum(valids)
            return np.concatenate(arrs, axis=0)

        return {i: {k: fetch(v) for k, v in outs[i].items()} for i in outs}

    # -------------------------------------------- image from camera pose

    def render_image_from_pose(self, params, pose, h, w, focal,
                               rng=None, sched=None):
        """Render an [H, W] image straight from a [4,4] (or [3,4]) camera
        pose: ray generation — including the NDC projection for forward-
        facing scenes — runs inside the jitted program, so the per-image
        upload is the pose instead of H*W*7 floats.  Returns the same
        per-cycle map dicts as :meth:`render_image`.

        Works identically on a mesh (rows sharded over the data axis).
        """
        out, k, chunk = self._dispatch_pose(params, pose, h, w, focal,
                                            rng, sched)
        return self._fetch_pose_maps(out, k, chunk, h, w)

    def _dispatch_pose(self, params, pose, h, w, focal, rng, sched):
        """Enqueue the pose program (JAX async dispatch) WITHOUT fetching —
        returns (device outputs, k, chunk).  Pairing dispatch and fetch
        across images lets image i+1's device compute overlap image i's
        host transfer (:meth:`render_images_from_poses`)."""
        if sched is None:
            sched = ScheduleValues.for_eval(self.cfg)
        if rng is None:
            rng = jax.random.PRNGKey(0)
        fn, k, chunk = self._pose_program(h, w, quantize=False)
        keys = jax.random.split(rng, k)
        out = fn(
            params, jnp.asarray(pose, jnp.float32),
            jnp.asarray(focal, jnp.float32), keys, sched,
        )
        return out, k, chunk

    def _fetch_pose_maps(self, out, k, chunk, h, w):
        """Fetch + unpack the pose program's (packed maps, scalars) output:
        ONE host transfer for all maps, column-split per the trace-time
        layout (exact — concat/split round-trips bit-for-bit)."""
        layout = self._packed_layouts[
            ("pose", h, w, k, chunk, self.cfg.dataset.ndc_rays, False)
        ]
        n = h * w
        if layout is None:  # unpacked program (PACKED_FETCH off at trace)
            valid = np.full(k, chunk, np.float64)
            valid[-1] = n - (k - 1) * chunk
            result: Dict[int, Dict[str, np.ndarray]] = {0: {}, 1: {}}
            for i in (0, 1):
                for name in self.extract_keys:
                    if name not in out[i] or out[i][name] is None:
                        continue
                    a = self._host_f32(np.asarray(out[i][name]))
                    if a.ndim == 1:
                        result[i][name] = np.sum(a * valid) / n
                    else:
                        fl = a.reshape(k * chunk, *a.shape[2:])[:n]
                        result[i][name] = (fl.reshape(h, w, -1) if fl.ndim == 2
                                           else fl.reshape(h, w))
            return result
        result = self._unpack_flat(out, layout, k, chunk, n)
        for i in (0, 1):  # flat [n(, C)] -> image layout
            for name, v in result[i].items():
                if np.ndim(v) == 2:
                    result[i][name] = v.reshape(h, w, -1)
                elif np.ndim(v) == 1:
                    result[i][name] = v.reshape(h, w)
        return result

    @staticmethod
    def _pipelined(poses, dispatch, fetch):
        """One-step-lookahead driver shared by the pipelined pose renderers:
        dispatch pose i+1's program before fetching pose i's outputs, so
        device compute overlaps the host transfer (which otherwise strictly
        serializes with it for the same image)."""
        pending = None
        for pose in poses:
            nxt = dispatch(pose)
            if pending is not None:
                yield fetch(pending)
            pending = nxt
        if pending is not None:
            yield fetch(pending)

    def render_images_from_poses(self, params, poses, h, w, focal,
                                 sched=None):
        """Yield per-cycle map dicts for each pose with ONE image of
        dispatch lookahead (see :meth:`_pipelined` — the f32 map fetch is
        comparable to device time on slow links; PERF.md round-4 render
        digest).  Per-image results are identical to calling
        :meth:`render_image_from_pose` per pose (same per-image rng)."""
        return self._pipelined(
            poses,
            lambda p: self._dispatch_pose(params, p, h, w, focal, None,
                                          sched),
            lambda pend: self._fetch_pose_maps(pend[0], pend[1], pend[2],
                                               h, w),
        )

    # ------------------------------------------------------------- image

    def render_image(
        self, params, origins, directions, radii, rng=None, sched=None
    ) -> Dict[int, Dict[str, np.ndarray]]:
        """Render an [H, W] bundle, reshaping maps back to image layout
        (the reference's restore_shapes reshape, models.py:63-72)."""
        h, w = origins.shape[:2]
        flat = self.render_flat(params, origins, directions, radii, rng, sched)
        for i in flat:
            for key, arr in flat[i].items():
                if np.ndim(arr) == 2:  # rgb / per-sample arrays
                    flat[i][key] = arr.reshape(h, w, -1)
                elif np.ndim(arr) == 1:
                    flat[i][key] = arr.reshape(h, w)
        return flat


def render_video_frames(
    cfg: Config,
    pipeline: NerfPipeline,
    params,
    val_dataset,
    mesh=None,
    progress=True,
):
    """Iterate the dataset's render-pose path, yielding per-frame f32 map
    dicts (mirrors render_video.py:73-104's pose loop).  Library helper for
    custom pipelines; the video CLI uses the faster uint8 pose path
    (``render_video_frame_from_pose``)."""
    renderer = ImageRenderer(cfg, pipeline, mesh, mode="render")
    sched = ScheduleValues.for_eval(cfg)
    for idx in range(len(val_dataset.render_poses)):
        pose = val_dataset.render_poses[idx]
        out = renderer.render_image_from_pose(
            params, pose, val_dataset.H, val_dataset.W, val_dataset.focal,
            sched=sched,
        )
        yield idx, out
