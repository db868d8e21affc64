#!/usr/bin/env bash
# Production-scale dress rehearsal (round-4 verdict #6): a standing gate
# that drives the REAL user workflow end to end — on-disk blender-format
# dataset -> train CLI -> eval CLI (incl. LPIPS when converted weights are
# present) -> video CLI — with PSNR and rays/s thresholds, so the day a
# real NeRF-synthetic scene (lego/fern) lands, the BASELINE matrix is pure
# execution: point dataset.basedir at it and raise the thresholds.
#
# Default shape is driver-tractable on one chip (400x400, 12 views, 3k
# iters, ~3-6 min incl. compiles); --full runs the 800x800 production
# shape (~30+ min).  On CPU (JAX_PLATFORMS=cpu) the thresholds drop to
# smoke levels automatically (compile-correctness, not perf).
#
# --llff runs the forward-facing family instead: LLFF on-disk layout
# (images/ + poses_bounds.npy) through configs/ff_dd.yml — poses_bounds
# parsing, minify cache, bd_factor rescale, recentering, NDC rays, and
# the spiral video path.
#
# Usage:  scripts/dress_rehearsal.sh [--full] [--llff] [--keep]
set -euo pipefail
cd "$(dirname "$0")/.."

# Default gates calibrated on chip (round 5): eval PSNR_fine measured
# 20.67 at 400^2/12 views/3k iters -> gate 19.0 (blender family); 30.12
# forward-facing (NDC, factor-4 minify) -> gate 27.0 (llff family).  The
# rays/s gate is a SANITY bound, not the perf headline (bench.py is):
# the relayed chip's per-dispatch latency varies ~10x between sessions
# (PERF.md round 5), so even with the 20-step scan-block driver a
# degraded session measures ~60k rays/s against ~300-450k on a good
# link.
FULL=0; LLFF=0; KEEP=0
for flag in "$@"; do
  case "$flag" in
    --full) FULL=1 ;;
    --llff) LLFF=1 ;;
    --keep) KEEP=1 ;;
    *) echo "unknown flag $flag (expected --full/--llff/--keep)" >&2
       exit 2 ;;
  esac
done

SIZE=400; VIEWS=12; ITERS=3000; MIN_RAYS_S=25000
if [[ $FULL == 1 ]]; then SIZE=800; VIEWS=24; ITERS=20000; fi
if [[ $LLFF == 1 ]]; then
  FORMAT=llff
  CONFIG=configs/ff_dd.yml
  MIN_PSNR=27.0  # calibrated 30.12 @400^2 default; same gate at --full
  # fern keypoints don't exist in the synthetic scene
  EXTRA_ARGS=(train_params.depth_analysis_rays False)
else
  FORMAT=blender
  CONFIG=configs/blender_dd.yml
  MIN_PSNR=19.0  # calibrated 20.67 @3k iters
  [[ $FULL == 1 ]] && MIN_PSNR=28.0  # calibrated 34.27 @800^2/20k
  EXTRA_ARGS=(dataset.synthetic False)
fi
MODEL_ARGS=()
if [[ "${JAX_PLATFORMS:-}" == "cpu" ]]; then
  # CPU smoke: same flow, tractable sizes + a small model (the flagship
  # 256-wide/65-sample model is minutes-per-program on CPU), no perf gate.
  SIZE=64; VIEWS=6; ITERS=60; MIN_PSNR=8.0; MIN_RAYS_S=0
  MODEL_ARGS=(nerf.coarse_hidden_size 32 nerf.fine_hidden_size 32
              nerf.train.num_coarse 8 nerf.train.num_fine 8
              nerf.train.num_random_rays 256
              nerf.validation.num_coarse 8 nerf.validation.num_fine 8
              nerf.validation.chunksize 4096)
fi

WORK=${DRESS_WORKDIR:-/tmp/ddnerf_dress}
DS="$WORK/dataset_${FORMAT}_$SIZE"
LOGROOT="$WORK/logs"
RUN_ID="dress_${FORMAT}_$SIZE"
LOGDIR="$LOGROOT/$RUN_ID"
[[ $KEEP == 1 ]] || rm -rf "$LOGDIR"

echo "== dataset ($FORMAT, $SIZE x $SIZE, $VIEWS views) =="
if [[ ! -f "$DS/transforms_train.json" && ! -f "$DS/poses_bounds.npy" ]]; then
  python scripts/make_synthetic_dataset.py "$DS" --format "$FORMAT" \
      --size "$SIZE" --train "$VIEWS" --val 2 --test 2
fi

echo "== train ($ITERS iters) =="
python -m ddnerf_tpu.cli.train --config "$CONFIG" \
    dataset.basedir "$DS" "${EXTRA_ARGS[@]}" \
    experiment.id "$RUN_ID" experiment.logdir "$LOGROOT" \
    experiment.train_iters "$ITERS" \
    experiment.validate_every $((ITERS / 3)) \
    experiment.save_every $((ITERS / 2)) \
    experiment.print_every $((ITERS / 10)) \
    experiment.train_scalars_every 20 \
    train_params.max_pdf_pad_iters $((ITERS / 4)) \
    train_params.finnish_smooth $((ITERS / 4)) \
    "${MODEL_ARGS[@]}"

echo "== eval =="
# AlexNet-LPIPS weights converted via scripts/convert_lpips_weights.py
# (its documented output name is lpips_alex.npz).
LPIPS_ARGS=()
if [[ -f "$WORK/lpips_alex.npz" ]]; then
  LPIPS_ARGS=(--lpips-weights "$WORK/lpips_alex.npz")
fi
python -m ddnerf_tpu.cli.eval --logdir "$LOGDIR" --max-images 2 \
    "${LPIPS_ARGS[@]}"

echo "== video (3 frames) =="
python -m ddnerf_tpu.cli.render_video --logdir "$LOGDIR" --max-frames 3

echo "== thresholds (PSNR >= $MIN_PSNR, train rays/s >= $MIN_RAYS_S) =="
python - "$LOGDIR" "$MIN_PSNR" "$MIN_RAYS_S" <<'PY'
import json, re, sys

logdir, min_psnr, min_rays = sys.argv[1], float(sys.argv[2]), float(sys.argv[3])
text = open(f"{logdir}/validation/results.txt").read()
m = re.search(r"psnr_fine: \t (\S+)", text)
assert m, "psnr_fine missing from results.txt"
psnr = float(m.group(1))
rates = []
with open(f"{logdir}/metrics.jsonl") as f:
    for line in f:
        rec = json.loads(line)
        if rec.get("kind") == "train" and "rays_per_sec" in rec:
            rates.append(rec["rays_per_sec"])
rate = max(rates) if rates else 0.0
print(f"eval psnr_fine={psnr:.2f} (gate {min_psnr}), "
      f"train rays/s peak={rate:,.0f} (gate {min_rays:,.0f})")
assert psnr >= min_psnr, f"PSNR {psnr:.2f} below gate {min_psnr}"
assert rate >= min_rays, f"rays/s {rate:,.0f} below gate {min_rays:,.0f}"
print("DRESS REHEARSAL PASSED")
PY
