#!/bin/bash
# Training-at-scale soak on the real TPU (VERDICT round-2 #1).
# Four sequential legs over the synthetic datasets (data/synth):
#   1. v4-tiny, 800 images, mosaic + multi-scale + EMA
#   2. yolov5s, mosaic + mixup + EMA
#   3. v4-tiny --rect (AR-bucketed compiled shapes)
#   4. squeeze-ernet classifier, 5x160 images
# Each leg logs to runs/soak/<leg>/ and appends a one-line summary to
# runs/soak/summary.txt. Single-tenant TPU: legs run strictly serially.
# Epochs are env-overridable so a leg can be sized to the session budget
# (E1..E4); a full-scale soak uses the defaults. After legs finish, run
# `python scripts/soak_report.py` to freeze evidence into artifacts/soak.
# NOTE: a timeout that fires mid-compile leaves the remote compile running
# server-side and the single-tenant tunnel busy until it finishes
# (CLAUDE.md) — prefer sizing epochs over relying on the timeout.
set -u
E1=${E1:-100} E2=${E2:-80} E3=${E3:-40} E4=${E4:-60}
# Timeouts scale with the epoch counts (45 s/epoch margin + 2400 s for
# compiles/evals) and stay env-overridable (T1..T4) so a full-default run
# can't hit a fixed timeout mid-compile (which would wedge the
# single-tenant tunnel server-side — see header note).
T1=${T1:-$((E1 * 45 + 2400))} T2=${T2:-$((E2 * 45 + 2400))}
T3=${T3:-$((E3 * 45 + 2400))} T4=${T4:-$((E4 * 20 + 1800))}
cd /root/repo
mkdir -p runs/soak
SUM=runs/soak/summary.txt
DET=data/synth/det/data/synth.data
CLS=data/synth/cls
V5YML=/root/reference/code/victim_localization/yolov5/models/yolov5s.yaml
CFG=/root/reference/code/victim_localization/yolov3/cfg/yolov4-tiny-aider-416.cfg

leg () {  # name, timeout_s, cmd...
  local name=$1 tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee -a "$SUM"
  local t0=$SECONDS
  timeout "$tmo" "$@" > "runs/soak/$name.log" 2>&1
  local rc=$?
  echo "$name rc=$rc wall=$((SECONDS-t0))s" | tee -a "$SUM"
  tail -3 "runs/soak/$name.log" | tee -a "$SUM"
}

# yolov5s needs a 2-class hyp with mosaic+mixup on
cat > runs/soak/hyp-v5-soak.yaml <<EOF
mosaic: 1.0
mixup: 0.2
hsv_h: 0.015
hsv_s: 0.7
hsv_v: 0.4
translate: 0.1
scale: 0.5
fliplr: 0.5
EOF

leg v4tiny_mosaic_ms "$T1" python -m rtdm_tpu.cli.yolo_train \
  --cfg "$CFG" --data "$DET" --epochs "$E1" --batch-size 16 \
  --img-size 416 --multi-scale --cache-images --ema --optimizer adam --lr0 0.002 \
  --nominal-batch 64 --eval-every 5 --ckpt-every 10 --num-workers 2 \
  --output runs/soak/v4tiny_mosaic_ms

leg v5s_mosaic_mixup "$T2" python -m rtdm_tpu.cli.yolo_train \
  --cfg "$V5YML" --data data/synth/det/data/synth.yaml --epochs "$E2" \
  --batch-size 16 --cache-images --img-size 416 --ema --optimizer adam --lr0 0.002 \
  --hyp runs/soak/hyp-v5-soak.yaml --nominal-batch 64 --eval-every 5 \
  --ckpt-every 10 --num-workers 2 --noautoanchor \
  --output runs/soak/v5s_mosaic_mixup

leg v4tiny_rect "$T3" python -m rtdm_tpu.cli.yolo_train \
  --cfg "$CFG" --data "$DET" --epochs "$E3" --batch-size 16 \
  --img-size 416 --rect --cache-images --ema --optimizer adam --lr0 0.002 \
  --nominal-batch 64 --eval-every 5 --ckpt-every 10 --num-workers 2 \
  --output runs/soak/v4tiny_rect

leg aider_cls "$T4" python -m rtdm_tpu.cli.aider_train \
  --model squeeze-ernet --root-dir "$CLS" \
  --train-split "$CLS/synth_train.csv" --val-split "$CLS/synth_val.csv" \
  --test-split "$CLS/synth_test.csv" --epochs "$E4" --batch-size 32 \
  --precision bf16 --num-workers 2 --checkpoint-dir runs/soak/aider_cls \
  --log-dir runs/soak/aider_cls/logs

echo "=== soak done $(date -u +%H:%M:%S) ===" | tee -a "$SUM"
