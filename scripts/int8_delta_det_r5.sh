#!/bin/bash
# Round-5 rerun of the DETECTOR legs of scripts/int8_delta.sh (VERDICT r4
# #3): same controlled bf16-vs-int8 eval on the synth 100-image valid
# split, AFTER the eval-loop fix that excludes the first-call XLA compile
# from the timed bracket. Round 4's det numbers (193.90 / 367.96 ms/img)
# were compile-amortization artifacts: ~7 batches of a 100-image set
# absorbing a 20-60s compile — int8 looked "1.9x slower" only because
# its QDQ-bearing program compiles longer. This run publishes the
# steady-state numbers those should have been.
# Single-tenant TPU: run alone. Results -> runs/int8_delta_r5/*.txt.
set -u
cd /root/repo
OUT=runs/int8_delta_r5
mkdir -p "$OUT"
DET_W=${DET_W:-runs/soak/v4tiny_mosaic_ms/best.npz}
CFG=/root/reference/code/victim_localization/yolov3/cfg/yolov4-tiny-aider-416.cfg
DET=data/synth/det/data/synth.data

run () {  # name, timeout, cmd...
  local name=$1 tmo=$2; shift 2
  echo "=== $name $(date -u +%H:%M:%S) ==="
  timeout "$tmo" "$@" > "$OUT/$name.txt" 2>&1
  echo "$name rc=$? $(grep -E 'images|timing' "$OUT/$name.txt" | tail -2)"
}

# batch 16 legs: the round-4 configuration, for apples-to-apples ms/img
run det_eval_bf16_b16 3600 python -m rtdm_tpu.cli.yolo_test \
  --cfg "$CFG" --data "$DET" --weights "$DET_W" --img-size 416 \
  --batch-size 16 --quant bf16
run det_eval_int8_b16 3600 python -m rtdm_tpu.cli.yolo_test \
  --cfg "$CFG" --data "$DET" --weights "$DET_W" --img-size 416 \
  --batch-size 16 --quant int8
# batch 32 legs: the new default eval batch
run det_eval_bf16_b32 3600 python -m rtdm_tpu.cli.yolo_test \
  --cfg "$CFG" --data "$DET" --weights "$DET_W" --img-size 416 \
  --batch-size 32 --quant bf16
run det_eval_int8_b32 3600 python -m rtdm_tpu.cli.yolo_test \
  --cfg "$CFG" --data "$DET" --weights "$DET_W" --img-size 416 \
  --batch-size 32 --quant int8
echo "=== int8_delta_det_r5 done $(date -u +%H:%M:%S) ==="
