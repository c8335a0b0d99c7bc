#!/bin/bash
# Controlled int8 accuracy-delta at dataset scale (VERDICT r3 next #5).
#
# Takes the soak-trained synth weights (classifier + v4-tiny), builds bf16
# AND int8 engines from the SAME weights, and evaluates both on the synth
# test/valid splits — the delta table mirrors the reference's fp32 -> TRT
# precision-mode rows (disaster_detection/model/Readme.md:16-20). Runs on
# the TPU; single-tenant: run alone, after the soak.
#
# Results land in runs/int8_delta/*.txt; commit via scripts/soak_report.py
# conventions (copy into artifacts + table into docs/DESIGN.md).
set -u
cd /root/repo
OUT=runs/int8_delta
mkdir -p "$OUT"
CLS_W=${CLS_W:-runs/soak/aider_cls/squeeze-ernet.npz}
CLS=${CLS:-data/synth/cls}
DET_W=${DET_W:-runs/soak/v4tiny_mosaic_ms/best.npz}
CFG=/root/reference/code/victim_localization/yolov3/cfg/yolov4-tiny-aider-416.cfg
DET=data/synth/det/data/synth.data

run () {  # name, timeout, cmd...
  local name=$1 tmo=$2; shift 2
  echo "=== $name $(date -u +%H:%M:%S) ==="
  timeout "$tmo" "$@" > "$OUT/$name.txt" 2>&1
  echo "$name rc=$? $(tail -1 "$OUT/$name.txt")"
}

# classifier: bf16 vs calibrated int8 engine from the synth-trained weights
run cls_build_bf16 1800 python -m rtdm_tpu.cli.build_engine \
  --model squeeze-ernet --weights "$CLS_W" --quant bf16 --batch-size 256 \
  --output "$OUT/cls_bf16_engine"
# flat calibration dir (load_calib_images globs non-recursively): 40
# train images per class, symlinked
CAL="$OUT/calib_cls"
mkdir -p "$CAL"
for d in "$CLS"/*/; do
  n=0
  for f in "$d"*.jpg; do
    ln -sf "$(readlink -f "$f")" "$CAL/$(basename "$d")_$(basename "$f")"
    n=$((n + 1)); [ "$n" -ge 40 ] && break
  done
done
run cls_build_int8 1800 python -m rtdm_tpu.cli.build_engine \
  --model squeeze-ernet --weights "$CLS_W" --quant int8 --batch-size 256 \
  --calib-dir "$CAL" --output "$OUT/cls_int8_engine"
run cls_eval_bf16 1800 python -m rtdm_tpu.cli.evaluate_classification \
  --engine "$OUT/cls_bf16_engine" --root-dir "$CLS" \
  --test-split "$CLS/synth_test.csv" --batch-size 256
run cls_eval_int8 1800 python -m rtdm_tpu.cli.evaluate_classification \
  --engine "$OUT/cls_int8_engine" --root-dir "$CLS" \
  --test-split "$CLS/synth_test.csv" --batch-size 256

# detector: same weights, bf16 vs honestly-calibrated int8 QDQ
run det_eval_bf16 3600 python -m rtdm_tpu.cli.yolo_test \
  --cfg "$CFG" --data "$DET" --weights "$DET_W" --img-size 416 \
  --batch-size 16 --quant bf16
run det_eval_int8 3600 python -m rtdm_tpu.cli.yolo_test \
  --cfg "$CFG" --data "$DET" --weights "$DET_W" --img-size 416 \
  --batch-size 16 --quant int8

echo "=== int8_delta done $(date -u +%H:%M:%S) ==="
