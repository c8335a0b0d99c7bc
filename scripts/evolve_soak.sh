#!/bin/bash
# Hyperparameter evolution at soak scale (VERDICT r3 stretch #8):
# --evolve generations of v4-tiny on the synth mini split, on the TPU.
# Artifacts: <out>/evolve.txt, hyp_evolved.yaml, evolution scatter plots.
# Matches yolov3/train.py:444-491 (method-3 mutation kernel + weighted
# top-n parents — train/evolve.py). Single-tenant: run alone, after soak.
set -u
cd /root/repo
GENS=${GENS:-10} EPOCHS=${EPOCHS:-8}
OUT=${OUT:-runs/evolve_v4tiny}
CFG=/root/reference/code/victim_localization/yolov3/cfg/yolov4-tiny-aider-416.cfg
DET=data/synth/det/data/synth.data
# WEIGHTS: optional warm-start checkpoint shared by EVERY trial (still
# identical init per generation, as the reference's fixed random init —
# but with enough mAP signal that env-sized generations can
# discriminate hyps; from scratch, 8 epochs x 100 imgs is all-zero
# fitness and evolution walks noise)
W=${WEIGHTS:+--weights}
timeout "${TMO:-10800}" python -m rtdm_tpu.cli.yolo_train \
  ${W:+$W "$WEIGHTS"} \
  --cfg "$CFG" --data "$DET" --epochs "$EPOCHS" --batch-size 16 \
  --img-size 320 --cache-images --ema --optimizer adam --lr0 0.002 \
  --nominal-batch 64 --eval-every 0 --num-workers 2 --evolve "$GENS" \
  --train-list-override /root/repo/data/synth/det/data/valid.txt \
  --output "$OUT" > "$OUT.log" 2>&1
echo "evolve rc=$? $(tail -2 "$OUT.log" | head -1)"
