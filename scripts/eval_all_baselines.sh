#!/bin/bash
# Run the 5 BASELINE.json eval configs end-to-end (test harness parity,
# calculate_test_accuracy_* equivalents). Checkpoints: reference .pth or
# our orbax dirs.
set -euo pipefail
DATASET=${1:?usage: eval_all_baselines.sh <test_set_root> <ckpt_dir>}
CKPT=${2:?}
PY="python -m garbage_classification_rca_tpu.cli"
$PY.test_image --image_model=shuffle_net --model_path="$CKPT/shufflenet.pth" --dataset_folder_name="$DATASET"
$PY.test_text --text_model=distilbert --model_path="$CKPT/distilbert_cls.pth" --dataset_folder_name="$DATASET"
$PY.test_image --image_model=transformer_B16 --model_path="$CKPT/vit_b16.pth" --dataset_folder_name="$DATASET"
$PY.test_both --late_fusion=MM_RCA --reverse --text_model=distilbert --model_path="$CKPT/mm_rca.pth" --dataset_folder_name="$DATASET"
[ -f "$CKPT/blip2.pth" ] && $PY.blip2_test --model_path="$CKPT/blip2.pth" --dataset_folder_name="$DATASET" || true
