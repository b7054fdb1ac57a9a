#!/bin/bash
# BLIP-2 LoRA fine-tune (reference slurm_files/blip2/fir_blip_2_train.sh).
set -euo pipefail
DATASET=${1:?usage: train_blip2.sh <dataset_root> [extra flags...]}
shift || true
exec python -m garbage_classification_rca_tpu.cli.blip2_train \
 --dataset_folder_name="$DATASET" --epochs=10 --batch_size=2 "$@"
