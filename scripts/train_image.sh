#!/bin/bash
# TPU launcher for an image-backbone run (reference slurm_files/
# image_models/*.sh shape; e.g. transformer_B16).
set -euo pipefail
MODEL=${1:?usage: train_image.sh <image_model> <dataset_root> [extra flags...]}
DATASET=${2:?usage: train_image.sh <image_model> <dataset_root> [extra flags...]}
shift 2 || true
exec python -m garbage_classification_rca_tpu.cli.main_image \
 --image_model="$MODEL" \
 --dataset_folder_name="$DATASET" \
 --ft_epochs=40 \
 --opt=adamw \
 --epochs=70 \
 --balance_weights \
 --reg=0.1 \
 --prob_aug=0.8 \
 "$@"
