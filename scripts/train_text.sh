#!/bin/bash
# TPU launcher for a text-tower run (reference slurm_files/text_models/*.sh).
set -euo pipefail
MODEL=${1:?usage: train_text.sh <text_model> <dataset_root> [extra flags...]}
DATASET=${2:?usage: train_text.sh <text_model> <dataset_root> [extra flags...]}
shift 2 || true
exec python -m garbage_classification_rca_tpu.cli.main_text \
 --text_model="$MODEL" \
 --dataset_folder_name="$DATASET" \
 --epochs=30 --ft_epochs=40 --opt=adamw --balance_weights \
 "$@"
