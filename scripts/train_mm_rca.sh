#!/bin/bash
# TPU launcher for the headline MM-RCA run — flag-for-flag the reference
# slurm_files/multimodal/MM_RCA.sh:15-29 (apptainer/SLURM replaced by a
# plain process: one JAX process drives the whole v5e slice; scale-out is
# --mesh_shape, not a scheduler).
set -euo pipefail
DATASET=${1:?usage: train_mm_rca.sh <dataset_root> [extra flags...]}
shift || true
exec python -m garbage_classification_rca_tpu.cli.main_both \
 --dataset_folder_name="$DATASET" \
 --late_fusion=MM_RCA \
 --ft_epochs=40 \
 --epochs=30 \
 --prob_aug=1.00 \
 --acc_steps=10 \
 --acc_steps_FT=10 \
 --opt=sgd \
 --text_model=distilbert \
 --fraction_lr=3 \
 --image_text_dropout=0.0 \
 --balance_weights \
 --reg=0.03 \
 --lr=0.0016 \
 --reverse \
 "$@"
