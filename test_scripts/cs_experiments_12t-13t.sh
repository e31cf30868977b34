#!/usr/bin/env bash
# Canonical Cityscapes experiment configs — TPU port of the reference's
# test_scripts/cs_experiments_12t-13t.sh (same hyperparameters, our flag surface).
# DASS_DATASET_ROOT / DASS_RUNS select the data and output roots;
# JAX_COMPILATION_CACHE_DIR amortizes TPU remote compiles across rounds.
set -euo pipefail
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}"

python active_train.py --backbone mobilenet --lr 0.01 --epochs 200 \
  --batch-size 5 --eval-interval 5 --dataset active_cityscapes_image \
  --base-size 513 --crop-size 513 --use-lr-scheduler --max-iterations 8 \
  --active-batch-size 125 --use-balanced-weights --workers 5 --memory-hog \
  --active-selection-mode ceal_entropy --checkname \
  alefw_12-ceal_entropy-scratch_ep200-abs_125-deeplab-mobilenet-bs_5-513x513-lr_0.01 \
  --min-improvement 0.0025

python active_train.py --backbone mobilenet --lr 0.01 --epochs 200 \
  --batch-size 5 --eval-interval 5 --dataset active_cityscapes_image \
  --base-size 513 --crop-size 513 --use-lr-scheduler --max-iterations 8 \
  --active-batch-size 125 --use-balanced-weights --workers 5 --memory-hog \
  --active-selection-mode ceal_fusion --checkname \
  alefw_13-ceal_fusion-scratch_ep200-abs_125-deeplab-mobilenet-bs_5-513x513-lr_0.01 \
  --min-improvement 0.0025
