#!/usr/bin/env bash
# Canonical Pascal VOC experiment configs — TPU port of the reference's
# test_scripts/pa_experiments_12t-13t.sh (same hyperparameters, our flag surface).
# DASS_DATASET_ROOT / DASS_RUNS select the data and output roots;
# JAX_COMPILATION_CACHE_DIR amortizes TPU remote compiles across rounds.
set -euo pipefail
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}"

python active_train.py --backbone mobilenet --lr 0.007 --epochs 150 \
  --batch-size 5 --eval-interval 5 --dataset active_pascal_image --base-size \
  512 --crop-size -1 --use-lr-scheduler --lr-scheduler step --max-iterations 8 \
  --active-batch-size 60 --use-balanced-weights --workers 5 --memory-hog \
  --no-early-stop --active-selection-mode ceal_entropy --checkname \
  evalpa_12-ceal_entropy_ep150-abs_60-deeplab-mobilenet-bs_5-512x512-lr_0.007 \
  --min-improvement 0.0025

python active_train.py --backbone mobilenet --lr 0.007 --epochs 150 \
  --batch-size 5 --eval-interval 5 --dataset active_pascal_image --base-size \
  512 --crop-size -1 --use-lr-scheduler --lr-scheduler step --max-iterations 8 \
  --active-batch-size 60 --use-balanced-weights --workers 5 --memory-hog \
  --no-early-stop --active-selection-mode ceal_fusion --checkname \
  evalpa_13-ceal_fusion_ep150-abs_60-deeplab-mobilenet-bs_5-512x512-lr_0.007 \
  --min-improvement 0.0025
