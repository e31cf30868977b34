#!/usr/bin/env bash
# Canonical Pascal VOC experiment configs — TPU port of the reference's
# test_scripts/pa_experiments_10t-11t.sh (same hyperparameters, our flag surface).
# DASS_DATASET_ROOT / DASS_RUNS select the data and output roots;
# JAX_COMPILATION_CACHE_DIR amortizes TPU remote compiles across rounds.
set -euo pipefail
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}"

python active_train.py --backbone mobilenet --lr 0.007 --epochs 150 \
  --batch-size 5 --eval-interval 5 --dataset active_pascal_image --base-size \
  512 --crop-size -1 --use-lr-scheduler --lr-scheduler step --max-iterations 8 \
  --active-batch-size 60 --use-balanced-weights --workers 5 --memory-hog \
  --no-early-stop --active-selection-mode ceal_confidence --checkname \
  evalpa_10-ceal_confidence_ep150-abs_60-deeplab-mobilenet-bs_5-512x512-lr_0.007 \
  --min-improvement 0.0025

python active_train.py --backbone mobilenet --lr 0.007 --epochs 150 \
  --batch-size 5 --eval-interval 5 --dataset active_pascal_image --base-size \
  512 --crop-size -1 --use-lr-scheduler --lr-scheduler step --max-iterations 8 \
  --active-batch-size 60 --use-balanced-weights --workers 5 --memory-hog \
  --no-early-stop --active-selection-mode ceal_margin --checkname \
  evalpa_11-ceal_margin_ep150-abs_60-deeplab-mobilenet-bs_5-512x512-lr_0.007 \
  --min-improvement 0.0025
