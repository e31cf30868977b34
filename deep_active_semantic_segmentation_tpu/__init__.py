"""TPU-native active-learning semantic segmentation framework.

A brand-new JAX/XLA/Pallas/pjit implementation of the capabilities of
``nihalsid/deep-active-semantic-segmentation`` (see /root/repo/SURVEY.md):
pool-based active learning for semantic segmentation with a model zoo
(DeepLab-v3+, ENet, FastSCNN, UNet, two-headed accuracy predictor), an
LMDB-compatible data pipeline with image- and region-level labeling, and the
full family of acquisition scorers.

Layout (mirrors SURVEY.md section 7's build plan):
  ops/        jitted numerical kernels (losses, metrics, entropy scoring,
              region NMS, k-center/max-subset greedy, align-corners resize)
  models/     flax model zoo (NHWC, cross-replica batch-norm)
  parallel/   mesh construction, sharding, train/eval step factories
  data/       stores, numpy transforms (reference-numerics), AL pools
  selection/  acquisition engine (batched on-device pool sweeps)
  engine/     the single Trainer + active-learning loop shared by drivers
  utils/      savers, summaries, early stop, class weights, comparisons
"""

__version__ = "0.1.0"
