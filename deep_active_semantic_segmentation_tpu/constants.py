"""Global constants.

Reference: /root/reference/constants.py:1-6. The reference hardcodes absolute
dataset/run paths; here they are environment-overridable with sane defaults
rooted in the current working tree.
"""

import os

DATASET_ROOT = os.environ.get("DASS_DATASET_ROOT", os.path.join(os.getcwd(), "datasets"))
RUNS = os.environ.get("DASS_RUNS", os.path.join(os.getcwd(), "runs"))
VISUALIZATIONS_FOLDER = os.environ.get("DASS_VISUALIZATIONS", "visualizations")

# Tensorboard image-grid logging cadence, keyed by percent of data labeled
# (reference constants.py:4).
TENSORBOARD_VISUALIZATION_INTERVAL = 10

# Monte-Carlo dropout hyperparameters (reference constants.py:5-6).
MC_DROPOUT_RATE = 0.25
MC_STEPS = 20

# Label value used for void / unlabeled pixels throughout
# (reference utils/cityscapes_to_lmdb.py:10).
IGNORE_INDEX = 255
