"""Training engine: the single Trainer + AL loop shared by every driver
(the reference triplicates ~300 lines of Trainer per driver,
SURVEY.md section 7)."""

from deep_active_semantic_segmentation_tpu.engine.trainer import Trainer  # noqa: F401
