from .pipeline import ClipSchema, ClipValidationSuite
from .checkpoint import CheckpointedRun

__all__ = ["ClipSchema", "ClipValidationSuite", "CheckpointedRun"]
