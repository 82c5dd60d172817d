from .validate_stream import (
    StreamingValidation,
    unique_within_watermark,
    validate_stream,
    windowed_verdicts,
)

__all__ = [
    "StreamingValidation",
    "unique_within_watermark",
    "validate_stream",
    "windowed_verdicts",
]
