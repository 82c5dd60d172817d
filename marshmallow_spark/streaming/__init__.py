from .validate_stream import (
    StreamingValidation,
    running_verdicts,
    unique_within_watermark,
    validate_stream,
    windowed_psi,
    windowed_verdicts,
)

__all__ = [
    "StreamingValidation",
    "running_verdicts",
    "unique_within_watermark",
    "validate_stream",
    "windowed_psi",
    "windowed_verdicts",
]
