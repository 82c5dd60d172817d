from .validate_stream import (
    StreamingValidation,
    audio_invariant_stream,
    duplicate_keys_in_window,
    landed_unique_batch_processor,
    landed_unique_sink,
    running_verdicts,
    session_stats_stream,
    unique_within_watermark,
    validate_stream,
    windowed_psi,
    windowed_verdicts,
)

__all__ = [
    "StreamingValidation",
    "audio_invariant_stream",
    "duplicate_keys_in_window",
    "landed_unique_batch_processor",
    "landed_unique_sink",
    "running_verdicts",
    "session_stats_stream",
    "unique_within_watermark",
    "validate_stream",
    "windowed_psi",
    "windowed_verdicts",
]
