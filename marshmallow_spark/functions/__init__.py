from . import audio

__all__ = ["audio"]
