from .synth import synth_clips, codecs_dim, clips_ref_manifest
from .tables import load_table, load_tables

__all__ = ["synth_clips", "codecs_dim", "clips_ref_manifest", "load_table", "load_tables"]
