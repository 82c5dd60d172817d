from .stats import column_stats, column_profile
from .uniqueness import duplicate_keys, duplicate_key_rows, uniqueness_violations
from .referential import referential_violations, referential_check
from .drift import (
    quantile_sketch,
    ks_statistic,
    ks_between,
    psi,
    psi_between,
    psi_df,
    histogram_counts,
)
from .sampling import assign_split, deterministic_sample, hash_bucket

__all__ = [
    "column_stats",
    "column_profile",
    "duplicate_keys",
    "duplicate_key_rows",
    "uniqueness_violations",
    "referential_violations",
    "referential_check",
    "quantile_sketch",
    "ks_statistic",
    "ks_between",
    "psi",
    "psi_between",
    "psi_df",
    "assign_split",
    "deterministic_sample",
    "hash_bucket",
    "histogram_counts",
]
