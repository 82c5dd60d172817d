"""marshmallow_spark — a PySpark-native schema + constraint validation engine.

A brand-new engine (NOT a port) reproducing the semantics of
marshmallow's Schema / Field / validator / hook / ValidationError
surface (/root/reference, marshmallow 3.23.0) as vectorized Spark
DataFrame plans: declarative field specs compile to a single Catalyst
projection of cast + violation expressions, dataset-level checks
(stats, uniqueness, referential integrity, distribution drift) run as
Spark aggregations/joins, and binary audio payloads are validated inside
Arrow-batched pandas UDFs with zero per-row Python.
"""

from . import fields, validate
from .decorators import (
    post_dump,
    post_load,
    pre_dump,
    pre_load,
    validates,
    validates_schema,
)
from .errors import SCHEMA, ValidationError, merge_errors
from .schema import EXCLUDE, INCLUDE, RAISE, Schema, SchemaOpts, ValidationResult
from .session import get_spark
from .utils import MISSING, missing

__version__ = "0.1.0"

__all__ = [
    "Schema",
    "SchemaOpts",
    "pprint",
    "ValidationResult",
    "ValidationError",
    "fields",
    "validate",
    "validates",
    "validates_schema",
    "pre_load",
    "post_load",
    "pre_dump",
    "post_dump",
    "RAISE",
    "EXCLUDE",
    "INCLUDE",
    "SCHEMA",
    "MISSING",
    "missing",
    "merge_errors",
    "get_spark",
    "__version__",
]


def pprint(obj, *args, **kwargs) -> None:
    """Parity shim for ``marshmallow.pprint`` (deprecated there since
    3.7, reference utils.py:77-94): warns and pretty-prints. Provided
    so drop-in imports keep working."""
    import pprint as _pp
    import warnings

    warnings.warn(
        "marshmallow's pprint function is deprecated and will be removed"
        " in marshmallow 4.",
        DeprecationWarning,
        stacklevel=2,
    )
    _pp.pprint(obj, *args, **kwargs)
