"""Small shared utilities.

The ``MISSING`` sentinel reproduces the reference's absence-of-value
marker (/root/reference/src/marshmallow/utils.py:27-44): distinct from
``None``. In the columnar engine, "missing" means *the column is absent
from the DataFrame* (schema-level), while ``None`` is SQL NULL
(row-level) — see SURVEY.md §7.3(2).
"""

from __future__ import annotations


class _Missing:
    def __bool__(self) -> bool:
        return False

    def __copy__(self):
        return self

    def __deepcopy__(self, _):
        return self

    def __repr__(self) -> str:
        return "<marshmallow_spark.missing>"


#: Singleton sentinel: value was not provided (!= None).
MISSING = _Missing()
missing = MISSING  # reference-compatible alias


def is_collection(obj) -> bool:
    from collections.abc import Iterable

    return isinstance(obj, Iterable) and not isinstance(obj, (str, bytes, dict))
