"""Hook decorators (parity: /root/reference/src/marshmallow/decorators.py:74-233).

Hooks are discovered once per class by the schema metaclass (like the
reference's ``resolve_hooks``, src/marshmallow/schema.py:149-188) and
invoked in the reference's fixed pipeline order (src/marshmallow/
schema.py:810-911, :1058-1099). Semantics in the columnar engine:

- ``pre_load`` / ``post_load`` / ``pre_dump`` / ``post_dump``:
  DataFrame -> DataFrame transforms (``pass_many`` hooks run first on
  load, last on dump, matching H6 in SURVEY.md §2.5).
- ``validates(field_name)``: method receives the *loaded* Column for
  that field and returns either a boolean Column (True = violation;
  message defaults to "Invalid value.") or a string Column that is the
  message when invalid and NULL when valid.
- ``validates_schema``: cross-field; the method receives the loaded
  DataFrame's column resolver (``F.col`` works directly) and returns
  the same condition/message shapes. ``skip_on_field_errors`` gates the
  check on rows with no field-level violations (parity:
  src/marshmallow/schema.py:1162-1163).
"""

from __future__ import annotations

import functools

PRE_LOAD = "pre_load"
POST_LOAD = "post_load"
PRE_DUMP = "pre_dump"
POST_DUMP = "post_dump"
VALIDATES = "validates"
VALIDATES_SCHEMA = "validates_schema"

HOOK_ATTR = "__marshmallow_spark_hook__"


def _tag(fn, tag: str, **opts):
    existing = list(getattr(fn, HOOK_ATTR, []))
    existing.append((tag, opts))
    fn.__marshmallow_spark_hook__ = existing
    return fn


def validates(field_name: str):
    """Register a single-field validator method
    (parity: src/marshmallow/decorators.py:86-91)."""

    def deco(fn):
        return _tag(fn, VALIDATES, field_name=field_name)

    return deco


def validates_schema(
    fn=None,
    *,
    pass_many: bool = False,
    pass_original: bool = False,
    skip_on_field_errors: bool = True,
    field_name: str | None = None,
):
    """Register a cross-field (schema-level) validator
    (parity: src/marshmallow/decorators.py:94-125)."""

    if fn is None:
        return functools.partial(
            validates_schema,
            pass_many=pass_many,
            pass_original=pass_original,
            skip_on_field_errors=skip_on_field_errors,
            field_name=field_name,
        )
    return _tag(
        fn,
        VALIDATES_SCHEMA,
        pass_many=pass_many,
        pass_original=pass_original,
        skip_on_field_errors=skip_on_field_errors,
        field_name=field_name,
    )


def _df_hook(tag):
    def outer(fn=None, *, pass_many: bool = False, pass_original: bool = False):
        if fn is None:
            return functools.partial(outer, pass_many=pass_many, pass_original=pass_original)
        return _tag(fn, tag, pass_many=pass_many, pass_original=pass_original)

    return outer


pre_load = _df_hook(PRE_LOAD)
post_load = _df_hook(POST_LOAD)
pre_dump = _df_hook(PRE_DUMP)
post_dump = _df_hook(POST_DUMP)
