"""Error types and error-tree algebra.

Reproduces the semantics of the reference's ``ValidationError``
(/root/reference/src/marshmallow/exceptions.py:15-57) and
``merge_errors`` (/root/reference/src/marshmallow/error_store.py:28-60)
without any code reuse: here errors are first-class *DataFrames* of
violation rows; the nested-dict shape is reconstructed driver-side only
for (small, sampled) reporting.
"""

from __future__ import annotations

from typing import Any

#: Key used for schema-level (cross-field) errors, matching the
#: reference's ``SCHEMA`` constant (src/marshmallow/exceptions.py:8).
SCHEMA = "_schema"


class MarshmallowSparkError(Exception):
    """Base error for this package."""


class RegistryError(MarshmallowSparkError, NameError):
    """Raised on failed schema-registry lookups
    (parity: src/marshmallow/exceptions.py:60)."""


class StringNotCollectionError(MarshmallowSparkError, TypeError):
    """Raised when a string is passed where a list of strings is expected
    (parity: src/marshmallow/exceptions.py:64)."""


class ValidationError(MarshmallowSparkError):
    """Raised when validation fails (driver-side terminal surface).

    ``messages`` is the marshmallow-shaped nested dict
    ``{row_key: {field: [msgs]}}`` (or ``{field: [msgs]}`` for a single
    logical record), built from a *sampled* subset of the violations
    DataFrame — at 10^12-row scale the full error set never leaves the
    cluster; consumers read ``violations_df`` instead.
    """

    def __init__(
        self,
        message: Any,
        field_name: str = SCHEMA,
        data: Any = None,
        valid_data: Any = None,
        **kwargs: Any,
    ):
        self.messages = [message] if isinstance(message, (str, bytes)) else message
        self.field_name = field_name
        self.data = data
        self.valid_data = valid_data
        self.kwargs = kwargs
        super().__init__(message)

    def normalized_messages(self) -> dict:
        if self.field_name == SCHEMA and isinstance(self.messages, dict):
            return self.messages
        return {self.field_name: self.messages}

    @property
    def messages_dict(self) -> dict:
        if not isinstance(self.messages, dict):
            raise TypeError("cannot access 'messages_dict' when 'messages' is of type list")
        return self.messages


def merge_errors(errors1: Any, errors2: Any) -> Any:
    """Deeply merge two error trees.

    Same algebra as the reference (src/marshmallow/error_store.py:28-60):
    list+list concatenates, dict+dict merges recursively, mixed shapes
    nest under ``SCHEMA``. Used driver-side when assembling the sampled
    message tree from violation rows.
    """
    if not errors1:
        return errors2
    if not errors2:
        return errors1
    if isinstance(errors1, list):
        if isinstance(errors2, list):
            return errors1 + errors2
        if isinstance(errors2, dict):
            return dict(errors2, **{SCHEMA: merge_errors(errors1, errors2.get(SCHEMA))})
        return errors1 + [errors2]
    if isinstance(errors1, dict):
        if isinstance(errors2, list):
            return dict(errors1, **{SCHEMA: merge_errors(errors1.get(SCHEMA), errors2)})
        if isinstance(errors2, dict):
            errors = dict(errors1)
            for key, val in errors2.items():
                if key in errors:
                    errors[key] = merge_errors(errors[key], val)
                else:
                    errors[key] = val
            return errors
        return dict(errors1, **{SCHEMA: merge_errors(errors1.get(SCHEMA), errors2)})
    if isinstance(errors2, list):
        return [errors1] + errors2
    if isinstance(errors2, dict):
        return dict(errors2, **{SCHEMA: merge_errors(errors1, errors2.get(SCHEMA))})
    return [errors1, errors2]


def violations_to_message_tree(rows, key_name: str = "row_key") -> dict:
    """Collected violation rows -> marshmallow-shaped nested dict.

    ``rows`` is an iterable of Row/dicts with (row_key, field, message).
    Shape matches the reference's ``many=True`` error dict keyed by row
    identity (src/marshmallow/schema.py:601-624), with messages merged
    per (row, field) like ``merge_errors``.

    Dotted violation paths nest like the reference's error dicts:
    ``"who.age"`` -> ``{"who": {"age": [...]}}``; numeric segments
    become int keys (List/Nested-many per-index errors,
    ``"xs.1"`` -> ``{"xs": {1: [...]}}``). Map-key segments that would
    be ambiguous (digit-only string keys, keys containing '.') arrive
    ESC-sentinel-wrapped from ``Mapping._key_segment`` and are restored
    to their original *string* form here — the reference keys its error
    dict by the original key object, never by a coerced int.
    """
    tree: dict = {}
    for r in rows:
        d = r.asDict() if hasattr(r, "asDict") else dict(r)
        key = d[key_name]
        msg = d["message"]
        parts = []
        for p in str(d["field"]).split("."):
            if len(p) >= 2 and p.startswith("\x1b") and p.endswith("\x1b"):
                parts.append(
                    p[1:-1].replace("\x1bD", ".").replace("\x1bE", "\x1b")
                )
            elif p.isdigit():
                parts.append(int(p))
            else:
                parts.append(p)
        node = tree.setdefault(key, {})
        for p in parts[:-1]:
            nxt = node.get(p)
            if not isinstance(nxt, dict):
                nxt = {} if nxt is None else {SCHEMA: nxt}
                node[p] = nxt
            node = nxt
        leaf = parts[-1]
        node[leaf] = merge_errors(node.get(leaf), [msg])
    return tree
