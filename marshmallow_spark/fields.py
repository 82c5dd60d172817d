"""Field type system: declarative column specs that compile to Spark exprs.

Parity target: /root/reference/src/marshmallow/fields.py (the Field
pipeline at :347-373, and each field's ``_deserialize``/``_serialize``).
Execution model is completely different: a Field never sees a value.
At schema-compile time each bound field emits

- ``load_expr(raw)``   -> Column: typed internal value, NULL on failure
- ``type_entries(raw, loaded, path)`` -> list[Column]: each an
  ``array<struct<field:string,message:string>>`` of violation entries
  (NULL / empty when the row conforms) — the columnar rendering of the
  reference's ValidationError messages (byte-identical strings)
- ``dump_expr(internal)`` -> Column: external representation

All expressions are built from ``pyspark.sql.functions`` so the whole
check pass stays inside whole-stage codegen; no Python executes per row.
"""

from __future__ import annotations

import re
import typing

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import validate as _validate
from .utils import MISSING, _Missing

__all__ = [
    "Field",
    "Raw",
    "String",
    "UUID",
    "Number",
    "Integer",
    "Float",
    "Decimal",
    "Boolean",
    "DateTime",
    "NaiveDateTime",
    "AwareDateTime",
    "Time",
    "Date",
    "TimeDelta",
    "List",
    "Tuple",
    "Mapping",
    "Dict",
    "Nested",
    "Pluck",
    "Url",
    "URL",
    "Email",
    "IP",
    "IPv4",
    "IPv6",
    "Enum",
    "Function",
    "Method",
    "Constant",
    "Str",
    "Int",
    "Bool",
]


def entry(path: str, cond: Column, message: str) -> Column:
    """One scalar violation check -> nullable single-entry array."""
    return F.when(
        cond,
        F.array(F.struct(F.lit(path).alias("field"), F.lit(message).alias("message"))),
    )


class Field:
    """Base field (parity: src/marshmallow/fields.py:83-483).

    Attributes mirror the reference's declaration surface: required,
    allow_none, load_default/dump_default, data_key, attribute,
    validate, error_messages, load_only/dump_only, metadata.
    """

    #: Verbatim message templates (src/marshmallow/fields.py:153-157).
    default_error_messages: dict[str, str] = {
        "required": "Missing data for required field.",
        "null": "Field may not be null.",
        "validator_failed": "Invalid value.",
    }

    _creation_index = 0  # declaration-order tiebreak, like the reference

    def __init__(
        self,
        *,
        required: bool = False,
        allow_none: bool | None = None,
        load_default: typing.Any = MISSING,
        dump_default: typing.Any = MISSING,
        data_key: str | None = None,
        attribute: str | None = None,
        validate=None,
        error_messages: dict[str, str] | None = None,
        load_only: bool = False,
        dump_only: bool = False,
        metadata: dict | None = None,
        **additional_metadata,
    ):
        # legacy aliases (reference fields.py:83-120 accepts them with a
        # RemovedInMarshmallow4Warning; same here)
        if "missing" in additional_metadata:
            import warnings

            warnings.warn(
                "The 'missing' argument to fields is deprecated. "
                "Use 'load_default' instead.",
                DeprecationWarning,
                stacklevel=2,
            )
            if load_default is MISSING:
                load_default = additional_metadata.pop("missing")
            else:
                additional_metadata.pop("missing")
        if "default" in additional_metadata:
            import warnings

            warnings.warn(
                "The 'default' argument to fields is deprecated. "
                "Use 'dump_default' instead.",
                DeprecationWarning,
                stacklevel=2,
            )
            if dump_default is MISSING:
                dump_default = additional_metadata.pop("default")
            else:
                additional_metadata.pop("default")
        if additional_metadata:
            # extra kwargs fold into metadata (reference fields.py:
            # 223-236, with a deprecation warning)
            import warnings

            warnings.warn(
                "Passing field metadata as keyword arguments is deprecated. "
                "Use the explicit `metadata=...` argument instead.",
                DeprecationWarning,
                stacklevel=2,
            )
            metadata = {**(metadata or {}), **additional_metadata}
        self.required = required
        # allow_none defaults True iff load_default is None
        # (src/marshmallow/fields.py:218-220)
        self.allow_none = (
            load_default is None if allow_none is None else allow_none
        )
        self.load_default = load_default
        self.dump_default = dump_default
        self.data_key = data_key
        self.attribute = attribute
        self.load_only = load_only
        self.dump_only = dump_only
        self.metadata = metadata or {}

        if validate is None:
            self.validators: list[_validate.Validator] = []
        elif isinstance(validate, (list, tuple)):
            self.validators = [_validate._resolve(v) for v in validate]
        else:
            self.validators = [_validate._resolve(validate)]

        # error_messages override chain: MRO + per-instance
        # (src/marshmallow/fields.py:238-243)
        messages: dict[str, str] = {}
        for cls in reversed(type(self).__mro__):
            messages.update(getattr(cls, "default_error_messages", {}))
        messages.update(error_messages or {})
        self.error_messages = messages

        self.name: str | None = None
        self.parent = None
        #: Spark type of the raw source column, set by Schema.plan at
        #: compile time. Needed where the reference's semantics depend
        #: on the *input* Python type (strict Integer, TimeDelta's
        #: int(value) vs float truncation).
        self.source_type: T.DataType | None = None
        Field._creation_index += 1
        self._creation_index = Field._creation_index

    # -- binding ----------------------------------------------------------
    def bind(self, name: str, parent) -> None:
        """Bind to a schema (parity: _bind_to_schema,
        src/marshmallow/fields.py:377-388)."""
        self.name = name
        self.parent = parent

    # -- spark surface ----------------------------------------------------
    def spark_type(self) -> T.DataType:
        return T.StringType()

    def external_parse_type(self) -> T.DataType:
        """Shape used to parse this field out of semi-structured input
        (loads_df). Defaults to the internal Spark type; fields whose
        external JSON form differs (Tuple: array vs positional struct)
        override."""
        return self.spark_type()

    def load_expr(self, raw: Column) -> Column:
        """External -> internal conversion; NULL signals a failed cast."""
        return raw

    def dump_expr(self, internal: Column) -> Column:
        """Internal -> external formatting (never validates; parity with
        the 3.0 no-validation-on-dump rule, src/marshmallow/schema.py:540)."""
        return internal

    def type_entries(self, raw: Column, loaded: Column, path: str) -> list[Column]:
        """Conformance violations: default = cast failure."""
        return [
            entry(path, raw.isNotNull() & loaded.isNull(), self._invalid_message())
        ]

    # -- JSON-kind-aware variants -----------------------------------------
    # The loads path hands fields the original JSON token TYPE (via
    # schema_of_variant: "BIGINT"/"DECIMAL(p,s)"/"DOUBLE" numbers,
    # "STRING", "BOOLEAN", "VOID") so semantics that depend on the
    # Python input type — json.loads gives int/float/str/bool objects —
    # reproduce exactly. Defaults ignore the kind.

    def load_expr_kinded(self, raw: Column, kind: Column) -> Column:
        return self.load_expr(raw)

    def type_entries_kinded(
        self, raw: Column, loaded: Column, path: str, kind: Column
    ) -> list[Column]:
        return self.type_entries(raw, loaded, path)

    def _invalid_message(self) -> str:
        return self.error_messages.get("invalid", self.error_messages["validator_failed"])

    def length_expr(self, loaded: Column) -> Column:
        """len() rendering for the Length validator (strings: chars)."""
        return F.length(loaded)

    def validator_entries(self, loaded: Column, path: str) -> list[Column]:
        """Post-deserialization validator chain; runs only on rows whose
        value deserialized successfully and is non-null (parity:
        Field.deserialize pipeline src/marshmallow/fields.py:347-373 —
        None short-circuits before validators when allow_none)."""
        gate = loaded.isNotNull()
        out = []
        for v in self.validators:
            col_for_v = loaded
            if isinstance(
                v, (_validate.ContainsOnly, _validate.ContainsNoneOf)
            ) and isinstance(self.spark_type(), T.StringType):
                # the reference treats a string as an iterable of chars
                # (ContainsOnly("abc") checks each character); guard the
                # empty string — split("", "") yields [""] not [], and an
                # empty iterable passes ContainsOnly
                col_for_v = F.when(
                    F.length(loaded) == 0, F.array().cast("array<string>")
                ).otherwise(F.split(loaded, ""))
            if isinstance(v, _validate.Length) and not isinstance(v, _validate.SizeLength):
                # container fields override length_expr; reuse it here
                checks = self._length_checks(v, loaded)
            else:
                checks = v.checks(col_for_v)
            for cond, msg in checks:
                out.append(entry(path, gate & F.coalesce(cond, F.lit(False)), msg))
        return out

    def _length_checks(self, v: _validate.Length, loaded: Column):
        ln = self.length_expr(loaded)
        if v.equal is not None:
            return [(ln != F.lit(v.equal), v._format(v.message_equal))]
        out = []
        if v.min is not None:
            msg = v._format(v.message_min if v.max is None else v.message_all)
            out.append((ln < F.lit(v.min), msg))
        if v.max is not None:
            msg = v._format(v.message_max if v.min is None else v.message_all)
            out.append((ln > F.lit(v.max), msg))
        return out

    def __repr__(self) -> str:
        return f"<fields.{type(self).__name__}(name={self.name!r})>"


class Raw(Field):
    """Passthrough (parity: src/marshmallow/fields.py:486-487)."""

    def type_entries(self, raw, loaded, path):
        return []


class String(Field):
    """Parity: src/marshmallow/fields.py:886-909."""

    default_error_messages = {
        "invalid": "Not a valid string.",
        "invalid_utf8": "Not a valid utf-8 string.",
    }

    def spark_type(self):
        return T.StringType()

    def load_expr(self, raw):
        # The reference accepts only str/bytes INPUT OBJECTS
        # (src/marshmallow/fields.py:905-909): an int/bool/float value
        # through a String field fails deserialization even though
        # Spark could cast it. Returning NULL here makes the standard
        # cast-failure entry fire AND gates the validator chain off —
        # validators never run on a failed deserialize (parity:
        # Field.deserialize pipeline, fields.py:347-373).
        if self.source_type is not None and not isinstance(
            self.source_type, (T.StringType, T.BinaryType)
        ):
            return F.lit(None).cast("string")
        return raw.cast("string")

    def type_entries(self, raw, loaded, path):
        return [entry(path, raw.isNotNull() & loaded.isNull(), self.error_messages["invalid"])]

    def load_expr_kinded(self, raw, kind):
        # non-string tokens never deserialize (so the validator chain
        # stays off, like the reference's failed-deserialize gating)
        return F.when(kind == F.lit("STRING"), self.load_expr(raw))

    def type_entries_kinded(self, raw, loaded, path, kind):
        """JSON number/boolean/container tokens through a string-family
        field are the field's own invalid message (reference: a
        non-str/bytes value raises, fields.py:905-909; subclasses like
        UUID resolve their own message). The stringified parse renders
        them as plausible strings, so the kind is the only witness."""
        nonstr = raw.isNotNull() & kind.isNotNull() & (kind != F.lit("STRING"))
        out = [F.when(kind == F.lit("STRING"), e) for e in self.type_entries(raw, loaded, path)]
        out.append(entry(path, nonstr, self._invalid_message()))
        return out


class UUID(String):
    """Parity: src/marshmallow/fields.py:912-932. uuid.UUID() is far
    more permissive than the canonical dashed form: it removes every
    'urn:' and 'uuid:' occurrence, strips surrounding braces, drops
    ALL dashes wherever they sit, then requires exactly 32 hex chars —
    so "{...}", "urn:uuid:...", un-dashed hex, and oddly-dashed forms
    all parse. (\\z not $: Java's $ matches before a trailing newline,
    which uuid.UUID rejects.)"""

    default_error_messages = {"invalid_uuid": "Not a valid UUID."}

    def type_entries(self, raw, loaded, path):
        c = F.regexp_replace(loaded, "urn:", "")
        c = F.regexp_replace(c, "uuid:", "")
        c = F.regexp_replace(c, r"^[{}]+|[{}]+\z", "")
        c = F.regexp_replace(c, "-", "")
        # loaded is NULL for non-string/non-binary sources (String.load_expr);
        # rlike(NULL) is NULL, so the null case must be flagged explicitly or
        # an int column through UUID silently loads NULL (reference:
        # uuid.UUID(5) -> TypeError -> "Not a valid UUID.").
        bad = raw.isNotNull() & (loaded.isNull() | ~c.rlike(r"^[0-9a-fA-F]{32}\z"))
        return [entry(path, bad, self.error_messages["invalid_uuid"])]


# Python numeric literals allow single underscores BETWEEN digit
# groups ("1_000", "1_0.5_5e1_0") — int()/float() accept them, Spark
# casts do not. Clean the separators only when the whole string is a
# validly-grouped numeric (misplaced underscores must stay and fail).
_UNDERSCORE_NUM = (
    r"^[+-]?(\d+(_\d+)*(\.(\d+(_\d+)*)?)?|\.\d+(_\d+)*)([eE][+-]?\d+(_\d+)*)?\z"
)


def _numeric_cleaned(s: Column) -> Column:
    return F.when(
        s.contains("_") & s.rlike(_UNDERSCORE_NUM),
        F.regexp_replace(s, "_", ""),
    ).otherwise(s)


# What Python float() actually accepts: optional surrounding
# whitespace, sign, grouped digits with ./exponent, inf/infinity/nan
# (any case). Spark's string->double cast is LOOSER (it also takes
# Java-literal suffixes like "0f"/"1d"), so the cast must be gated on
# this shape or "0f" silently becomes 0.0.
_PY_FLOAT = (
    r"(?i)^\s*[+-]?((\d+(_\d+)*(\.(\d+(_\d+)*)?)?|\.\d+(_\d+)*)"
    r"(e[+-]?\d+(_\d+)*)?|inf(inity)?|nan)\s*\z"
)


def _py_float_cast(s: Column) -> Column:
    # Trim BEFORE underscore-cleaning: _UNDERSCORE_NUM is anchored with
    # no whitespace tolerance, so ' 1_000 ' would keep its underscores
    # and try_cast to NULL even though Python float(' 1_000 ') == 1000.0.
    t = _ws_trim(s)
    return F.when(s.rlike(_PY_FLOAT), _numeric_cleaned(t).try_cast("double"))


def _ws_trim(s: Column) -> Column:
    """Python int()/float() strip ALL whitespace (tabs, newlines, …);
    Spark's trim() strips spaces only."""
    return F.regexp_replace(s, r"^\s+|\s+$", "")


# decimal.Decimal is LOOSER than float() about underscores: it removes
# every '_' before parsing ("0_", "_0", "1__0", even "n_an" all parse),
# while float() only allows single underscores between digits.
_PY_DECIMAL_NUM = r"(?i)^[+-]?(\d+(\.\d*)?|\.\d+)(e[+-]?\d+)?\z"


def _decimal_cleaned(s: Column) -> Column:
    """Trimmed, underscore-stripped candidate string (Decimal grammar)."""
    return F.regexp_replace(_ws_trim(s), "_", "")


def _py_decimal_cast(s: Column) -> Column:
    t = _decimal_cleaned(s)
    return F.when(t.rlike(_PY_DECIMAL_NUM), t.try_cast("double"))


class Number(Field):
    """Numeric base (parity: src/marshmallow/fields.py:935-983)."""

    default_error_messages = {
        "invalid": "Not a valid number.",
        "too_large": "Number too large.",
    }

    num_type = "double"

    def __init__(self, *, as_string: bool = False, **kwargs):
        self.as_string = as_string
        super().__init__(**kwargs)

    def spark_type(self):
        return T.DoubleType()

    def load_expr(self, raw):
        if not isinstance(raw, Column):
            return raw
        # bools rejected by the reference (Number._validated,
        # src/marshmallow/fields.py:960-964) even though Spark casts
        # true/false to 1/0; NULL gates the validator chain off too
        if isinstance(self.source_type, T.BooleanType):
            return F.lit(None).cast(self.num_type)
        if isinstance(self.source_type, T.StringType):
            if self.num_type == "double":
                return _py_float_cast(raw)
            return _numeric_cleaned(_ws_trim(raw)).try_cast(self.num_type)
        return raw.try_cast(self.num_type)

    def dump_expr(self, internal):
        return internal.cast("string") if self.as_string else internal

    def load_expr_kinded(self, raw, kind):
        # JSON token kinds map exactly onto the source-type dispatch
        # load_expr already implements (str -> Python float()/int()
        # grammar incl. underscore grouping, bool -> rejected, number
        # -> cast), so compile each variant's expression under the
        # corresponding source type instead of duplicating the
        # grammar. Without this, a STRING token inside a container
        # fell to the bare-cast branch and "1_000" — valid Python —
        # failed as "Not a valid number." (fuzz-found r4). Inherited
        # by Float and Decimal; Integer overrides with its own
        # truncation/strict kind semantics.
        saved = self.source_type
        try:
            self.source_type = T.StringType()
            as_str = self.load_expr(raw)
            self.source_type = T.BooleanType()
            as_bool = self.load_expr(raw)
            self.source_type = T.DoubleType()
            as_num = self.load_expr(raw)
        finally:
            self.source_type = saved
        return (
            F.when(kind == F.lit("STRING"), as_str)
            .when(kind == F.lit("BOOLEAN"), as_bool)
            .otherwise(as_num)
        )

    def type_entries(self, raw, loaded, path):
        return [entry(path, raw.isNotNull() & loaded.isNull(), self.error_messages["invalid"])]


class Integer(Number):
    """Parity: src/marshmallow/fields.py:986-1007. ``strict`` rejects
    non-integral input; columnar: value != floor(value) or a string
    source column (type-level, caught at compile)."""

    default_error_messages = {"invalid": "Not a valid integer."}
    num_type = "long"

    def __init__(self, *, strict: bool = False, **kwargs):
        self.strict = strict
        super().__init__(**kwargs)

    def spark_type(self):
        return T.LongType()

    def load_expr(self, raw):
        if not isinstance(raw, Column):
            return raw
        # The reference's strict mode accepts only numbers.Integral
        # *input objects* (src/marshmallow/fields.py:956-963): any
        # string or float source value fails, even "5" or 5.0.
        # Returning NULL fires the cast-failure entry and gates the
        # validator chain off (no validators on failed deserialize).
        if self.strict and isinstance(
            self.source_type,
            (T.StringType, T.DoubleType, T.FloatType, T.DecimalType),
        ):
            return F.lit(None).cast(self.num_type)
        return super().load_expr(raw)

    def type_entries(self, raw, loaded, path):
        bad = raw.isNotNull() & loaded.isNull()
        if self.strict and self.source_type is None:
            # no compile-time type info: value-level fractional check
            frac = raw.isNotNull() & loaded.isNotNull() & (
                raw.try_cast("double") != loaded.cast("double")
            )
            bad = bad | frac
        return [entry(path, bad, self.error_messages["invalid"])]

    # JSON-kind semantics (json.loads type fidelity): BIGINT tokens are
    # Python ints (exact, cast to long), DECIMAL/DOUBLE tokens are
    # floats (int(value) truncates toward zero; infinities overflow to
    # "Number too large."; strict rejects them), STRING tokens follow
    # Python int(str), BOOLEAN tokens are invalid.
    _NUM_KINDS_PREFIXES = ("BIGINT", "DECIMAL", "DOUBLE")

    @staticmethod
    def _kind_is_number(kind):
        return kind.isNotNull() & (
            (kind == F.lit("BIGINT"))
            | kind.startswith("DECIMAL")
            | (kind == F.lit("DOUBLE"))
        )

    @staticmethod
    def _kinded_double(raw):
        # the stringified parse renders an overflowed JSON number (not
        # representable as a JSON literal) as a QUOTED "Infinity" inside
        # containers — strip quotes as a fallback
        return F.coalesce(
            raw.try_cast("double"),
            F.regexp_replace(raw, '^"|"$', "").try_cast("double"),
        )

    # int64 ceiling for float->int truncation: the reference's int() is
    # arbitrary-precision, a columnar long is not — finite doubles at or
    # beyond 2^63 become "Number too large." (same documented engine
    # bound as JSON integer tokens beyond int64 and TimeDelta's +/-2^63
    # microsecond ceiling). float(2^63) is exactly 2^63, so < is the
    # right upper comparison; -(2^63) is itself a valid long.
    _LONG_MIN_D = float(-(1 << 63))
    _LONG_MAX_D = float(1 << 63)

    @classmethod
    def _in_long_range(cls, dbl):
        return (dbl >= F.lit(cls._LONG_MIN_D)) & (dbl < F.lit(cls._LONG_MAX_D))

    def load_expr_kinded(self, raw, kind):
        is_num = self._kind_is_number(kind)
        dbl = self._kinded_double(raw)
        finite = ~F.isnan(dbl) & (F.abs(dbl) != F.lit(float("inf")))
        if self.strict:
            num_loaded = F.when(kind == F.lit("BIGINT"), raw.try_cast("long"))
        else:
            num_loaded = F.when(
                kind == F.lit("BIGINT"), raw.try_cast("long")
            ).otherwise(
                # double->long cast truncates toward zero, like int();
                # guarded by the range check — under ANSI mode a bare
                # cast of a finite out-of-range double (e.g. the float32
                # extreme 3.4e38) CRASHES the task with CAST_OVERFLOW
                # instead of yielding a violation row (fuzz-found r3)
                F.when(
                    finite & self._in_long_range(dbl), dbl.try_cast("long")
                )
            )
        if self.strict:
            # strict rejects str/float objects entirely
            return F.when(is_num, num_loaded)
        # STRING tokens follow Python int(str) — whitespace trim +
        # underscore digit grouping — compiled via the StringType
        # branch of Number.load_expr (the kinded path has no Spark
        # source_type, so the dispatch must be forced; fuzz-found r4:
        # "0_00" in a Dict value failed where int("0_00") == 0)
        saved = self.source_type
        try:
            self.source_type = T.StringType()
            as_str = super().load_expr(raw)
        finally:
            self.source_type = saved
        return F.when(is_num, num_loaded).otherwise(
            F.when(kind == F.lit("STRING"), as_str)
        )

    def type_entries_kinded(self, raw, loaded, path, kind):
        is_num = self._kind_is_number(kind)
        dbl = self._kinded_double(raw)
        nonfinite = F.isnan(dbl) | (F.abs(dbl) == F.lit(float("inf")))
        out_of_range = ~nonfinite & ~self._in_long_range(dbl)
        bigint_overflow = (kind == F.lit("BIGINT")) & raw.try_cast("long").isNull()
        too_large = raw.isNotNull() & is_num & (
            bigint_overflow
            | (
                (kind != F.lit("BIGINT"))
                & F.coalesce(nonfinite | out_of_range, F.lit(False))
                & F.lit(not self.strict)
            )
        )
        invalid = raw.isNotNull() & loaded.isNull() & ~too_large
        return [
            entry(path, invalid, self.error_messages["invalid"]),
            entry(path, too_large, self.error_messages["too_large"]),
        ]


class Float(Number):
    """Parity: src/marshmallow/fields.py:1010-1035; NaN/Inf rejected
    unless ``allow_nan``."""

    default_error_messages = {
        "special": "Special numeric values (nan or infinity) are not permitted."
    }
    num_type = "double"

    def __init__(self, *, allow_nan: bool = False, as_string: bool = False, **kwargs):
        self.allow_nan = allow_nan
        super().__init__(as_string=as_string, **kwargs)

    def type_entries(self, raw, loaded, path):
        out = super().type_entries(raw, loaded, path)
        if not self.allow_nan:
            special = loaded.isNotNull() & (
                F.isnan(loaded) | (F.abs(loaded) == F.lit(float("inf")))
            )
            out.append(entry(path, special, self.error_messages["special"]))
        return out


class Decimal(Number):
    """Parity: src/marshmallow/fields.py:1038-1120. ``places`` -> scale;
    rounding uses HALF_EVEN via ``F.bround`` (the reference's context
    default) unless rounding='HALF_UP' (plain ``F.round``)."""

    default_error_messages = {
        "special": "Special numeric values (nan or infinity) are not permitted."
    }

    def __init__(self, places: int | None = None, rounding: str | None = None,
                 *, allow_nan: bool = False, as_string: bool = False, **kwargs):
        self.places = places
        self.rounding = rounding
        self.allow_nan = allow_nan
        super().__init__(as_string=as_string, **kwargs)

    def spark_type(self):
        return T.DecimalType(38, self.places if self.places is not None else 18)

    def load_expr(self, raw):
        if isinstance(self.source_type, T.BooleanType):
            return F.lit(None).cast(self.spark_type())
        if isinstance(self.source_type, T.StringType):
            c = _py_decimal_cast(raw)
        else:
            c = raw.try_cast("double")
        if self.places is not None:
            c = (
                F.round(c, self.places)
                if self.rounding == "HALF_UP"
                else F.bround(c, self.places)
            )
        return c.try_cast(self.spark_type())

    def dump_expr(self, internal):
        return internal.cast("string") if self.as_string else internal

    #: decimal.Decimal's special-value grammar is wider than float()'s:
    #: signaling NaN and diagnostic payloads ("sNaN", "NaN123") parse —
    #: and underscores are stripped first, so "n_an" is NaN too.
    DECIMAL_SPECIAL = r"(?i)^[+-]?(s?nan\d*|inf(inity)?)\z"

    def type_entries(self, raw, loaded, path):
        s = raw.cast("string")
        special = raw.isNotNull() & _decimal_cleaned(s).rlike(self.DECIMAL_SPECIAL)
        out = []
        if not self.allow_nan:
            # parity: "Special numeric values ... not permitted.", NOT
            # "Not a valid number." (src/marshmallow/fields.py:1099-1107)
            out.append(entry(path, special, self.error_messages["special"]))
        # allow_nan=True: the reference returns Decimal NaN/Inf; Spark's
        # DecimalType cannot represent them, so they load as NULL with
        # no violation (documented engine rendering).
        bad = raw.isNotNull() & loaded.isNull() & ~special
        out.append(entry(path, bad, self.error_messages["invalid"]))
        return out


class Boolean(Field):
    """Token-set boolean (parity: src/marshmallow/fields.py:1123-1217,
    truthy/falsy sets :1135-1174)."""

    truthy = {"t", "T", "true", "True", "TRUE", "on", "On", "ON",
              "y", "Y", "yes", "Yes", "YES", "1", 1}
    falsy = {"f", "F", "false", "False", "FALSE", "off", "Off", "OFF",
             "n", "N", "no", "No", "NO", "0", 0}

    default_error_messages = {"invalid": "Not a valid boolean."}

    def __init__(self, *, truthy=None, falsy=None, **kwargs):
        super().__init__(**kwargs)
        if truthy is not None:
            self.truthy = set(truthy)
        if falsy is not None:
            self.falsy = set(falsy)

    def spark_type(self):
        return T.BooleanType()

    def load_expr(self, raw):
        # boolean sources pass through; everything else goes through
        # the token sets with EXACT matching — Spark's lenient
        # string->boolean cast trims and would accept "0 " where the
        # reference's set membership does not
        if isinstance(self.source_type, T.BooleanType):
            return raw.try_cast("boolean")
        s = raw.cast("string")
        truthy_s = sorted({str(t) for t in self.truthy})
        falsy_s = sorted({str(f) for f in self.falsy})
        return (
            F.when(s.isin(*truthy_s), F.lit(True))
            .when(s.isin(*falsy_s), F.lit(False))
            .otherwise(F.lit(None).cast("boolean"))
        )

    def type_entries(self, raw, loaded, path):
        return [entry(path, raw.isNotNull() & loaded.isNull(), self.error_messages["invalid"])]

    def load_expr_kinded(self, raw, kind):
        # JSON number tokens: the reference's set membership uses
        # numeric equality (1.0 in {1} is True), so any number equal to
        # a numeric truthy/falsy member maps; other numbers are invalid.
        is_num = (
            (kind == F.lit("BIGINT"))
            | kind.startswith("DECIMAL")
            | (kind == F.lit("DOUBLE"))
        )
        dbl = raw.try_cast("double")
        truthy_nums = [float(t) for t in self.truthy if isinstance(t, (int, float)) and not isinstance(t, bool)]
        falsy_nums = [float(f) for f in self.falsy if isinstance(f, (int, float)) and not isinstance(f, bool)]
        num_loaded = F.when(
            dbl.isin(*truthy_nums) if truthy_nums else F.lit(False), F.lit(True)
        ).when(
            dbl.isin(*falsy_nums) if falsy_nums else F.lit(False), F.lit(False)
        ).otherwise(F.lit(None).cast("boolean"))
        return F.when(is_num, num_loaded).otherwise(self.load_expr(raw))


def strftime_to_java(fmt: str) -> str:
    """Translate the common strftime directives to a Java
    DateTimeFormatter pattern (the subset marshmallow users use)."""
    mapping = {
        "%Y": "yyyy", "%y": "yy", "%m": "MM", "%d": "dd",
        "%H": "HH", "%I": "hh", "%M": "mm", "%S": "ss",
        "%f": "SSSSSS", "%z": "xx", "%Z": "zzz",
        "%j": "DDD", "%a": "EEE", "%A": "EEEE", "%b": "MMM", "%B": "MMMM",
        "%p": "a", "%%": "%",
    }
    out = []
    i = 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            tok = fmt[i : i + 2]
            out.append(mapping.get(tok, tok))
            i += 2
        else:
            ch = fmt[i]
            out.append("'" + ch + "'" if ch.isalpha() else ch)
            i += 1
    return "".join(out)


RFC822_JAVA = "EEE, dd MMM yyyy HH:mm:ss Z"


# --- Python-strptime-exact parsing of custom formats ----------------------
#
# ``datetime.strptime`` accepts unpadded 1-2 digit numerics, pivots %y at
# 69, and takes several %z shapes — none of which a fixed-width Java
# pattern reproduces. The JVM-exact plan below mirrors CPython's
# ``_strptime.TimeRE`` character class per directive as an anchored gate
# regex (so ACCEPTANCE matches byte-for-byte), then parses with
# width-lenient single-letter Java patterns (which accept a superset of
# every gated string). Directives with locale names / 12-hour clocks /
# week numbers, and formats without a year (strptime defaults those to
# 1900 where Spark uses 1970), fall back to an Arrow-batched UDF running
# the real ``datetime.strptime`` — the documented cold path.

_STRPTIME_GATE = {
    "%Y": r"\d{4}",
    "%y": r"\d{2}",
    "%m": r"(?:1[0-2]|0[1-9]|[1-9])",
    "%d": r"(?:3[01]|[12]\d|0[1-9]|[1-9])",
    "%H": r"(?:2[0-3]|[0-1]\d|\d)",
    "%M": r"(?:[0-5]\d|\d)",
    # TimeRE admits leap seconds 60/61 but datetime.strptime's
    # constructor then rejects them, so the end-to-end gate excludes
    "%S": r"(?:[0-5]\d|\d)",
    "%f": r"\d{1,6}",
    # %j is NOT here: Spark's formatter cannot resolve day-of-year +
    # year (probed: try_to_timestamp('366 of 2024', "D 'o''f' y") ->
    # NULL), so %j formats take the strptime-UDF path
    # fractional-second offsets (TimeRE's trailing (\.\d{1,6})?) are
    # not Java-parseable; such inputs take the rejection path
    "%z": r"(?:[+-]\d\d:?\d\d(?::?\d\d)?|Z)",
    "%%": r"%",
}
_STRPTIME_JAVA = {
    "%Y": "y", "%y": "yy", "%m": "M", "%d": "d", "%H": "H",
    "%M": "m", "%S": "s", "%f": "SSSSSS", "%%": "%",
}
#: Java offset patterns jointly covering every %z shape the gate admits
_Z_ATTEMPTS = ("XX", "XXX", "XXXXX", "xxxx")
_JAVA_REGEX_SPECIALS = set(".^$*+?()[]{}|\\-&")


class _StrptimePlan(typing.NamedTuple):
    gate: str
    java_patterns: tuple[str, ...]
    directives: frozenset[str]


def strptime_jvm_plan(fmt: str) -> _StrptimePlan | None:
    """Compile a strftime format to (gate regex, Java parse patterns),
    or None when only ``datetime.strptime`` itself can honor it."""
    gate: list[str] = ["^"]
    java: list[str] = []
    directives: set[str] = set()
    has_z = False
    prev_numeric = False
    i = 0
    while i < len(fmt):
        ch = fmt[i]
        if ch == "%" and i + 1 < len(fmt):
            tok = fmt[i : i + 2]
            if tok not in _STRPTIME_GATE:
                return None
            if tok not in ("%z", "%%"):
                # adjacent digit-eating directives ("%Y%m%d") need
                # strptime's regex backtracking — Java's greedy
                # variable-width values can't split the digit run
                if prev_numeric:
                    return None
                prev_numeric = True
            else:
                prev_numeric = False
            gate.append(_STRPTIME_GATE[tok])
            if tok == "%z":
                has_z = True
                java.append("\x00")  # placeholder, expanded below
            else:
                java.append(_STRPTIME_JAVA[tok])
            directives.add(tok)
            i += 2
        elif ch.isspace():
            # TimeRE maps any whitespace run in the format to \s+; the
            # Java side sees input pre-normalized to single spaces
            gate.append(r"\s+")
            java.append(" ")
            prev_numeric = False
            while i < len(fmt) and fmt[i].isspace():
                i += 1
        else:
            if ch.isdigit():
                return None  # digit literal next to digit fields: UDF
            gate.append("\\" + ch if ch in _JAVA_REGEX_SPECIALS else ch)
            java.append("'" + ch + "'" if ch.isalpha() else ch)
            prev_numeric = False
            i += 1
    gate.append(r"\z")
    base = "".join(java)
    patterns = (
        tuple(base.replace("\x00", z) for z in _Z_ATTEMPTS) if has_z else (base,)
    )
    return _StrptimePlan("".join(gate), patterns, frozenset(directives))


def _strptime_timestamp_udf(fmt: str):
    """Cold-path exact parser: Arrow-batched pandas UDF running the real
    datetime.strptime (locale month/day names, %I/%p, 1900-defaults).
    Aware results are converted to UTC instants, matching the pinned-UTC
    session of the JVM path. Values outside pandas' ns range (year >
    2262) are rejected — the one documented divergence."""
    import datetime as _dt
    import re as _re

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("timestamp")
    def parse(s: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return None
            try:
                d = _dt.datetime.strptime(v, fmt)
            except (ValueError, TypeError):
                return None
            except _re.error:
                # broken format (repeated group via a composite locale
                # directive) that slipped past the build-time probe —
                # never crash the worker; the value is unparseable
                return None
            if d.tzinfo is not None:
                d = d.astimezone(_dt.timezone.utc).replace(tzinfo=None)
            try:
                return pd.Timestamp(d)
            except (ValueError, OverflowError):
                return None

        return s.map(one)

    return parse


def _strptime_directives(fmt: str) -> list[str]:
    toks = []
    i = 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            toks.append(fmt[i : i + 2])
            i += 2
        else:
            i += 1
    return toks


def strptime_parse_expr(s: Column, fmt: str, *, need_year: bool = True) -> Column:
    """String column -> timestamp column with datetime.strptime
    acceptance for the given format. JVM-side whenever exactly
    expressible; otherwise the strptime UDF."""
    # datetime.strptime compiles the format to a named-group regex, so
    # a repeated directive raises re.error ("redefinition of group
    # name") on EVERY load in the reference — a broken schema, not a
    # data error. Surface it as a clear error at plan build instead of
    # an analysis exception (Java path) or a worker crash (UDF path);
    # fuzz-found r3.
    toks = [t for t in _strptime_directives(fmt) if t != "%%"]
    dups = sorted({t for t in toks if toks.count(t) > 1})
    if dups:
        raise ValueError(
            f"strptime format {fmt!r} repeats directive {dups[0]!r}; "
            "datetime.strptime raises re.error (redefinition of group "
            "name) for such formats"
        )
    # The literal-dup check above misses composite locale directives:
    # %c/%x/%X expand to OTHER directives' regex groups inside CPython's
    # TimeRE (e.g. %x -> %m/%d/%y in the C locale), so '%x %m' also
    # dies with re.error on every parse. Rather than re-implement the
    # locale expansion, probe the real compiler once at plan build —
    # ValueError just means '' doesn't match (expected); re.error means
    # the format itself is broken (advice r3).
    if {"%c", "%x", "%X"} & set(toks):
        import datetime as _dt
        import re as _re

        try:
            _dt.datetime.strptime("", fmt)
        except _re.error:
            raise ValueError(
                f"strptime format {fmt!r} repeats a directive through a "
                "composite locale directive (%c/%x/%X); datetime.strptime "
                "raises re.error (redefinition of group name) for such "
                "formats"
            ) from None
        except ValueError:
            pass
    plan = strptime_jvm_plan(fmt)
    if plan is None or (need_year and not ({"%Y", "%y"} & plan.directives)):
        return _strptime_timestamp_udf(fmt)(s)
    if {"%Y", "%y"} <= plan.directives:
        # CPython allows both year directives (the LAST one in format
        # order wins); Java's formatter rejects conflicting year
        # fields, so these formats take the exact cold path (fuzz-found
        # r3: '%y/%H.%Y' parses in the reference)
        return _strptime_timestamp_udf(fmt)(s)
    snorm = F.regexp_replace(s, r"\s+", " ")
    parsed = F.coalesce(
        *[F.try_to_timestamp(snorm, F.lit(p)) for p in plan.java_patterns]
    )
    if "%y" in plan.directives and "%Y" not in plan.directives:
        # Java's yy maps to 2000-2099; strptime pivots 69-99 -> 1900s
        parsed = F.when(
            F.year(parsed) >= 2069, parsed - F.expr("INTERVAL 100 YEARS")
        ).otherwise(parsed)
    return F.when(snorm.rlike(plan.gate), parsed)


class DateTime(Field):
    """Parity: src/marshmallow/fields.py:1220-1305 (formats iso / rfc /
    timestamp / timestamp_ms / strftime)."""

    SERIALIZATION_FUNCS = {"iso", "iso8601", "rfc", "rfc822", "timestamp", "timestamp_ms"}
    DEFAULT_FORMAT = "iso"
    OBJ_TYPE = "datetime"

    default_error_messages = {
        "invalid": "Not a valid {obj_type}.",
        "invalid_awareness": "Not a valid {awareness} {obj_type}.",
        "format": '"{input}" cannot be formatted as a {obj_type}.',
    }

    SCHEMA_OPTS_VAR_NAME = "datetimeformat"

    def __init__(self, format: str | None = None, **kwargs):
        super().__init__(**kwargs)
        self._explicit_format = format
        self.format = format or self.DEFAULT_FORMAT

    def bind(self, name, parent):
        """Pull the Meta-level format default when none was given
        (parity: DateTime._bind_to_schema,
        src/marshmallow/fields.py:1274-1280)."""
        super().bind(name, parent)
        if self._explicit_format is None and parent is not None:
            meta_fmt = getattr(
                getattr(parent, "opts", None), self.SCHEMA_OPTS_VAR_NAME, None
            )
            if meta_fmt:
                self.format = meta_fmt

    def spark_type(self):
        return T.TimestampType()

    def _invalid_message(self):
        return self.error_messages["invalid"].format(obj_type=self.OBJ_TYPE)

    #: Shape gate mirroring the reference's _iso8601_datetime_re
    #: (utils.py:121-126): 1-2 digit components allowed, [T ] separator,
    #: minute REQUIRED (a bare date is NOT a datetime), fraction up to
    #: 12 digits (6 kept), optional Z/offset, absolute end (Spark's
    #: parser would otherwise accept date-only and trailing-space
    #: strings the reference rejects).
    ISO_GATE = (
        r"^\d{4}-\d{1,2}-\d{1,2}[T ]\d{1,2}:\d{1,2}"
        r"(:\d{1,2}(\.\d{1,12})?)?(Z|[+-]\d{2}(:?\d{2})?)?\z"
    )

    def load_expr(self, raw):
        fmt = self.format
        s = raw.cast("string")
        if fmt in ("iso", "iso8601"):
            # The gate admits seconds-omitted forms with a tz offset
            # ("2024-01-01T10:00Z") that every parse attempt below
            # rejects — normalize by inserting ":00" after the minute
            # when no seconds group follows (no-op otherwise).
            norm = F.regexp_replace(
                s,
                # (?![:\d]) — not just (?!:) — or the greedy minute
                # backtracks one digit to satisfy the lookahead and
                # mangles seconds-bearing strings.
                r"^(\d{4}-\d{1,2}-\d{1,2}[T ]\d{1,2}:\d{1,2})(?![:\d])",
                r"$1:00",
            )
            return F.when(
                s.rlike(self.ISO_GATE),
                F.coalesce(
                    F.try_to_timestamp(norm),
                    F.try_to_timestamp(norm, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
                    F.try_to_timestamp(norm, F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")),
                ),
            )
        if fmt in ("rfc", "rfc822"):
            # Spark's post-3.0 parser rejects 'EEE' when PARSING (it
            # still formats fine); the day name is redundant anyway, so
            # strip an optional "Dow, " prefix and parse the rest —
            # same acceptance as email.utils.parsedate_to_datetime.
            stripped = F.regexp_replace(s, r"^[A-Za-z]{3},\s*", "")
            return F.coalesce(
                F.try_to_timestamp(stripped, F.lit("dd MMM yyyy HH:mm:ss Z")),
                # named zones ("GMT", "UTC") use the zone-name pattern
                F.try_to_timestamp(stripped, F.lit("dd MMM yyyy HH:mm:ss zzz")),
            )
        if fmt == "timestamp":
            # reference: float(value) with full Python float syntax
            # (underscores, whitespace), then rejects bools, negatives,
            # nan/inf, and anything datetime.fromtimestamp can't hold
            # (>= 253402300800 = year 10000) — utils.from_timestamp,
            # src/marshmallow/utils.py:191-201
            num = _py_float_cast(s)
            ok = (
                num.isNotNull()
                & ~F.isnan(num)
                & (num >= 0)
                & (num < F.lit(253402300800.0))
            )
            return F.when(ok, F.timestamp_seconds(num))
        if fmt == "timestamp_ms":
            # same float parse; fractional milliseconds keep microsecond
            # precision like fromtimestamp(value / 1000) does
            num_ms = _py_float_cast(s)
            ok = (
                num_ms.isNotNull()
                & ~F.isnan(num_ms)
                & (num_ms >= 0)
                & (num_ms < F.lit(253402300800000.0))
            )
            return F.when(
                ok, F.timestamp_micros(F.round(num_ms * 1000).cast("long"))
            )
        return strptime_parse_expr(s, fmt)

    def dump_expr(self, internal):
        fmt = self.format
        if fmt in ("iso", "iso8601"):
            return F.date_format(internal, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
        if fmt in ("rfc", "rfc822"):
            return F.date_format(internal, RFC822_JAVA)
        if fmt == "timestamp":
            return F.unix_timestamp(internal).cast("double") + (
                F.date_format(internal, "SSSSSS").cast("double") / 1e6
            )
        if fmt == "timestamp_ms":
            return F.unix_millis(internal)
        return F.date_format(internal, strftime_to_java(fmt))

    def type_entries(self, raw, loaded, path):
        return [entry(path, raw.isNotNull() & loaded.isNull(), self._invalid_message())]


TZ_OFFSET_PATTERN = r".*(Z|[+-]\d{2}:?\d{2})$"


def _tz_name(tz) -> str:
    """datetime.timezone / ZoneInfo -> a zone id Spark's ZoneId.of
    accepts. str() of a fixed-offset timezone is 'UTC+05:30', of a
    ZoneInfo the IANA name — both valid Spark zone ids."""
    return str(tz)


class NaiveDateTime(DateTime):
    """Rejects tz-aware input strings — or, with ``timezone=``, converts
    them to that zone and drops the offset (parity:
    src/marshmallow/fields.py:1308-1343). Conversions assume the
    engine's pinned UTC session timezone (session.py): internal
    timestamps are UTC wall-times, so 'convert then strip tzinfo' is
    ``from_utc_timestamp``."""

    AWARENESS = "naive"

    def __init__(self, format: str | None = None, *, timezone=None, **kwargs):
        super().__init__(format=format, **kwargs)
        self.timezone = timezone

    def load_expr(self, raw):
        base = super().load_expr(raw)
        if self.timezone is None:
            return base
        aware = raw.cast("string").rlike(TZ_OFFSET_PATTERN)
        return F.when(
            aware, F.from_utc_timestamp(base, _tz_name(self.timezone))
        ).otherwise(base)

    def type_entries(self, raw, loaded, path):
        out = super().type_entries(raw, loaded, path)
        if self.timezone is None:
            aware = raw.isNotNull() & raw.cast("string").rlike(TZ_OFFSET_PATTERN)
            msg = self.error_messages["invalid_awareness"].format(
                awareness=self.AWARENESS, obj_type=self.OBJ_TYPE
            )
            out.append(entry(path, aware, msg))
        return out


class AwareDateTime(DateTime):
    """Requires tz-aware input strings — or, with ``default_timezone=``,
    interprets naive ones in that zone (parity:
    src/marshmallow/fields.py:1346-1380)."""

    AWARENESS = "aware"

    def __init__(
        self, format: str | None = None, *, default_timezone=None, **kwargs
    ):
        super().__init__(format=format, **kwargs)
        self.default_timezone = default_timezone

    def load_expr(self, raw):
        base = super().load_expr(raw)
        if self.default_timezone is None:
            return base
        naive = ~raw.cast("string").rlike(TZ_OFFSET_PATTERN)
        return F.when(
            naive, F.to_utc_timestamp(base, _tz_name(self.default_timezone))
        ).otherwise(base)

    def type_entries(self, raw, loaded, path):
        out = super().type_entries(raw, loaded, path)
        if self.default_timezone is None:
            naive = raw.isNotNull() & ~raw.cast("string").rlike(TZ_OFFSET_PATTERN)
            msg = self.error_messages["invalid_awareness"].format(
                awareness=self.AWARENESS, obj_type=self.OBJ_TYPE
            )
            out.append(entry(path, naive, msg))
        return out


# The reference parses times with its own start-anchored regex
# (utils.py:130-133, from_iso_time :171-188): minute is required,
# fields are greedy 1-2 digit captures, any suffix is allowed
# (re.match, no $), and ranges are enforced by the dt.time
# constructor. TIME_CORE mirrors that regex; range checks live in
# Time.load_expr.
TIME_CORE = r"^(\d{1,2}):(\d{1,2})(?::(\d{1,2})(?:\.(\d{1,6})\d{0,6})?)?"


class Time(Field):
    """Time-of-day; internal = normalized ``HH:MM:SS[.ffffff]`` string
    (Spark has no TIME column type in stable API). Supports ``"iso"``
    or a custom strftime format, pulling ``Meta.timeformat`` at bind
    like the reference (parity: src/marshmallow/fields.py:1383-1405,
    SCHEMA_OPTS_VAR_NAME = "timeformat")."""

    OBJ_TYPE = "time"
    SCHEMA_OPTS_VAR_NAME = "timeformat"
    default_error_messages = {
        "invalid": "Not a valid time.",
        "format": '"{input}" cannot be formatted as a time.',
    }

    def __init__(self, format: str | None = None, **kwargs):
        super().__init__(**kwargs)
        self._explicit_format = format
        self.format = format or "iso"

    def bind(self, name, parent):
        super().bind(name, parent)
        if self._explicit_format is None and parent is not None:
            meta_fmt = getattr(
                getattr(parent, "opts", None), self.SCHEMA_OPTS_VAR_NAME, None
            )
            if meta_fmt:
                self.format = meta_fmt

    @staticmethod
    def _normalized_iso(ts: Column) -> Column:
        """timestamp -> time.isoformat()-style string (micro only when
        non-zero, like dt.time.isoformat())."""
        base = F.date_format(ts, "HH:mm:ss")
        micro = F.date_format(ts, "SSSSSS")
        return F.when(
            micro.cast("int") > 0, F.concat(base, F.lit("."), micro)
        ).otherwise(base)

    def load_expr(self, raw):
        if self.format not in ("iso", "iso8601"):
            # need_year=False: only the time-of-day survives, so
            # Spark's 1970 default vs strptime's 1900 is immaterial
            ts = strptime_parse_expr(
                raw.cast("string"), self.format, need_year=False
            )
            return F.when(ts.isNotNull(), self._normalized_iso(ts))
        s = raw.cast("string")
        h = F.nullif(F.regexp_extract(s, TIME_CORE, 1), F.lit("")).try_cast("int")
        mi = F.nullif(F.regexp_extract(s, TIME_CORE, 2), F.lit("")).try_cast("int")
        sec = F.nullif(F.regexp_extract(s, TIME_CORE, 3), F.lit("")).try_cast("int")
        micro = F.nullif(F.regexp_extract(s, TIME_CORE, 4), F.lit(""))
        ok = (
            h.isNotNull()
            & (h <= 23)
            & (mi <= 59)
            & (F.coalesce(sec, F.lit(0)) <= 59)
        )
        # normalized internal form = dt.time.isoformat() of the parse
        base = F.concat_ws(
            ":",
            F.lpad(h.cast("string"), 2, "0"),
            F.lpad(mi.cast("string"), 2, "0"),
            F.lpad(F.coalesce(sec, F.lit(0)).cast("string"), 2, "0"),
        )
        micro6 = F.rpad(micro, 6, "0")
        iso = F.when(
            micro.isNotNull() & (micro6.cast("int") > 0),
            F.concat(base, F.lit("."), micro6),
        ).otherwise(base)
        return F.when(ok, iso)

    def dump_expr(self, internal):
        if self.format in ("iso", "iso8601"):
            return internal.cast("string")
        ts = F.coalesce(
            F.try_to_timestamp(internal, F.lit("HH:mm:ss.SSSSSS")),
            F.try_to_timestamp(internal, F.lit("HH:mm:ss")),
        )
        return F.date_format(ts, strftime_to_java(self.format))

    def type_entries(self, raw, loaded, path):
        return [entry(path, raw.isNotNull() & loaded.isNull(), self.error_messages["invalid"])]


class Date(DateTime):
    """Parity: src/marshmallow/fields.py:1408-1434."""

    OBJ_TYPE = "date"
    SCHEMA_OPTS_VAR_NAME = "dateformat"
    default_error_messages = {
        "invalid": "Not a valid date.",
        "format": '"{input}" cannot be formatted as a date.',
    }

    def __init__(self, format: str | None = None, **kwargs):
        super().__init__(format=format, **kwargs)

    def spark_type(self):
        return T.DateType()

    def _invalid_message(self):
        return self.error_messages["invalid"]

    #: _iso8601_date_re (utils.py:128): strictly yyyy-M-d, nothing after.
    DATE_GATE = r"^\d{4}-\d{1,2}-\d{1,2}\z"

    def load_expr(self, raw):
        s = raw.cast("string")
        if self.format in ("iso", "iso8601"):
            return F.when(
                s.rlike(self.DATE_GATE), F.try_to_timestamp(s).cast("date")
            )
        return strptime_parse_expr(s, self.format).cast("date")

    def dump_expr(self, internal):
        if self.format in ("iso", "iso8601"):
            return F.date_format(internal, "yyyy-MM-dd")
        return F.date_format(internal, strftime_to_java(self.format))


_TIMEDELTA_FACTORS_US = {
    "weeks": 7 * 24 * 3600 * 10**6,
    "days": 24 * 3600 * 10**6,
    "hours": 3600 * 10**6,
    "minutes": 60 * 10**6,
    "seconds": 10**6,
    "milliseconds": 10**3,
    "microseconds": 1,
}

#: Python timedelta bounds in microseconds (timedelta.min/.max)
_TD_MAX_US_PY = (999999999 * 86400 + 86399) * 10**6 + 999999
_TD_MIN_US_PY = -999999999 * 86400 * 10**6


def _timedelta_unit_bounds(factor_us: int) -> tuple[int, int]:
    """Acceptance bounds for a unit count: the intersection of the
    reference's timedelta range with what an int64-microsecond internal
    value can hold. Counts are bounds-checked BEFORE the factor
    multiply — with ANSI off a long*long overflow silently wraps, which
    would accept garbage durations. Documented divergence: durations
    beyond +-2^63 us (~292471 years, the same ceiling as Spark's own
    DayTimeIntervalType) are rejected where Python's 2.7M-year
    timedelta still accepts them."""
    max_us = min(_TD_MAX_US_PY, 2**63 - 1)
    min_us = max(_TD_MIN_US_PY, -(2**63))
    return -((-min_us) // factor_us), max_us // factor_us


class TimeDelta(Field):
    """Integer count at unit ``precision`` <-> duration (parity:
    src/marshmallow/fields.py:1437-1538). Internal representation:
    LongType microseconds."""

    default_error_messages = {
        "invalid": "Not a valid period of time.",
        "format": "{input!r} cannot be formatted as a timedelta.",
    }

    def __init__(
        self,
        precision: str = "seconds",
        serialization_type: type = int,
        **kwargs,
    ):
        precision = precision.lower()
        if precision not in _TIMEDELTA_FACTORS_US:
            units = ", ".join(_TIMEDELTA_FACTORS_US)
            raise ValueError(f'The precision must be one of: {units}.')
        if serialization_type not in (int, float):
            raise ValueError("The serialization type must be one of int or float")
        self.precision = precision
        self.serialization_type = serialization_type
        super().__init__(**kwargs)

    def spark_type(self):
        return T.LongType()

    def load_expr(self, raw):
        if self.serialization_type is int:
            # Reference does int(value) (src/marshmallow/fields.py:
            # 1527-1530): string input must be an integral literal
            # ("1.5" raises); float input truncates toward zero.
            if isinstance(
                self.source_type, (T.DoubleType, T.FloatType, T.DecimalType)
            ):
                num = raw.try_cast("long")  # double->long truncates
            else:
                # int(str): integral literal; Python strips surrounding
                # whitespace and allows underscore grouping
                trimmed = _ws_trim(raw.cast("string"))
                num = F.when(
                    trimmed.rlike(r"^[+-]?\d+(_\d+)*\z"),
                    _numeric_cleaned(trimmed).try_cast("long"),
                )
        else:
            num = _numeric_cleaned(raw.cast("string")).try_cast("double")
        factor = _TIMEDELTA_FACTORS_US[self.precision]
        if self.serialization_type is int:
            lo, hi = _timedelta_unit_bounds(factor)
            num = F.when((num >= F.lit(lo)) & (num <= F.lit(hi)), num)
            return (num * factor).cast("long")
        # float path: double arithmetic saturates instead of wrapping,
        # so the try_cast rejects out-of-range results
        return (num * factor).try_cast("long")

    def dump_expr(self, internal):
        factor = _TIMEDELTA_FACTORS_US[self.precision]
        if self.serialization_type is int:
            # reference floor-divides microseconds (fields.py:1514-1519)
            # — floor, not truncate-toward-zero, matters for negatives
            return F.floor(internal / F.lit(factor)).cast("long")
        return internal.cast("double") / F.lit(float(factor))

    def type_entries(self, raw, loaded, path):
        return [entry(path, raw.isNotNull() & loaded.isNull(), self.error_messages["invalid"])]


class List(Field):
    """Array of an inner field; per-element violations keyed by index
    ("field.idx"), matching the reference's per-index error dicts
    (src/marshmallow/fields.py:736-799; tests/test_schema.py:139-151)."""

    default_error_messages = {"invalid": "Not a valid list."}

    def __init__(self, cls_or_instance: "Field | type", **kwargs):
        super().__init__(**kwargs)
        self.inner = cls_or_instance() if isinstance(cls_or_instance, type) else cls_or_instance

    def spark_type(self):
        return T.ArrayType(self.inner.spark_type())

    def load_expr(self, raw):
        return F.transform(raw, lambda x: self.inner.load_expr(x))

    def dump_expr(self, internal):
        return F.transform(internal, lambda x: self.inner.dump_expr(x))

    def length_expr(self, loaded):
        return F.size(loaded)

    def type_entries(self, raw, loaded, path):
        # per-element conformance: emit one entry per violating index;
        # a NULL element is "Field may not be null." (unless the inner
        # field allows none), like the reference's per-index
        # _validate_missing (fields.py:311-318 under List)
        inner = self.inner

        def elem_entries(x, i):
            lx = inner.load_expr(x)
            sub = inner.type_entries(x, lx, "")  # path filled below
            # merge sub-entries for the element into one struct w/ index
            conds = [F.size(F.coalesce(e, F.array())) > 0 for e in sub]
            anybad = F.lit(False)
            for c in conds:
                anybad = anybad | c
            fieldname = F.concat(F.lit(path + "."), i.cast("string"))
            e = F.when(
                anybad,
                F.struct(
                    fieldname.alias("field"),
                    F.lit(inner._invalid_message()).alias("message"),
                ),
            )
            if not inner.allow_none:
                e = F.when(
                    x.isNull(),
                    F.struct(
                        fieldname.alias("field"),
                        F.lit(inner.error_messages["null"]).alias("message"),
                    ),
                ).otherwise(e)
            return e

        arr = F.filter(
            # transform's (x, i) lambda — NOT zip_with against a
            # sequence(0, size-1), which on an EMPTY array descends
            # [0, -1] and pads phantom NULL elements
            F.transform(raw, lambda x, i: elem_entries(x, i)),
            lambda s: s.isNotNull(),
        )
        return [F.when(raw.isNotNull() & (F.size(arr) > 0), arr)]

    def load_expr_kinded(self, raw, kind):
        # kind is struct<vk: whole-value kind, ek: per-element kinds>
        inner = self.inner
        ek = kind["ek"]
        return F.transform(
            raw,
            lambda x, i: inner.load_expr_kinded(
                x, F.try_element_at(ek, (i + 1).cast("int"))
            ),
        )

    def type_entries_kinded(self, raw, loaded, path, kind):
        """Per-element JSON token kinds: the inner field's kinded
        entries decide validity of element i from kind["ek"][i] (the
        whole-value kind kind["vk"] is handled by Schema._field_checks:
        list-vs-scalar mismatch)."""
        inner = self.inner
        ekinds = kind["ek"]

        def elem_entries(x, i):
            k = F.try_element_at(ekinds, (i + 1).cast("int"))
            lx = inner.load_expr_kinded(x, k)
            sub = inner.type_entries_kinded(x, lx, "", k)
            # pick the FIRST firing sub-entry's message so per-element
            # diagnostics keep the inner field's own wording (e.g.
            # "Number too large." vs "Not a valid integer.")
            structs = F.flatten(
                F.array_compact(F.array(*[F.coalesce(e, F.array()) for e in sub]))
            )
            fieldname = F.concat(F.lit(path + "."), i.cast("string"))
            e = F.when(
                F.size(structs) > 0,
                F.struct(
                    fieldname.alias("field"),
                    F.element_at(structs, 1)["message"].alias("message"),
                ),
            )
            if not inner.allow_none:
                e = F.when(
                    x.isNull() & (k == F.lit("VOID")),
                    F.struct(
                        fieldname.alias("field"),
                        F.lit(inner.error_messages["null"]).alias("message"),
                    ),
                ).otherwise(e)
            return e

        arr = F.filter(
            F.transform(raw, lambda x, i: elem_entries(x, i)),
            lambda s: s.isNotNull(),
        )
        return [F.when(raw.isNotNull() & (F.size(arr) > 0), arr)]


class Tuple(Field):
    """Fixed-arity heterogeneous positions over an array or struct
    column (parity: src/marshmallow/fields.py:802-883)."""

    default_error_messages = {"invalid": "Not a valid tuple."}

    def __init__(self, tuple_fields, **kwargs):
        super().__init__(**kwargs)
        self.tuple_fields = [
            f() if isinstance(f, type) else f for f in tuple_fields
        ]

    def spark_type(self):
        return T.StructType(
            [
                T.StructField(f"_{i + 1}", f.spark_type())
                for i, f in enumerate(self.tuple_fields)
            ]
        )

    def external_parse_type(self):
        # a tuple's EXTERNAL (JSON) form is an array; the internal form
        # is the positional struct above
        return T.ArrayType(T.StringType())

    def load_expr(self, raw):
        # raw: array column -> struct of typed positions
        return F.struct(
            *[
                f.load_expr(F.try_element_at(raw, F.lit(i + 1))).alias(f"_{i + 1}")
                for i, f in enumerate(self.tuple_fields)
            ]
        )

    def _arity_message(self) -> str:
        # parity: the reference validates arity with Length(equal=n)
        # (src/marshmallow/fields.py:815-821) -> "Length must be {n}."
        return f"Length must be {len(self.tuple_fields)}."

    def type_entries(self, raw, loaded, path):
        n = len(self.tuple_fields)
        out = [
            entry(
                path,
                raw.isNotNull() & (F.size(raw) != F.lit(n)),
                self._arity_message(),
            )
        ]
        for i, f in enumerate(self.tuple_fields):
            x = F.try_element_at(raw, F.lit(i + 1))
            lx = f.load_expr(x)
            out.extend(f.type_entries(x, lx, f"{path}.{i}"))
        return out

    @staticmethod
    def _pos_kind(ek, i, f):
        if not isinstance(f, (String, Integer, Boolean)):
            return None
        return F.try_element_at(ek, F.lit(i + 1))

    def load_expr_kinded(self, raw, kind):
        # kind is struct<vk, ek> like List's (loads path)
        ek = kind["ek"]
        cols = []
        for i, f in enumerate(self.tuple_fields):
            x = F.try_element_at(raw, F.lit(i + 1))
            k = self._pos_kind(ek, i, f)
            loaded = f.load_expr_kinded(x, k) if k is not None else f.load_expr(x)
            cols.append(loaded.alias(f"_{i + 1}"))
        return F.struct(*cols)

    def type_entries_kinded(self, raw, loaded, path, kind):
        ek = kind["ek"]
        n = len(self.tuple_fields)
        out = [
            entry(
                path,
                raw.isNotNull() & (F.size(raw) != F.lit(n)),
                self._arity_message(),
            )
        ]
        for i, f in enumerate(self.tuple_fields):
            x = F.try_element_at(raw, F.lit(i + 1))
            k = self._pos_kind(ek, i, f)
            lx = f.load_expr_kinded(x, k) if k is not None else f.load_expr(x)
            sub = (
                f.type_entries_kinded(x, lx, f"{path}.{i}", k)
                if k is not None
                else f.type_entries(x, lx, f"{path}.{i}")
            )
            out.extend(sub)
        return out


class Mapping(Field):
    """Map of key field -> value field; per-key violations keyed
    "field.key" (parity: src/marshmallow/fields.py:1541-1687)."""

    default_error_messages = {"invalid": "Not a valid mapping type."}

    def __init__(self, keys=None, values=None, **kwargs):
        super().__init__(**kwargs)
        self.key_field = (keys() if isinstance(keys, type) else keys) or Raw()
        self.value_field = (values() if isinstance(values, type) else values) or Raw()

    def spark_type(self):
        return T.MapType(self.key_field.spark_type(), self.value_field.spark_type())

    def load_expr(self, raw):
        return F.transform_values(raw, lambda k, v: self.value_field.load_expr(v))

    def length_expr(self, loaded):
        return F.size(loaded)

    @staticmethod
    def _key_segment(k):
        """Map-key path segment. Keys that would corrupt the dotted path
        (digit-only — the tree builder int-coerces positional indices —
        or containing '.'/ESC) are sentinel-wrapped with '.'→ESC+'D',
        ESC→ESC+'E'; errors.violations_to_message_tree restores the
        original string key. Plain keys stay human-readable."""
        s = k.cast("string")
        esc = F.regexp_replace(
            F.regexp_replace(s, "\x1b", "\x1bE"), r"\.", "\x1bD"
        )
        needs = s.rlike(r"^\d+$") | s.contains(".") | s.contains("\x1b")
        return F.when(
            needs, F.concat(F.lit("\x1b"), esc, F.lit("\x1b"))
        ).otherwise(s)

    def type_entries(self, raw, loaded, path):
        kf, vf = self.key_field, self.value_field

        def bad_value(k, v):
            lv = vf.load_expr(v)
            return v.isNotNull() & lv.isNull()

        badkeys = F.map_keys(F.map_filter(raw, bad_value))
        arr = F.transform(
            badkeys,
            lambda k: F.struct(
                F.concat(F.lit(path + "."), self._key_segment(k), F.lit(".value")).alias("field"),
                F.lit(vf._invalid_message()).alias("message"),
            ),
        )
        out = [F.when(raw.isNotNull() & (F.size(arr) > 0), arr)]
        if not vf.allow_none:
            # NULL values: "Field may not be null." per key (parity:
            # per-value _validate_missing under Mapping)
            nullkeys = F.map_keys(
                F.map_filter(raw, lambda k, v: v.isNull())
            )
            narr = F.transform(
                nullkeys,
                lambda k: F.struct(
                    F.concat(
                        F.lit(path + "."), self._key_segment(k), F.lit(".value")
                    ).alias("field"),
                    F.lit(vf.error_messages["null"]).alias("message"),
                ),
            )
            out.append(F.when(raw.isNotNull() & (F.size(narr) > 0), narr))
        if not isinstance(kf, Raw):
            # key conformance: errors keyed "<path>.<key>.key"
            # (parity: {key: {"key": [...]}}, src/marshmallow/fields.py:1604-1626)
            def bad_key(k, v):
                lk = kf.load_expr(k)
                return k.isNotNull() & lk.isNull()

            badk = F.map_keys(F.map_filter(raw, bad_key))
            karr = F.transform(
                badk,
                lambda k: F.struct(
                    F.concat(
                        F.lit(path + "."), self._key_segment(k), F.lit(".key")
                    ).alias("field"),
                    F.lit(kf._invalid_message()).alias("message"),
                ),
            )
            out.append(F.when(raw.isNotNull() & (F.size(karr) > 0), karr))
        return out

    def load_expr_kinded(self, raw, kind):
        # kind is struct<vk: whole-value kind, mk: per-key value kinds>
        mk = kind["mk"]
        vf = self.value_field
        return F.transform_values(
            raw,
            lambda k, v: vf.load_expr_kinded(
                v, F.try_element_at(mk, k.cast("string"))
            ),
        )

    def type_entries_kinded(self, raw, loaded, path, kind):
        """Per-value JSON token kinds: each value's validity (and
        message) comes from the value field's kinded entries under that
        value's original token kind — so a float token through
        Dict(values=Integer()) truncates like the reference's
        int(float) instead of failing as a stringified decimal. The
        whole-value kind kind["vk"] (mapping-vs-scalar) is handled by
        Schema._field_checks."""
        kf, vf = self.key_field, self.value_field
        mk = kind["mk"]

        def entry_for(ent):
            k, v = ent["key"], ent["value"]
            kv = F.try_element_at(mk, k.cast("string"))
            lv = vf.load_expr_kinded(v, kv)
            sub = vf.type_entries_kinded(v, lv, "", kv)
            structs = F.flatten(
                F.array_compact(F.array(*[F.coalesce(e, F.array()) for e in sub]))
            )
            fieldname = F.concat(
                F.lit(path + "."), self._key_segment(k), F.lit(".value")
            )
            e = F.when(
                F.size(structs) > 0,
                F.struct(
                    fieldname.alias("field"),
                    F.element_at(structs, 1)["message"].alias("message"),
                ),
            )
            if not vf.allow_none:
                e = F.when(
                    v.isNull() & (kv == F.lit("VOID")),
                    F.struct(
                        fieldname.alias("field"),
                        F.lit(vf.error_messages["null"]).alias("message"),
                    ),
                ).otherwise(e)
            return e

        arr = F.filter(
            F.transform(F.map_entries(raw), entry_for), lambda s: s.isNotNull()
        )
        out = [F.when(raw.isNotNull() & (F.size(arr) > 0), arr)]
        if not isinstance(kf, Raw):
            # JSON object keys are always string tokens; key conformance
            # is kind-independent
            def bad_key(k, v):
                lk = kf.load_expr(k)
                return k.isNotNull() & lk.isNull()

            badk = F.map_keys(F.map_filter(raw, bad_key))
            karr = F.transform(
                badk,
                lambda k: F.struct(
                    F.concat(
                        F.lit(path + "."), self._key_segment(k), F.lit(".key")
                    ).alias("field"),
                    F.lit(kf._invalid_message()).alias("message"),
                ),
            )
            out.append(F.when(raw.isNotNull() & (F.size(karr) > 0), karr))
        return out


class Dict(Mapping):
    """Alias (parity: src/marshmallow/fields.py:1683-1687)."""


class Nested(Field):
    """Sub-schema on a StructType column; violation paths are dotted
    (parity: src/marshmallow/fields.py:490-675). ``only``/``exclude``
    propagate to the child like the reference's normalized nested opts."""

    default_error_messages = {"type": "Invalid type."}

    def __init__(
        self,
        nested,
        *,
        only=None,
        exclude=(),
        many: bool = False,
        unknown: str | None = None,
        max_depth: int | None = None,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self._nested_arg = nested
        self.only = only
        self.exclude = exclude
        self.many = many
        #: Nested("self") unroll depth: the reference recurses
        #: dynamically per datum (src/marshmallow/fields.py:596-607); a
        #: columnar plan compiles one concrete StructType, so "self" is
        #: unrolled max_depth levels at schema build
        #: (Schema._init_fields) and data below the horizon is ignored.
        self.max_depth = max_depth
        #: unknown-policy override for the child schema (parity:
        #: src/marshmallow/fields.py:529; in columnar input a struct's
        #: field set is closed, so this matters for the child's own
        #: loads/validate surfaces, not per-row keys)
        self.unknown = unknown
        self._schema_cache = None

    @property
    def schema(self):
        """Resolve + cache the child schema (parity: instance cache,
        src/marshmallow/fields.py:574-632; string names via the class
        registry, src/marshmallow/class_registry.py:72-94)."""
        if self._schema_cache is None:
            from .schema import Schema, class_registry

            nested = self._nested_arg
            if callable(nested) and not isinstance(nested, type):
                nested = nested()
            if isinstance(nested, str):
                if nested == "self":
                    # reference resolves "self" to the parent schema
                    # (deprecated there since 3.3, fields.py:596-607).
                    # Inside a Schema this is unrolled to max_depth at
                    # field binding (Schema._init_fields) and this
                    # branch is never reached; reaching it means the
                    # field is used standalone or without a depth.
                    raise ValueError(
                        'Nested("self") resolves only inside a Schema '
                        "and needs an explicit unroll depth: declare "
                        'it as Nested("self", max_depth=N). A '
                        "columnar engine compiles a concrete Spark "
                        "StructType, so the recursion is unrolled N "
                        "levels and deeper data is ignored."
                    )
                nested = class_registry.get_class(nested)
            if isinstance(nested, type) and issubclass(nested, Schema):
                nested = nested(
                    only=self.only, exclude=self.exclude, unknown=self.unknown
                )
            elif isinstance(nested, Schema) and (self.only or self.exclude):
                nested = type(nested)(only=self.only, exclude=self.exclude)
            self._schema_cache = nested
        return self._schema_cache

    def spark_type(self):
        return (
            T.ArrayType(self.schema.spark_struct_type())
            if self.many
            else self.schema.spark_struct_type()
        )

    def load_expr(self, raw):
        sch = self.schema
        if self.many:
            return F.transform(raw, lambda x: sch.struct_load_expr(x))
        return sch.struct_load_expr(raw)

    def dump_expr(self, internal):
        sch = self.schema
        if self.many:
            return F.transform(internal, lambda x: sch.struct_dump_expr(x))
        return sch.struct_dump_expr(internal)

    def load_expr_kinded(self, raw, kind):
        # kind is struct<vk, mk: per-subfield token kinds> (loads path)
        if self.many or kind is None:
            return self.load_expr(raw)
        return self.schema.struct_load_expr(raw, kinds=kind["mk"])

    def type_entries_kinded(self, raw, loaded, path, kind):
        if self.many or kind is None:
            return self.type_entries(raw, loaded, path)
        return self.type_entries(raw, loaded, path, kinds=kind["mk"])

    def type_entries(self, raw, loaded, path, present=None, kinds=None):
        sch = self.schema
        if self.many:
            out = []
            # per-element nested violations with .idx path: summarized
            # per element (detailed per-field requires explode; the
            # dataset-level API exposes that via validate_exploded)
            def elem(x, i):
                anybad = sch.struct_violation_cond(x)
                return F.when(
                    anybad,
                    F.struct(
                        F.concat(F.lit(path + "."), i.cast("string")).alias("field"),
                        F.lit("Invalid value.").alias("message"),
                    ),
                )

            arr = F.filter(
                F.transform(raw, elem),
                lambda s: s.isNotNull(),
            )
            out.append(F.when(raw.isNotNull() & (F.size(arr) > 0), arr))
            return out
        return sch.struct_entries(raw, path, present=present, kinds=kinds)


class Pluck(Nested):
    """Nested-then-project-one-key (parity:
    src/marshmallow/fields.py:678-733)."""

    def __init__(self, nested, field_name: str, **kwargs):
        super().__init__(nested, only=(field_name,), **kwargs)
        self.field_name = field_name

    def spark_type(self):
        inner = self.schema.fields[self.field_name].spark_type()
        return T.ArrayType(inner) if self.many else inner

    def load_expr(self, raw):
        f = self.schema.fields[self.field_name]
        if self.many:
            return F.transform(raw, lambda x: f.load_expr(x[self.field_name]))
        return f.load_expr(raw[self.field_name])

    def dump_expr(self, internal):
        f = self.schema.fields[self.field_name]
        return f.dump_expr(internal)

    def type_entries(self, raw, loaded, path):
        return []


class Url(String):
    """String + URL validator prepended (parity:
    src/marshmallow/fields.py:1690-1726, validator insert :1722-1725)."""

    default_error_messages = {"invalid": "Not a valid URL."}

    def __init__(self, *, relative=False, absolute=True, schemes=None,
                 require_tld=True, **kwargs):
        super().__init__(**kwargs)
        self.validators.insert(
            0,
            _validate.URL(
                relative=relative,
                absolute=absolute,
                schemes=schemes,
                require_tld=require_tld,
                error=self.error_messages["invalid"],
            ),
        )


class Email(String):
    """Parity: src/marshmallow/fields.py:1729-1743. ``strict_idna``
    swaps the unicode-domain regex approximation for the reference's
    exact IDNA fallback in a pandas UDF (audit mode, not hot path)."""

    default_error_messages = {"invalid": "Not a valid email address."}

    def __init__(self, *, strict_idna: bool = False, **kwargs):
        super().__init__(**kwargs)
        self.validators.insert(
            0,
            _validate.Email(
                error=self.error_messages["invalid"], strict_idna=strict_idna
            ),
        )


IPV4_PATTERN = (
    r"^(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)"
    r"(\.(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)){3}$"
)
_V4_CORE = IPV4_PATTERN[1:-1]
IPV6_PATTERN = (
    r"^("
    r"([0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}"
    r"|([0-9A-Fa-f]{1,4}:){1,7}:"
    r"|([0-9A-Fa-f]{1,4}:){1,6}:[0-9A-Fa-f]{1,4}"
    r"|([0-9A-Fa-f]{1,4}:){1,5}(:[0-9A-Fa-f]{1,4}){1,2}"
    r"|([0-9A-Fa-f]{1,4}:){1,4}(:[0-9A-Fa-f]{1,4}){1,3}"
    r"|([0-9A-Fa-f]{1,4}:){1,3}(:[0-9A-Fa-f]{1,4}){1,4}"
    r"|([0-9A-Fa-f]{1,4}:){1,2}(:[0-9A-Fa-f]{1,4}){1,5}"
    r"|[0-9A-Fa-f]{1,4}:((:[0-9A-Fa-f]{1,4}){1,6})"
    r"|:((:[0-9A-Fa-f]{1,4}){1,7}|:)"
    # IPv4-mapped / mixed notation ("::ffff:1.2.3.4", "64:ff9b::1.2.3.4")
    rf"|([0-9A-Fa-f]{{1,4}}:){{6}}(?:{_V4_CORE})"
    rf"|([0-9A-Fa-f]{{1,4}}:){{1,5}}:(?:{_V4_CORE})"
    rf"|::([0-9A-Fa-f]{{1,4}}:){{0,5}}(?:{_V4_CORE})"
    rf"|([0-9A-Fa-f]{{1,4}}:){{1,4}}(:[0-9A-Fa-f]{{1,4}}){{1,3}}:(?:{_V4_CORE})"
    r")$"
)


# ipaddress accepts a scoped IPv6 zone suffix since Python 3.9:
# "fe80::1%eth0" — one %, non-empty zone, any chars but %.
V6_ZONE = r"(%[^%]+)?"


class IP(String):
    """Parity: src/marshmallow/fields.py:1746-1786."""

    default_error_messages = {"invalid_ip": "Not a valid IP address."}
    PATTERN = f"(?:{IPV4_PATTERN[1:-1]})|(?:(?:{IPV6_PATTERN[1:-1]}){V6_ZONE})"

    def __init__(self, *, exploded: bool = False, **kwargs):
        super().__init__(**kwargs)
        self.exploded = exploded

    def type_entries(self, raw, loaded, path):
        # loaded NULL (non-string source) must flag, not NULL-propagate.
        bad = raw.isNotNull() & (
            loaded.isNull() | ~loaded.rlike(f"^(?:{self.PATTERN})\\z")
        )
        return [entry(path, bad, self.error_messages["invalid_ip"])]


class IPv4(IP):
    default_error_messages = {"invalid_ip": "Not a valid IPv4 address."}
    PATTERN = IPV4_PATTERN[1:-1]


class IPv6(IP):
    default_error_messages = {"invalid_ip": "Not a valid IPv6 address."}
    PATTERN = f"(?:{IPV6_PATTERN[1:-1]}){V6_ZONE}"


def _v4_masks() -> str:
    """The 33 valid IPv4 netmasks + their hostmask complements —
    everything ipaddress.IPv4Interface accepts after the slash besides
    a bare prefix length."""
    import ipaddress as _ip

    masks = []
    for p in range(33):
        net = _ip.IPv4Network(f"0.0.0.0/{p}")
        masks.append(str(net.netmask))
        masks.append(str(net.hostmask))
    return "|".join(re.escape(m) for m in sorted(set(masks)))


V4_PREFIX = r"(3[0-2]|[12]?\d)"
V6_PREFIX = r"(12[0-8]|1[01]\d|\d{1,2})"


class IPInterface(String):
    """Address + optional /prefix or /netmask (parity:
    src/marshmallow/fields.py:1805-1844, ipaddress.ip_interface
    acceptance)."""

    default_error_messages = {"invalid_ip_interface": "Not a valid IP interface."}

    V4 = f"(?:{IPV4_PATTERN[1:-1]})(?:/(?:{V4_PREFIX}|__MASKS__))?"
    # zone must be slash-free inside an interface (the /prefix follows)
    V6 = f"(?:{IPV6_PATTERN[1:-1]})(%[^%/]+)?(?:/{V6_PREFIX})?"

    def __init__(self, *, exploded: bool = False, **kwargs):
        super().__init__(**kwargs)
        self.exploded = exploded

    def _pattern(self) -> str:
        masks = _v4_masks()
        return f"^(?:{self.V4.replace('__MASKS__', masks)}|{self.V6})\\z"

    def type_entries(self, raw, loaded, path):
        # loaded NULL (non-string source) must flag, not NULL-propagate.
        bad = raw.isNotNull() & (loaded.isNull() | ~loaded.rlike(self._pattern()))
        return [entry(path, bad, self.error_messages["invalid_ip_interface"])]


class IPv4Interface(IPInterface):
    default_error_messages = {"invalid_ip_interface": "Not a valid IPv4 interface."}

    def _pattern(self) -> str:
        return f"^(?:{self.V4.replace('__MASKS__', _v4_masks())})\\z"


class IPv6Interface(IPInterface):
    default_error_messages = {"invalid_ip_interface": "Not a valid IPv6 interface."}

    def _pattern(self) -> str:
        return f"^(?:{self.V6})\\z"


class Enum(Field):
    """Member-of-enum by name or value (parity:
    src/marshmallow/fields.py:1863-1933).

    ``by_value`` may be False (lookup by NAME through String semantics:
    a non-string input is "Not a valid string."), True (lookup by raw
    VALUE with Python equality: numeric/boolean sources compare by
    value against int choices, but a string "1" never equals 1), or a
    Field class/instance (the reference's typed form: input first
    deserializes through that field — Integer coerces "1" -> 1 — then
    looks up)."""

    default_error_messages = {"unknown": "Must be one of: {choices}."}

    def __init__(self, enum, *, by_value=False, **kwargs):
        super().__init__(**kwargs)
        self.enum = enum
        self.by_value = bool(by_value)
        if by_value:
            self.choices = [m.value for m in enum]
            if isinstance(by_value, bool):
                self.value_field: Field | None = None  # raw equality
            else:
                self.value_field = by_value() if isinstance(by_value, type) else by_value
        else:
            self.choices = [m.name for m in enum]
            self.value_field = String()

    def spark_type(self):
        if self.by_value and all(
            isinstance(c, int) and not isinstance(c, bool) for c in self.choices
        ):
            return T.LongType()
        return T.StringType()

    def _loaded(self, raw, kind=None):
        vf = self.value_field
        if vf is not None:
            vf.source_type = self.source_type
            return vf.load_expr_kinded(raw, kind) if kind is not None else vf.load_expr(raw)
        if kind is not None:
            # by_value=True under JSON loads: the TOKEN type drives the
            # raw Python equality (1 and 2.0 and true all equal int
            # choices by value; the string "1" never does)
            if isinstance(self.spark_type(), T.LongType):
                num = raw.try_cast("double")
                as_long = F.when(num == F.floor(num), num.try_cast("long"))
                bool_long = (
                    F.when(raw == F.lit("true"), F.lit(1).cast("long"))
                    .when(raw == F.lit("false"), F.lit(0).cast("long"))
                )
                return (
                    F.when(kind == F.lit("BOOLEAN"), bool_long)
                    .when(kind.rlike("^(BIGINT|DOUBLE|DECIMAL|FLOAT)"), as_long)
                )
            return F.when(kind == F.lit("STRING"), raw.cast("string"))
        # by_value=True: raw Python equality. Numeric + boolean sources
        # compare by value against int choices (2.0 == 2, True == 1);
        # string sources never coerce ("1" != 1). For string choices
        # the inverse holds.
        target = self.spark_type()
        src = self.source_type
        if isinstance(target, T.LongType):
            if isinstance(src, T.StringType):
                return F.lit(None).cast("long")
            if isinstance(src, (T.DoubleType, T.FloatType, T.DecimalType)):
                # equality only for integral values (2.0 -> 2; 2.5 never)
                t = raw.try_cast("long")
                return F.when(t.cast(src) == raw, t)
            return raw.try_cast("long")
        if isinstance(src, T.StringType) or src is None:
            return raw.cast("string")
        return F.lit(None).cast("string")  # non-string value vs string choices

    def load_expr(self, raw):
        return self._loaded(raw)

    def load_expr_kinded(self, raw, kind):
        return self._loaded(raw, kind)

    def _membership_entries(self, raw, loaded, path, type_sub):
        choices_text = ", ".join(str(c) for c in self.choices)
        msg = self.error_messages["unknown"].format(choices=choices_text)
        if self.value_field is not None:
            # typed form: the inner field's own invalid-type entries
            # fire first (reference deserializes before lookup); the
            # membership check covers successfully-typed values
            out = list(type_sub)
            out.append(
                entry(path, loaded.isNotNull() & ~loaded.isin(*self.choices), msg)
            )
            return out
        # raw-equality form: every non-member (including type-mismatched
        # NULL loads) is "Must be one of: ..."
        return [
            entry(
                path,
                raw.isNotNull()
                & ~F.coalesce(loaded.isin(*self.choices), F.lit(False)),
                msg,
            )
        ]

    def type_entries(self, raw, loaded, path):
        vf = self.value_field
        sub = vf.type_entries(raw, loaded, path) if vf is not None else []
        return self._membership_entries(raw, loaded, path, sub)

    def type_entries_kinded(self, raw, loaded, path, kind):
        vf = self.value_field
        sub = (
            vf.type_entries_kinded(raw, loaded, path, kind)
            if vf is not None
            else []
        )
        return self._membership_entries(raw, loaded, path, sub)


class Function(Field):
    """Computed field from user-supplied Column-factory callables
    (parity: src/marshmallow/fields.py:1998-2058). ``serialize`` /
    ``deserialize`` take a Column (or the whole row for serialize via
    ``F.struct('*')``) and return a Column — vectorized, never per-row."""

    def __init__(self, serialize=None, deserialize=None, **kwargs):
        kwargs.setdefault("dump_only", serialize is not None and deserialize is None)
        super().__init__(**kwargs)
        self._serialize_fn = serialize
        self._deserialize_fn = deserialize

    def load_expr(self, raw):
        return self._deserialize_fn(raw) if self._deserialize_fn else raw

    def dump_expr(self, internal):
        return self._serialize_fn(internal) if self._serialize_fn else internal

    def type_entries(self, raw, loaded, path):
        return []


class Method(Field):
    """Schema-method computed field (parity:
    src/marshmallow/fields.py:1936-1995): the named methods on the
    Schema receive a Column and return a Column."""

    def __init__(self, serialize: str | None = None, deserialize: str | None = None, **kwargs):
        kwargs.setdefault("dump_only", serialize is not None and deserialize is None)
        super().__init__(**kwargs)
        self._serialize_name = serialize
        self._deserialize_name = deserialize

    def load_expr(self, raw):
        if self._deserialize_name and self.parent is not None:
            return getattr(self.parent, self._deserialize_name)(raw)
        return raw

    def dump_expr(self, internal):
        if self._serialize_name and self.parent is not None:
            return getattr(self.parent, self._serialize_name)(internal)
        return internal

    def type_entries(self, raw, loaded, path):
        return []


class Constant(Field):
    """Always emit a constant (parity: src/marshmallow/fields.py:2061-2083)."""

    def __init__(self, constant, **kwargs):
        super().__init__(**kwargs)
        self.constant = constant
        self.load_default = constant
        self.dump_default = constant

    def load_expr(self, raw):
        return F.lit(self.constant)

    def dump_expr(self, internal):
        return F.lit(self.constant)

    def type_entries(self, raw, loaded, path):
        return []


# Aliases (parity: src/marshmallow/fields.py:2114-2118)
Str = String
Int = Integer
Bool = Boolean
URL = Url


class Inferred(Field):
    """Placeholder for Meta.fields/additional entries with no declared
    Field: the concrete field class is picked from the COLUMN's Spark
    type at plan time via ``Schema.TYPE_MAPPING`` (parity:
    src/marshmallow/fields.py:2086-2111, where the pick keys off the
    runtime value type; a column's dtype is the columnar analogue).
    Falls back to Raw for unmapped types."""

    def resolve(self, dtype: T.DataType, schema) -> "Field":
        mapping = getattr(type(schema), "TYPE_MAPPING", {})
        field_cls = mapping.get(type(dtype), Raw)
        f = field_cls()
        # carry the declaration-surface knobs over
        f.required = self.required
        f.allow_none = self.allow_none
        f.load_default = self.load_default
        f.dump_default = self.dump_default
        f.data_key = self.data_key
        f.attribute = self.attribute
        f.validators = list(self.validators)
        f.load_only = self.load_only
        f.dump_only = self.dump_only
        return f
