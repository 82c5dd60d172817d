"""Validator library: row-level predicates compiled to Spark Column expressions.

Parity targets (messages are verbatim; semantics mirrored, code is new):
/root/reference/src/marshmallow/validate.py — And(:43), URL(:93),
Email(:223), Range(:283), Length(:360), Equal(:426), Regexp(:453),
Predicate(:501), NoneOf(:535), OneOf(:566), ContainsOnly(:627),
ContainsNoneOf(:657).

Each validator exposes

    violation_cond(col: Column) -> Column   # boolean, True => violation

plus ``.message`` — a *driver-formatted literal string* (all the
reference's ``{min}``/``{choices}`` interpolations are constant per
validator instance, so interpolation happens once at compile time and
the executor-side expression is a pure codegen-friendly predicate with a
literal message). None of this touches Python at row scope.
"""

from __future__ import annotations

import re
import typing

from pyspark.sql import Column
from pyspark.sql import functions as F


class Validator:
    """Abstract base validator (parity: src/marshmallow/validate.py:24-40)."""

    default_message = "Invalid value."

    def __init__(self, *, error: str | None = None):
        self.error = error

    @property
    def message(self) -> str:
        return self.error or self.default_message

    def violation_cond(self, col: Column) -> Column:  # pragma: no cover - abstract
        raise NotImplementedError

    def checks(self, col: Column) -> list[tuple[Column, str]]:
        """(condition, message) pairs; subclasses with several distinct
        messages (Range/Length) override this."""
        return [(self.violation_cond(col), self.message)]

    def __repr__(self) -> str:
        return f"<{type(self).__name__}>"


class And(Validator):
    """Run all validators, collecting every failure (NOT short-circuit) —
    matching src/marshmallow/validate.py:43-90 and the multiple-errors-
    per-row behavior in tests/test_schema.py:172-186. In the Spark plan
    this is simply the concatenation of each child's check list: every
    violating (row, check) pair yields its own violation row."""

    def __init__(self, *validators: "Validator | typing.Callable"):
        super().__init__()
        self.validators = [_resolve(v) for v in validators]

    def checks(self, col: Column) -> list[tuple[Column, str]]:
        out: list[tuple[Column, str]] = []
        for v in self.validators:
            out.extend(v.checks(col))
        return out


class Lambda(Validator):
    """Wrap a user callable ``Column -> Column(bool: True=valid)``.

    Parity: plain-callable validators returning False =>
    "Invalid value." (src/marshmallow/validate.py:79-80;
    src/marshmallow/fields.py:153-157). The callable here operates on a
    whole Column (vectorized), never per row.
    """

    default_message = "Invalid value."

    def __init__(self, func: typing.Callable[[Column], Column], *, error: str | None = None):
        super().__init__(error=error)
        self.func = func

    def violation_cond(self, col: Column) -> Column:
        valid = self.func(col)
        return ~F.coalesce(valid, F.lit(False))


def _resolve(v: "Validator | typing.Callable") -> Validator:
    if isinstance(v, Validator):
        return v
    if callable(v):
        return Lambda(v)
    raise ValueError(f"not a validator or callable: {v!r}")


class Range(Validator):
    """Bound check with inclusivity, message interpolation identical to
    src/marshmallow/validate.py:283-357."""

    message_min = "Must be {min_op} {{min}}."
    message_max = "Must be {max_op} {{max}}."
    message_all = "Must be {min_op} {{min}} and {max_op} {{max}}."

    message_gte = "greater than or equal to"
    message_gt = "greater than"
    message_lte = "less than or equal to"
    message_lt = "less than"

    def __init__(
        self,
        min=None,
        max=None,
        *,
        min_inclusive: bool = True,
        max_inclusive: bool = True,
        error: str | None = None,
    ):
        super().__init__(error=error)
        self.min = min
        self.max = max
        self.min_inclusive = min_inclusive
        self.max_inclusive = max_inclusive
        self.message_min = self.message_min.format(
            min_op=self.message_gte if min_inclusive else self.message_gt
        )
        self.message_max = self.message_max.format(
            max_op=self.message_lte if max_inclusive else self.message_lt
        )
        self.message_all = self.message_all.format(
            min_op=self.message_gte if min_inclusive else self.message_gt,
            max_op=self.message_lte if max_inclusive else self.message_lt,
        )

    def _format(self, template: str) -> str:
        if self.error:
            return self.error.format(min=self.min, max=self.max)
        return template.format(min=self.min, max=self.max)

    def violation_cond(self, col: Column) -> Column:
        conds = [c for c, _ in self.checks(col)]
        out = conds[0]
        for c in conds[1:]:
            out = out | c
        return out

    def checks(self, col: Column) -> list[tuple[Column, str]]:
        out = []
        if self.min is not None:
            below = col < self.min if self.min_inclusive else col <= self.min
            msg = self._format(self.message_min if self.max is None else self.message_all)
            out.append((below, msg))
        if self.max is not None:
            above = col > self.max if self.max_inclusive else col >= self.max
            msg = self._format(self.message_max if self.min is None else self.message_all)
            out.append((above, msg))
        return out


class Length(Validator):
    """``len()`` bound on strings (characters) / arrays / maps.
    Parity: src/marshmallow/validate.py:360-423."""

    message_min = "Shorter than minimum length {min}."
    message_max = "Longer than maximum length {max}."
    message_all = "Length must be between {min} and {max}."
    message_equal = "Length must be {equal}."

    def __init__(self, min=None, max=None, *, equal=None, error: str | None = None):
        super().__init__(error=error)
        if equal is not None and any([min, max]):
            raise ValueError(
                "The `equal` parameter was provided, maximum or "
                "minimum parameter must not be provided."
            )
        self.min = min
        self.max = max
        self.equal = equal

    def _format(self, template: str) -> str:
        if self.error:
            return self.error.format(min=self.min, max=self.max, equal=self.equal)
        return template.format(min=self.min, max=self.max, equal=self.equal)

    @staticmethod
    def _len(col: Column) -> Column:
        # F.length for strings; callers on array/map columns should pass
        # F.size(col) themselves via Field.length_expr (fields know their type).
        return F.length(col)

    def checks(self, col: Column) -> list[tuple[Column, str]]:
        ln = self._len(col)
        if self.equal is not None:
            return [(ln != F.lit(self.equal), self._format(self.message_equal))]
        out = []
        if self.min is not None:
            msg = self._format(self.message_min if self.max is None else self.message_all)
            out.append((ln < F.lit(self.min), msg))
        if self.max is not None:
            msg = self._format(self.message_max if self.min is None else self.message_all)
            out.append((ln > F.lit(self.max), msg))
        return out

    def violation_cond(self, col: Column) -> Column:
        conds = [c for c, _ in self.checks(col)]
        out = conds[0]
        for c in conds[1:]:
            out = out | c
        return out


class SizeLength(Length):
    """Length over array/map columns (`F.size`), same messages."""

    @staticmethod
    def _len(col: Column) -> Column:
        return F.size(col)


class Equal(Validator):
    """Parity: src/marshmallow/validate.py:426-450."""

    default_message = "Must be equal to {other}."

    def __init__(self, comparable, *, error: str | None = None):
        super().__init__(error=error)
        self.comparable = comparable

    @property
    def message(self) -> str:
        return (self.error or self.default_message).format(other=self.comparable)

    def violation_cond(self, col: Column) -> Column:
        return ~(col.eqNullSafe(F.lit(self.comparable)))


class Regexp(Validator):
    """Anchored-at-start match (``re.match`` semantics), like
    src/marshmallow/validate.py:453-498. ``rlike`` is substring-search,
    so the pattern is anchored with ``^`` unless already anchored."""

    default_message = "String does not match expected pattern."

    def __init__(self, regex: str, flags: int = 0, *, error: str | None = None):
        super().__init__(error=error)
        self.regex_src = regex
        self.flags = flags
        pat = regex if regex.startswith("^") else "^(?:" + regex + ")"
        inline = ""
        if flags & re.IGNORECASE:
            inline += "i"
        if flags & re.MULTILINE:
            inline += "m"
        if flags & re.DOTALL:
            inline += "s"
        self.spark_pattern = (f"(?{inline})" if inline else "") + pat

    def violation_cond(self, col: Column) -> Column:
        return ~col.cast("string").rlike(self.spark_pattern)


class Predicate(Validator):
    """Method-on-value predicate: here a named builtin SQL function or a
    Column->Column callable. Parity: src/marshmallow/validate.py:501-532."""

    default_message = "Invalid input."

    def __init__(self, method: "str | typing.Callable[[Column], Column]", *, error: str | None = None):
        super().__init__(error=error)
        self.method = method

    def violation_cond(self, col: Column) -> Column:
        if callable(self.method):
            valid = self.method(col)
        else:
            valid = F.call_function(self.method, col)
        return ~F.coalesce(valid.cast("boolean"), F.lit(False))


class NoneOf(Validator):
    """Fail if value is a member of ``iterable``.
    Parity: src/marshmallow/validate.py:535-563."""

    default_message = "Invalid input."

    def __init__(self, iterable, *, error: str | None = None):
        super().__init__(error=error)
        self.iterable = list(iterable)

    @property
    def message(self) -> str:
        values_text = ", ".join(str(each) for each in self.iterable)
        return (self.error or self.default_message).format(values=values_text)

    def violation_cond(self, col: Column) -> Column:
        return col.isin(*self.iterable)


class OneOf(Validator):
    """Membership check. Parity: src/marshmallow/validate.py:566-624."""

    default_message = "Must be one of: {choices}."

    def __init__(self, choices, labels=None, *, error: str | None = None):
        super().__init__(error=error)
        self.choices = list(choices)
        self.labels = list(labels) if labels is not None else []

    @property
    def message(self) -> str:
        choices_text = ", ".join(str(c) for c in self.choices)
        labels_text = ", ".join(str(l) for l in self.labels)
        return (self.error or self.default_message).format(
            choices=choices_text, labels=labels_text
        )

    def violation_cond(self, col: Column) -> Column:
        return ~col.isin(*self.choices)


class ContainsOnly(OneOf):
    """Every element of an array column must be in ``choices`` (empty
    arrays pass). Parity: src/marshmallow/validate.py:627-654."""

    default_message = "One or more of the choices you made was not in: {choices}."

    def violation_cond(self, col: Column) -> Column:
        allowed = F.array(*[F.lit(c) for c in self.choices])
        return ~F.forall(col, lambda x: F.array_contains(allowed, x))


class ContainsNoneOf(NoneOf):
    """No element of an array column may be in ``iterable``.
    Parity: src/marshmallow/validate.py:657-678."""

    default_message = "One or more of the choices you made was in: {values}."

    def violation_cond(self, col: Column) -> Column:
        banned = F.array(*[F.lit(c) for c in self.iterable])
        return F.exists(col, lambda x: F.array_contains(banned, x))


# ---------------------------------------------------------------------------
# URL / Email — regex construction is original but validates the same
# corpus shape as src/marshmallow/validate.py:93-220 / :223-280.
# Patterns are built once on the driver and memoized, mirroring the
# reference's class-level regex memoization (validate.py:105-174).
# ---------------------------------------------------------------------------

_URL_MEMO: dict[tuple, str] = {}


def _build_url_pattern(relative: bool, absolute: bool, require_tld: bool, schemes) -> str:
    key = (relative, absolute, require_tld, tuple(sorted(schemes)) if schemes else None)
    if key in _URL_MEMO:
        return _URL_MEMO[key]
    if schemes:
        scheme_part = "(?:" + "|".join(re.escape(s) for s in schemes) + ")://"
    else:
        scheme_part = "[a-z][a-z0-9+.\\-]*://"
    # require_tld=False admits single-label hosts ("http://intranet/x"),
    # so the dotted-label prefix becomes optional.
    label = "[a-zA-Z0-9](?:[a-zA-Z0-9-]{0,61}[a-zA-Z0-9])?"
    hostname = (
        "(?:"
        + (
            f"(?:{label}\\.)+[a-zA-Z]{{2,63}}"
            if require_tld
            else f"(?:{label}\\.)*{label}"
        )
        + "|localhost"
        "|\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"
        "|\\[[A-Fa-f0-9:]+\\]"
        ")"
    )
    userinfo = "(?:[^\\s:@/]+(?::[^\\s:@/]*)?@)?"
    port = "(?::\\d+)?"
    rest = "(?:[/?#][^\\s]*)?"
    absolute_pat = scheme_part + userinfo + hostname + port + rest
    relative_pat = "(?:/[^\\s]*)?"
    if absolute and relative:
        pat = f"^(?:{absolute_pat}|{relative_pat})$"
    elif relative:
        pat = f"^{relative_pat}$"
    else:
        pat = f"^{absolute_pat}$"
    _URL_MEMO[key] = pat
    return pat


class URL(Validator):
    """URL conformance via one compiled regex (`rlike`, executor-side
    JVM regex — compiled once per executor). Parity:
    src/marshmallow/validate.py:93-220."""

    default_message = "Not a valid URL."

    def __init__(
        self,
        *,
        relative: bool = False,
        absolute: bool = True,
        schemes=None,
        require_tld: bool = True,
        error: str | None = None,
    ):
        super().__init__(error=error)
        self.relative = relative
        self.absolute = absolute
        self.schemes = set(schemes) if schemes else {"http", "https", "ftp", "ftps"}
        self.require_tld = require_tld
        self.pattern = _build_url_pattern(relative, absolute, require_tld, self.schemes)

    def violation_cond(self, col: Column) -> Column:
        return ~col.rlike(self.pattern)


EMAIL_USER_PATTERN = r"[A-Za-z0-9!#$%&'*+\-/=?^_`{}|~]+(?:\.[A-Za-z0-9!#$%&'*+\-/=?^_`{}|~]+)*"
EMAIL_QUOTED_USER = r'"(?:[\x01-\x08\x0b\x0c\x0e-\x1f!#-\[\]-\x7f]|\\[\x01-\x09\x0b\x0c\x0e-\x7f])*"'
EMAIL_DOMAIN_PATTERN = (
    r"(?:[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?\.)+[A-Za-z]{2,63}"
    r"|localhost"
    r"|\[(?:\d{1,3}\.){3}\d{1,3}\]"
)
EMAIL_PATTERN = f"^(?:{EMAIL_USER_PATTERN}|{EMAIL_QUOTED_USER})@(?:{EMAIL_DOMAIN_PATTERN})$"


class Email(Validator):
    """Email conformance regex (user + domain parts, same corpus shape
    as src/marshmallow/validate.py:223-280; IDNA strict mode lives in a
    pandas UDF — see functions/textfns.py)."""

    default_message = "Not a valid email address."

    def violation_cond(self, col: Column) -> Column:
        return ~col.rlike(EMAIL_PATTERN)


__all__ = [
    "Validator",
    "And",
    "Lambda",
    "Range",
    "Length",
    "SizeLength",
    "Equal",
    "Regexp",
    "Predicate",
    "NoneOf",
    "OneOf",
    "ContainsOnly",
    "ContainsNoneOf",
    "URL",
    "Email",
]
