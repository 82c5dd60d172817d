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


def _build_url_pattern(relative: bool, absolute: bool, require_tld: bool) -> str:
    """Java-regex rendering of the reference's URL grammar
    (src/marshmallow/validate.py:109-162): ``(?i)`` for its IGNORECASE,
    ``\\z`` absolute-end anchor (Java ``$``/``\\Z`` tolerate a trailing
    newline; Python's ``\\Z`` does not), hostname variants incl.
    punycode-style TLDs and bracketed IPv6, RFC-3986 userinfo that may
    be empty, and the ``(?:/?|[/?]\\S+)`` relative tail. The scheme
    *membership* check is separate (see URL.violation_cond), matching
    the reference's two-step validation."""
    key = (relative, absolute, require_tld)
    if key in _URL_MEMO:
        return _URL_MEMO[key]
    hostname_variants = [
        "(?:[a-z0-9](?:[a-z0-9-]{0,61}[a-z0-9])?\\.)+"
        "(?:[a-z]{2,6}\\.?|[a-z0-9-]{2,}\\.?)",
        "localhost",
        "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}",
        "\\[[a-f0-9]*:[a-f0-9:]+\\]",
    ]
    if not require_tld:
        hostname_variants.append("(?:[a-z0-9](?:[a-z0-9-]{0,61}[a-z0-9])?\\.?)")
    absolute_part = (
        "(?:[a-z0-9.\\-+]*)://"
        "(?:(?:[a-z0-9\\-._~!$&'()*+,;=:]|%[0-9a-f]{2})*@)?"
        "(?:" + "|".join(hostname_variants) + ")"
        "(?::\\d+)?"
    )
    relative_part = "(?:/?|[/?]\\S+)\\z"
    if relative and absolute:
        pat = f"(?i)^(?:{absolute_part})?{relative_part}"
    elif relative:
        pat = f"(?i)^{relative_part}"
    else:
        pat = f"(?i)^{absolute_part}{relative_part}"
    _URL_MEMO[key] = pat
    return pat


class URL(Validator):
    """URL conformance: a separate scheme-membership check plus one
    compiled regex (`rlike`, executor-side JVM regex — compiled once
    per executor), mirroring the reference's two-step validation.
    Parity: src/marshmallow/validate.py:93-220."""

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
        if not relative and not absolute:
            raise ValueError(
                "URL validation cannot set both relative and absolute to False."
            )
        super().__init__(error=error)
        self.relative = relative
        self.absolute = absolute
        self.schemes = set(schemes) if schemes else {"http", "https", "ftp", "ftps"}
        self.require_tld = require_tld
        self.pattern = _build_url_pattern(relative, absolute, require_tld)

    def violation_cond(self, col: Column) -> Column:
        nonempty = F.length(col) > 0
        # scheme checked separately and only when "://" is present
        # (parity: validate.py:209-213)
        has_scheme = col.contains("://")
        scheme = F.lower(F.substring_index(col, "://", 1))
        scheme_ok = ~has_scheme | scheme.isin(*sorted(self.schemes))
        valid = nonempty & scheme_ok & col.rlike(self.pattern)
        return ~valid


# Java renderings of the reference's USER_REGEX / DOMAIN_REGEX
# (src/marshmallow/validate.py:230-247). (?U) turns on Java's unicode
# character classes so \w matches unicode letters like Python's
# re.UNICODE. \z is the absolute end anchor (Python \Z).
EMAIL_USER_PATTERN = (
    r"(?iU)^(?:"
    r"[-!#$%&'*+/=?^`{}|~\w]+(?:\.[-!#$%&'*+/=?^`{}|~\w]+)*"  # dot-atom
    r'|"(?:[\x01-\x08\x0b\x0c\x0e-\x1f!#-\[\]-\x7f]'          # quoted-string
    r"|\\[\x01-\x09\x0b\x0c\x0e-\x7f])*\")\z"
)
# The reference's DOMAIN_REGEX is ASCII; unicode domains pass only via
# its IDNA-encode fallback (validate.py:272-279). IDNA is not
# expressible in a JVM regex, so unicode letters/digits are admitted
# directly in labels (\p{L}\p{N}) — the same acceptance for every
# practical address; pathological labels that fail IDNA encoding
# (post-encoding length >63, bidi rules) are over-accepted.
EMAIL_DOMAIN_PATTERN = (
    r"(?iU)^(?:"
    r"(?:[\p{L}\p{N}](?:[\p{L}\p{N}-]{0,61}[\p{L}\p{N}])?\.)+"
    r"(?:\p{L}{2,6}|[\p{L}\p{N}-]{2,})"
    r"|\[(?:25[0-5]|2[0-4]\d|[01]?\d?\d)"
    r"(?:\.(?:25[0-5]|2[0-4]\d|[01]?\d?\d)){3}\]"
    r")\z"
)


class Email(Validator):
    """Email conformance mirroring the reference's two-part check
    (src/marshmallow/validate.py:223-280): split at the LAST '@',
    user part against the dot-atom/quoted-string grammar, domain part
    against the domain/IP-literal grammar with a 'localhost'
    whitelist.

    ``strict_idna=True`` swaps the unicode-domain regex approximation
    for the reference's EXACT IDNA-encode fallback inside an
    Arrow-batched pandas UDF — bit-exact parity at ~10-100x the cost of
    the JVM regex; reserve it for audit passes, not the 10^12-row hot
    path."""

    default_message = "Not a valid email address."

    def __init__(self, *, error: str | None = None, strict_idna: bool = False):
        super().__init__(error=error)
        self.strict_idna = strict_idna

    def violation_cond(self, col: Column) -> Column:
        has_at = col.contains("@")
        domain = F.substring_index(col, "@", -1)
        user = col.substr(F.lit(1), F.length(col) - F.length(domain) - 1)
        user_ok = user.rlike(EMAIL_USER_PATTERN)
        if self.strict_idna:
            from .functions.textfns import idna_domain_ok

            domain_ok = (domain == F.lit("localhost")) | idna_domain_ok(domain)
        else:
            domain_ok = (domain == F.lit("localhost")) | domain.rlike(
                EMAIL_DOMAIN_PATTERN
            )
        valid = (F.length(col) > 0) & has_at & user_ok & domain_ok
        return ~valid


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
