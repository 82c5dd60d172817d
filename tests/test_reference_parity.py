"""Cross-validate against the reference implementation itself.

The reference marshmallow (read-only at /root/reference/src) is imported
and run per-row on the same values our engine validates columnar;
error trees must match field-for-field, message-for-message
(SURVEY.md §5.2(1): the reference is the semantics oracle)."""

import sys

import pytest

sys.path.insert(0, "/root/reference/src")

import marshmallow as ref  # noqa: E402  (the reference library)
from marshmallow import validate as ref_validate  # noqa: E402

from marshmallow_spark import Schema, fields, validate  # noqa: E402


def run_both(spark, our_schema_cls, ref_schema_cls, rows, columns):
    """rows: list of dicts with string/None externals."""
    ref_errors = ref_schema_cls().validate(rows, many=True)

    data = [tuple([i] + [r.get(c) for c in columns]) for i, r in enumerate(rows)]
    schema_str = "rid long, " + ", ".join(f"{c} string" for c in columns)
    df = spark.createDataFrame(data, schema_str)
    res = our_schema_cls(row_key="rid", unknown="exclude").validate_df(df)
    ours: dict = {}
    for r in res.violations.collect():
        ours.setdefault(int(r.rid), {}).setdefault(r.field, []).append(r.message)
    # normalize: sort message lists
    ref_norm = {
        i: {f: sorted(msgs) for f, msgs in errs.items()}
        for i, errs in ref_errors.items()
    }
    our_norm = {i: {f: sorted(m) for f, m in errs.items()} for i, errs in ours.items()}
    return ref_norm, our_norm


CASES = []


def case(name):
    def deco(fn):
        CASES.append((name, fn))
        return fn

    return deco


@case("integer_coercion")
def _c1():
    class Ours(Schema):
        x = fields.Integer()

    class Ref(ref.Schema):
        x = ref.fields.Integer()

    rows = [{"x": "5"}, {"x": "abc"}, {"x": "7.5"}, {"x": "1e3"}, {"x": "-2"}]
    return Ours, Ref, rows, ["x"]


@case("float_special")
def _c2():
    class Ours(Schema):
        x = fields.Float()

    class Ref(ref.Schema):
        x = ref.fields.Float()

    rows = [{"x": "1.5"}, {"x": "zz"}, {"x": "NaN"}, {"x": "Infinity"}]
    return Ours, Ref, rows, ["x"]


@case("allow_none")
def _c3():
    class Ours(Schema):
        a = fields.String(allow_none=True)
        b = fields.String(allow_none=False)

    class Ref(ref.Schema):
        a = ref.fields.String(allow_none=True)
        b = ref.fields.String(allow_none=False)

    rows = [{"a": None, "b": None}, {"a": "x", "b": "y"}]
    return Ours, Ref, rows, ["a", "b"]


@case("range_messages")
def _c4():
    class Ours(Schema):
        x = fields.Integer(validate=validate.Range(min=1, max=30))
        y = fields.Integer(validate=validate.Range(min=2, min_inclusive=False))
        z = fields.Integer(validate=validate.Range(max=9, max_inclusive=False))

    class Ref(ref.Schema):
        x = ref.fields.Integer(validate=ref_validate.Range(min=1, max=30))
        y = ref.fields.Integer(validate=ref_validate.Range(min=2, min_inclusive=False))
        z = ref.fields.Integer(validate=ref_validate.Range(max=9, max_inclusive=False))

    rows = [
        {"x": "0", "y": "2", "z": "9"},
        {"x": "31", "y": "3", "z": "8"},
        {"x": "15", "y": "1", "z": "10"},
    ]
    return Ours, Ref, rows, ["x", "y", "z"]


@case("length_equal_oneof_noneof")
def _c5():
    class Ours(Schema):
        a = fields.String(validate=validate.Length(min=2, max=4))
        b = fields.String(validate=validate.Length(equal=3))
        c = fields.String(validate=validate.OneOf(["red", "blue"]))
        d = fields.String(validate=validate.NoneOf(["bad"]))
        e = fields.String(validate=validate.Equal("yes"))

    class Ref(ref.Schema):
        a = ref.fields.String(validate=ref_validate.Length(min=2, max=4))
        b = ref.fields.String(validate=ref_validate.Length(equal=3))
        c = ref.fields.String(validate=ref_validate.OneOf(["red", "blue"]))
        d = ref.fields.String(validate=ref_validate.NoneOf(["bad"]))
        e = ref.fields.String(validate=ref_validate.Equal("yes"))

    rows = [
        {"a": "x", "b": "abc", "c": "red", "d": "ok", "e": "yes"},
        {"a": "abcde", "b": "ab", "c": "green", "d": "bad", "e": "no"},
    ]
    return Ours, Ref, rows, ["a", "b", "c", "d", "e"]


@case("regexp_anchoring")
def _c6():
    class Ours(Schema):
        a = fields.String(validate=validate.Regexp(r"ab+c"))

    class Ref(ref.Schema):
        a = ref.fields.String(validate=ref_validate.Regexp(r"ab+c"))

    # re.match semantics: matches at start, suffix allowed
    rows = [{"a": "abbc"}, {"a": "abcd"}, {"a": "xabc"}, {"a": "ac"}]
    return Ours, Ref, rows, ["a"]


@case("multiple_validators_collect_all")
def _c7():
    class Ours(Schema):
        a = fields.String(
            validate=validate.And(
                validate.Length(min=3), validate.Regexp(r"[0-9]+$")
            )
        )

    class Ref(ref.Schema):
        a = ref.fields.String(
            validate=ref_validate.And(
                ref_validate.Length(min=3), ref_validate.Regexp(r"[0-9]+$")
            )
        )

    rows = [{"a": "ab"}, {"a": "12"}, {"a": "abcd"}, {"a": "1234"}]
    return Ours, Ref, rows, ["a"]


@case("uuid_email_url")
def _c8():
    class Ours(Schema):
        u = fields.UUID()
        e = fields.Email()
        w = fields.Url()

    class Ref(ref.Schema):
        u = ref.fields.UUID()
        e = ref.fields.Email()
        w = ref.fields.Url()

    rows = [
        {
            "u": "12345678-1234-5678-1234-567812345678",
            "e": "user@example.com",
            "w": "https://spark.apache.org/docs",
        },
        {"u": "not-a-uuid", "e": "no-at-sign", "w": "notaurl"},
        {"u": "12345678-1234-5678-1234-56781234567", "e": "a@b.co", "w": "http://localhost:8080/x"},
        # uuid.UUID's permissive forms: un-dashed, braced, urn-prefixed,
        # oddly-dashed
        {"u": "12345678123456781234567812345678", "e": "x@y.io", "w": "http://a.io"},
        {"u": "{12345678-1234-5678-1234-567812345678}", "e": "x@y.io", "w": "http://a.io"},
        {"u": "urn:uuid:12345678-1234-5678-1234-567812345678", "e": "x@y.io", "w": "http://a.io"},
        {"u": "12345678-1234-5678-1234-5678-12345678", "e": "x@y.io", "w": "http://a.io"},
        {"u": "0x1234567812345678123456781234567", "e": "x@y.io", "w": "http://a.io"},
    ]
    return Ours, Ref, rows, ["u", "e", "w"]


@case("date_datetime")
def _c9():
    class Ours(Schema):
        d = fields.Date()
        t = fields.DateTime()

    class Ref(ref.Schema):
        d = ref.fields.Date()
        t = ref.fields.DateTime()

    rows = [
        {"d": "2024-01-02", "t": "2024-01-02T03:04:05"},
        {"d": "not-a-date", "t": "nope"},
        {"d": "2024-13-45", "t": "2024-01-02 03:04:05"},
    ]
    return Ours, Ref, rows, ["d", "t"]


@case("boolean_tokens")
def _c10():
    class Ours(Schema):
        b = fields.Boolean()

    class Ref(ref.Schema):
        b = ref.fields.Boolean()

    rows = [{"b": v} for v in ["yes", "off", "maybe", "1", "0", "TRUE", "n"]]
    return Ours, Ref, rows, ["b"]


@case("decimal_specials")
def _c10b():
    class Ours(Schema):
        d = fields.Decimal()

    class Ref(ref.Schema):
        d = ref.fields.Decimal()

    rows = [
        {"d": "Infinity"}, {"d": "nan"}, {"d": "-inf"}, {"d": "sNaN"},
        {"d": "NaN123"}, {"d": "1e3"}, {"d": "zz"},
    ]
    return Ours, Ref, rows, ["d"]


@case("enum_by_name_and_value")
def _c11():
    import enum as _enum

    class Color(_enum.Enum):
        RED = "r"
        GREEN = "g"

    class Ours(Schema):
        a = fields.Enum(Color)
        b = fields.Enum(Color, by_value=True)

    class Ref(ref.Schema):
        a = ref.fields.Enum(Color)
        b = ref.fields.Enum(Color, by_value=ref.fields.String)

    rows = [
        {"a": "RED", "b": "g"},
        {"a": "r", "b": "GREEN"},
        {"a": "BLUE", "b": "x"},
    ]
    return Ours, Ref, rows, ["a", "b"]


@case("timedelta")
def _c12():
    class Ours(Schema):
        s = fields.TimeDelta()
        m = fields.TimeDelta(precision="minutes")

    class Ref(ref.Schema):
        s = ref.fields.TimeDelta()
        m = ref.fields.TimeDelta(precision="minutes")

    rows = [{"s": "12", "m": "3"}, {"s": "abc", "m": "1.5"}, {"s": "-4", "m": "0"}]
    return Ours, Ref, rows, ["s", "m"]


@case("ip_family")
def _c13():
    class Ours(Schema):
        a = fields.IP()
        b = fields.IPv4()
        c = fields.IPv6()

    class Ref(ref.Schema):
        a = ref.fields.IP()
        b = ref.fields.IPv4()
        c = ref.fields.IPv6()

    rows = [
        {"a": "192.168.0.1", "b": "10.0.0.255", "c": "2001:db8::1"},
        {"a": "::1", "b": "256.1.1.1", "c": "192.168.0.1"},
        {"a": "999.0.0.1", "b": "1.2.3", "c": "not:ipv6::zz"},
        # scoped IPv6 (Python 3.9+): zone after %, non-empty, no second %
        {"a": "fe80::1%eth0", "b": "010.0.0.1", "c": "fe80::1%25"},
        {"a": "1.2.3.4%eth0", "b": "1.2.3.4", "c": "fe80::1%"},
    ]
    return Ours, Ref, rows, ["a", "b", "c"]


@case("ip_interface_family")
def _c13b():
    class Ours(Schema):
        a = fields.IPInterface()
        b = fields.IPv4Interface()
        c = fields.IPv6Interface()

    class Ref(ref.Schema):
        a = ref.fields.IPInterface()
        b = ref.fields.IPv4Interface()
        c = ref.fields.IPv6Interface()

    rows = [
        {"a": "192.168.0.2/24", "b": "10.0.0.1/255.255.255.0", "c": "2001:db8::1/64"},
        {"a": "192.168.0.2/33", "b": "10.0.0.1/255.0.255.0", "c": "2001:db8::1/129"},
        {"a": "2001:db8::5/128", "b": "1.2.3.4", "c": "::1"},
        {"a": "not-an-ip/8", "b": "2001:db8::1/64", "c": "10.0.0.1/8"},
    ]
    return Ours, Ref, rows, ["a", "b", "c"]


@case("strict_integer")
def _c14():
    class Ours(Schema):
        x = fields.Integer(strict=True)

    class Ref(ref.Schema):
        x = ref.fields.Integer(strict=True)

    rows = [{"x": "5"}, {"x": "5.5"}]
    return Ours, Ref, rows, ["x"]


@case("required_none")
def _c15():
    class Ours(Schema):
        a = fields.String(required=True)
        b = fields.Integer(required=True, allow_none=True)

    class Ref(ref.Schema):
        a = ref.fields.String(required=True)
        b = ref.fields.Integer(required=True, allow_none=True)

    rows = [{"a": None, "b": None}, {"a": "x", "b": "3"}]
    return Ours, Ref, rows, ["a", "b"]


@case("url_variants")
def _c16():
    class Ours(Schema):
        a = fields.Url(require_tld=False)
        b = fields.Url(schemes={"ftp"})
        c = fields.Url(relative=True)

    class Ref(ref.Schema):
        a = ref.fields.Url(require_tld=False)
        b = ref.fields.Url(schemes={"ftp"})
        c = ref.fields.Url(relative=True)

    rows = [
        {"a": "http://intranet/x", "b": "ftp://files.example.com/a", "c": "/docs/index.html"},
        {"a": "http://", "b": "https://example.com", "c": "not a url"},
    ]
    return Ours, Ref, rows, ["a", "b", "c"]


@case("time_field")
def _c17():
    class Ours(Schema):
        t = fields.Time()

    class Ref(ref.Schema):
        t = ref.fields.Time()

    rows = [
        {"t": "03:04:05"},
        {"t": "25:00:00"},
        {"t": "12:30"},
        {"t": "nope"},
        {"t": "07"},            # hour-only: minute required -> invalid
        {"t": "3:04:05"},       # single-digit hour: valid
        {"t": "12:99"},         # out-of-range minute, no backtracking
        {"t": "12:30:45.123456xyz"},  # suffix allowed (re.match)
        {"t": "12:30:70"},      # out-of-range second
    ]
    return Ours, Ref, rows, ["t"]


@case("containsonly_containsnoneof")
def _c18():
    class Ours(Schema):
        a = fields.String(validate=validate.ContainsOnly(["a", "b", "c"]))
        b = fields.String(validate=validate.ContainsNoneOf(["x", "y"]))

    class Ref(ref.Schema):
        a = ref.fields.String(validate=ref_validate.ContainsOnly(["a", "b", "c"]))
        b = ref.fields.String(validate=ref_validate.ContainsNoneOf(["x", "y"]))

    # strings are iterables of chars — both sides treat them as element sets
    rows = [{"a": "abca", "b": "pq"}, {"a": "abd", "b": "qx"}]
    return Ours, Ref, rows, ["a", "b"]


@case("datetime_formats")
def _c20():
    class Ours(Schema):
        r = fields.DateTime(format="rfc")
        ts = fields.DateTime(format="timestamp")
        tm = fields.DateTime(format="timestamp_ms")

    class Ref(ref.Schema):
        r = ref.fields.DateTime(format="rfc")
        ts = ref.fields.DateTime(format="timestamp")
        tm = ref.fields.DateTime(format="timestamp_ms")

    rows = [
        {"r": "Sun, 12 Nov 2023 14:30:00 +0000", "ts": "1700000000", "tm": "1700000000123"},
        {"r": "not rfc at all", "ts": "-5", "tm": "abc"},
        {"r": "Mon, 01 Jan 2024 00:00:00 -0500", "ts": "0", "tm": "0"},
    ]
    return Ours, Ref, rows, ["r", "ts", "tm"]


@case("iso_datetime_shapes")
def _c20b():
    """The reference parses ISO datetimes with its own regex
    (utils.py:121-126): 1-2 digit components, [T ] separator, minute
    required, bare dates REJECTED; Date is strictly yyyy-M-d."""

    class Ours(Schema):
        dt = fields.DateTime()
        d = fields.Date()

    class Ref(ref.Schema):
        dt = ref.fields.DateTime()
        d = ref.fields.Date()

    rows = [
        {"dt": "2024-1-2T3:04:05", "d": "2024-1-2"},
        {"dt": "2024-01-02 03:04", "d": "2024-01-02T03:04:05"},  # date w/ time -> bad
        {"dt": "2024-01-02", "d": "2024-01-02 "},                # bare date / trailing space -> bad
        {"dt": "2024-01-02T03:04:05.1234567", "d": "2024-13-45"},
        {"dt": "2024-01-02T03:04:05xyz", "d": "02-01-2024"},
    ]
    return Ours, Ref, rows, ["dt", "d"]


@case("naive_aware_datetime")
def _c21():
    class Ours(Schema):
        n = fields.NaiveDateTime()
        a = fields.AwareDateTime()

    class Ref(ref.Schema):
        n = ref.fields.NaiveDateTime()
        a = ref.fields.AwareDateTime()

    rows = [
        {"n": "2024-01-02T03:04:05", "a": "2024-01-02T03:04:05+02:00"},
        {"n": "2024-01-02T03:04:05+02:00", "a": "2024-01-02T03:04:05"},
        {"n": "2024-01-02T03:04:05Z", "a": "2024-01-02T03:04:05Z"},
    ]
    return Ours, Ref, rows, ["n", "a"]


@case("user_schema_integrated")
def _c19():
    """F2 fixture: integrated many-field schema mirroring the
    reference's UserSchema (tests/base.py:181-228) — every field type
    in one schema, one pass, error trees must match field-for-field."""

    class Ours(Schema):
        name = fields.String(required=True)
        age = fields.Float(validate=validate.Range(min=0, max=150))
        homepage = fields.Url()
        email = fields.Email()
        balance = fields.Decimal()
        registered = fields.Boolean()
        finger_count = fields.Integer()
        uid = fields.UUID()
        time_registered = fields.Time()
        birthdate = fields.Date()
        activation = fields.DateTime()
        species = fields.String(validate=validate.OneOf(["human", "android"]))

    class Ref(ref.Schema):
        name = ref.fields.String(required=True)
        age = ref.fields.Float(validate=ref_validate.Range(min=0, max=150))
        homepage = ref.fields.Url()
        email = ref.fields.Email()
        balance = ref.fields.Decimal()
        registered = ref.fields.Boolean()
        finger_count = ref.fields.Integer()
        uid = ref.fields.UUID()
        time_registered = ref.fields.Time()
        birthdate = ref.fields.Date()
        activation = ref.fields.DateTime()
        species = ref.fields.String(validate=ref_validate.OneOf(["human", "android"]))

    good = {
        "name": "Monty", "age": "42.5",
        "homepage": "http://monty.example.com/",
        "email": "monty@example.com", "balance": "100.00",
        "registered": "true", "finger_count": "10",
        "uid": "12345678-1234-5678-1234-567812345678",
        "time_registered": "10:30:00", "birthdate": "1995-08-12",
        "activation": "2013-05-25T10:45:00", "species": "human",
    }
    bad = {
        "name": None, "age": "-3",
        "homepage": "www.no-scheme.com",
        "email": "not-an-email", "balance": "1e1e1",
        "registered": "absolutely", "finger_count": "ten",
        "uid": "1234-not-a-uuid",
        "time_registered": "25:99", "birthdate": "08/12/1995",
        "activation": "someday", "species": "martian",
    }
    mixed = dict(good, age="200", species="android", registered="0")
    return Ours, Ref, [good, bad, mixed], list(good)


@pytest.mark.parametrize("name,builder", CASES, ids=[c[0] for c in CASES])
def test_parity(spark, name, builder):
    ours, refs, rows, cols = builder()
    ref_norm, our_norm = run_both(spark, ours, refs, rows, cols)
    assert our_norm == ref_norm


def test_typed_source_parity(spark):
    """Input-TYPE semantics (not expressible through the string-column
    harness): the reference rejects non-str values into String fields
    and bool values into Number fields regardless of castability."""

    class Ours(Schema):
        s = fields.String()
        n = fields.Integer()
        f = fields.Float()

    class Ref(ref.Schema):
        s = ref.fields.String()
        n = ref.fields.Integer()
        f = ref.fields.Float()

    rows = [{"s": 42, "n": True, "f": False}, {"s": 7, "n": False, "f": True}]
    ref_errors = Ref().validate(rows, many=True)
    df = spark.createDataFrame(
        [(i, r["s"], r["n"], r["f"]) for i, r in enumerate(rows)],
        "rid long, s long, n boolean, f boolean",
    )
    res = Ours(row_key="rid", unknown="exclude").validate_df(df)
    got = {}
    for r in res.violations.collect():
        got.setdefault(int(r.rid), {}).setdefault(r.field, []).append(r.message)
    assert got == {
        i: {f: sorted(m) for f, m in e.items()} for i, e in ref_errors.items()
    }


def test_reference_benchmark_schema_dump_parity(spark):
    """The head-to-head bench (bench_reference_dump.py) is only valid
    if the Spark mirror of the reference's QuoteSchema emits
    value-identical output — pin that parity here (without running the
    reference's timeit loop)."""
    import datetime
    import importlib.util

    import bench_reference_dump as brd

    spec = importlib.util.spec_from_file_location("ref_benchmark", brd.REF_BENCH)
    ref_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_mod)
    ref_quotes = [
        ref_mod.Quote(
            i,
            ref_mod.Author(i, "Foo", "Bar", 42, 66, "123 Fake St"),
            "Hello World",
            datetime.datetime(2019, 7, 4, 0, 0, 0, 123456),
            "The World",
            34,
            3,
            70,
        )
        for i in range(20)
    ]
    brd.assert_output_parity(spark, brd.build_schemas(), ref_mod, ref_quotes)
