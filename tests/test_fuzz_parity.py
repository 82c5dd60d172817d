"""Property-based parity: hypothesis-generated strings through every
scalar parser, reference marshmallow as the live oracle. Catches
acceptance-boundary divergences no hand-written corpus thought of."""

import sys

import pytest
from hypothesis import given, settings, strategies as st

sys.path.insert(0, "/root/reference/src")

import marshmallow as ref  # noqa: E402

from marshmallow_spark import Schema, fields  # noqa: E402

# characters that matter to the parsers under test
ALPHABET = "0123456789.:-+/TZz eE'\"\\n\t_,abf" + "\u00e9\u03b4"

row_strategy = st.text(alphabet=ALPHABET, min_size=0, max_size=24)
# seed the pool with near-miss shapes pure randomness rarely finds
EDGE_SEEDS = [
    "2024-01-02T03:04:05", "2024-1-2 3:4", "12:30:45.123", "23:59:60",
    "1e3", "1E+308", "-0", "+5", "inf", "nan", "0x10", "1_000",
    "true", "On", "2024-02-30", "1.5e", ".5", "5.", "''", " 7",
    "7 ", "00:00", "24:00", "2024-01-02T03:04:05.999999999Z",
]
value_strategy = st.one_of(st.sampled_from(EDGE_SEEDS), row_strategy)


class OursSchema(Schema):
    i = fields.Integer()
    f = fields.Float()
    b = fields.Boolean()
    d = fields.Date()
    t = fields.Time()
    dt = fields.DateTime()
    td = fields.TimeDelta()


class RefSchema(ref.Schema):
    i = ref.fields.Integer()
    f = ref.fields.Float()
    b = ref.fields.Boolean()
    d = ref.fields.Date()
    t = ref.fields.Time()
    dt = ref.fields.DateTime()
    td = ref.fields.TimeDelta()


COLS = ["i", "f", "b", "d", "t", "dt", "td"]


@pytest.fixture(scope="module")
def engines(spark):
    return spark, OursSchema(row_key="rid", unknown="exclude"), RefSchema()


@settings(max_examples=4, deadline=None)
@given(st.lists(value_strategy, min_size=40, max_size=40))
def test_scalar_parser_fuzz_parity(engines, values):
    spark, ours, refs = engines
    rows = [{c: v for c in COLS} for v in values]
    ref_errors = refs.validate(rows, many=True)
    df = spark.createDataFrame(
        [tuple([i] + [v] * len(COLS)) for i, v in enumerate(values)],
        "rid long, " + ", ".join(f"{c} string" for c in COLS),
    )
    got: dict = {}
    for r in ours.validate_df(df).violations.collect():
        got.setdefault(int(r.rid), {}).setdefault(r.field, []).append(r.message)
    ref_norm = {
        i: {f: sorted(m) for f, m in e.items()} for i, e in ref_errors.items()
    }
    our_norm = {i: {f: sorted(m) for f, m in e.items()} for i, e in got.items()}
    mism = {
        i: (values[i], ref_norm.get(i), our_norm.get(i))
        for i in set(ref_norm) | set(our_norm)
        if ref_norm.get(i) != our_norm.get(i)
    }
    assert not mism, f"(value, ref, ours): {mism}"


# --- round 2: domain-string + decimal + format-variant fuzz ----------------

ALPHABET2 = "0123456789abcdef.:-+@%{}[]/_u erngGMTZé"
EDGE_SEEDS2 = [
    "ce9a2f46-9d2c-45a5-bd2f-05dbe46ba9b5",
    "urn:uuid:ce9a2f46-9d2c-45a5-bd2f-05dbe46ba9b5",
    "{ce9a2f469d2c45a5bd2f05dbe46ba9b5}", "ce9a2f469d2c45a5bd2f05dbe46ba9b5",
    "1.2.3.4", "255.255.255.256", "::1", "fe80::1%eth0", "1.2.3.4/24",
    "1.2.3.4/255.255.0.0", "::ffff:1.2.3.4", "0.1", "-0.05", "1e-3",
    "Infinity", "-Infinity", "nan", "00.5", "127.1", "2_5", ".e3",
    "10.30", "Mon, 01 Jan 2024 10:00:00 GMT", "01 Jan 2024 10:00:00 +0000",
]
value_strategy2 = st.one_of(
    st.sampled_from(EDGE_SEEDS2), st.text(alphabet=ALPHABET2, max_size=24)
)


class OursSchema2(Schema):
    u = fields.UUID()
    dec = fields.Decimal(places=2)
    ip = fields.IP()
    ipi = fields.IPInterface()
    rfc = fields.DateTime(format="rfc")
    ts = fields.DateTime(format="timestamp")


class RefSchema2(ref.Schema):
    u = ref.fields.UUID()
    dec = ref.fields.Decimal(places=2)
    ip = ref.fields.IP()
    ipi = ref.fields.IPInterface()
    rfc = ref.fields.DateTime(format="rfc")
    ts = ref.fields.DateTime(format="timestamp")


COLS2 = ["u", "dec", "ip", "ipi", "rfc", "ts"]


@pytest.fixture(scope="module")
def engines2(spark):
    return spark, OursSchema2(row_key="rid", unknown="exclude"), RefSchema2()


@settings(max_examples=4, deadline=None)
@given(st.lists(value_strategy2, min_size=40, max_size=40))
def test_domain_parser_fuzz_parity(engines2, values):
    spark, ours, refs = engines2
    rows = [{c: v for c in COLS2} for v in values]
    ref_errors = refs.validate(rows, many=True)
    df = spark.createDataFrame(
        [tuple([i] + [v] * len(COLS2)) for i, v in enumerate(values)],
        "rid long, " + ", ".join(f"{c} string" for c in COLS2),
    )
    got: dict = {}
    for r in ours.validate_df(df).violations.collect():
        got.setdefault(int(r.rid), {}).setdefault(r.field, []).append(r.message)
    ref_norm = {
        i: {f: sorted(m) for f, m in e.items()} for i, e in ref_errors.items()
    }
    our_norm = {i: {f: sorted(m) for f, m in e.items()} for i, e in got.items()}
    mism = {
        i: (values[i], ref_norm.get(i), our_norm.get(i))
        for i in set(ref_norm) | set(our_norm)
        if ref_norm.get(i) != our_norm.get(i)
    }
    assert not mism, f"(value, ref, ours): {mism}"


# --- round 2: container fields through the JSON loads pipeline -------------

import json as _json


def _json_rows(values):
    """Build JSON object strings exercising list/dict/nested shapes."""
    return values


CONTAINER_SEEDS = [
    '{"xs": [1, 2, 3], "m": {"a": 1}, "n": {"z": 5}}',
    '{"xs": ["1", "zz", 3], "m": {"a": "bad"}, "n": {"z": "q"}}',
    '{"xs": [], "m": {}, "n": {"z": 0}}',
    '{"xs": null, "m": null, "n": null}',
    '{"xs": [null], "m": {"k": null}, "n": {}}',
    '{"m": {"1": 2, "a.b": 3}}',
    '{"xs": [1e309]}',
    '{"n": {"z": 1, "extra": 2}}',
    "{}",
]


class OursContainers(Schema):
    class NZ(Schema):
        z = fields.Integer()

    xs = fields.List(fields.Integer())
    m = fields.Dict(keys=fields.String(), values=fields.Integer())
    n = fields.Nested(NZ)

    class Meta:
        unknown = "exclude"


class _RefNZ(ref.Schema):
    z = ref.fields.Integer()


class RefContainers(ref.Schema):
    xs = ref.fields.List(ref.fields.Integer())
    m = ref.fields.Dict(keys=ref.fields.String(), values=ref.fields.Integer())
    n = ref.fields.Nested(_RefNZ, unknown="exclude")

    class Meta:
        unknown = "exclude"


def _norm_tree(d):
    if isinstance(d, dict):
        return {str(k): _norm_tree(v) for k, v in d.items()}
    if isinstance(d, list):
        return sorted(str(x) for x in d)
    return str(d)


@pytest.mark.parametrize("raw", CONTAINER_SEEDS)
def test_container_loads_parity(spark, raw):
    refs = RefContainers()
    try:
        refs.load(_json.loads(raw))
        want = {}
    except ref.ValidationError as e:
        want = e.messages
    df = spark.createDataFrame([(raw,)], "j string")
    res = OursContainers().loads_df(df, "j")
    tree = res.messages()
    got = tree.get(0, tree.get(list(tree)[0] if tree else None, {}))
    assert _norm_tree(got) == _norm_tree(want), f"{raw}: got={got} want={want}"


# --- round 2: JSON token-type fidelity through loads -----------------------

KIND_CASES = [
    '{"i": 1.5, "s": "ok", "b": true, "istr": 3}',
    '{"i": -2.7, "s": 1.5, "b": 1, "istr": "4"}',
    '{"i": 1e309, "s": true, "b": 1.0, "istr": 5.0}',
    '{"i": "1.5", "s": "x", "b": 0.0, "istr": true}',
    '{"i": "7", "s": 9, "b": 2.5, "istr": 6}',
    '{"i": 2, "s": [1], "b": "yes", "istr": "no"}',
    '{"i": 1e15, "s": {"a": 1}, "b": "0", "istr": 1.25}',
]


class OursKinds(Schema):
    i = fields.Integer()
    s = fields.String()
    b = fields.Boolean()
    istr = fields.Integer(strict=True)

    class Meta:
        unknown = "exclude"


class RefKinds(ref.Schema):
    i = ref.fields.Integer()
    s = ref.fields.String()
    b = ref.fields.Boolean()
    istr = ref.fields.Integer(strict=True)

    class Meta:
        unknown = "exclude"


@pytest.mark.parametrize("raw", KIND_CASES)
def test_json_token_type_fidelity(spark, raw):
    refs = RefKinds()
    data = _json.loads(raw)
    try:
        want_out = refs.load(data)
        want_err = {}
    except ref.ValidationError as e:
        want_err = e.messages
        want_out = None
    df = spark.createDataFrame([(raw,)], "j string")
    res = OursKinds().loads_df(df, "j")
    tree = res.messages()
    got_err = next(iter(tree.values()), {}) if tree else {}
    assert _norm_tree(got_err) == _norm_tree(want_err), (
        f"{raw}: got={got_err} want={want_err}"
    )
    if want_out is not None:
        row = res.valid.collect()[0].asDict()
        assert row == want_out, f"{raw}: loaded={row} want={want_out}"


# --- round 3: TimeDelta precisions + custom Boolean token sets -------------

ALPHABET3 = "0123456789+-_. exXoOnNyYtTfF"
#: NOTE: counts whose duration exceeds +-2^63 us (~292471 years) are a
#: DOCUMENTED divergence (int64-microsecond internal repr; see
#: _timedelta_unit_bounds and test_timedelta_int64_ceiling) — seeds and
#: the 18-char text cap keep the fuzz inside the parity envelope.
EDGE_SEEDS3 = [
    "1", "-1", " 2 ", "1_0", "00", "+5", "1.5", "1e2", "0x10", "", "_1",
    "1_", "99999999999999999", "86400000000000", "-86399999999999",
    "999999999", "1000000000", "y", "N", "ON", "off",
    "TRUE", "faLse", "0", "2",
]
value_strategy3 = st.one_of(
    st.sampled_from(EDGE_SEEDS3), st.text(alphabet=ALPHABET3, max_size=18)
)


class OursSchema3(Schema):
    td = fields.TimeDelta()
    tdu = fields.TimeDelta(precision="microseconds")
    tdw = fields.TimeDelta(precision="weeks")
    b = fields.Boolean(truthy={"y", "ON", "2"}, falsy={"N", "off", "0"})


class RefSchema3(ref.Schema):
    td = ref.fields.TimeDelta()
    tdu = ref.fields.TimeDelta(precision="microseconds")
    tdw = ref.fields.TimeDelta(precision="weeks")
    b = ref.fields.Boolean(truthy={"y", "ON", "2"}, falsy={"N", "off", "0"})


COLS3 = ["td", "tdu", "tdw", "b"]


@pytest.fixture(scope="module")
def engines3(spark):
    return spark, OursSchema3(row_key="rid", unknown="exclude"), RefSchema3()


@settings(max_examples=4, deadline=None)
@given(st.lists(value_strategy3, min_size=40, max_size=40))
def test_timedelta_boolean_fuzz_parity(engines3, values):
    spark, ours, refs = engines3
    rows = [{c: v for c in COLS3} for v in values]
    ref_errors = refs.validate(rows, many=True)
    df = spark.createDataFrame(
        [tuple([i] + [v] * len(COLS3)) for i, v in enumerate(values)],
        "rid long, " + ", ".join(f"{c} string" for c in COLS3),
    )
    got: dict = {}
    for r in ours.validate_df(df).violations.collect():
        got.setdefault(int(r.rid), {}).setdefault(r.field, []).append(r.message)
    ref_norm = {
        i: {f: sorted(m) for f, m in e.items()} for i, e in ref_errors.items()
    }
    our_norm = {i: {f: sorted(m) for f, m in e.items()} for i, e in got.items()}
    mism = {
        i: (values[i], ref_norm.get(i), our_norm.get(i))
        for i in set(ref_norm) | set(our_norm)
        if ref_norm.get(i) != our_norm.get(i)
    }
    assert not mism, f"(value, ref, ours): {mism}"


def test_timedelta_int64_ceiling(spark):
    """Documented divergence + wraparound regression: counts whose
    duration exceeds +-2^63 microseconds (~292471 years — Spark's own
    DayTimeIntervalType ceiling) are REJECTED, never silently wrapped
    (long*long overflow wraps with ANSI off), even though Python's
    2.7M-year timedelta accepts some of them; in-range boundary values
    load exactly."""
    from marshmallow_spark import Schema, fields as f

    class S(Schema):
        td = f.TimeDelta()

        class Meta:
            row_key = "rid"
            unknown = "exclude"

    hi_ok = 9223372036854          # floor(2^63-1 / 1e6) seconds
    cases = [
        (0, str(hi_ok), True),
        (1, str(hi_ok + 1), False),        # wrapped to garbage before the fix
        (2, "86399999999999", False),      # ref-valid, beyond int64 us: documented reject
        (3, str(10**17), False),           # invalid on both sides
        (4, str(-hi_ok), True),
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v, _ in cases], "rid long, td string"
    )
    res = S().validate_df(df)
    bad = {int(r.rid) for r in res.violations.collect()}
    for i, v, ok in cases:
        assert (i not in bad) == ok, (v, "accepted" if i not in bad else "rejected")


# --- round 3: generated-JSON loads fuzz (post one-pass refactor) -----------

_json_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(10**12), max_value=10**12),
    # floats stay inside the engine's documented int64 truncation
    # domain: the reference's int() is arbitrary-precision, the engine
    # emits "Number too large." at/beyond 2^63 (a documented
    # divergence pinned by test_integer_float_int64_ceiling, not a
    # parity target for this fuzz)
    st.floats(
        allow_nan=False,
        allow_infinity=False,
        width=32,
        min_value=-(2.0**62),
        max_value=2.0**62,
    ),
    st.text(alphabet="abz019._-", max_size=8),
)


def _obj_strategy():
    return st.fixed_dictionaries(
        {},
        optional={
            "xs": st.one_of(_json_scalars, st.lists(_json_scalars, max_size=4)),
            "m": st.one_of(
                _json_scalars,
                st.dictionaries(st.text(alphabet="ab1", min_size=1, max_size=3),
                                _json_scalars, max_size=3),
            ),
            "n": st.one_of(
                _json_scalars,
                st.fixed_dictionaries({}, optional={"z": _json_scalars}),
            ),
            "junk": _json_scalars,
        },
    )


class OursKeyedContainers(Schema):
    k = fields.Integer(required=True)
    xs = fields.List(fields.Integer())
    m = fields.Dict(keys=fields.String(), values=fields.Integer())
    n = fields.Nested(OursContainers.NZ)

    class Meta:
        unknown = "exclude"
        row_key = "k"


class RefKeyedContainers(ref.Schema):
    k = ref.fields.Integer(required=True)
    xs = ref.fields.List(ref.fields.Integer())
    m = ref.fields.Dict(keys=ref.fields.String(), values=ref.fields.Integer())
    n = ref.fields.Nested(_RefNZ, unknown="exclude")

    class Meta:
        unknown = "exclude"


@settings(max_examples=6, deadline=None)
@given(st.lists(_obj_strategy(), min_size=12, max_size=12))
def test_generated_json_loads_parity(spark, objs):
    """Random JSON objects through the ONE-PASS loads pipeline vs the
    reference loading the same parsed objects: identical message trees
    row by row (containers, unknown keys, missing-vs-null, type kinds).
    Row identity rides a declared integer row key."""
    objs = [dict(o, k=i) for i, o in enumerate(objs)]
    refs = RefKeyedContainers()
    raws = [_json.dumps(o) for o in objs]
    want = []
    for o in objs:
        try:
            refs.load(o)
            want.append({})
        except ref.ValidationError as e:
            want.append(e.messages)
    df = spark.createDataFrame([(r,) for r in raws], "j string")
    res = OursKeyedContainers().loads_df(df, "j")
    tree = res.messages()
    mism = []
    for i in range(len(objs)):
        got = tree.get(i, tree.get(str(i), {}))
        if _norm_tree(got) != _norm_tree(want[i]):
            mism.append((raws[i], want[i], got))
    assert not mism, mism[:3]


def test_integer_float_int64_ceiling(spark):
    """Fuzz-found r3: a finite JSON double at the float32 extreme
    (3.4e38) used to CRASH the task with ANSI CAST_OVERFLOW in the
    kinded float->long truncation. Engine policy (documented int64
    ceiling, same as JSON bigint tokens beyond int64): finite doubles
    at/beyond 2^63 are "Number too large." in every container path;
    exactly -2^63 is a valid long; in-range floats truncate like
    int()."""
    import json as _j

    from marshmallow_spark import Schema, fields

    class S(Schema):
        k = fields.Integer(required=True)
        xs = fields.List(fields.Integer())
        m = fields.Dict(keys=fields.String(), values=fields.Integer())
        n = fields.Integer()

        class Meta:
            unknown = "exclude"
            row_key = "k"

    objs = [
        {"k": 0, "n": -3.4028234663852886e38},
        {"k": 1, "xs": [-3.4028234663852886e38]},
        {"k": 2, "m": {"a": 3.4028234663852886e38}},
        {"k": 3, "n": 1.5},
        {"k": 4, "n": 9.3e18},
        {"k": 5, "n": -9.223372036854776e18},  # exactly -2^63
    ]
    df = spark.createDataFrame([(_j.dumps(o),) for o in objs], "j string")
    res = S().loads_df(df, "j")
    tree = {int(k): v for k, v in res.messages().items()}
    assert tree == {
        0: {"n": ["Number too large."]},
        1: {"xs": {0: ["Number too large."]}},
        2: {"m": {"a": {"value": ["Number too large."]}}},
        4: {"n": ["Number too large."]},
    }
    loaded = {r.k: r for r in res.valid.collect()}
    assert loaded[3].n == 1  # int(1.5) truncation parity
    assert loaded[5].n == -(1 << 63)
