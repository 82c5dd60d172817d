"""Regression tests for round-1 advisor findings: NULL-propagating
type_entries on regex-validated string fields, loads_df row-id
collisions, ISO datetimes with tz but no seconds, float whitespace +
underscore grouping, and map-key paths in the message tree."""

import sys

import pytest

sys.path.insert(0, "/root/reference/src")
import marshmallow as mm  # noqa: E402

from marshmallow_spark import Schema, fields  # noqa: E402


def _violations(spark, spark_field, value, ddl_type):
    class S(Schema):
        v = spark_field

        class Meta:
            row_key = "k"

    df = spark.createDataFrame([("0", value)], f"k string, v {ddl_type}")
    return {
        (r["field"], r["message"])
        for r in S().validate_df(df).violations.collect()
    }


@pytest.mark.parametrize(
    "mk_field,ddl,msg",
    [
        (fields.UUID, "int", "Not a valid UUID."),
        (fields.UUID, "double", "Not a valid UUID."),
        (fields.IP, "int", "Not a valid IP address."),
        (fields.IPv4, "int", "Not a valid IPv4 address."),
        (fields.IPv6, "int", "Not a valid IPv6 address."),
        (fields.IPInterface, "int", "Not a valid IP interface."),
        (fields.IPv4Interface, "int", "Not a valid IPv4 interface."),
    ],
)
def test_non_string_source_flags_not_nulls(spark, mk_field, ddl, msg):
    # rlike(NULL) is NULL: without an explicit isNull() term the entry
    # condition never fires and bad rows land in `valid` silently.
    value = 5.0 if ddl == "double" else 5
    assert _violations(spark, mk_field(), value, ddl) == {("v", msg)}


def test_uuid_string_still_accepted(spark):
    ok = "ce9a2f46-9d2c-45a5-bd2f-05dbe46ba9b5"
    assert _violations(spark, fields.UUID(), ok, "string") == set()
    assert _violations(spark, fields.UUID(), "nope", "string") == {
        ("v", "Not a valid UUID.")
    }


@pytest.mark.parametrize(
    "s",
    [
        "2024-01-01T10:00Z",
        "2024-01-01 10:00+05:30",
        "2024-01-01T10:00",
        "2024-01-01T10:00:05Z",
        "2024-01-01T10:00:05.123456+02:00",
        "2024-01-01T10:00+05",
        "2024-01-01",           # ref rejects: date, not datetime
        "2024-01-01T10",        # ref rejects: no minute
    ],
)
def test_iso_datetime_secondsless_tz_parity(spark, s):
    try:
        mm.Schema.from_dict({"v": mm.fields.DateTime()})().load({"v": s})
        want = set()
    except mm.ValidationError as e:
        want = {("v", e.messages["v"][0])}
    assert _violations(spark, fields.DateTime(), s, "string") == want


@pytest.mark.parametrize("s", [" 1_000 ", "\t2_5.5\n", " inf ", "1__0", "_1"])
def test_float_whitespace_and_underscores_parity(spark, s):
    try:
        mm.Schema.from_dict({"v": mm.fields.Float()})().load({"v": s})
        want = set()
    except mm.ValidationError as e:
        want = {("v", e.messages["v"][0])}
    assert _violations(spark, fields.Float(), s, "string") == want


def test_loads_df_ids_do_not_collide(spark):
    class S(Schema):
        a = fields.Integer(required=True)

    df = spark.createDataFrame(
        [('{"a": "zz"}',), ("not json",), ('{"a": 1}',), ("[1,2]",)],
        "j string",
    )
    res = S().loads_df(df, "j")
    v = [tuple(r) for r in res.violations.select("row_id", "field").collect()]
    assert len(v) == 3
    schema_keys = {k for k, f in v if f == "_schema"}
    field_keys = {k for k, f in v if f == "a"}
    assert not schema_keys & field_keys
    assert len(res.messages()) == 3


def test_loads_df_declared_row_key_survives(spark):
    class SK(Schema):
        k = fields.String(required=True)
        a = fields.Integer()

        class Meta:
            row_key = "k"

    df = spark.createDataFrame(
        [('{"k": "r1", "a": "zz"}',), ("garbage",)], "j string"
    )
    v = {
        (r["k"], r["field"])
        for r in SK().loads_df(df, "j").violations.collect()
    }
    assert ("r1", "a") in v
    assert any(f == "_schema" and k != "r1" for k, f in v)


def test_map_key_paths_keep_string_identity(spark):
    class M(Schema):
        m = fields.Dict(keys=fields.String(), values=fields.Integer())

        class Meta:
            row_key = "rk"

    df = spark.createDataFrame(
        [("x", {"1": "bad", "a.b": "bad2", "ok": "3"})],
        "rk string, m map<string,string>",
    )
    inner = M().validate_df(df).messages()["x"]["m"]
    # reference keys the error dict by the ORIGINAL key object
    assert set(inner) == {"1", "a.b"}
    assert 1 not in inner


def test_list_indices_still_int_keyed(spark):
    class L(Schema):
        xs = fields.List(fields.Integer())

        class Meta:
            row_key = "rk"

    df = spark.createDataFrame([("y", ["1", "zz"])], "rk string, xs array<string>")
    assert 1 in L().validate_df(df).messages()["y"]["xs"]


def test_loads_df_missing_vs_null_per_row(spark):
    """Per-row absent-key vs null-valued-key distinction on JSON input
    (reference `missing` sentinel, utils.py:27-44; fields.py:311-318)."""
    import marshmallow as mm2

    class R(mm2.Schema):
        a = mm2.fields.Integer(required=True)
        b = mm2.fields.Integer(load_default=7)

    class S(Schema):
        a = fields.Integer(required=True)
        b = fields.Integer(load_default=7)

    rows = ['{"a": 1}', '{"a": null}', "{}", '{"a": 2, "b": null}',
            '{"a": 3, "b": 4}']
    df = spark.createDataFrame([(r,) for r in rows], "j string")
    res = S().loads_df(df, "j")
    tree = res.messages()
    # reference expectations, row by row
    want = {}
    for i, r in enumerate(rows):
        import json as _json
        try:
            R().load(_json.loads(r))
        except mm2.ValidationError as e:
            want[i] = e.messages
    # row ids are partition-based, not sequential: compare the multiset
    # of per-row error dicts and that each landed on a distinct row
    got = sorted(
        str({fk: sorted(v) for fk, v in d.items()}) for d in tree.values()
    )
    want_l = sorted(
        str({fk: sorted(v) for fk, v in d.items()}) for d in want.values()
    )
    assert got == want_l, f"got={got} want={want_l}"
    # load_default fills the MISSING b (row 0); the present-null row is
    # invalid (allow_none=False since load_default != None) and excluded
    vals = {r["a"]: r["b"] for r in res.valid.collect()}
    assert vals == {1: 7, 3: 4}


def test_loads_df_per_row_unknown_raise(spark):
    class S(Schema):
        a = fields.Integer()
        # unknown defaults to RAISE

    df = spark.createDataFrame(
        [('{"a": 1, "zz": 9}',), ('{"a": 2}',)], "j string"
    )
    v = {
        (r["field"], r["message"])
        for r in S().loads_df(df, "j").violations.collect()
    }
    assert v == {("zz", "Unknown field.")}


def test_naive_datetime_timezone_conversion(spark):
    """NaiveDateTime(timezone=tz) converts aware inputs instead of
    rejecting (reference fields.py:1308-1343)."""
    import datetime as dt

    class S(Schema):
        t = fields.NaiveDateTime(timezone=dt.timezone(dt.timedelta(hours=2)))

        class Meta:
            row_key = "k"

    df = spark.createDataFrame(
        [("a", "2024-01-01T10:00:00+05:00"), ("b", "2024-01-01T10:00:00")],
        "k string, t string",
    )
    res = S().validate_df(df)
    assert res.violations.isEmpty()
    got = sorted(str(r["t"]) for r in res.valid.collect())
    # reference: 10:00+05:00 -> 05:00 UTC -> 07:00 at +02, tz dropped;
    # internal repr is a UTC-session timestamp holding that wall time
    assert got == ["2024-01-01 07:00:00", "2024-01-01 10:00:00"]

    class Strict(Schema):
        t = fields.NaiveDateTime()

        class Meta:
            row_key = "k"

    v = {
        (r["k"], r["message"])
        for r in Strict().validate_df(df).violations.collect()
    }
    assert v == {("a", "Not a valid naive datetime.")}


def test_aware_datetime_default_timezone(spark):
    import datetime as dt

    class S(Schema):
        t = fields.AwareDateTime(
            default_timezone=dt.timezone(dt.timedelta(hours=5, minutes=30))
        )

        class Meta:
            row_key = "k"

    df = spark.createDataFrame(
        [("a", "2024-01-01T10:00:00"), ("b", "2024-01-01T10:00:00+00:00")],
        "k string, t string",
    )
    res = S().validate_df(df)
    assert res.violations.isEmpty()
    got = {r["k"]: str(r["t"]) for r in res.valid.join(
        spark.createDataFrame([("a",), ("b",)], "k string"), "k", "inner"
    ).collect()} if False else None
    vals = sorted(str(r["t"]) for r in res.valid.collect())
    # naive 10:00 read as +05:30 -> 04:30 UTC instant; aware kept
    assert vals == ["2024-01-01 04:30:00", "2024-01-01 10:00:00"]

    class Strict(Schema):
        t = fields.AwareDateTime()

        class Meta:
            row_key = "k"

    v = {
        (r["k"], r["message"])
        for r in Strict().validate_df(df).violations.collect()
    }
    assert v == {("a", "Not a valid aware datetime.")}


def test_timedelta_dump_floor_and_float(spark):
    """Reference TimeDelta._serialize floor-divides for int and divides
    exactly for float (fields.py:1508-1520)."""
    import datetime as dt

    ref_i = mm.Schema.from_dict(
        {"d": mm.fields.TimeDelta(precision="seconds")}
    )()
    ref_f = mm.Schema.from_dict(
        {"d": mm.fields.TimeDelta(precision="seconds", serialization_type=float)}
    )()
    td = dt.timedelta(microseconds=-1_500_000)  # -1.5 s
    want_i = ref_i.dump({"d": td})["d"]
    want_f = ref_f.dump({"d": td})["d"]

    class SI(Schema):
        d = fields.TimeDelta(precision="seconds")

    class SF(Schema):
        d = fields.TimeDelta(precision="seconds", serialization_type=float)

    df = spark.createDataFrame([(-1_500_000,)], "d long")
    got_i = SI().dump_df(df).collect()[0]["d"]
    got_f = SF().dump_df(df).collect()[0]["d"]
    assert got_i == want_i == -2
    assert got_f == want_f == -1.5
