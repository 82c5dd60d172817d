"""Core Schema.validate_df semantics: violations / valid / verdicts.

Mirrors the assertion style of the reference's tests/test_schema.py
(error shapes, multiple errors per row, valid_data) on tiny in-memory
DataFrames.
"""

import pytest
from pyspark.sql import functions as F

from marshmallow_spark import (
    EXCLUDE,
    INCLUDE,
    RAISE,
    Schema,
    ValidationError,
    fields,
    validate,
)


class ClipSchema(Schema):
    clip_id = fields.String(required=True)
    sr_hz = fields.Integer(validate=validate.OneOf([8000, 16000, 22050, 44100]))
    dur_ms = fields.Integer(validate=validate.Range(min=1, max=100000))
    codec = fields.String(validate=validate.OneOf(["pcm16", "ulaw", "alaw"]))
    transcript = fields.String(allow_none=False)

    class Meta:
        row_key = "clip_id"
        unknown = RAISE


@pytest.fixture(scope="module")
def clips_df(spark):
    rows = [
        ("c1", 16000, 1000, "pcm16", "hello world"),
        ("c2", 12345, 1000, "pcm16", "ok"),          # bad sr
        ("c3", 8000, -5, "ulaw", "neg dur"),          # bad dur
        ("c4", 44100, 1000, "mp3", "bad codec"),      # bad codec
        ("c5", 22050, 1000, "alaw", None),            # null transcript
        ("c6", 0, 0, "wat", None),                    # 4 violations
    ]
    return spark.createDataFrame(
        rows, "clip_id string, sr_hz int, dur_ms int, codec string, transcript string"
    )


def test_violations_shape_and_messages(clips_df):
    res = ClipSchema().validate_df(clips_df)
    v = {(r.clip_id, r.field): r.message for r in res.violations.collect()}
    assert v[("c2", "sr_hz")] == "Must be one of: 8000, 16000, 22050, 44100."
    assert (
        v[("c3", "dur_ms")]
        == "Must be greater than or equal to 1 and less than or equal to 100000."
    )
    assert v[("c4", "codec")] == "Must be one of: pcm16, ulaw, alaw."
    assert v[("c5", "transcript")] == "Field may not be null."
    # c6 has multiple violations (And-collect semantics, no short-circuit)
    c6 = [k for k in v if k[0] == "c6"]
    assert len(c6) == 4


def test_valid_excludes_bad_rows(clips_df):
    res = ClipSchema().validate_df(clips_df)
    assert [r.clip_id for r in res.valid.orderBy("clip_id").collect()] == ["c1"]


def test_valid_data_nulls_bad_cells(clips_df):
    res = ClipSchema().validate_df(clips_df)
    rows = {r.clip_id: r for r in res.valid_data.collect()}
    assert rows["c2"].sr_hz is None
    assert rows["c2"].dur_ms == 1000  # untouched cell survives
    assert rows["c1"].sr_hz == 16000


def test_verdicts_totals(clips_df):
    res = ClipSchema().validate_df(clips_df)
    agg = res.verdicts.agg(
        F.sum("rows").alias("r"), F.sum("failed_rows").alias("f")
    ).first()
    assert agg.r == 6
    assert agg.f == 5


def test_messages_tree(clips_df):
    res = ClipSchema().validate_df(clips_df)
    tree = res.messages()
    assert tree["c5"] == {"transcript": ["Field may not be null."]}
    assert set(tree["c6"]) == {"sr_hz", "dur_ms", "codec", "transcript"}


def test_load_raises(clips_df):
    with pytest.raises(ValidationError) as ei:
        ClipSchema().load_df(clips_df)
    assert "c5" in ei.value.messages


def test_load_ok(spark):
    df = spark.createDataFrame(
        [("a", 8000, 5, "pcm16", "x")],
        "clip_id string, sr_hz int, dur_ms int, codec string, transcript string",
    )
    out = ClipSchema().load_df(df)
    assert out.count() == 1


def test_required_missing_column(spark):
    df = spark.createDataFrame([(1,)], "sr_hz int")
    res = ClipSchema(unknown=EXCLUDE).validate_df(df)
    msgs = {(r.field, r.message) for r in res.violations.collect()}
    assert ("clip_id", "Missing data for required field.") in msgs


def test_unknown_raise_exclude_include(spark):
    df = spark.createDataFrame(
        [("a", 8000, 5, "pcm16", "x", 99)],
        "clip_id string, sr_hz int, dur_ms int, codec string, transcript string, extra int",
    )
    res = ClipSchema().validate_df(df)
    msgs = {(r.field, r.message) for r in res.violations.collect()}
    assert ("extra", "Unknown field.") in msgs

    res2 = ClipSchema(unknown=EXCLUDE).validate_df(df)
    assert res2.violations.count() == 0
    assert "extra" not in res2.valid.columns

    res3 = ClipSchema(unknown=INCLUDE).validate_df(df)
    assert "extra" in res3.valid.columns


def test_partial_skips_required(spark):
    df = spark.createDataFrame([(8000,)], "sr_hz int")
    res = ClipSchema(partial=True, unknown=EXCLUDE).validate_df(df)
    assert res.violations.count() == 0


def test_only_exclude(spark, clips_df):
    s = ClipSchema(only=["clip_id", "sr_hz"])
    assert set(s.fields) == {"clip_id", "sr_hz"}
    s2 = ClipSchema(exclude=["transcript"])
    assert "transcript" not in s2.fields


def test_data_key_alias(spark):
    class S(Schema):
        internal = fields.Integer(data_key="external", required=True)

    df = spark.createDataFrame([(5,)], "external int")
    res = S().validate_df(df)
    assert res.violations.count() == 0
    assert res.valid.columns[-1] == "internal"
    assert res.valid.first().internal == 5


def test_data_key_collision_raises():
    with pytest.raises(ValueError, match="data_key"):
        class S(Schema):
            a = fields.Integer(data_key="x")
            b = fields.Integer(data_key="x")

        S()


def test_load_default_fills_missing_column(spark):
    class S(Schema):
        a = fields.Integer(required=True)
        b = fields.Integer(load_default=7)

    df = spark.createDataFrame([(1,)], "a int")
    res = S().validate_df(df)
    assert res.violations.count() == 0
    assert res.valid.first().b == 7


def test_dump_projection(spark):
    class S(Schema):
        name = fields.String()
        when = fields.Date(data_key="whenExternal")
        secret = fields.String(load_only=True)

    df = spark.createDataFrame(
        [("x", "2024-01-02", "s")], "name string, when string, secret string"
    ).withColumn("when", F.to_date("when"))
    out = S().dump_df(df)
    assert out.columns == ["name", "whenExternal"]
    assert out.first().whenExternal == "2024-01-02"


def test_meta_include_keyword_field(spark):
    """Meta.include is the escape hatch for Python-keyword field names
    (parity: src/marshmallow/schema.py:112,225)."""

    class S(Schema):
        n = fields.Integer()

        class Meta:
            row_key = "rid"
            include = {"from": fields.String(required=True)}

    df = spark.createDataFrame(
        [("a", "1", "x"), ("b", "2", None)], "rid string, n string, `from` string"
    )
    res = S().validate_df(df)
    v = {(r["rid"], r["field"], r["message"]) for r in res.violations.collect()}
    assert v == {("b", "from", "Field may not be null.")}
    assert "from" in res.valid.columns


def test_meta_timeformat_pulled_at_bind(spark):
    """Time fields honor Meta.timeformat like DateTime honors
    Meta.datetimeformat (parity: SCHEMA_OPTS_VAR_NAME='timeformat')."""
    import sys
    sys.path.insert(0, "/root/reference/src")
    import marshmallow as mm

    class S(Schema):
        t = fields.Time()

        class Meta:
            row_key = "rid"
            timeformat = "%H.%M"

    class R(mm.Schema):
        t = mm.fields.Time()

        class Meta:
            timeformat = "%H.%M"

    df = spark.createDataFrame(
        [("a", "10.30"), ("b", "10:30")], "rid string, t string"
    )
    res = S().validate_df(df)
    v = {(r["rid"], r["message"]) for r in res.violations.collect()}
    # reference: "10.30" parses with the custom format, "10:30" fails
    R().load({"t": "10.30"})
    try:
        R().load({"t": "10:30"})
        raise AssertionError("reference accepted iso under custom format?")
    except mm.ValidationError as e:
        ref_msg = e.messages["t"][0]
    assert v == {("b", ref_msg)}
    got = [r["t"] for r in res.valid.collect()]
    assert got == ["10:30:00"]


def test_time_explicit_format_and_dump(spark):
    class S(Schema):
        t = fields.Time(format="%H-%M-%S")

        class Meta:
            row_key = "rid"

    df = spark.createDataFrame([("a", "23-59-58")], "rid string, t string")
    res = S().validate_df(df)
    assert res.violations.isEmpty()
    assert res.valid.collect()[0].t == "23:59:58"
    dumped = S().dump_df(res.valid.withColumnRenamed("t", "t")).collect()[0]
    assert dumped.t == "23-59-58"


def test_render_module_pluggable_codec(spark):
    """Meta.render_module parity (reference schema.py:212-221; exercised
    with simplejson at tests/base.py:211-212): the codec's loads decides
    what parses; its dumps formats the output."""
    import json as _json

    class CommentTolerantCodec:
        """Accepts '//'-prefixed JSON on load; dumps with sorted keys
        and custom separators so usage is observable."""

        @staticmethod
        def loads(s):
            return _json.loads(s[2:] if s.startswith("//") else s)

        @staticmethod
        def dumps(obj):
            return _json.dumps(obj, sort_keys=True, separators=("|", "=>"))

    class S(Schema):
        a = fields.Integer(required=True)
        b = fields.String()

        class Meta:
            render_module = CommentTolerantCodec

    df = spark.createDataFrame(
        [('//{"a": 1, "b": "x"}',), ('{"a": 2, "b": "y"}',), ("{nope",)],
        "j string",
    )
    res = S().loads_df(df, "j")
    v = {(r["field"], r["message"]) for r in res.violations.collect()}
    assert v == {("_schema", "Invalid input type.")}
    assert res.valid.count() == 2  # the //-prefixed row parsed via codec

    out = sorted(
        r["json"]
        for r in S().dumps_df(
            spark.createDataFrame([(1, "x")], "a int, b string")
        ).collect()
    )
    assert out == ['{"a"=>1|"b"=>"x"}']


def test_meta_fields_inferred_type_mapping(spark):
    """Meta.fields entries without declared fields resolve their field
    class from the column dtype via Schema.TYPE_MAPPING (T23; parity:
    Inferred + TYPE_MAPPING, reference fields.py:2086-2111)."""

    class S(Schema):
        class Meta:
            row_key = "rid"
            fields = ("n", "f", "s", "b", "rid")

    df = spark.createDataFrame(
        [("a", 1, 2.5, "x", True)],
        "rid string, n long, f double, s string, b boolean",
    )
    inst = S()
    res = inst.validate_df(df)
    assert res.violations.isEmpty()
    row = res.valid.collect()[0]
    assert (row.n, row.f, row.s, row.b) == (1, 2.5, "x", True)
    # dump side round-trips through the inferred fields too
    out = inst.dump_df(df).collect()[0]
    assert out.n == 1 and out.b is True


def test_per_call_partial_override(spark):
    """validate_df(partial=...) overrides the constructor setting for
    one call (parity: schema.py:846-847)."""

    class S(Schema):
        a = fields.Integer(required=True)
        b = fields.Integer(required=True)

        class Meta:
            row_key = "rid"

    df = spark.createDataFrame([("r", "1")], "rid string, a string")
    strict = S().validate_df(df)
    assert {(r["field"], r["message"]) for r in strict.violations.collect()} == {
        ("b", "Missing data for required field.")
    }
    # partial=True: all required checks dropped for this call
    assert S().validate_df(df, partial=True).violations.isEmpty()
    # per-field list
    assert S().validate_df(df, partial=["b"]).violations.isEmpty()
    # the schema instance is unchanged afterwards
    s = S()
    s.validate_df(df, partial=True)
    assert not s.validate_df(df).violations.isEmpty()
