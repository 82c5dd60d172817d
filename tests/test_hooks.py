"""Hook pipeline coverage (H1-H6): pre/post_load, pre/post_dump,
validates, validates_schema with skip_on_field_errors gating."""

from pyspark.sql import functions as F

from marshmallow_spark import Schema, fields, validate
from marshmallow_spark.decorators import (
    post_dump,
    post_load,
    pre_dump,
    pre_load,
    validates,
    validates_schema,
)


def viol_map(res, key="rid"):
    out = {}
    for r in res.violations.collect():
        out.setdefault(r[key], set()).add((r.field, r.message))
    return out


def test_pre_load_transform_runs_before_checks(spark):
    class S(Schema):
        name = fields.String(validate=validate.Length(min=3))

        class Meta:
            row_key = "rid"

        @pre_load
        def strip_name(self, df):
            return df.withColumn("name", F.trim("name"))

    df = spark.createDataFrame([("a", "  ab  ")], "rid string, name string")
    v = viol_map(S().validate_df(df))
    # trimmed to "ab" -> Length(min=3) fails on the TRIMMED value
    assert v == {"a": {("name", "Shorter than minimum length 3.")}}


def test_post_load_only_on_valid_branch(spark):
    class S(Schema):
        n = fields.Integer()

        class Meta:
            row_key = "rid"

        @post_load
        def add_double(self, df):
            return df.withColumn("n2", F.col("n") * 2)

    df = spark.createDataFrame([("a", "3"), ("b", "zz")], "rid string, n string")
    res = S().validate_df(df)
    valid = res.valid.collect()
    assert len(valid) == 1 and valid[0].n2 == 6
    # the violating row still appears in violations (post_load skipped)
    assert ("n", "Not a valid integer.") in viol_map(res)["b"]


def test_validates_field_hook(spark):
    class S(Schema):
        sku = fields.String()

        class Meta:
            row_key = "rid"

        @validates("sku")
        def check_sku(self, col):
            # boolean Column: True = violation
            return (~col.startswith("SKU-"), "Must start with SKU-.")

    df = spark.createDataFrame([("a", "SKU-1"), ("b", "X-2")], "rid string, sku string")
    v = viol_map(S().validate_df(df))
    assert v == {"b": {("sku", "Must start with SKU-.")}}


def test_validates_schema_cross_field(spark):
    class S(Schema):
        lo = fields.Integer()
        hi = fields.Integer()

        class Meta:
            row_key = "rid"

        @validates_schema
        def lo_le_hi(self):
            return (F.col("lo") > F.col("hi"), "lo must not exceed hi")

    df = spark.createDataFrame(
        [("a", "1", "2"), ("b", "5", "3")], "rid string, lo string, hi string"
    )
    v = viol_map(S().validate_df(df))
    assert v == {"b": {("_schema", "lo must not exceed hi")}}


def test_validates_schema_skip_on_field_errors(spark):
    class S(Schema):
        lo = fields.Integer()
        hi = fields.Integer()

        class Meta:
            row_key = "rid"

        @validates_schema  # skip_on_field_errors=True by default
        def lo_le_hi(self):
            return (F.col("lo") > F.col("hi"), "lo must not exceed hi")

    class NoSkip(S):
        @validates_schema(skip_on_field_errors=False)
        def lo_le_hi(self):  # noqa: F811 - override
            return (F.col("lo") > F.col("hi"), "lo must not exceed hi")

    # row b: field error on hi AND lo>hi would hold if compared vs null -> null cond
    df = spark.createDataFrame(
        [("b", "9", "zz"), ("c", "9", "3")], "rid string, lo string, hi string"
    )
    v = viol_map(S().validate_df(df))
    # gated: b only has the cast violation, NOT the cross-field one
    assert v["b"] == {("hi", "Not a valid integer.")}
    assert v["c"] == {("_schema", "lo must not exceed hi")}

    v2 = viol_map(NoSkip().validate_df(df))
    assert v2["c"] == {("_schema", "lo must not exceed hi")}


def test_validates_schema_field_name_key(spark):
    class S(Schema):
        a = fields.Integer()
        b = fields.Integer()

        class Meta:
            row_key = "rid"

        @validates_schema(field_name="b")
        def b_gt_a(self):
            return (F.col("b") <= F.col("a"), "b must exceed a")

    df = spark.createDataFrame([("r", "5", "2")], "rid string, a string, b string")
    v = viol_map(S().validate_df(df))
    assert v == {"r": {("b", "b must exceed a")}}


def test_dump_hooks_order(spark):
    class S(Schema):
        name = fields.String()

        class Meta:
            row_key = "rid"

        @pre_dump
        def upper(self, df):
            return df.withColumn("name", F.upper("name"))

        @post_dump
        def envelope(self, df):
            return df.withColumn("_v", F.lit(1))

    df = spark.createDataFrame([("a", "bob")], "rid string, name string")
    out = S().dump_df(df).collect()[0]
    assert out.name == "BOB"
    assert out._v == 1


def test_post_load_pass_original(spark):
    """Parity: tests/test_decorators.py pass_original — a post_load hook
    reads a raw input column the schema itself dropped (unknown=EXCLUDE)."""
    from marshmallow_spark.schema import EXCLUDE

    class S(Schema):
        n = fields.Integer()

        class Meta:
            row_key = "rid"
            unknown = EXCLUDE

        @post_load(pass_original=True)
        def keep_hair(self, df, orig):
            return df.withColumn("hair", orig("hair"))

    df = spark.createDataFrame(
        [("a", "3", "brown"), ("b", "zz", "red")],
        "rid string, n string, hair string",
    )
    res = S().validate_df(df)
    valid = res.valid.collect()
    assert len(valid) == 1
    assert valid[0].n == 3 and valid[0].hair == "brown"
    # orig helper columns never leak into outputs
    assert not [c for c in res.valid.columns if c.startswith("_mms_orig_")]
    assert not [c for c in res.valid_data.columns if c.startswith("_mms_orig_")]


def test_validates_schema_pass_original(spark):
    """Cross-field check reading the RAW (pre-cast) value."""

    class S(Schema):
        n = fields.Integer()

        class Meta:
            row_key = "rid"

        @validates_schema(pass_original=True, skip_on_field_errors=False)
        def no_leading_zero(self, orig):
            return (orig("n").startswith("0"), "No leading zeros.")

    df = spark.createDataFrame(
        [("a", "07"), ("b", "7")], "rid string, n string"
    )
    v = viol_map(S().validate_df(df))
    assert v == {"a": {("_schema", "No leading zeros.")}}


def test_post_dump_pass_original(spark):
    """post_dump hook reads a pre-serialization internal column that the
    dump projection dropped."""

    class S(Schema):
        name = fields.String()

        class Meta:
            row_key = "rid"

        @post_dump(pass_original=True)
        def attach_internal(self, df, orig):
            return df.withColumn("src_rid", orig("rid"))

    df = spark.createDataFrame([("a", "bob")], "rid string, name string")
    out = S().dump_df(df).collect()[0]
    assert out.name == "bob" and out.src_rid == "a"
    assert "_mms_orig_rid" not in S().dump_df(df).columns
