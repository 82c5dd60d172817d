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
