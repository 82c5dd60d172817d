"""Container, computed, and dynamic-schema field coverage
(T8, T14-T17, T22, P11-P12, V6/V8, S2/S4, E3, U1-U3)."""

import pytest
from pyspark.sql import functions as F

from marshmallow_spark import Schema, fields, validate
from marshmallow_spark import class_registry
from marshmallow_spark.errors import merge_errors


def viol_map(res, key="rid"):
    out = {}
    for r in res.violations.collect():
        out.setdefault(r[key], set()).add((r.field, r.message))
    return out


# -- List (T14): per-index violation paths ---------------------------------


def test_list_per_index_errors(spark):
    class S(Schema):
        xs = fields.List(fields.Integer())

        class Meta:
            row_key = "rid"

    df = spark.createDataFrame(
        [("a", ["1", "2"]), ("b", ["3", "zz", "4", "qq"]), ("c", None)],
        "rid string, xs array<string>",
    )
    v = viol_map(S().validate_df(df))
    assert "a" not in v
    assert v["b"] == {
        ("xs.1", "Not a valid integer."),
        ("xs.3", "Not a valid integer."),
    }
    # None list with allow_none=False default -> null violation
    assert ("xs", "Field may not be null.") in v["c"]


def test_list_loaded_values_typed(spark):
    class S(Schema):
        xs = fields.List(fields.Integer())

        class Meta:
            row_key = "rid"

    df = spark.createDataFrame([("a", ["1", "2"])], "rid string, xs array<string>")
    row = S().validate_df(df).valid.collect()[0]
    assert row.xs == [1, 2]


# -- Tuple (T15): arity + per-position types -------------------------------


def test_tuple_arity_and_positions(spark):
    class S(Schema):
        t = fields.Tuple((fields.String(), fields.Integer()))

        class Meta:
            row_key = "rid"

    df = spark.createDataFrame(
        [("a", ["x", "1"]), ("b", ["y"]), ("c", ["z", "NaNo"])],
        "rid string, t array<string>",
    )
    v = viol_map(S().validate_df(df))
    assert "a" not in v
    assert ("t", "Length must be 2.") in v["b"]  # reference: Length(equal=2)
    assert ("t.1", "Not a valid integer.") in v["c"]


# -- Mapping/Dict (T16): per-key value violations ---------------------------


def test_dict_value_violations(spark):
    class S(Schema):
        m = fields.Dict(keys=fields.String(), values=fields.Integer())

        class Meta:
            row_key = "rid"

    df = spark.createDataFrame(
        [("a", {"k1": "1"}), ("b", {"k1": "1", "bad": "zz"})],
        "rid string, m map<string,string>",
    )
    v = viol_map(S().validate_df(df))
    assert "a" not in v
    assert v["b"] == {("m.bad.value", "Not a valid integer.")}


def test_dict_key_violations(spark):
    class S(Schema):
        m = fields.Dict(keys=fields.Integer(), values=fields.String())

        class Meta:
            row_key = "rid"

    df = spark.createDataFrame(
        [("a", {"1": "x"}), ("b", {"1": "x", "nine": "y"})],
        "rid string, m map<string,string>",
    )
    v = viol_map(S().validate_df(df))
    assert "a" not in v
    assert v["b"] == {("m.nine.key", "Not a valid integer.")}


# -- Nested (T17) + registry + Pluck (P12) ----------------------------------


class ChildSchema(Schema):
    name = fields.String(required=True)
    age = fields.Integer(validate=validate.Range(min=0))


def test_nested_dotted_paths(spark):
    class S(Schema):
        who = fields.Nested(ChildSchema)

        class Meta:
            row_key = "rid"

    df = spark.createDataFrame(
        [("a", ("alice", "30")), ("b", ("bob", "-1")), ("c", (None, "x"))],
        "rid string, who struct<name:string, age:string>",
    )
    v = viol_map(S().validate_df(df))
    assert "a" not in v
    assert ("who.age", "Must be greater than or equal to 0.") in v["b"]
    assert ("who.name", "Field may not be null.") in v["c"]
    assert ("who.age", "Not a valid integer.") in v["c"]


def test_nested_by_registry_name(spark):
    # ChildSchema was auto-registered by the metaclass
    assert class_registry.get_class("ChildSchema") is ChildSchema

    class S(Schema):
        who = fields.Nested("ChildSchema")

        class Meta:
            row_key = "rid"

    df = spark.createDataFrame(
        [("a", ("x", "-5"))], "rid string, who struct<name:string, age:string>"
    )
    v = viol_map(S().validate_df(df))
    assert ("who.age", "Must be greater than or equal to 0.") in v["a"]


def test_nested_many_and_pluck(spark):
    class S(Schema):
        kids = fields.Nested(ChildSchema, many=True)
        first = fields.Pluck(ChildSchema, "name", attribute="first", data_key="who")

        class Meta:
            row_key = "rid"

    df = spark.createDataFrame(
        [
            ("a", [("x", "1"), ("y", "nope")], ("zed", "9")),
        ],
        "rid string, kids array<struct<name:string,age:string>>, "
        "who struct<name:string,age:string>",
    )
    res = S().validate_df(df)
    v = viol_map(res)
    assert ("kids.1", "Invalid value.") in v["a"]
    # Pluck projects the single key out of the struct
    row = res.valid_data.select("first").collect()[0]
    assert row.first == "zed"


# -- Decimal (T8) ------------------------------------------------------------


def test_decimal_places_rounding(spark):
    class S(Schema):
        rid = fields.String()  # declared so valid_data keeps the key
        d = fields.Decimal(places=2)

        class Meta:
            row_key = "rid"

    df = spark.createDataFrame(
        [("a", "1.005"), ("b", "2.675"), ("c", "nope")], "rid string, d string"
    )
    res = S().validate_df(df)
    v = viol_map(res)
    assert v == {"c": {("d", "Not a valid number.")}}
    vals = {r.rid: float(r.d) for r in res.valid_data.where("d is not null").collect()}
    assert vals["a"] == 1.0  # HALF_EVEN
    assert vals["b"] == 2.68


# -- Function / Method / Constant (T22, P11, U2) -----------------------------


def test_function_method_constant(spark):
    class S(Schema):
        up = fields.Function(deserialize=lambda c: F.upper(c))
        halved = fields.Method(deserialize="halve")
        version = fields.Constant(7)

        class Meta:
            row_key = "rid"

        def halve(self, col):
            return (col.cast("double") / 2).cast("long")

    df = spark.createDataFrame(
        [("a", "hi", "10")], "rid string, up string, halved string"
    )
    row = S().validate_df(df).valid.collect()[0]
    assert row.up == "HI"
    assert row.halved == 5
    assert row.version == 7


# -- Predicate / Lambda validators (V8, U3) ----------------------------------


def test_predicate_and_lambda_validators(spark):
    class S(Schema):
        a = fields.String(validate=validate.Predicate(lambda c: F.startswith(c, F.lit("ok"))))
        b = fields.Integer(validate=lambda c: c % 2 == 0)

        class Meta:
            row_key = "rid"

    df = spark.createDataFrame(
        [("r1", "okay", "4"), ("r2", "nope", "3")], "rid string, a string, b string"
    )
    v = viol_map(S().validate_df(df))
    assert "r1" not in v
    assert v["r2"] == {("a", "Invalid input."), ("b", "Invalid value.")}


# -- from_dict (dynamic construction) ----------------------------------------


def test_from_dict(spark):
    S = Schema.from_dict(
        {"x": fields.Integer(validate=validate.Range(max=5))}, name="DynSchema"
    )
    df = spark.createDataFrame([("a", "9")], "rid string, x string")
    v = viol_map(S(row_key="rid", unknown="exclude").validate_df(df))
    assert v == {"a": {("x", "Must be less than or equal to 5.")}}
    assert class_registry.get_class("DynSchema") is S


# -- loads/dumps round-trip (S2/S4) ------------------------------------------


def test_loads_dumps_roundtrip(spark):
    class S(Schema):
        name = fields.String(required=True)
        n = fields.Integer()

        class Meta:
            row_key = "rid"

    df = spark.createDataFrame(
        [('{"name": "x", "n": 3}',), ('{"name": null, "n": "bad"}',)],
        "json string",
    )
    res = S(row_key=None).loads_df(df, "json")
    msgs = {(r.field, r.message) for r in res.violations.collect()}
    assert ("name", "Field may not be null.") in msgs
    assert ("n", "Not a valid integer.") in msgs

    out = S().dumps_df(res.valid).collect()
    assert '"name":"x"' in out[0].json


def test_validate_exploded_detailed_nested_errors(spark):
    class S(Schema):
        kids = fields.Nested(ChildSchema, many=True)

        class Meta:
            row_key = "rid"

    df = spark.createDataFrame(
        [
            ("a", [("x", "1"), ("y", "nope"), (None, "-3")]),
            ("b", [("z", "2")]),
        ],
        "rid string, kids array<struct<name:string,age:string>>",
    )
    got = {
        (r.rid, r.field, r.message)
        for r in S().validate_exploded(df, "kids").collect()
    }
    assert got == {
        ("a", "kids.1.age", "Not a valid integer."),
        ("a", "kids.2.name", "Field may not be null."),
        ("a", "kids.2.age", "Must be greater than or equal to 0."),
    }


def test_loads_malformed_json_schema_violation(spark):
    class S(Schema):
        name = fields.String(required=True)

    df = spark.createDataFrame(
        [('{"name": "ok"}',), ("{invalid",), ("",)], "json string"
    )
    res = S(row_key=None, unknown="exclude").loads_df(df, "json")
    rows = [(r.field, r.message) for r in res.violations.collect()]
    assert rows.count(("_schema", "Invalid input type.")) == 2
    assert not res.is_valid()


# -- merge_errors algebra (E3) ------------------------------------------------


def test_message_tree_nests_dotted_paths(spark):
    """messages() reconstructs the reference's nested error dicts:
    dotted paths become nested dicts, numeric segments become int keys."""

    class S(Schema):
        who = fields.Nested(ChildSchema)
        xs = fields.List(fields.Integer())

        class Meta:
            row_key = "rid"

    df = spark.createDataFrame(
        [("r1", ("a", "-1"), ["1", "zz"])],
        "rid string, who struct<name:string,age:string>, xs array<string>",
    )
    tree = S().validate_df(df).messages()
    assert tree == {
        "r1": {
            "who": {"age": ["Must be greater than or equal to 0."]},
            "xs": {1: ["Not a valid integer."]},
        }
    }


def test_merge_errors_shapes():
    assert merge_errors(["a"], ["b"]) == ["a", "b"]
    assert merge_errors({"f": ["a"]}, {"f": ["b"], "g": ["c"]}) == {
        "f": ["a", "b"],
        "g": ["c"],
    }
    assert merge_errors(["top"], {"f": ["x"]}) == {"_schema": ["top"], "f": ["x"]}


# -- custom Field subclass (U1) -----------------------------------------------


def test_custom_field_subclass(spark):
    class Uppercased(fields.Field):
        def load_expr(self, raw):
            return F.upper(raw.cast("string"))

    class S(Schema):
        u = Uppercased()

        class Meta:
            row_key = "rid"

    df = spark.createDataFrame([("a", "mixedCase")], "rid string, u string")
    assert S().validate_df(df).valid.collect()[0].u == "MIXEDCASE"


def test_nested_self_requires_depth():
    """Nested("self") without max_depth has no finite StructType in a
    columnar engine — must fail at schema build with an actionable
    message naming the max_depth knob, not a registry miss."""
    import pytest as _pytest

    from marshmallow_spark import Schema, fields

    class S(Schema):
        child = fields.Nested("self")

    with _pytest.raises(ValueError, match="max_depth"):
        S()


def test_nested_self_bounded_unroll(spark):
    """Nested("self", max_depth=N): the recursion unrolls N levels —
    violations inside the horizon carry the same dotted paths and
    messages as the reference's dynamic recursion; data BELOW the
    horizon is ignored (the documented truncation divergence)."""
    import sys

    sys.path.insert(0, "/root/reference/src")
    import warnings

    import marshmallow as ref

    class Node(Schema):
        name = fields.String(required=True, validate=validate.Length(min=2))
        child = fields.Nested("self", max_depth=2)

        class Meta:
            row_key = "rid"

    class RefNode(ref.Schema):
        name = ref.fields.String(
            required=True, validate=ref.validate.Length(min=2)
        )
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            child = ref.fields.Nested("self")

    # max_depth=2 validates child and child.child (whose own recursive
    # field is dropped — anything under child.child.child is ignored)
    df = spark.createDataFrame(
        [
            ("a", "root", ("ok", ("xx",))),   # all names fine in-horizon
            ("b", "root", ("z", ("deep",))),  # child.name too short
            ("c", "r", None),                 # root name too short
            ("d", "root", ("okay", ("z",))),  # child.child.name short
        ],
        "rid string, name string, child struct<name:string, "
        "child:struct<name:string>>",
    )
    v = viol_map(Node().validate_df(df))
    ref_b = None
    try:
        RefNode().load({"name": "root", "child": {"name": "z"}})
    except ref.ValidationError as e:
        ref_b = e.messages
    assert ref_b == {"child": {"name": ["Shorter than minimum length 2."]}}
    assert ("child.name", "Shorter than minimum length 2.") in v["b"]
    assert "a" not in v
    assert ("name", "Shorter than minimum length 2.") in v["c"]
    assert ("child.child.name", "Shorter than minimum length 2.") in v["d"]

    # many=True self-nesting (the tree-children shape) builds and
    # validates
    class Tree(Schema):
        name = fields.String(required=True)
        kids = fields.Nested("self", many=True, max_depth=2)

        class Meta:
            row_key = "rid"

    t = Tree()
    df2 = spark.createDataFrame(
        [("a", "root", [("k1", [])])],
        "rid string, name string, kids array<struct<name:string, "
        "kids:array<struct<name:string>>>>",
    )
    assert t.validate_df(df2).violations.count() == 0

    # schema unrolled DEEPER than the data: the plan clamps to the
    # source struct's actual depth instead of failing analysis with
    # INVALID_EXTRACT_BASE_FIELD_TYPE; the same schema instance still
    # validates deeper data afterwards (the clamp is plan-local)
    class Deep(Schema):
        name = fields.String(required=True, validate=validate.Length(min=3))
        parent = fields.Nested("self", max_depth=4)

        class Meta:
            row_key = "rid"

    deep = Deep()
    shallow_df = spark.createDataFrame(
        [("a", "CD", ("ok", None))],
        "rid string, name string, parent struct<name:string, "
        "parent:string>",
    )
    vs = viol_map(deep.validate_df(shallow_df))
    assert ("name", "Shorter than minimum length 3.") in vs["a"]
    assert ("parent.name", "Shorter than minimum length 3.") in vs["a"]
    deeper_df = spark.createDataFrame(
        [("b", "Books", ("Media", ("xy", None)))],
        "rid string, name string, parent struct<name:string, "
        "parent:struct<name:string, parent:string>>",
    )
    vd = viol_map(deep.validate_df(deeper_df))
    assert ("parent.parent.name", "Shorter than minimum length 3.") in vd["b"]


def test_tuple_via_json_loads(spark):
    """Tuple fields parse from JSON arrays (external form) into the
    positional struct; arity and kind mismatches match the reference:
    Length(equal=n) wording, 'Not a valid tuple.' for scalars, and
    position token kinds (float truncates through Integer)."""
    import json as _json
    import sys

    sys.path.insert(0, "/root/reference/src")
    import marshmallow as ref

    class S(Schema):
        k = fields.Integer(required=True)
        t = fields.Tuple((fields.String(), fields.Integer()))

        class Meta:
            row_key = "k"
            unknown = "exclude"

    class R(ref.Schema):
        k = ref.fields.Integer(required=True)
        t = ref.fields.Tuple((ref.fields.String(), ref.fields.Integer()))

        class Meta:
            unknown = "exclude"

    rows = [
        {"k": 0, "t": ["a", 1]},
        {"k": 1, "t": ["a"]},
        {"k": 2, "t": 5},
        {"k": 3, "t": ["a", "zz"]},
        {"k": 4, "t": ["a", 1.9]},
        {"k": 5, "t": None},
    ]
    want = {}
    for r in rows:
        try:
            R().load(r)
        except ref.ValidationError as e:
            want[r["k"]] = e.messages
    df = spark.createDataFrame([( _json.dumps(r),) for r in rows], "j string")
    res = S().loads_df(df, "j")
    got = res.messages()

    def norm(d):
        if isinstance(d, dict):
            return {str(k): norm(v) for k, v in d.items()}
        if isinstance(d, list):
            return sorted(str(x) for x in d)
        return str(d)

    for k in set(str(x) for x in want) | set(str(x) for x in got):
        g = got.get(k, got.get(int(k), {}))
        assert norm(g) == norm(want.get(int(k), {})), (k, g, want.get(int(k)))


def test_enum_type_sensitivity_parity(spark):
    """Reference Enum semantics are input-TYPE-sensitive: name mode
    rejects non-strings as 'Not a valid string.', by_value=True uses
    raw Python equality ('1' != 1 but 2.0 == 2 and True == 1), and
    by_value=Integer deserializes first ('1' -> 1 valid). Verified
    cell-by-cell against the live reference."""
    import enum as _enum
    import sys

    sys.path.insert(0, "/root/reference/src")
    import marshmallow as ref

    class Color(_enum.Enum):
        RED = 1
        BLUE = 2

    def ours(field, data, dtype):
        class S(Schema):
            v = field

            class Meta:
                row_key = "rid"
                unknown = "exclude"

        df = spark.createDataFrame(list(enumerate(data)), f"rid long, v {dtype}")
        res = S().validate_df(df)
        bad = {r.rid: r.message for r in res.violations.collect()}
        vals = {}
        for r in res._annotated.select("_mms_row_key", "v").collect():
            vals[r[0]] = r[1]
        return [(bad.get(i), vals.get(i)) for i in range(len(data))]

    def theirs(rfield, data):
        class R(ref.Schema):
            v = rfield

        out = []
        for x in data:
            try:
                r = R().load({"v": x})
                out.append((None, r["v"]))
            except ref.ValidationError as e:
                out.append((e.messages["v"][0], None))
        return out

    cases = [
        (fields.Enum(Color), ref.fields.Enum(Color),
         ["RED", "red", "BLUE", "", "1"], "string"),
        (fields.Enum(Color, by_value=True), ref.fields.Enum(Color, by_value=True),
         ["RED", "1", "2"], "string"),
        (fields.Enum(Color, by_value=True), ref.fields.Enum(Color, by_value=True),
         [1, 2, 3], "long"),
        (fields.Enum(Color, by_value=True), ref.fields.Enum(Color, by_value=True),
         [2.0, 2.5, 1.0], "double"),
        (fields.Enum(Color, by_value=True), ref.fields.Enum(Color, by_value=True),
         [True, False], "boolean"),
        (fields.Enum(Color, by_value=fields.Integer),
         ref.fields.Enum(Color, by_value=ref.fields.Integer),
         ["1", "2", "3", "RED", ""], "string"),
        (fields.Enum(Color), ref.fields.Enum(Color), [1, 2], "long"),
    ]
    for ofield, rfield, data, dtype in cases:
        got = ours(ofield, data, dtype)
        want = theirs(rfield, data)
        for i, (g, w) in enumerate(zip(got, want)):
            # compare error message; loaded value compared as name/value
            assert g[0] == w[0], (dtype, data[i], g, w)
            if w[0] is None:
                wv = w[1].value if rfield.by_value else w[1].name
                assert g[1] == wv, (dtype, data[i], g[1], wv)


def test_enum_json_token_kinds(spark):
    """Enum through JSON loads keeps token-type semantics: a number
    token through a name-mode Enum is 'Not a valid string.', a string
    token through by_value=Integer coerces, a number token through
    by_value=True matches by value."""
    import enum as _enum
    import json as _json
    import sys

    sys.path.insert(0, "/root/reference/src")
    import marshmallow as ref

    class Color(_enum.Enum):
        RED = 1
        BLUE = 2

    class S(Schema):
        k = fields.Integer(required=True)
        byname = fields.Enum(Color)
        byval = fields.Enum(Color, by_value=True)
        byint = fields.Enum(Color, by_value=fields.Integer)

        class Meta:
            row_key = "k"
            unknown = "exclude"

    class R(ref.Schema):
        k = ref.fields.Integer(required=True)
        byname = ref.fields.Enum(Color)
        byval = ref.fields.Enum(Color, by_value=True)
        byint = ref.fields.Enum(Color, by_value=ref.fields.Integer)

        class Meta:
            unknown = "exclude"

    rows = [
        {"k": 0, "byname": "RED", "byval": 1, "byint": "2"},
        {"k": 1, "byname": 1, "byval": "1", "byint": 2.0},
        {"k": 2, "byname": "red", "byval": 2.0, "byint": True},
        {"k": 3, "byname": True, "byval": True, "byint": 3},
    ]
    want = {}
    for r in rows:
        try:
            R().load(r)
            want[str(r["k"])] = {}
        except ref.ValidationError as e:
            want[str(r["k"])] = {f: sorted(m) for f, m in e.messages.items()}
    df = spark.createDataFrame([(_json.dumps(r),) for r in rows], "j string")
    tree = S().loads_df(df, "j").messages()
    got = {str(k): {f: sorted(m) for f, m in v.items()} for k, v in tree.items()}
    for k in set(want) | set(got):
        assert got.get(k, {}) == want.get(k, {}), (k, got.get(k), want.get(k))


def test_container_numeric_underscore_grouping_parity(spark):
    """Python numeric literals allow single underscores between digit
    groups (int("0_00") == 0, float("1_0.5") == 10.5, Decimal too) and
    the reference parses container values with those constructors. The
    kinded container path has no Spark source_type, so the STRING-token
    branch must force the Python-grammar dispatch (fuzz-found r4:
    "0_00" through Dict(values=Integer()) failed as 'Not a valid
    integer.'). Misplaced underscores ("1_", "1__0") must still fail."""
    import json as _json
    import sys

    sys.path.insert(0, "/root/reference/src")
    import marshmallow as ref

    class S(Schema):
        k = fields.Integer(required=True)
        m = fields.Dict(keys=fields.String(), values=fields.Integer())
        f = fields.Dict(keys=fields.String(), values=fields.Float())
        d = fields.Dict(keys=fields.String(), values=fields.Decimal())
        xs = fields.List(fields.Integer())

        class Meta:
            unknown = "exclude"
            row_key = "k"

    class R(ref.Schema):
        k = ref.fields.Integer(required=True)
        m = ref.fields.Dict(keys=ref.fields.String(), values=ref.fields.Integer())
        f = ref.fields.Dict(keys=ref.fields.String(), values=ref.fields.Float())
        d = ref.fields.Dict(keys=ref.fields.String(), values=ref.fields.Decimal())
        xs = ref.fields.List(ref.fields.Integer())

        class Meta:
            unknown = "exclude"

    rows = [
        {"k": 0, "m": {"a": "0_00", "1": 0}},   # the fuzz falsifier
        {"k": 1, "m": {"a": "1_"}},             # trailing underscore: invalid
        {"k": 2, "m": {"a": "1_0.5"}},          # int() takes no decimals
        {"k": 3, "f": {"a": "1_0.5"}},          # float() does
        {"k": 4, "f": {"a": "1__0"}},           # doubled underscore: invalid
        {"k": 5, "xs": ["7_7", "1_"]},
        {"k": 6, "d": {"a": "1_0.2_5"}},        # Decimal takes grouping too
        {"k": 7, "m": {"a": " 5 "}},            # int() trims whitespace
    ]
    want = {}
    for r in rows:
        try:
            R().load(r)
            want[r["k"]] = {}
        except ref.ValidationError as e:
            want[r["k"]] = _json.loads(_json.dumps(e.messages, default=dict))
    df = spark.createDataFrame([(_json.dumps(r),) for r in rows], "j string")
    tree = S().loads_df(df, "j").messages()
    for k in sorted(want):
        got = _json.loads(
            _json.dumps(tree.get(k, tree.get(str(k), {})), default=dict)
        )
        assert got == want[k], (k, got, want[k])
