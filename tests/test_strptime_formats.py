"""Custom strftime-format parity: datetime.strptime is the acceptance
oracle for DateTime/Date/Time(format=...). Exercises the JVM gate+parse
plan (unpadded numerics, %y pivot, %z shapes, %f widths) and the
strptime-UDF cold path (%b names, %I/%p, 1900 defaults) against the
live reference library, comparing LOADED VALUES, not just accept/reject.
"""

import datetime as dt
import sys

import pytest
from hypothesis import given, settings, strategies as st

sys.path.insert(0, "/root/reference/src")

import marshmallow as ref  # noqa: E402

from marshmallow_spark import Schema, fields  # noqa: E402

DT_CASES = [
    ("%Y-%m-%d %H:%M:%S", "2024-1-5 7:3:9"),
    ("%Y-%m-%d %H:%M:%S", "2024-01-05 07:03:09"),
    ("%Y-%m-%d %H:%M:%S", "2024-012-05 07:03:09"),
    ("%Y-%m-%d %H:%M:%S", "2024-02-30 00:00:00"),
    ("%Y-%m-%d %H:%M:%S", "2024-2-29 23:59:59"),
    ("%y/%m/%d", "75/01/02"),
    ("%y/%m/%d", "68/01/02"),
    ("%y/%m/%d", "69/12/31"),
    ("%y/%m/%d", "00/1/2"),
    ("%d %b %Y %H:%M", "05 Jan 2024 10:00"),
    ("%d %b %Y %H:%M", "5 JAN 2024 10:00"),
    ("%d %B %Y", "5 january 2024"),
    ("%Y-%m-%dT%H:%M:%S%z", "2024-01-02T03:04:05+0530"),
    ("%Y-%m-%dT%H:%M:%S%z", "2024-01-02T03:04:05+05:30"),
    ("%Y-%m-%dT%H:%M:%S%z", "2024-01-02T03:04:05Z"),
    ("%Y-%m-%dT%H:%M:%S%z", "2024-01-02T03:04:05-0000"),
    ("%Y-%m-%d %H:%M:%S.%f", "2024-01-02 03:04:05.1"),
    ("%Y-%m-%d %H:%M:%S.%f", "2024-01-02 03:04:05.123456"),
    ("%I:%M %p on %d", "07:30 PM on 02"),
    ("%I:%M %p on %d", "7:30 pm on 2"),
    ("%I:%M %p on %d", "12:00 AM on 31"),
    ("%m/%d", "2/29"),  # 1900 default year is not a leap year
    ("%m/%d", "2/28"),
    ("%j of %Y", "366 of 2024"),
    ("%j of %Y", "366 of 2023"),
    # both year directives: CPython lets the LAST one win (fuzz-found
    # r3); routed to the exact strptime cold path
    ("%y/%H.%Y", "11/05.1911"),
    ("%y/%H.%Y", "67/17.1967"),
    ("%Y.%H/%y", "1911.05/11"),
]


def _ref_load_dt(fmt, value):
    class R(ref.Schema):
        v = ref.fields.DateTime(format=fmt)

    try:
        out = R().load({"v": value})["v"]
    except ref.ValidationError:
        return None
    if out.tzinfo is not None:
        out = out.astimezone(dt.timezone.utc).replace(tzinfo=None)
    return out


def _ours_load_dt(spark, field, value):
    class O(Schema):
        v = field

        class Meta:
            row_key = "rid"
            unknown = "exclude"

    df = spark.createDataFrame([(0, value)], "rid long, v string")
    res = O().validate_df(df)
    if res.violations.count():
        return None
    return res.valid.select("v").collect()[0][0]


@pytest.mark.parametrize("fmt,value", DT_CASES)
def test_datetime_custom_format_value_parity(spark, fmt, value):
    want = _ref_load_dt(fmt, value)
    got = _ours_load_dt(spark, fields.DateTime(format=fmt), value)
    assert got == want, f"{fmt!r} {value!r}: ours={got} ref={want}"


DATE_CASES = [
    ("%Y/%m/%d", "2024/1/5"),
    ("%Y/%m/%d", "2024/01/05"),
    ("%d.%m.%y", "31.12.69"),
    ("%d.%m.%y", "1.1.68"),
    ("%b %d %Y", "Jan 05 2024"),
    ("%Y%m%d", "20240229"),
    ("%Y%m%d", "20230229"),
]


@pytest.mark.parametrize("fmt,value", DATE_CASES)
def test_date_custom_format_value_parity(spark, fmt, value):
    class R(ref.Schema):
        v = ref.fields.Date(format=fmt)

    try:
        want = R().load({"v": value})["v"]
    except ref.ValidationError:
        want = None
    got = _ours_load_dt(spark, fields.Date(format=fmt), value)
    assert got == want, f"{fmt!r} {value!r}: ours={got} ref={want}"


TIME_CASES = [
    ("%H:%M", "7:3"),
    ("%H:%M", "23:59"),
    ("%H.%M.%S", "07.03.09"),
    ("%I:%M %p", "7:30 PM"),
    ("%I:%M %p", "12:00 am"),
    ("%H%M%S", "070309"),
]


@pytest.mark.parametrize("fmt,value", TIME_CASES)
def test_time_custom_format_value_parity(spark, fmt, value):
    class R(ref.Schema):
        v = ref.fields.Time(format=fmt)

    try:
        want = R().load({"v": value})["v"].isoformat()
    except ref.ValidationError:
        want = None
    got = _ours_load_dt(spark, fields.Time(format=fmt), value)
    assert got == want, f"{fmt!r} {value!r}: ours={got} ref={want}"


# --- fuzz: random near-miss strings through a format mix -------------------

FUZZ_FORMATS = [
    "%Y-%m-%d %H:%M:%S",
    "%y/%m/%d",
    "%Y-%m-%dT%H:%M:%S%z",
    "%d %b %Y",
    "%Y-%m-%d %H:%M:%S.%f",
]
FUZZ_ALPHABET = "0123456789:-+/.TZz JanFebDc "
FUZZ_SEEDS = [
    "2024-1-1 0:0:0", "2024-12-31 23:59:59", "24/1/1", "99/9/9",
    "2024-01-02T03:04:05+05:30", "2024-01-02T03:04:05.999999",
    "1 Jan 2024", "31 Dec 1999", "2024-1-1 24:00:00",
    "2024-1-1  0:0:0", "2024-06-31 00:00:00", "70/02/29",
]


@settings(max_examples=3, deadline=None)
@given(st.lists(
    st.one_of(st.sampled_from(FUZZ_SEEDS),
              st.text(alphabet=FUZZ_ALPHABET, max_size=26)),
    min_size=30, max_size=30,
))
def test_custom_format_fuzz_parity(spark, values):
    for fmt in FUZZ_FORMATS:
        class R(ref.Schema):
            v = ref.fields.DateTime(format=fmt)

        class O(Schema):
            v = fields.DateTime(format=fmt)

            class Meta:
                row_key = "rid"
                unknown = "exclude"

        refs = R()
        want = []
        for v in values:
            try:
                out = refs.load({"v": v})["v"]
                if out.tzinfo is not None:
                    out = out.astimezone(dt.timezone.utc).replace(tzinfo=None)
                want.append(out)
            except ref.ValidationError:
                want.append(None)
        df = spark.createDataFrame(
            list(enumerate(values)), "rid long, v string"
        )
        res = O().validate_df(df)
        bad = {int(r.rid) for r in res.violations.collect()}
        mism = []
        for i, v in enumerate(values):
            ours_rejects = i in bad
            if (want[i] is None) != ours_rejects:
                mism.append((fmt, v, want[i], "reject" if ours_rejects else "accept"))
        assert not mism, mism


def test_repeated_directive_raises_clear_error(spark):
    """datetime.strptime raises re.error ('redefinition of group name')
    on EVERY load for a format with a repeated directive — a broken
    schema. The engine surfaces the same condition as a clear
    ValueError at plan build (fuzz-found r3: the Java path used to die
    with an analysis exception and the UDF path crashed the worker)."""
    class O(Schema):
        v = fields.DateTime(format="%p%pT%Y")

        class Meta:
            row_key = "rid"
            unknown = "exclude"

    df = spark.createDataFrame([(0, "AMAMT2024")], "rid long, v string")
    with pytest.raises(ValueError, match="repeats directive '%p'"):
        O().validate_df(df)

    class Z(Schema):
        v = fields.DateTime(format="%z %d ~ %z")

        class Meta:
            row_key = "rid"
            unknown = "exclude"

    with pytest.raises(ValueError, match="repeats directive '%z'"):
        Z().validate_df(df)

    # %% may repeat freely (it is a literal, not a group)
    class P(Schema):
        v = fields.DateTime(format="%%%Y%%")

        class Meta:
            row_key = "rid"
            unknown = "exclude"

    ok = spark.createDataFrame([(0, "%2024%")], "rid long, v string")
    res = P().validate_df(ok)
    assert res.violations.count() == 0


def test_composite_locale_directive_dup_raises(spark):
    """%c/%x/%X expand to OTHER directives' regex groups inside CPython's
    TimeRE (%x -> %m/%d/%y in the C locale), so '%x %m' raises re.error
    on every strptime call even though no directive literally repeats.
    The engine must surface that at plan build too (advice r3)."""
    df = spark.createDataFrame([(0, "01/02/25 01")], "rid long, v string")
    for fmt in ("%x %m", "%c %Y", "%X %H"):
        class C(Schema):
            v = fields.DateTime(format=fmt)

            class Meta:
                row_key = "rid"
                unknown = "exclude"

        with pytest.raises(ValueError, match="composite locale directive"):
            C().validate_df(df)

    # a LONE composite directive is a normal (cold-path) format: the
    # engine must accept exactly what datetime.strptime accepts
    class X(Schema):
        v = fields.DateTime(format="%x")

        class Meta:
            row_key = "rid"
            unknown = "exclude"

    ok = spark.createDataFrame(
        [(0, "07/04/19"), (1, "not a date")], "rid long, v string"
    )
    res = X().validate_df(ok)
    assert {int(r.rid) for r in res.violations.collect()} == {1}


# --- fuzz: random FORMAT STRINGS (not just values) vs the reference --------

_FMT_DIRS = ["%Y", "%y", "%m", "%d", "%H", "%I", "%M", "%S", "%f",
             "%j", "%b", "%B", "%a", "%A", "%p", "%z", "%%"]
_FMT_SEPS = ["-", "/", " ", ":", ".", "T", " ~ "]


@st.composite
def _fmt_strategy(draw):
    n = draw(st.integers(min_value=1, max_value=4))
    parts = draw(st.lists(st.sampled_from(_FMT_DIRS), min_size=n, max_size=n))
    seps = draw(st.lists(st.sampled_from(_FMT_SEPS), min_size=n, max_size=n))
    out = []
    for p, sep in zip(parts, seps):
        out.append(p)
        out.append(sep)
    return "".join(out[:-1])


@settings(max_examples=4, deadline=None)
@given(fmt=_fmt_strategy(), data=st.data())
def test_random_format_parity(spark, fmt, data):
    """Random strftime FORMATS: render datetimes through each format,
    mutate some, and demand identical accept/reject + loaded values vs
    the live reference. Repeated-directive formats must raise the
    clear ValueError exactly when the reference's strptime would raise
    re.error."""
    toks = [fmt[i : i + 2] for i in range(len(fmt) - 1) if fmt[i] == "%"]
    dirs = [t for t in toks if t != "%%"]
    aware = "%z" in dirs
    base = data.draw(
        st.datetimes(
            min_value=dt.datetime(1900, 1, 2),
            max_value=dt.datetime(2100, 12, 28),
        )
    )
    if aware:
        base = base.replace(
            tzinfo=dt.timezone(dt.timedelta(minutes=data.draw(
                st.sampled_from([0, 330, -480, 60]))))
        )
    vals = [base.strftime(fmt)]
    vals.append(vals[0][:-1])
    vals.append(vals[0] + "9")
    vals += ["", "zz"]

    class R(ref.Schema):
        v = ref.fields.DateTime(format=fmt)

    class O(Schema):
        rid = fields.Integer()
        v = fields.DateTime(format=fmt)

        class Meta:
            row_key = "rid"
            unknown = "exclude"

    refs = R()
    want = []
    ref_crashed = False
    for v in vals:
        try:
            out = refs.load({"v": v})["v"]
            if out.tzinfo is not None:
                out = out.astimezone(dt.timezone.utc).replace(tzinfo=None)
            want.append(out)
        except ref.ValidationError:
            want.append(None)
        except Exception:
            ref_crashed = True
            break

    df = spark.createDataFrame(list(enumerate(vals)), "rid long, v string")
    try:
        res = O().validate_df(df)
    except ValueError:
        assert ref_crashed, f"{fmt!r}: engine raised but reference parses"
        return
    assert not ref_crashed, f"{fmt!r}: reference crashes but engine accepted"
    bad = {int(r.rid) for r in res.violations.collect()}
    loaded = {
        int(r.rid): r.v
        for r in res.valid_data.select("rid", "v").collect()
        if r.rid is not None
    }
    for i, v in enumerate(vals):
        if want[i] is None:
            assert i in bad, f"{fmt!r} {v!r}: ref rejects, ours loads {loaded.get(i)}"
        else:
            assert i not in bad, f"{fmt!r} {v!r}: ref loads {want[i]}, ours rejects"
            assert loaded.get(i) == want[i], (
                f"{fmt!r} {v!r}: ours={loaded.get(i)} ref={want[i]}"
            )
