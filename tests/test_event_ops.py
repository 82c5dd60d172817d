"""Unit tests for the event-time / dataset-delta / sampling operators:
sessionize, asof_join, snapshot_diff, stratified_topk, and the
repetition-signal fold — hand-computed expectations plus determinism
under different partition layouts."""

from __future__ import annotations

import datetime as dt
from collections import Counter

from pyspark.sql import functions as F

from marshmallow_spark.operators.asof import asof_join
from marshmallow_spark.operators.diff import snapshot_diff
from marshmallow_spark.operators.sampling import stratified_topk
from marshmallow_spark.operators.sessions import session_stats, sessionize
from marshmallow_spark.operators.text import repetition_signals


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


def test_sessionize_gap_boundary_inclusive(spark):
    """An event exactly `gap` after the previous one stays in the same
    session — session_window merges per-event windows that TOUCH at
    the endpoint, and the batch operator matches it (split condition
    is strict >); one microsecond more opens a new session."""
    rows = [
        (1, _ts(0)),
        (1, _ts(30)),          # exactly 30 min after -> same session
        (1, dt.datetime(2024, 1, 1, 1, 0, 0, 1)),  # 30min + 1us -> new
        (2, _ts(5)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = sessionize(df, "user_id", "ts", gap="30 minutes").collect()
    sess = {(r.user_id, r.ts): r.session_index for r in out}
    assert sess[(1, _ts(0))] == 1
    assert sess[(1, _ts(30))] == 1
    assert sess[(1, dt.datetime(2024, 1, 1, 1, 0, 0, 1))] == 2
    assert sess[(2, _ts(5))] == 1


def test_session_stats_rollup_and_duration(spark):
    rows = [
        (1, _ts(0), 2.0),
        (1, _ts(10), 3.0),
        (1, _ts(50), 5.0),  # 40 min gap -> session 2
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = session_stats(df, "user_id", "ts", gap="30 minutes").collect()
    by_idx = {r.session_index: r for r in out}
    assert by_idx[1].n_events == 2
    assert by_idx[1].duration_us == 10 * 60 * 1_000_000
    assert by_idx[2].n_events == 1
    assert by_idx[2].duration_us == 0


def test_sessionize_stable_across_partitioning(spark):
    rows = [(u, _ts(m), float(m)) for u in (1, 2, 3) for m in range(0, 59, 7)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    a = sorted(
        tuple(r)
        for r in sessionize(df.repartition(1), "user_id", "ts").collect()
    )
    b = sorted(
        tuple(r)
        for r in sessionize(df.repartition(7), "user_id", "ts").collect()
    )
    assert a == b


def test_asof_join_backward_inclusive_and_null(spark):
    left = spark.createDataFrame(
        [(100, 1, _ts(10)), (101, 1, _ts(20)), (102, 2, _ts(5))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts(10), "a"), (1, _ts(15), "b"), (2, _ts(6), "c")],
        "user_id long, ts timestamp, tag string",
    )
    out = asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="ts", right_cols=("tag",)
    ).collect()
    by_id = {r.event_id: r for r in out}
    # equal timestamps match (inclusive)
    assert by_id[100].tag == "a" and by_id[100].matched_ts == _ts(10)
    # newest prior wins
    assert by_id[101].tag == "b"
    # no prior right row -> NULLs, left row preserved
    assert by_id[102].tag is None and by_id[102].matched_ts is None
    assert len(out) == 3


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts(30))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _ts(0), "old")], "user_id long, ts timestamp, tag string"
    )
    loose = asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="ts",
        right_cols=("tag",), tolerance="1 hour",
    ).collect()[0]
    assert loose.tag == "old"
    tight = asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="ts",
        right_cols=("tag",), tolerance="10 minutes",
    ).collect()[0]
    assert tight.tag is None and tight.matched_ts is None


def test_asof_join_rejects_column_collision(spark):
    df = spark.createDataFrame([(1, _ts(0), "x")], "user_id long, ts timestamp, tag string")
    try:
        asof_join(df, df, on="user_id", left_ts="ts", right_ts="ts", right_cols=("tag",))
    except ValueError as e:
        assert "collide" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_snapshot_diff_classification(spark):
    before = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 20.0, "B"), (3, 30.0, None), (4, 40.0, "D")],
        "k long, price double, status string",
    )
    after = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 25.0, "B"), (3, 30.0, "C"), (5, 50.0, "E")],
        "k long, price double, status string",
    )
    out = {
        r.k: r
        for r in snapshot_diff(before, after, "k").collect()
    }
    assert 1 not in out  # unchanged filtered by default
    assert out[2].change_type == "changed" and out[2].changed_cols == ["price"]
    # NULL -> value is a change (null-safe compare)
    assert out[3].change_type == "changed" and out[3].changed_cols == ["status"]
    assert out[4].change_type == "removed" and out[4].changed_cols == []
    assert out[5].change_type == "added" and out[5].changed_cols == []

    with_unchanged = {
        r.k: r.change_type
        for r in snapshot_diff(
            before, after, "k", include_unchanged=True
        ).collect()
    }
    assert with_unchanged[1] == "unchanged"


def test_stratified_topk_exact_k_and_determinism(spark):
    rows = [(i, f"g{i % 3}") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = stratified_topk(df, "source", "doc_id", 4)
    counts = Counter(r.source for r in out.collect())
    assert counts == {"g0": 4, "g1": 4, "g2": 4}
    # small stratum: min(k, n) rows survive
    tiny = spark.createDataFrame([(1, "solo"), (2, "solo")], "doc_id long, source string")
    assert stratified_topk(tiny, "source", "doc_id", 4).count() == 2
    # identical selection at any parallelism
    a = sorted(r.doc_id for r in stratified_topk(df.repartition(1), "source", "doc_id", 4).collect())
    b = sorted(r.doc_id for r in stratified_topk(df.repartition(13), "source", "doc_id", 4).collect())
    assert a == b


def _py_repetition(text: str):
    toks = text.split(" ")
    bigrams = [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
    tc = Counter(toks)
    top_tok, top_tok_c = min(
        tc.items(), key=lambda kv: (-kv[1], kv[0])
    )
    if bigrams:
        bc = Counter(bigrams)
        top_bg, top_bg_c = min(bc.items(), key=lambda kv: (-kv[1], kv[0]))
    else:
        top_bg, top_bg_c = None, 0
    return (
        len(toks),
        len(set(toks)),
        top_tok,
        top_tok_c,
        top_bg,
        top_bg_c,
    )


def test_repetition_signals_matches_python_counter(spark):
    docs = [
        (0, "a b a b a"),          # top token 'a' x3, top bigram tie -> 'a b'
        (1, "x x x x"),            # degenerate repetition
        (2, "one"),                # single token: no bigrams
        (3, "t u v w"),            # all unique: counts 1, lex-min wins
        (4, "b a b a b a b"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: r for r in repetition_signals(df, "doc_id").collect()}
    for doc_id, text in docs:
        exp = _py_repetition(text)
        r = out[doc_id]
        got = (
            r.n_tokens,
            r.n_uniq_tokens,
            r.top_token,
            r.top_token_count,
            r.top_bigram,
            r.top_bigram_count,
        )
        assert got == exp, (doc_id, got, exp)


def test_weighted_sample_monotone_and_grouped(spark):
    from marshmallow_spark.operators.sampling import (
        deterministic_sample,
        weighted_sample,
    )

    rows = [(i, f"src{i % 4}") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")

    half = {
        r.doc_id
        for r in weighted_sample(df, "doc_id", "source", {"src0": 0.5}).collect()
    }
    quarter = {
        r.doc_id
        for r in weighted_sample(df, "doc_id", "source", {"src0": 0.25}).collect()
    }
    # lowering a rate only shrinks the kept set (same hash order)
    assert quarter <= half
    # groups without a rate fall to default_rate=0.0 -> dropped
    assert all(i % 4 == 0 for i in half)
    # a group's survivors are exactly deterministic_sample at that rate
    src0 = df.where("source = 'src0'")
    flat = {r.doc_id for r in deterministic_sample(src0, "doc_id", 0.5).collect()}
    assert half == flat
    # full-rate group passes through untouched alongside a zero group
    mix = weighted_sample(
        df, "doc_id", "source", {"src1": 1.0}, default_rate=0.0
    )
    assert mix.count() == 500

    try:
        weighted_sample(df, "doc_id", "source", {"src0": 1.5})
    except ValueError:
        pass
    else:
        raise AssertionError("expected ValueError")


def test_key_skew_profile_values(spark):
    from marshmallow_spark.operators.stats import key_skew_profile

    rows = [("hot",)] * 60 + [("warm",)] * 30 + [("cold",)] * 10
    df = spark.createDataFrame(rows, "k string")
    out = {r.key_value: r for r in key_skew_profile(df, "k", top_n=2).collect()}
    assert set(out) == {"hot", "warm"}  # top-2 only
    assert out["hot"].key_count == 60
    assert out["hot"].row_share == 0.6
    assert out["hot"].x_mean == 1.8  # 60 / (100/3 keys)
    assert out["warm"].x_mean == 0.9

    # NULL keys profile as a key of their own
    withnull = spark.createDataFrame(
        [("a",), (None,), (None,), (None,)], "k string"
    )
    prof = {r.key_value: r.key_count for r in key_skew_profile(withnull, "k").collect()}
    assert prof[None] == 3 and prof["a"] == 1


def test_pack_sequences_contiguous_budget(spark):
    from marshmallow_spark.operators.sampling import pack_sequences

    rows = [(i, 100) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    packed = pack_sequences(df, "doc_id", "n_tokens", budget=300, num_shards=2)
    out = packed.collect()
    # every doc assigned; bins within a shard are contiguous 0..max
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    assert sum(len(v) for v in by_shard.values()) == 40
    for shard, rs in by_shard.items():
        bins = sorted({r.bin for r in rs})
        assert bins == list(range(len(bins))), (shard, bins)
        # a 300-budget bin of 100-token docs holds exactly 3 docs
        # (only the final bin may be smaller)
        from collections import Counter

        c = Counter(r.bin for r in rs)
        for b in bins[:-1]:
            assert c[b] == 3, (shard, b, c)
    # oversized doc owns its own bin(s): nothing else joins its bin
    big = spark.createDataFrame(
        [(1, 50), (2, 1000), (3, 50)], "doc_id long, n_tokens long"
    )
    p2 = {
        r.doc_id: (r.shard, r.bin)
        for r in pack_sequences(big, "doc_id", "n_tokens", budget=300, num_shards=1).collect()
    }
    assert len({v for v in p2.values()}) >= 2
    # determinism across parallelism
    a = sorted(map(tuple, pack_sequences(df.repartition(1), "doc_id", "n_tokens", budget=300, num_shards=2).collect()))
    b = sorted(map(tuple, pack_sequences(df.repartition(9), "doc_id", "n_tokens", budget=300, num_shards=2).collect()))
    assert a == b


def test_rolling_features_microsecond_boundary(spark):
    """rolling_event_features: an event exactly window_seconds earlier
    is IN the frame; one microsecond older is OUT — the frame is
    microsecond-exact on TIMESTAMP_NTZ (a seconds cast would lump
    both)."""
    from datetime import datetime, timedelta

    from marshmallow_spark.operators.sessions import rolling_event_features

    t0 = datetime(2024, 6, 1, 12, 0, 0, 500000)
    rows = [
        (1, 10, t0 - timedelta(seconds=60, microseconds=1), 100.0),  # OUT
        (2, 10, t0 - timedelta(seconds=60), 10.0),                   # IN (exact)
        (3, 10, t0 - timedelta(seconds=30), 1.0),                    # IN
        (4, 10, t0, 0.5),                                            # self
        (5, 99, t0 - timedelta(seconds=10), 7.0),                    # other user
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, value double"
    )
    out = {
        r.event_id: r
        for r in rolling_event_features(
            df, "user_id", "ts", "value", window_seconds=60, id_col="event_id"
        ).collect()
    }
    assert out[4].n_window == 3
    assert abs(out[4].sum_window - 11.5) < 1e-9
    # the boundary event's OWN trailing window: event 1 is 1us before
    # it, well inside ITS 60s frame — 2 rows (event 1 + itself)
    assert out[2].n_window == 2


def test_funnel_steps_sequential_not_min_per_step(spark):
    """funnel_steps: a purchase BEFORE signup does not convert (the
    min-per-step shortcut would count it); at-or-after chains;
    same-instant steps chain via the peer-inclusive frame."""
    from datetime import datetime

    from marshmallow_spark.operators.sessions import funnel_steps

    t = lambda m: datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        # u1: full ordered funnel
        (1, t(0), "signup"), (1, t(1), "click"), (1, t(2), "purchase"),
        # u2: purchase BEFORE signup -> only signup+click count
        (2, t(0), "purchase"), (2, t(1), "signup"), (2, t(2), "click"),
        # u3: click only -> 0 (funnel starts at signup)
        (3, t(0), "click"),
        # u4: signup and click at the SAME instant -> both chain
        (4, t(0), "signup"), (4, t(0), "click"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz, event_type string")
    got = {
        r.user_id: r.steps_completed
        for r in funnel_steps(
            df, "user_id", "ts", "event_type", ["signup", "click", "purchase"]
        ).collect()
    }
    assert got == {1: 3, 2: 2, 3: 0, 4: 2}


def test_percentile_bounds_exact_known_values(spark):
    """percentile_bounds: inverse-CDF picks are exact on a known set
    (1..100: p05=5, p95=95); single-row groups return that row for
    both bounds."""
    from marshmallow_spark.operators.stats import percentile_bounds

    rows = [("g", float(i)) for i in range(1, 101)] + [("solo", 42.0)]
    df = spark.createDataFrame(rows, "grp string, v double").repartition(8)
    got = {r.grp: r for r in percentile_bounds(df, "grp", "v").collect()}
    assert (got["g"].p_low_value, got["g"].p_high_value, got["g"].n) == (5.0, 95.0, 100)
    assert (got["solo"].p_low_value, got["solo"].p_high_value) == (42.0, 42.0)
