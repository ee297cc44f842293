"""Generic windowed-function edge cases (functions/windowed.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from feagen_spark.functions import windowed as W


def test_add_rolling_include_current_frame_is_last_n_rows(spark):
    """include_current=True must yield a frame of exactly last_n rows
    (last_n-1 preceding + current), not last_n+1."""
    df = spark.createDataFrame(
        [("k", i, float(i)) for i in range(1, 7)], "k string, o int, v double"
    )
    out = (
        W.add_rolling(df, "k", ("o",), F.sum("v"), "s", last_n=3, include_current=True)
        .orderBy("o")
        .toPandas()
    )
    # rows 1..6, window of 3 incl current: [1,3,6,9,12,15]
    assert list(out["s"]) == [1.0, 3.0, 6.0, 9.0, 12.0, 15.0]

    excl = (
        W.add_rolling(df, "k", ("o",), F.sum("v"), "s", last_n=3)
        .orderBy("o")
        .toPandas()
    )
    # exclusive: previous 3 rows → [None,1,3,6,9,12]
    assert excl["s"].fillna(-1).tolist() == [-1.0, 1.0, 3.0, 6.0, 9.0, 12.0]


def test_session_id_capped_semantics_and_plan(spark):
    """Capped sessions: part k covers [start + k*max, start + (k+1)*max)
    within a gap session; a new gap session resets the anchor. The part
    window refines the sessionizer's key partitioning, so the whole
    thing still costs exactly ONE exchange."""
    import re

    from feagen_spark.functions.windowed import add_session_id_capped

    rows = [
        # one long session (gap 100s never exceeded), 250s span, cap 100s
        ("u1", 1, 0), ("u1", 2, 50), ("u1", 3, 100), ("u1", 4, 199),
        ("u1", 5, 250),
        # gap of 1000s -> new session, anchor resets
        ("u1", 6, 1250), ("u1", 7, 1349),
    ]
    df = spark.createDataFrame(rows, "user_id string, event_id long, sec long").select(
        "user_id", "event_id",
        F.timestamp_micros(F.col("sec") * 1_000_000).alias("ts"),
    )
    out = add_session_id_capped(
        df, "user_id", ("ts", "event_id"), "ts",
        gap_s=100, max_duration_s=100,
    )
    # plan BEFORE executing: an executed AQE plan prints final+initial
    # sections, double-counting every Exchange line
    plan = out._jdf.queryExecution().executedPlan().toString()
    got = {
        r["event_id"]: (r["session_id"], r["session_part"])
        for r in out.collect()
    }
    assert got == {
        1: (0, 0), 2: (0, 0),
        3: (0, 1),            # exactly at start+max -> next part
        4: (0, 1), 5: (0, 2),
        6: (1, 0), 7: (1, 0), # new gap session, anchor reset
    }, got

    hash_ex = [
        l
        for l in plan.splitlines()
        if re.search(r"\bExchange\b", l) and "hashpartitioning" in l
    ]
    assert len(hash_ex) == 1, plan


# -- property-based: windowed core vs a loop reference ------------------------

try:
    from hypothesis import given, settings, strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False


if _HYP:

    @settings(max_examples=10, deadline=None)
    @given(
        rows=st.lists(
            st.tuples(
                st.sampled_from("ab"),
                st.integers(0, 200),   # seconds
                st.integers(-3, 3),    # value
            ),
            min_size=1, max_size=25,
        ),
        gap=st.integers(5, 60),
        n=st.integers(1, 4),
    )
    def test_windowed_core_property(spark, rows, gap, n):
        """add_rolling / add_cumulative / add_session_id /
        add_rolling_time on random irregular streams (duplicate
        timestamps included) must match a python loop reference —
        trailing frames strictly exclude the current row, sessions
        split at delta > gap, time frames exclude equal-ts peers."""
        from feagen_spark.functions.windowed import (
            add_cumulative,
            add_rolling,
            add_rolling_time,
            add_session_id,
        )

        data = [
            (i, k, s, float(v)) for i, (k, s, v) in enumerate(rows)
        ]
        df = spark.createDataFrame(
            data, "rid long, k string, sec long, v double"
        ).select(
            "rid", "k", "v",
            F.timestamp_micros(F.col("sec") * 1_000_000).alias("ts"),
        )
        order = ("ts", "rid")
        out = add_rolling(df, "k", order, F.sum("v"), "roll", last_n=n)
        out = add_cumulative(out, "k", order, F.count(F.lit(1)), "n_prior")
        out = add_session_id(out, "k", order, "ts", gap_s=gap)
        out = add_rolling_time(
            out, "k", "ts", F.sum("v"), "troll", last_seconds=gap
        )
        got = {
            r["rid"]: (r["roll"], r["n_prior"], r["session_id"], r["troll"])
            for r in out.collect()
        }

        by_key: dict = {}
        for i, (k, s, v) in enumerate(rows):
            by_key.setdefault(k, []).append((s, i, float(v)))
        want = {}
        for k, seq in by_key.items():
            seq.sort()
            sess = 0
            for pos, (s, i, v) in enumerate(seq):
                prior = seq[max(0, pos - n):pos]
                roll = sum(x[2] for x in prior) if prior else None
                if pos > 0 and s - seq[pos - 1][0] > gap:
                    sess += 1
                troll_rows = [
                    x for x in seq[:pos] if s - gap <= x[0] < s
                ]
                troll = (
                    sum(x[2] for x in troll_rows) if troll_rows else None
                )
                want[i] = (roll, pos, sess, troll)
        assert got == want


def test_rolling_distinct_and_decayed_sum_match_reference(spark):
    """add_rolling_distinct / add_rolling_decayed_sum (r5) vs loop
    references: distinct counts over the trailing frame (empty frame →
    0, never NULL), decayed sum exact to double precision with NULLs
    contributing 0."""
    import math

    rows = [
        # (rid, key, sec, value, etype)
        (0, "a", 0, 1.0, "x"),
        (1, "a", 100, 2.0, "y"),
        (2, "a", 200, None, "x"),
        (3, "a", 900, 4.0, "z"),
        (4, "a", 5000, 5.0, "x"),
        (5, "b", 0, 7.0, "x"),
    ]
    df = spark.createDataFrame(
        [(i, k, s, v, e) for i, k, s, v, e in rows],
        "rid long, k string, sec long, v double, etype string",
    ).select(
        "rid", "k", "v", "etype",
        F.timestamp_micros(F.col("sec") * 1_000_000).alias("ts"),
    )
    out = W.add_rolling_distinct(
        df, "k", ("ts", "rid"), "etype", "n_types", last_n=3
    )
    out = W.add_rolling_decayed_sum(
        out, "k", ("ts", "rid"), "ts", "v", "decay",
        half_life_s=600, last_n=3,
    )
    got = {r["rid"]: (r["n_types"], r["decay"]) for r in out.collect()}

    lam = math.log(2.0) / (600 * 1e6)
    by_key: dict = {}
    for rid, k, s, v, e in rows:
        by_key.setdefault(k, []).append((s, rid, v, e))
    for k, seq in by_key.items():
        seq.sort()
        for pos, (s, rid, v, e) in enumerate(seq):
            prior = seq[max(0, pos - 3):pos]
            n_types = len({x[3] for x in prior})
            decay = sum(
                (x[2] or 0.0) * math.exp(-lam * (s - x[0]) * 1e6)
                for x in prior
            )
            gn, gd = got[rid]
            assert gn == n_types, (rid, gn, n_types)
            assert abs(gd - decay) < 1e-9, (rid, gd, decay)
    # empty frame: first row of each key
    assert got[0] == (0, 0.0) and got[5] == (0, 0.0)


def test_rolling_frame_features_fused_parity(spark):
    """add_rolling_frame_features (r6 fusion, VERDICT r5 #5) must be
    bit-identical to the standalone distinct + decayed-sum pair on the
    same frame, including NULL tag / NULL value / NULL ts corners."""
    rows = [
        (0, "a", 0, 1.0, "x"),
        (1, "a", 100, 2.0, None),   # NULL tag: excluded from distinct
        (2, "a", 200, None, "x"),   # NULL value: contributes 0 to decay
        (3, "a", 900, 4.0, "z"),
        (4, "a", None, 5.0, "y"),   # NULL ts: NULL decay, no weight
        (5, "b", 0, 7.0, "x"),
    ]
    df = spark.createDataFrame(
        [(i, k, s, v, e) for i, k, s, v, e in rows],
        "rid long, k string, sec long, v double, etype string",
    ).select(
        "rid", "k", "v", "etype",
        F.timestamp_micros(F.col("sec") * 1_000_000).alias("ts"),
    )
    sep = W.add_rolling_distinct(
        df, "k", ("ts", "rid"), "etype", "n_types", last_n=3
    )
    sep = W.add_rolling_decayed_sum(
        sep, "k", ("ts", "rid"), "ts", "v", "decay",
        half_life_s=600, last_n=3,
    )
    fused = W.add_rolling_frame_features(
        df, "k", ("ts", "rid"), "ts", "v",
        distinct_col="etype", distinct_out="n_types", decay_out="decay",
        half_life_s=600, last_n=3,
    )
    a = {r["rid"]: (r["n_types"], r["decay"]) for r in sep.collect()}
    b = {r["rid"]: (r["n_types"], r["decay"]) for r in fused.collect()}
    assert a == b
    # the fused plan carries ONE collect_list and NO collect_set
    # (AQE's toString repeats the plan under "== Initial Plan ==" —
    # count only the final section)
    plan = fused._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "collect_set" not in final
    assert final.count("collect_list") == 1


def test_windowed_accepts_timestamp_ntz_frames(spark):
    """Code-review r6: driver parquet reads are TIMESTAMP_NTZ; every
    ts-consuming function must cast defensively (the repo NTZ rule that
    asof.py/intervals.py already follow) instead of dying with
    DATATYPE_MISMATCH inside unix_micros."""
    df = spark.createDataFrame(
        [("u", i, float(i)) for i in range(6)],
        "user_id string, n int, value double",
    ).withColumn(
        "ts",
        F.timestamp_micros(F.col("n").cast("long") * 600_000_000).cast(
            "timestamp_ntz"
        ),
    )
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"

    out = W.add_ts_delta(df, "user_id", ["ts"], ts_col="ts")
    out = W.add_rolling_time(
        out, "user_id", "ts", F.count(F.lit(1)), "n_last_20m", 1200
    )
    out = W.add_rolling_decayed_sum(
        out, "user_id", ["ts"], "ts", "value", "decay", half_life_s=600
    )
    out = W.add_session_id(out, "user_id", ["ts"], ts_col="ts", gap_s=1800)
    rows = {r["n"]: r for r in out.collect()}
    assert rows[1]["ts_delta_prev_s"] == 600.0
    assert rows[2]["n_last_20m"] == 2
    assert rows[0]["session_id"] == 0

    aggs = W.session_aggregates(
        out, "user_id", ts_col="ts", session_col="session_id"
    )
    assert aggs.count() >= 1
