"""Global leakage property (BASELINE.json zero-temporal-leakage rule):
every trailing feature must be PREFIX-INVARIANT — computing it over only
the rows up to a cutoff must give the same values as computing it over
the full stream and then looking at those rows. A feature that reads any
later row fails this for some cutoff.

This checks the property end-to-end through the DAG engine (not per
frame), on randomized inputs, for both the transcript and the event
profiles."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from feagen_spark.core.dag import FeatureDAG
from feagen_spark.core.engine import Engine


def _random_events(spark, seed: int, n: int = 400):
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        rows.append(
            (
                i,
                f"u{rng.randint(0, 7)}",
                ["click", "view", "purchase"][rng.randint(0, 3)],
                float(np.round(rng.uniform(0, 100), 2)),
                int(rng.randint(0, 72 * 3600) * 1_000_000),
            )
        )
    df = spark.createDataFrame(
        rows, "event_id long, user_id string, event_type string, value double, us long"
    )
    return df.select(
        "event_id", "user_id", "event_type", "value",
        F.timestamp_micros(F.col("us")).alias("ts"),
    )


EV_FEATURES = [
    "prev_event_type", "ts_delta_prev_s", "n_so_far", "cum_value",
    "value_sum_last_10", "n_events_600s", "session_id",
    "last_click_value", "value_lag_3",
    # r5 trailing additions — must be prefix-invariant like the rest
    "n_types_last_10", "value_decay_600s",
]


@pytest.mark.parametrize("seed", [11, 37, 101])
def test_event_features_prefix_invariant(spark, seed):
    from feagen_spark.features.events import event_nodes, event_templates

    ev = _random_events(spark, seed)
    dag = FeatureDAG(
        nodes=event_nodes(), templates=event_templates(),
        input_columns=tuple(ev.columns),
    )
    eng = Engine(dag, store=None, keys=("user_id", "event_id"))
    full = eng.generate(ev, EV_FEATURES)

    # the cut must be a valid HISTORY prefix, so cut on ts (the ordering
    # column) — an event_id cut would drop rows from the middle of a
    # user's timeline and legitimately change trailing features
    med_ts = ev.agg(F.expr("percentile(unix_micros(ts), 0.6)")).first()[0]
    w_cut = ev.where(F.unix_micros("ts") <= med_ts)
    prefix = eng.generate(w_cut, EV_FEATURES)

    cols = ["event_id"] + EV_FEATURES
    f = (
        full.where(F.unix_micros("ts") <= med_ts)
        .select(*cols).orderBy("event_id").toPandas()
    )
    p = prefix.select(*cols).orderBy("event_id").toPandas()
    assert len(f) == len(p) and len(f) > 50
    for c in EV_FEATURES:
        fa, pa = f[c], p[c]
        if fa.dtype.kind == "f":
            assert np.allclose(
                fa.astype(float), pa.astype(float), equal_nan=True
            ), c
        else:
            assert (fa.fillna("__n__") == pa.fillna("__n__")).all(), c


@pytest.mark.parametrize("seed", [5])
def test_transcript_features_prefix_invariant(spark, seed, tiny_transcripts):
    from bench import GOLDEN_FEATURES
    from feagen_spark.features.turns import transcript_nodes, transcript_templates

    df = tiny_transcripts
    dag = FeatureDAG(
        nodes=transcript_nodes(), templates=transcript_templates(),
        input_columns=tuple(df.columns),
    )
    eng = Engine(dag, store=None)
    feats = [x for x in GOLDEN_FEATURES]
    full = eng.generate(df, feats)
    # prefix per conversation: keep the first 60% of turns (turn_idx is
    # the total order, so a turn_idx cut IS a valid history prefix)
    cut = df.groupBy("conv_id").agg(
        (F.max("turn_idx") * 0.6).cast("int").alias("cut")
    )
    w_cut = df.join(cut, "conv_id").where(F.col("turn_idx") <= F.col("cut")).drop("cut")
    prefix = eng.generate(w_cut, feats)

    keys = ["conv_id", "turn_idx"]
    f = (
        full.join(w_cut.select(keys), keys, "left_semi")
        .select(*keys, *feats).orderBy(*keys).toPandas()
    )
    p = prefix.select(*keys, *feats).orderBy(*keys).toPandas()
    assert len(f) == len(p) and len(f) > 100
    for c in feats:
        fa, pa = f[c], p[c]
        if str(fa.dtype).startswith("datetime") or fa.dtype == object:
            assert (fa.fillna("__n__").astype(str) == pa.fillna("__n__").astype(str)).all(), c
        elif fa.dtype.kind == "f":
            assert np.allclose(fa.astype(float), pa.astype(float), equal_nan=True), c
        else:
            assert (fa == pa).all(), c


@pytest.mark.parametrize("seed", [19, 53])
def test_rolling_zscore_prefix_invariant(spark, seed):
    """add_rolling_zscore (frame -n..-1) must be prefix-invariant: the
    z-scores of the rows before a cutoff are identical whether the
    later rows exist or not. Its full-group sibling add_group_zscore is
    deliberately NOT (checked too — if the group variant ever passed
    this, the test itself would be vacuous)."""
    from feagen_spark.functions.windowed import (
        add_group_zscore,
        add_rolling_zscore,
    )

    ev = _random_events(spark, seed)
    cutoff = F.timestamp_micros(F.lit(36 * 3600 * 1_000_000))

    def vals(df, col):
        pdf = df.toPandas().sort_values("event_id")
        return pdf[col].to_numpy(dtype=float)

    full = add_rolling_zscore(
        ev, "user_id", "value", order=("ts", "event_id"), n=10
    ).where(F.col("ts") <= cutoff)
    prefix = add_rolling_zscore(
        ev.where(F.col("ts") <= cutoff),
        "user_id", "value", order=("ts", "event_id"), n=10,
    )
    a, b = vals(full, "value_zscore_trailing"), vals(prefix, "value_zscore_trailing")
    assert len(a) == len(b) > 50
    assert np.allclose(a, b, equal_nan=True)

    g_full = add_group_zscore(ev, "user_id", "value").where(
        F.col("ts") <= cutoff
    )
    g_prefix = add_group_zscore(
        ev.where(F.col("ts") <= cutoff), "user_id", "value"
    )
    ga, gb = vals(g_full, "value_zscore"), vals(g_prefix, "value_zscore")
    assert not np.allclose(ga, gb, equal_nan=True)
