"""As-of join correctness vs pandas loop-oracle (SURVEY.md §5.2, C9-C10),
including equal-ts tie-break and null-feature non-leak semantics."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from feagen_spark.features import turns as T
from feagen_spark.operators.asof import asof_join, backfill_snapshots
from feagen_spark.datagen.transcripts import labels
from oracles import oracle_asof

VALUE_COLS = ["turns_so_far", "session_id", "cum_tool_calls"]


@pytest.fixture(scope="module")
def featured(tiny_transcripts):
    df = T.add_turns_so_far(tiny_transcripts)
    df = T.add_session_id(df)
    df = T.add_cum_tool_calls(df)
    return df.cache()


@pytest.fixture(scope="module")
def label_df(spark, tiny_transcripts):
    return labels(spark, tiny_transcripts).cache()


@pytest.mark.parametrize("strict", [True, False])
def test_asof_matches_oracle(featured, label_df, strict):
    got = (
        backfill_snapshots(
            featured, label_df, feature_cols=VALUE_COLS, strict=strict
        )
        .toPandas()
        .sort_values(["conv_id", "ts"] + VALUE_COLS)
        .reset_index(drop=True)
    )
    exp = (
        oracle_asof(
            label_df.toPandas(),
            featured.toPandas(),
            VALUE_COLS,
            strict=strict,
        )
        .sort_values(["conv_id", "ts"] + VALUE_COLS)
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    for c in VALUE_COLS:
        g = pd.to_numeric(got[c], errors="coerce").astype(float)
        e = pd.to_numeric(exp[c], errors="coerce").astype(float)
        assert np.allclose(g, e, equal_nan=True), f"{c} strict={strict}"


def test_asof_before_start_is_null(featured, spark):
    lbl = spark.createDataFrame(
        [("conv00000000",)], "conv_id string"
    ).withColumn("ts", F.lit("2020-01-01 00:00:00").cast("timestamp"))
    out = backfill_snapshots(featured, lbl, feature_cols=["turns_so_far"]).collect()
    assert len(out) == 1 and out[0]["turns_so_far"] is None


def test_asof_equal_ts_tiebreak(featured, spark):
    """convTIE has two turns at identical ts: strict sees neither at that
    instant; inclusive sees the LATEST (turn_idx tie-break)."""
    tie_ts = featured.where(F.col("conv_id") == "convTIE").select("ts").first()["ts"]
    lbl = spark.createDataFrame([("convTIE", tie_ts)], "conv_id string, ts timestamp")
    strict = backfill_snapshots(
        featured, lbl, feature_cols=["turns_so_far"], strict=True
    ).collect()[0]
    incl = backfill_snapshots(
        featured, lbl, feature_cols=["turns_so_far"], strict=False
    ).collect()[0]
    assert strict["turns_so_far"] is None
    assert incl["turns_so_far"] == 1  # latest of the two equal-ts turns


def test_asof_null_value_does_not_leak_older(spark):
    """A right row whose feature VALUE is null must still win as-of — a
    null snapshot must not resurrect an older non-null one (struct
    carrier semantics)."""
    right = spark.createDataFrame(
        [("c", 1, "2026-01-01 00:00:00", 10.0), ("c", 2, "2026-01-01 00:10:00", None)],
        "conv_id string, turn_idx int, ts_s string, v double",
    ).select("conv_id", "turn_idx", F.col("ts_s").cast("timestamp").alias("ts"), "v")
    lbl = spark.createDataFrame(
        [("c", "2026-01-01 00:20:00")], "conv_id string, ts_s string"
    ).select("conv_id", F.col("ts_s").cast("timestamp").alias("ts"))
    out = asof_join(
        lbl, right, on=["conv_id"], values=["v"], strict=True,
        right_order=("turn_idx",),
    ).collect()[0]
    assert out["v"] is None  # the null snapshot, NOT 10.0


def test_asof_multiple_value_columns_single_window(tiny_transcripts, label_df):
    """Plan sanity: the as-of join itself runs as ONE Window exec over the
    union — no join explosion, no per-value-column window. Uses a
    window-free right side so upstream feature windows don't pollute the
    count."""
    right = tiny_transcripts.select(
        "conv_id",
        "turn_idx",
        "ts",
        F.length("text").alias("v1"),
        (F.col("role") == "tool").cast("int").alias("v2"),
        F.unix_micros("ts").alias("v3"),
    )
    out = asof_join(
        label_df, right, on=["conv_id"], values=["v1", "v2", "v3"],
        strict=True, right_order=("turn_idx",),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    asof_windows = sum(
        1 for line in plan.splitlines() if "last(__asof_snap" in line
    )
    assert asof_windows == 1, plan  # one Window exec carries all value cols
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
