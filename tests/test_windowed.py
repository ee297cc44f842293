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
