"""Mergeable-sketch properties (operators/sketches.py): sparse-mode
exactness, union==whole, bounded error at scale, layout invariance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from feagen_spark.operators import sketches as SK


@pytest.fixture(scope="module")
def events_like(spark):
    # 40_000 rows, 9 sources, global distinct users = 3000 (pmod keeps
    # the remainder non-negative — a plain % would double the range),
    # heavily overlapping across sources
    return spark.range(40_000).select(
        (F.col("id") % 9).alias("source"),
        F.pmod(F.xxhash64("id"), F.lit(3000)).alias("user"),
        (F.col("id") % 97).cast("double").alias("value"),
    ).cache()


def test_sparse_mode_is_exact(spark):
    """Below the coupon threshold the DataSketches HLL is exact — the
    estimate equals count(DISTINCT) exactly, not approximately."""
    df = spark.range(10_000).select(
        F.lit(1).alias("g"), (F.col("id") % 200).alias("u")
    )
    est = SK.distinct_estimate(SK.distinct_sketch(df, ["g"], "u")).first()
    assert est["n_distinct"] == 200


def test_union_of_group_sketches_equals_whole(events_like):
    """Mergeability — the 100TB property: per-source sketches unioned
    give the SAME estimate as one sketch over everything."""
    per_source = SK.distinct_sketch(events_like, ["source"], "user")
    merged = SK.distinct_estimate(
        SK.distinct_rollup(per_source, [], "sketch")
    ).first()["n_distinct"]
    whole = SK.distinct_estimate(
        SK.distinct_sketch(events_like.select(F.lit(1).alias("g"), "user"), ["g"], "user")
    ).first()["n_distinct"]
    assert merged == whole


def test_error_bound_at_scale(spark):
    """At 100k distinct values (far past sparse mode) the estimate must
    land within ~5x the theoretical RSE (1.6% at lg_k=12)."""
    df = spark.range(300_000).select(
        F.lit(1).alias("g"), (F.xxhash64("id") % 100_000).alias("u")
    )
    exact = df.select("u").distinct().count()
    est = SK.distinct_estimate(SK.distinct_sketch(df, ["g"], "u")).first()[
        "n_distinct"
    ]
    assert abs(est - exact) / exact < 0.08, (est, exact)


def test_estimate_invariant_under_repartition(events_like):
    """HLL insertion is order/layout independent: the same data through
    a different partitioning must give the identical estimate."""
    a = SK.distinct_estimate(
        SK.distinct_rollup(
            SK.distinct_sketch(events_like, ["source"], "user"), []
        )
    ).first()["n_distinct"]
    b = SK.distinct_estimate(
        SK.distinct_rollup(
            SK.distinct_sketch(
                events_like.repartition(17, "user"), ["source"], "user"
            ),
            [],
        )
    ).first()["n_distinct"]
    assert a == b


def test_approx_quantiles_bounded_rank_error(events_like):
    """GK quantiles: each returned value's true rank must sit within
    eps=1/accuracy of the requested prob."""
    probs = [0.1, 0.5, 0.9]
    got = SK.approx_quantiles_by(
        events_like, [], "value", probs, accuracy=1000
    ).first()["quantiles"]
    n = events_like.count()
    vals = sorted(r["value"] for r in events_like.select("value").collect())
    for p, q in zip(probs, got):
        import bisect

        lo = bisect.bisect_left(vals, q) / n
        hi = bisect.bisect_right(vals, q) / n
        assert lo - 0.002 <= p <= hi + 0.002, (p, q, lo, hi)
