"""Mergeable sketch aggregates for corpus-scale monitoring.

The 100 TB pattern these enable: maintain a small SKETCH TABLE
incrementally — one HLL sketch per (source, day) partition, appended as
data lands — and answer "distinct fingerprints per source / overall"
by UNIONING sketches, never by re-scanning the corpus. A sketch is a
few KB regardless of input size, the union is associative and
commutative (layout/arrival-order independent), and a year of
per-source-per-day rollups fits on the driver.

Built on Spark's native Apache DataSketches bindings
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate`` —
JVM-side, no Python in the aggregation path) and the GK quantile
aggregate (``percentile_approx``). Properties pinned by
tests/test_sketches.py:

- exactness in sparse mode: below ~0.75·2^lg_k distinct values the
  DataSketches HLL stores exact coupons, so small-cardinality
  estimates are EXACT, not approximate;
- mergeability: union of per-group sketches == one sketch over the
  whole input (same estimate);
- bounded error at scale (relative standard error ≈ 1.04/√2^lg_k,
  ~1.6 % at the default lg_k=12);
- layout invariance: estimates identical under repartition.

No DuckDB twin exists for the DataSketches binary format, so these
carry pytest evidence rather than a driver oracle (the exact
distinct-count operators — groupBy/countDistinct/window count(DISTINCT)
— are the oracle-checked relatives).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

DEFAULT_LG_K = 12  # RSE ≈ 1.04 / sqrt(2^12) ≈ 1.6%


def distinct_sketch(
    df: DataFrame,
    keys: Sequence[str],
    col: str,
    out: str = "sketch",
    lg_k: int = DEFAULT_LG_K,
    extra_aggs: Sequence[Column] = (),
) -> DataFrame:
    """One HLL sketch of ``col``'s distinct values per ``keys`` group —
    the incremental build step (run per partition/batch and append).
    Map-side combinable like any aggregate: the shuffle carries
    sketches, not values."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(col, F.lit(int(lg_k))).alias(out), *extra_aggs
    )


def distinct_rollup(
    sketch_df: DataFrame,
    keys: Sequence[str],
    sketch_col: str = "sketch",
    out: str | None = None,
) -> DataFrame:
    """Roll sketches up to a coarser key set by sketch UNION (e.g.
    (source, day) → source, or → grand total with ``keys=[]``) —
    touches only the sketch table, never the corpus."""
    return sketch_df.groupBy(*keys).agg(
        F.hll_union_agg(sketch_col).alias(out or sketch_col)
    )


def distinct_estimate(
    sketch_df: DataFrame,
    sketch_col: str = "sketch",
    out: str = "n_distinct",
) -> DataFrame:
    """Materialize the distinct-count estimate column (bigint)."""
    return sketch_df.withColumn(out, F.hll_sketch_estimate(sketch_col))


def approx_quantiles_by(
    df: DataFrame,
    keys: Sequence[str],
    col: str,
    probs: Sequence[float],
    accuracy: int = 10_000,
    out: str = "quantiles",
) -> DataFrame:
    """Per-group approximate quantiles (GK aggregate): the length/score
    distribution monitor for curation dashboards. ``accuracy`` trades
    memory for error (ε ≈ 1/accuracy of rank). For oracle-exact
    percentiles see the `percentile` path (ev_value_median)."""
    return df.groupBy(*keys).agg(
        F.percentile_approx(
            col, F.array(*[F.lit(float(p)) for p in probs]), F.lit(int(accuracy))
        ).alias(out)
    )
