"""Source/sink layer (SURVEY.md §2.C C1-C2): Iceberg-first table access
with a parquet fallback for this sandbox.

No Iceberg runtime jar ships with this install (verified — SURVEY.md
§1.2), so `format="iceberg"` only activates when the runtime is present
(real cluster: `spark-submit --packages org.apache.iceberg:...` +
catalog conf). Everything else in the engine talks to this module, so
swapping storage is a one-line config change.

Layout guidance encoded here (the 100TB defaults):
- transcripts partitioned by bucket(conv_id) — co-locates each
  conversation for the window suite and bounds file counts;
  `days(ts)`-style partitioning is the alternative when retention
  pruning matters more than conversation locality.
- feature snapshot tables keyed (conv_id, turn_idx), written with the
  checkpoint store's manifest (per-file rows, ts min/max, checksum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


def read_table(
    spark: SparkSession,
    location: str,
    fmt: str = "parquet",
    ts_col: str | None = "ts",
) -> DataFrame:
    """Read an input table; NTZ timestamps are normalized to session-TZ
    timestamps so window range frames and as-of joins are well-defined."""
    if fmt == "iceberg" and not iceberg_available(spark):
        fmt = "parquet"  # sandbox fallback; see module docstring
    df = (
        spark.read.format(fmt).load(location)
        if fmt != "iceberg"
        else spark.read.table(location)
    )
    if ts_col and ts_col in df.columns and df.schema[ts_col].dataType.typeName() == (
        "timestamp_ntz"
    ):
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by: tuple[int, str] = (8, "conv_id"),
    sort_by: tuple[str, ...] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Catalog-managed BUCKETED table (Spark-native bucketing — works
    with the built-in session catalog, no Iceberg required): two tables
    bucketed on the same key with the same bucket count JOIN WITH NO
    EXCHANGE on either side — the co-located-join layout for the 100 TB
    deployment's repeated feature/label joins (asserted shuffle-free in
    tests/test_plans.py). ``sort_by`` additionally pre-sorts within
    buckets so window suites over the key start sort-free."""
    n, col = bucket_by
    w = df.write.mode(mode).format(fmt).bucketBy(n, col)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.saveAsTable(table)


def write_table(
    df: DataFrame,
    location: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    bucket_by: tuple[int, str] | None = None,
    partition_by: str | None = None,
) -> None:
    """Write a table with the scale-default layout. bucket_by requires a
    saveAsTable-capable catalog (Iceberg/HMS); plain parquet paths fall
    back to repartition-by-key so files are still conversation-clustered."""
    if fmt == "iceberg" and not iceberg_available(df.sparkSession):
        fmt = "parquet"
    w = df.write.mode(mode)
    if bucket_by is not None:
        n, col = bucket_by
        if fmt == "parquet":
            df = df.repartition(n, col)
            w = df.write.mode(mode)
        else:
            w = w.bucketBy(n, col)
    if partition_by:
        w = w.partitionBy(partition_by)
    w.format(fmt).save(location)
