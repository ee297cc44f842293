"""Source/sink layer (C1/C2): NTZ normalization, iceberg fallback,
bucket-style clustered writes."""

from __future__ import annotations

from pyspark.sql import functions as F

from feagen_spark.sources import tables as SRC


def test_iceberg_falls_back_in_sandbox(spark):
    # no iceberg jar ships here (SURVEY.md §1.2): must report unavailable
    assert SRC.iceberg_available(spark) is False


def test_read_normalizes_ntz(spark):
    """Driver parquet is TIMESTAMP_NTZ; read_table must hand back a
    session-TZ timestamp so unix_micros/range frames work."""
    df = SRC.read_table(spark, "/root/testdata/sf0.001/events.parquet")
    assert df.schema["ts"].dataType.typeName() == "timestamp"
    # and the instant matches duckdb's epoch_us view of the same file
    got = df.select(F.unix_micros("ts").alias("us")).orderBy("us").first()["us"]
    import duckdb

    exp = duckdb.connect().execute(
        "select min(epoch_us(ts)) from read_parquet('/root/testdata/sf0.001/events.parquet')"
    ).fetchone()[0]
    assert got == exp


def test_bucketed_parquet_write_clusters_keys(spark, tiny_transcripts, tmp_path):
    out = str(tmp_path / "clustered")
    SRC.write_table(
        tiny_transcripts, out, fmt="parquet", bucket_by=(4, "conv_id")
    )
    back = spark.read.parquet(out)
    assert back.count() == tiny_transcripts.count()
    # each conv's rows land in exactly one file (conversation locality)
    per_conv_files = (
        back.select("conv_id", F.input_file_name().alias("f"))
        .groupBy("conv_id")
        .agg(F.countDistinct("f").alias("nf"))
        .agg(F.max("nf").alias("m"))
        .first()["m"]
    )
    assert per_conv_files == 1
