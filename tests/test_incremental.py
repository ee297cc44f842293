"""Data-level incremental refresh: touched-conversation recompute must
equal the full recompute on those conversations, and partition-overwrite
must leave untouched conversations' files intact."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from feagen_spark.core.dag import FeatureDAG
from feagen_spark.core.engine import Engine
from feagen_spark.features.turns import transcript_nodes, transcript_templates
from feagen_spark.operators import incremental as INC

REQ = ["prev_role", "turns_so_far", "session_id", "turn_in_session"]


@pytest.fixture()
def engine(tiny_transcripts):
    dag = FeatureDAG(
        nodes=transcript_nodes(),
        templates=transcript_templates(),
        input_columns=tuple(tiny_transcripts.columns),
    )
    return Engine(dag, store=None)


def test_refresh_equals_full_recompute(engine, tiny_transcripts):
    # "new turns" arrive for every 5th conversation
    new_turns = tiny_transcripts.where(
        F.pmod(F.xxhash64("conv_id"), F.lit(5)) == 0
    ).where(F.col("turn_idx") == 0)
    affected = INC.affected_conversations(new_turns)
    n_affected = affected.count()
    assert 0 < n_affected < tiny_transcripts.select("conv_id").distinct().count()

    refreshed = INC.refresh_conversations(
        engine, tiny_transcripts, new_turns, REQ
    )
    full = engine.generate(tiny_transcripts, REQ).join(
        F.broadcast(affected), on="conv_id", how="left_semi"
    )
    a = (
        refreshed.select("conv_id", "turn_idx", *REQ)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
        .fillna("__n__")
        .astype(str)
    )
    b = (
        full.select("conv_id", "turn_idx", *REQ)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
        .fillna("__n__")
        .astype(str)
    )
    pd.testing.assert_frame_equal(a, b)


def test_write_refresh_touches_only_affected_partitions(
    engine, tiny_transcripts, tmp_path, spark
):
    snap = str(tmp_path / "snapshot")
    full = engine.generate(tiny_transcripts, REQ).select(
        "conv_id", "turn_idx", *REQ
    )
    full.write.mode("overwrite").partitionBy("conv_id").parquet(snap)
    before = spark.read.parquet(snap).count()

    new_turns = tiny_transcripts.where(F.col("conv_id") == "conv00000003")
    refreshed = INC.refresh_conversations(
        engine, tiny_transcripts, new_turns, REQ
    ).select("conv_id", "turn_idx", *REQ)
    INC.write_refresh(refreshed, snap)

    after = spark.read.parquet(snap)
    assert after.count() == before  # same rows (refresh, not append)
    # untouched conversations still fully present
    assert (
        after.where(F.col("conv_id") != "conv00000003").count()
        == before - tiny_transcripts.where(F.col("conv_id") == "conv00000003").count()
    )


def test_corpus_diff_classifies_and_ships_digests_only(spark):
    from feagen_spark.operators.incremental import corpus_diff

    old = spark.createDataFrame(
        [(i, f"text {i}", f"h{i}") for i in range(1, 11)],
        "doc_id long, text string, fingerprint string",
    )
    new_rows = [
        (i, f"text {i}", f"h{i}") for i in range(1, 11) if i != 3
    ]
    new_rows = [
        (i, t, ("h5x" if i == 5 else h)) for i, t, h in new_rows
    ] + [(11, "text 11", "h11")]
    new = spark.createDataFrame(
        new_rows, "doc_id long, text string, fingerprint string"
    )

    out = corpus_diff(old, new)
    got = {r["doc_id"]: r["status"] for r in out.collect()}
    assert got == {3: "removed", 5: "changed", 11: "added"}
    row5 = {r["doc_id"]: r for r in out.collect()}[5]
    assert row5["old_fingerprint"] == "h5" and row5["new_fingerprint"] == "h5x"

    full = corpus_diff(old, new, include_unchanged=True)
    assert full.count() == 11
    assert full.where(F.col("status") == "unchanged").count() == 8

    # the diff join must shuffle digests, never the text payload
    import re

    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", final):
        assert "text" not in m.group(1), final


def test_corpus_diff_null_fingerprints_classify_by_presence(spark):
    """Presence flags, not fingerprint nullness, decide added/removed:
    a doc present in both snapshots with a NULL fingerprint on one
    side is CHANGED; NULL on both sides is unchanged (code-review r6)."""
    from feagen_spark.operators.incremental import corpus_diff

    old = spark.createDataFrame(
        [(1, None), (2, "h2"), (3, None)],
        "doc_id long, fingerprint string",
    )
    new = spark.createDataFrame(
        [(1, "h1x"), (2, None), (3, None)],
        "doc_id long, fingerprint string",
    )
    got = {
        r["doc_id"]: r["status"]
        for r in corpus_diff(old, new, include_unchanged=True).collect()
    }
    assert got == {1: "changed", 2: "changed", 3: "unchanged"}
