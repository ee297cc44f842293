"""Data-level incremental feature refresh (batch counterpart of
streaming/incremental.py; complements the engine's node-level
skip-if-exists resume).

Window features need the FULL conversation history, so the correct
incremental unit is the conversation, not the row: when a batch of new
turns lands, only the touched conversations' feature rows change.

``refresh_conversations`` recomputes exactly those conversations and
returns (updated_feature_rows, affected_conv_ids). At 100TB the flow
is: append new turns to the transcript table → semi-join the table on
the (small, broadcast) affected-conv set → run the feature DAG on that
slice → dynamic-partition-overwrite the feature snapshot table for
those conversations. The cost is O(touched conversations), not O(table).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def affected_conversations(new_turns: DataFrame, key: str = "conv_id") -> DataFrame:
    return new_turns.select(key).distinct()


def refresh_conversations(
    engine,
    full_table: DataFrame,
    new_turns: DataFrame,
    requested: Sequence[str],
    key: str = "conv_id",
) -> DataFrame:
    """Recompute the requested features for exactly the conversations
    touched by ``new_turns`` (which must already be part of
    ``full_table``). Returns the refreshed feature rows for those
    conversations — correct against a full recompute because each
    conversation is featurized from its complete history."""
    affected = affected_conversations(new_turns, key=key)
    slice_df = full_table.join(F.broadcast(affected), on=key, how="left_semi")
    return engine.generate(slice_df, list(requested))


def _dynamic_overwrite(
    df: DataFrame,
    path: str,
    partition_by: list[str] | str,
    fmt: str = "parquet",
) -> None:
    """Dynamic partition overwrite: only the partitions PRESENT in `df`
    are rewritten — the idempotent-append primitive shared by the
    refresh snapshot writer and the streaming ingest-dedup sinks (a
    replayed batch overwrites exactly its own partitions).

    The mode rides as a PER-WRITE option, not the session conf: two
    concurrent writers toggling the session-global
    ``partitionOverwriteMode`` can race one of them into a STATIC
    overwrite that deletes every existing partition (code-review r6)."""
    cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*cols)
        .format(fmt)
        .save(path)
    )


def write_refresh(
    refreshed: DataFrame,
    snapshot_path: str,
    key: str = "conv_id",
    fmt: str = "parquet",
) -> None:
    """Dynamic partition overwrite of the refreshed conversations into a
    key-partitioned snapshot table (only touched partitions rewritten)."""
    _dynamic_overwrite(refreshed, snapshot_path, key, fmt=fmt)


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    fingerprint_col: str = "fingerprint",
    include_unchanged: bool = False,
) -> DataFrame:
    """Snapshot-over-snapshot corpus audit: classify every document as
    ``added`` / ``removed`` / ``changed`` / ``unchanged`` between two
    corpus versions — the data-versioning regression check a training
    pipeline runs before promoting a refresh (did the crawler drop a
    domain? did a cleaning-rule change silently rewrite half the
    corpus?).

    Scalable shape: both sides project to (id, fingerprint) BEFORE the
    ONE full-outer equi-join — the shuffle carries two digest columns,
    never document payloads (plan-asserted; the exact_dedup lesson,
    VERDICT r2 #2). Content comparison is by the caller's fingerprint
    column (``textstats.add_fingerprint`` = md5 of the normalized text
    — compute it on each side if not already stored). ``unchanged``
    rows are excluded by default: at 100 TB they are ~the whole corpus
    and the interesting classes are the small ones; the summary
    ``groupBy(status).count()`` is map-combinable either way.

    Presence is tracked by an explicit per-side flag, NOT by
    fingerprint nullness (code-review r6): a doc present in both
    snapshots with a NULL fingerprint on one side (add_fingerprint
    over NULL text) must classify as changed, not added/removed;
    fingerprints compare null-safely, so NULL vs NULL is unchanged.

    Output: (id, status, old_fingerprint, new_fingerprint)."""
    o = old.select(
        F.col(id_col),
        F.col(fingerprint_col).alias("old_fingerprint"),
        F.lit(1).alias("__in_old"),
    )
    n = new.select(
        F.col(id_col),
        F.col(fingerprint_col).alias("new_fingerprint"),
        F.lit(1).alias("__in_new"),
    )
    j = o.join(n, on=id_col, how="full_outer")
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(
            ~F.col("old_fingerprint").eqNullSafe(F.col("new_fingerprint")),
            F.lit("changed"),
        )
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(id_col, status.alias("status"),
                   "old_fingerprint", "new_fingerprint")
    if not include_unchanged:
        out = out.where(F.col("status") != "unchanged")
    return out
