"""Point-in-time / as-of join and backfill (SURVEY.md §2.C C9-C10).

For each left (label/query) row ``(keys, ts)`` attach the latest right
(feature) row with ``right.ts <= left.ts`` (``strict=False``) or
``right.ts < left.ts`` (``strict=True``, the leakage-safe default per
BASELINE.json:14 — a feature snapshot taken AT the label instant is
already information from that instant).

Implementation: the union-and-window pattern, chosen over a range join
because it costs exactly ONE shuffle on the join keys and never
materializes an (n_left × n_right) intermediate — at 10^12 turns a
range/theta join on (conv_id, ts<=) would explode. Both sides are
tagged, unioned by name, and a single
``last(snapshot, ignorenulls=True)`` window ordered by
``(ts, side_tag)`` carries the most recent feature struct forward onto
each left row. Tie-break at equal ts is encoded purely in the side tag
ordering:

    strict=False: right rows sort BEFORE left rows at equal ts → visible
    strict=True:  right rows sort AFTER  left rows at equal ts → hidden

Right-side values are carried inside ONE struct column, so genuinely
NULL feature values do not make ``last(..., ignorenulls)`` leak an older
snapshot forward (the struct itself is non-null for every right row).

Skew: the single window partitions by the join keys; AQE cannot split a
skewed window partition, so for pathologically hot keys use
operators.skew.salted hints upstream or pre-aggregate the right side.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

_SIDE = "__asof_side"
_SNAP = "__asof_snap"
_ORD = "__asof_ord"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    values: Sequence[str] | None = None,
    strict: bool = True,
    right_order: Sequence[str] = (),
    value_prefix: str = "",
) -> DataFrame:
    """As-of join left←right on ``on`` keys ordered by timestamps.

    Returns all left rows + ``values`` columns from the latest admissible
    right row (null when none exists). ``right_order`` breaks ties among
    right rows sharing a timestamp (latest wins); defaults to input order
    of the right frame made deterministic by right_ts only.
    """
    on = list(on)
    if values is None:
        values = [c for c in right.columns if c not in set(on) | {right_ts}]
    values = list(values)

    out_cols = [f"{value_prefix}{v}" for v in values]
    left_payload = [c for c in left.columns if c not in set(on) | {left_ts}]

    # tag ordering: lower _SIDE sorts first at equal ts
    right_side = 0 if not strict else 2
    left_side = 1

    # tie-break columns among equal-ts right rows, renamed to avoid any
    # clash with left payload columns
    ord_aliases = [f"{_ORD}{i}" for i in range(len(right_order))]

    r = right.select(
        *on,
        F.col(right_ts).alias(_ORD),
        F.lit(right_side).alias(_SIDE),
        F.struct(*[F.col(v) for v in values]).alias(_SNAP),
        *[
            F.col(c).alias(a)
            for c, a in zip(right_order, ord_aliases)
        ],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        F.lit(None).cast(left.schema[left_ts].dataType).alias(left_ts),
    )
    l = left.select(
        *on,
        F.col(left_ts).alias(_ORD),
        F.lit(left_side).alias(_SIDE),
        F.lit(None).cast(r.schema[_SNAP].dataType).alias(_SNAP),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(a)
            for c, a in zip(right_order, ord_aliases)
        ],
        *left_payload,
        F.col(left_ts),
    )
    u = r.unionByName(l)

    order = [F.col(_ORD).asc(), F.col(_SIDE).asc()] + [
        F.col(a).asc() for a in ord_aliases
    ]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    u = u.withColumn(_SNAP, F.last(_SNAP, ignorenulls=True).over(w))

    picked = u.where(F.col(_SIDE) == left_side)
    result = picked.select(
        *on,
        left_ts,
        *left_payload,
        *[F.col(f"{_SNAP}.{v}").alias(o) for v, o in zip(values, out_cols)],
    )
    return result


def backfill_snapshots(
    turns_with_features: DataFrame,
    label_points: DataFrame,
    on: Sequence[str] = ("conv_id",),
    feature_cols: Sequence[str] | None = None,
    strict: bool = True,
) -> DataFrame:
    """C10: attach the as-of feature snapshot to each label point.

    ``turns_with_features`` is the transcript table with trailing-window
    features already appended (those ARE the as-of state at each turn);
    this projects the snapshot onto arbitrary (conv_id, ts) query points.
    """
    if feature_cols is None:
        feature_cols = [
            c
            for c in turns_with_features.columns
            if c not in {"conv_id", "turn_idx", "role", "text", "tool", "ts",
                         "next_role"}  # leads never enter snapshots
        ]
    return asof_join(
        label_points,
        turns_with_features,
        on=on,
        values=list(feature_cols),
        strict=strict,
        right_order=("turn_idx",) if "turn_idx" in turns_with_features.columns else (),
    )
