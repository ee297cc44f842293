"""Measured evidence for interleave_strata's scale claim: the
within-stratum rank comes from the mono-id side-table machinery, NOT a
per-stratum window — on a skew-dominated corpus (one stratum holding
~95% of rows, the realistic shape: English in a multilingual corpus)
a window implementation pins the dominant stratum to ONE task while
the side-table path spreads it across every range partition.

Run: python tools/bench_interleave.py  [n_rows]
Appends nothing; prints a BENCH/SKEW.md-ready table. Times are
best-of-2 per mode, interleaved (window, side-table, window,
side-table) so box drift cannot systematically favor one mode.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from feagen_spark import get_spark
from feagen_spark.operators.cleaning import interleave_strata


def naive_window_interleave(df, strata_col, id_col, n_partitions):
    """The implementation interleave_strata deliberately avoids: exact
    same math (rank r -> pos r/(n+1) -> global order), but the
    within-stratum rank is a per-stratum window — the dominant stratum
    becomes one task."""
    key = F.xxhash64(F.lit(42), F.col(id_col))
    w = Window.partitionBy(strata_col).orderBy(key, id_col)
    wn = Window.partitionBy(strata_col)
    pos = (
        F.row_number().over(w) / (F.count(F.lit(1)).over(wn) + 1)
    ).alias("interleave_pos")
    out = df.select("*", key.alias("interleave_key"), pos)
    return out.repartitionByRange(
        n_partitions, F.col("interleave_pos"), F.col("interleave_key")
    ).sortWithinPartitions("interleave_pos", "interleave_key", id_col)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    spark = get_spark(master="local[32]", shuffle_partitions=64)
    # 95% of rows in one stratum, the rest split across 20 small ones
    df = (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.when(F.pmod("id", F.lit(20)) > 0, F.lit("en"))
            .otherwise(F.concat(F.lit("s"), F.pmod("id", F.lit(400))))
            .alias("src"),
        )
        .localCheckpoint()  # pin the input out of both measurements
    )

    def run_noop(frame) -> float:
        t0 = time.monotonic()
        frame.write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    times: dict[str, list[float]] = {"window": [], "side-table": []}
    for _ in range(2):
        times["window"].append(
            run_noop(naive_window_interleave(df, "src", "doc_id", 64))
        )
        times["side-table"].append(
            run_noop(
                interleave_strata(
                    df, "src", n_partitions=64, rank_col=None
                )
            )
        )
    w, s = min(times["window"]), min(times["side-table"])
    print(f"rows={n} dominant stratum ~{0.95 * n:.0f}")
    print(f"per-stratum window : {w:.2f}s  (dominant stratum = ONE task)")
    print(f"side-table (ours)  : {s:.2f}s  ({w / s:.2f}x)")
    spark.stop()


if __name__ == "__main__":
    main()
