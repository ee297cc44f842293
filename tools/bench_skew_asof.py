"""Skew evidence for the as-of join: plain union+window (hot key pinned
to ONE task) vs asof_join_chunked (two-pass time-bucketed carry).

Reuses the bench_skew.py pathological input (one conversation with 98%
of all rows). Labels = every 20th turn's timestamp. Appends/replaces an
"## As-of join" section in BENCH/SKEW.md.

Usage: python tools/bench_skew_asof.py [--giant-turns 2000000]
"""

from __future__ import annotations

import argparse
import re
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SECTION = "## As-of join (union+window vs two-pass chunked)"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--giant-turns", type=int, default=2_000_000)
    ap.add_argument("--n-conv", type=int, default=2000)
    ap.add_argument("--n-chunks", type=int, default=64)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from feagen_spark.datagen.transcripts import transcripts
    from feagen_spark.operators.asof import asof_join, asof_join_chunked
    from feagen_spark.session import get_spark

    spark = get_spark(
        app_name="bench_skew_asof",
        extra_conf={"spark.driver.memory": "48g"},
    )
    # cache key must carry EVERY generation parameter: keying on
    # giant_turns alone silently reuses data built under an old --n-conv
    path = f"/tmp/feagen_skew_{args.giant_turns}_{args.n_conv}"
    if not Path(path, "_SUCCESS").exists():
        transcripts(
            spark, n_conv=args.n_conv, giant_convs=1,
            giant_turns=args.giant_turns, partitions=64,
        ).repartition(64, "conv_id").write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path)

    right = df.select(
        "conv_id", "ts", "turn_idx", F.length("text").alias("v")
    )
    left = df.where(F.col("turn_idx") % 20 == 7).select("conv_id", "ts")
    n_right, n_left = right.count(), left.count()

    # size chunks to split the giant key into ~n_chunks buckets
    span = df.agg(
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("us")
    ).first()["us"]
    chunk_span_s = max(1, int(span / 1_000_000 / args.n_chunks))

    kw = dict(on=["conv_id"], values=["v"], strict=True, right_order=("turn_idx",))

    def timed(fn):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn().write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        return best

    t_plain = timed(lambda: asof_join(left, right, **kw))
    t_chunk = timed(
        lambda: asof_join_chunked(left, right, chunk_span_s=chunk_span_s, **kw)
    )

    section = f"""{SECTION}

Same 98%-skewed input: right = {n_right:,} snapshots, left =
{n_left:,} label points, one conversation holding 98% of both sides.
chunk_span_s={chunk_span_s:,} (~{args.n_chunks} buckets over the giant
key's time range), local[32], best of 2, noop sink.

| strategy | sec | speedup |
|---|---|---|
| plain asof_join (hot key pinned to ONE window task) | {t_plain:.2f} | 1.0x |
| asof_join_chunked (two-pass, per-(key,chunk) windows) | {t_chunk:.2f} | {t_plain / t_chunk:.2f}x |

Values identical (tests/test_asof.py::test_chunked_asof_value_identical,
equal-ts ties + right-free-gap carries). The chunked path pays a second
pass (per-chunk finals) + a broadcast fixup join; it wins whenever the
hot key's single-task sort dominates, and is the ONLY option when one
key's rows exceed a single task's memory.

Regenerate: `python tools/bench_skew_asof.py`.
"""
    md_path = REPO / "BENCH/SKEW.md"
    text = md_path.read_text()
    if SECTION in text:
        text = re.sub(
            re.escape(SECTION) + r".*?(?=\n## |\Z)",
            lambda _m: section,  # raw-template backslash hazard
            text,
            flags=re.S,
        )
    else:
        text = text.rstrip() + "\n\n" + section
    md_path.write_text(text)
    print(section)


if __name__ == "__main__":
    main()
