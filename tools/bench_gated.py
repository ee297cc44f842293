"""Canary-gated per-query timing for weather-hostile boxes (r7).

Runs each named query up to ``--attempts`` times; a fixed JVM-only
canary job runs immediately before and after every attempt, and the
attempt is ACCEPTED only when both canaries are under ``--canary-max``
seconds (host steal bursts inflate the canary 2-10x, so this rejects
samples taken inside a burst instead of averaging them in). Reports the
min over accepted samples (falls back to min over all, flagged).

Usage:
    python tools/bench_gated.py [--sf-dir DIR] [--attempts N]
                                [--accept K] query [query...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--attempts", type=int, default=6)
    ap.add_argument("--accept", type=int, default=2,
                    help="stop once this many accepted samples exist")
    ap.add_argument("--canary-max", type=float, default=1.35)
    ap.add_argument("--json-out", default=None)
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from feagen_spark.session import get_spark

    spark = get_spark(app_name="bench_gated", extra_conf={
        "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEM", "48g")})

    spark.range(1).select(
        F.aggregate(
            F.zip_with(F.array(F.lit(1.0)), F.array(F.lit(2.0)),
                       lambda a, b: a * b),
            F.lit(0.0), lambda acc, v: acc + v,
        )
    ).collect()
    from pyspark.sql.functions import pandas_udf
    _wu = pandas_udf(lambda s: s, "long")
    spark.range(64, numPartitions=32).select(_wu("id")).collect()

    def canary() -> float:
        t0 = time.perf_counter()
        spark.range(30_000_000, numPartitions=32).groupBy(
            (F.col("id") % 997).alias("k")
        ).count().write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    canary()  # warm canary codegen
    qs = E.queries()
    out = {}
    for name in args.queries:
        fn = qs[name]
        accepted, rejected = [], []
        for _ in range(args.attempts):
            c0 = canary()
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).write.mode("overwrite").format(
                "noop").save()
            el = time.perf_counter() - t0
            c1 = canary()
            ok = max(c0, c1) <= args.canary_max
            (accepted if ok else rejected).append(round(el, 3))
            print(f"  {name}: {el:.2f}s canaries {c0:.2f}/{c1:.2f} "
                  f"{'OK' if ok else 'REJECT'}", file=sys.stderr, flush=True)
            if len(accepted) >= args.accept:
                break
        out[name] = {
            "sec": min(accepted) if accepted else min(rejected),
            "gated": bool(accepted),
            "accepted": accepted,
            "rejected": rejected,
        }
    line = json.dumps({"sf_dir": args.sf_dir, "queries": out})
    print(line)
    if args.json_out:
        Path(args.json_out).write_text(line + "\n")


if __name__ == "__main__":
    main()
