"""Benchmark harness.

Default mode (driver contract): run the headline queries from
__spark_entry__ at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], plus the transcript feature-DAG throughput
(the north-rule metric, turns/sec), and print ONE JSON line:
    {"metric": ..., "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "turns_per_sec": ...}

Scaling mode (north-rule two-cluster-size evidence, run by
tools/bench_scaling.py): `--feature-dag-only --master local[N]` times
just the transcript feature DAG on a pre-materialized parquet input so
two parallelism levels see identical bytes.

Timing uses a noop-format write: full evaluation of every output column
with zero sink cost (a count() would let Catalyst skip the projections).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

# r5 names: several legs were merged into single queries() entries (the
# driver's CORRECTNESS artifact caps at 50 entries) — each merged leg
# still runs every underlying operator, so leg totals stay comparable
# to r4 modulo the merge arithmetic (see SURVEY.md §8).
HEADLINE = [
    "ev_lag_lead",            # + r4 ev_cumulative
    "ev_rolling",             # + r4 ev_rolling_600s
    "ev_sessionize",          # + r4 ev_sessionize_capped
    "ev_session_attribution",
    "ev_session_aggs",
    "ev_asof_purchase_click",
    "ev_backfill_state",
    "ev_topk_per_user",
    "ev_user_profile",        # r4 ev_type_counts + ev_pivot_counts
    "ev_asof_inclusive",
    "ev_type_stats",          # r5 ev_value_median + ev_json_props
    "ev_value_scaling",       # r4 zscore + zscore_trailing + decile
    "ev_asof_ttl_nearest",    # r4 ev_asof_tolerance + ev_asof_nearest
    "ev_stratified_sample",
    "doc_mixture_report",
    "emb_label_centroids",
    "li_rollup",              # r6: + grouping-sets leg (merged entry)
    "li_pricing_summary",
    "join_revenue_by_priority",
    "doc_profile",            # r6: + r5 doc_keep_split (dedup keep + hash split)
    "doc_negatives",          # r6: deterministic negative sampling
    "doc_minhash_pairs",
    "doc_simhash",
    "doc_sparse_features",
    "doc_tfidf",
    "doc_scrub_chunks",       # r6: + para_dedup leg (20-group fixture)
    "emb_topk",               # r6: + ivf_exhaustive method (was emb_ivf_topk)
    "emb_semantic_dedup",     # r6: SemDeDup over seed-centroid clusters
    "emb_bundle",
    "ev_feature_dag",
    "ev_asof_chunked",
    "ev_incremental_refresh",
    "emb_lsh_recall",
    "emb_near_dups",
    "doc_dup_clusters",
    "doc_quality_signals",    # r4 doc_dup_ngrams + doc_unigram_logprob
    "doc_contamination",
    "doc_quality_quota",
    "doc_dsir_sample",        # r6: DSIR importance resampling + Gumbel top-k
]

# Best-of-2 is the DEFAULT for every leg since r5 (VERDICT r4 #9): r2-r4
# showed the shingle/regex/pandas_udf legs swing 1.3-4x with box
# weather, and per-round curation of a "swingy set" kept missing
# newcomers. Two runs per leg keep round-over-round comparisons
# tracking code, not cache state, at the cost of ~2x bench wall time
# (reported per-leg numbers are minima, so totals stay comparable).
BENCH_RUNS = 2

GOLDEN_FEATURES = [
    "text_len", "is_tool_turn", "prev_role", "ts_delta_prev",
    "turns_so_far", "cum_tool_calls", "user_turns_last_10",
    "tool_calls_last_10", "tool_calls_last_600s", "session_id",
    "turn_in_session", "session_start_ts",
]


def _noop_write(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def _completed_stages(spark) -> dict | None:
    """Completed-stage metrics from the Spark status REST API, keyed by
    (stageId, attemptId). Returns None when the UI is disabled or the
    call fails — callers degrade to timing-only output. None (not {}):
    a failed 'before' snapshot must not masquerade as 'no prior stages'
    or the diff would attribute every stage since app start to the
    measured run (code-review r4 finding)."""
    import urllib.request

    try:
        ui = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        url = f"{ui}/api/v1/applications/{app}/stages?status=complete"
        with urllib.request.urlopen(url, timeout=10) as r:
            stages = json.loads(r.read().decode())
        return {(s["stageId"], s["attemptId"]): s for s in stages}
    except Exception:
        return None


def _diff_stage_stats(before: dict | None, after: dict | None) -> dict | None:
    """Aggregate shuffle volume + stage count for the stages that
    completed between two snapshots (BASELINE.md's promised plan-level
    evidence: shuffle bytes must be CONSTANT across parallelism levels —
    eff(8→32) loss is DRAM, not shuffle growth)."""
    if before is None or after is None:
        return None
    new = [s for k, s in after.items() if k not in before]
    return {
        "stages": len(new),
        "shuffle_read_bytes": sum(s.get("shuffleReadBytes", 0) for s in new),
        "shuffle_write_bytes": sum(s.get("shuffleWriteBytes", 0) for s in new),
        "input_bytes": sum(s.get("inputBytes", 0) for s in new),
    }


def materialize_transcripts(spark, path: str, n_conv: int, giant_turns: int) -> int:
    from feagen_spark.datagen.transcripts import transcripts

    # fixed 64-way layout regardless of the generating level: both
    # parallelism levels must see identical bytes AND enough input splits
    # that the scan stage is never the parallelism ceiling
    df = transcripts(
        spark, n_conv=n_conv, giant_convs=3, giant_turns=giant_turns,
        partitions=64,
    )
    df.repartition(64, "conv_id").write.mode("overwrite").parquet(path)
    return spark.read.parquet(path).count()


def run_feature_dag(
    spark, input_path: str, repeats: int = 2
) -> tuple[float, dict | None]:
    """Time the full golden feature DAG over a parquet transcript table;
    returns best of `repeats` runs (first run pays JVM/JIT warmup —
    identical treatment at every parallelism level keeps scaling
    comparisons fair)."""
    from feagen_spark.core.dag import FeatureDAG
    from feagen_spark.core.engine import Engine
    from feagen_spark.features.turns import transcript_nodes, transcript_templates

    df = spark.read.parquet(input_path)
    dag = FeatureDAG(
        nodes=transcript_nodes(),
        templates=transcript_templates(),
        input_columns=tuple(df.columns),
    )
    eng = Engine(dag, store=None)
    best, best_stats = float("inf"), None
    for _ in range(max(1, repeats)):
        before = _completed_stages(spark)
        t0 = time.perf_counter()
        out = eng.generate(df, GOLDEN_FEATURES)
        # feature-snapshot output = keys + features (a snapshot table
        # does not re-store the raw text payload)
        out = out.select("conv_id", "turn_idx", "ts", *GOLDEN_FEATURES)
        _noop_write(out)
        el = time.perf_counter() - t0
        if el < best:
            best = el
            best_stats = _diff_stage_stats(before, _completed_stages(spark))
    return best, best_stats


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", default=None)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--feature-dag-only", action="store_true")
    ap.add_argument("--transcripts-path", default="/tmp/feagen_bench_transcripts")
    ap.add_argument("--n-conv", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "120000")))
    ap.add_argument("--giant-turns", type=int, default=30000)
    ap.add_argument("--json-out", default=None)
    # best-of-3: the first run pays JVM warmup AND a cold page-cache
    # read of the transcript parquet (measured 10.9s cold vs 2.2s warm
    # for identical code); two warm runs make the north-rule headline
    # track code, not whether a prior job evicted the cache
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    from feagen_spark.session import get_spark

    spark = get_spark(
        app_name="feagen_bench",
        master=args.master,
        # big heap: 32 sort-heavy threads on an 8g heap spend their time
        # in GC, which shows up as fake scaling loss. UI on (off in the
        # library default): the status REST API is where the per-stage
        # shuffle-volume evidence comes from.
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEM", "48g"),
            "spark.ui.enabled": "true",
        },
    )
    sf = args.sf_dir.rstrip("/").split("sf")[-1]

    def _loadavg() -> list[float] | None:
        try:
            with open("/proc/loadavg") as f:
                return [float(x) for x in f.read().split()[:3]]
        except Exception:
            return None

    load_before = _loadavg()

    # transcript feature-DAG throughput (north-rule metric)
    tp = args.transcripts_path
    # the marker pins WHICH input the cached table is — a changed
    # --n-conv/--giant-turns must regenerate, not silently bench stale
    # data under a stale row count (code-review r6)
    marker = Path(tp) / "_ROWS"
    want_cfg = f"n_conv={args.n_conv} giant_turns={args.giant_turns}"
    cached = marker.read_text().split("\n") if marker.exists() else []
    if len(cached) < 2 or cached[1] != want_cfg:
        rows = materialize_transcripts(spark, tp, args.n_conv, args.giant_turns)
        marker.write_text(f"{rows}\n{want_cfg}")
    rows = int(marker.read_text().split("\n")[0])
    dag_sec, dag_stats = run_feature_dag(spark, tp, repeats=args.repeats)
    turns_per_sec = rows / dag_sec

    result = {
        "metric": "headline query wall time + transcript feature-DAG throughput",
        "unit": "sec",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "transcript_rows": rows,
        "feature_dag_sec": round(dag_sec, 3),
        "turns_per_sec": round(turns_per_sec, 1),
        "parallelism": spark.sparkContext.defaultParallelism,
        "queries": {},
    }
    if dag_stats:
        result["feature_dag_stages"] = dag_stats["stages"]
        result["feature_dag_shuffle_read_bytes"] = dag_stats["shuffle_read_bytes"]
        result["feature_dag_shuffle_write_bytes"] = dag_stats["shuffle_write_bytes"]
        result["feature_dag_input_bytes"] = dag_stats["input_bytes"]

    if not args.feature_dag_only:
        import __spark_entry__ as E

        # JVM warmup for machinery the feature-DAG leg doesn't touch:
        # the first higher-order-function evaluation in a process pays
        # ~3s of classload/JIT (measured on a 1-ROW query) — that's JVM
        # tax, not query cost, and would otherwise be attributed to
        # whichever query hits a zip_with/aggregate first.
        from pyspark.sql import functions as F

        spark.range(1).select(
            F.aggregate(
                F.zip_with(
                    F.array(F.lit(1.0)), F.array(F.lit(2.0)), lambda a, b: a * b
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        ).collect()

        # Python-worker fleet warmup, same reasoning: the FIRST pandas_udf
        # query in a session pays ~8s of worker spawn + numpy/pandas import
        # across 32 executors threads (measured: doc_simhash 9.3s cold vs
        # 1.5s warm, identical plan) — startup tax, not query cost. Workers
        # are reused afterwards (spark.python.worker.reuse default).
        from pyspark.sql.functions import pandas_udf

        # functional form: PEP-563 stringified annotations (future import
        # above) break the decorator's signature inference
        _wu = pandas_udf(lambda s: s, "long")

        spark.range(64, numPartitions=32).select(_wu("id")).collect()

        # canary: one fixed JVM-only job timed at start / middle / end
        # of the loop. Host contention on this box arrives in BURSTS —
        # legs inside a burst inflate 4-10x while legs in gaps match a
        # quiet box exactly, which the per-leg best-of-2 spread CANNOT
        # see (both runs of a leg usually share the burst). Canary
        # divergence (max/min > 1.5) catches exactly that pattern.
        def _canary() -> float:
            t0 = time.perf_counter()
            spark.range(30_000_000, numPartitions=32).groupBy(
                (F.col("id") % 997).alias("k")
            ).count().write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0

        _canary()  # warm the canary's own codegen once
        canaries = [_canary()]

        qs = E.queries()
        total = dag_sec
        spreads = {}
        for i, name in enumerate(HEADLINE):
            if i == len(HEADLINE) // 2:
                canaries.append(_canary())
            runs = []
            for _ in range(BENCH_RUNS):
                t0 = time.perf_counter()
                _noop_write(qs[name](spark, args.sf_dir))
                runs.append(time.perf_counter() - t0)
            el = min(runs)
            result["queries"][name] = round(el, 3)
            spreads[name] = round(max(runs) / max(el, 1e-9), 2)
            total += el
        canaries.append(_canary())
        result["canary_secs"] = [round(c, 3) for c in canaries]
        result["canary_ratio"] = round(max(canaries) / min(canaries), 2)
        # weather guard (VERDICT r5 #4): a contended box inflates legs
        # 1.5-2x uniformly with identical plans/shuffle bytes — record
        # the per-leg best-vs-worst spread so a cold reader can tell
        # box weather from a code regression without a re-run.
        # Measured caveat (r6, two back-to-back runs of identical code):
        # spread alone is a WEAK contention signal — on a contended box
        # both runs inflate together (spread_max 3.43 contended vs 3.24
        # quiet), while per-leg first-run JIT keeps some spreads high on
        # a quiet box. Load is the discriminating signal (4.2 vs 0.4
        # before-load on those same runs); spread still localizes WHICH
        # legs swung.
        vals = sorted(spreads.values())
        result["leg_spread_max"] = vals[-1]
        result["leg_spread_median"] = vals[len(vals) // 2]
        result["leg_spread_hot"] = {
            k: v for k, v in sorted(spreads.items(), key=lambda kv: -kv[1])
            if v >= 1.5
        }
        result["queries"]["tr_feature_dag"] = round(dag_sec, 3)
        result["value"] = round(total, 3)
    else:
        result["value"] = round(dag_sec, 3)
        result["queries"]["tr_feature_dag"] = round(dag_sec, 3)

    # weather stamps (VERDICT r5 #4): 1-min loadavg before/after. The
    # bench's own workers drive load to ~7-8 by the end on a quiet box
    # (measured), so the discriminating signals are: load ALREADY
    # elevated at start, load far beyond own-workload at end, or a
    # uniformly inflated spread median.
    load_after = _loadavg()
    result["loadavg_before"] = load_before
    result["loadavg_after"] = load_after
    busy_before = bool(load_before) and load_before[0] > 2.0
    busy_after = bool(load_after) and load_after[0] > 12.0
    med = result.get("leg_spread_median", 1.0)
    bursty = result.get("canary_ratio", 1.0) >= 1.5
    result["weather_suspect"] = bool(
        busy_before or busy_after or med >= 1.5 or bursty
    )

    line = json.dumps(result)
    print(line)
    if args.json_out:
        Path(args.json_out).write_text(line + "\n")


if __name__ == "__main__":
    main()
