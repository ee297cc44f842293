"""Driver contract for the spark-graft builder (PySpark target).

Queries map SURVEY.md §2 operators onto the driver's testdata tables:
the windowed/as-of/sessionization suite runs over `events`
(user_id≈conv_id, ts), text analysis + dedup over `documents`,
similarity + bundles over `embeddings`, generic relational ops over
`lineitem`/`orders`. Each query delegates to the feagen_spark library;
oracle_sql() carries the exact ANSI-SQL twin for DuckDB.

Conventions shared by both sides (see tools/crosscheck.py):
- timestamps are emitted as epoch microseconds BIGINT
  (spark unix_micros(cast ts) == duckdb epoch_us(ts), session TZ UTC)
- double aggregates are rounded (4-6 dp) on BOTH sides
- counts → BIGINT, ranks → INT, on both sides
- as-of contract: the ev_asof_* oracles assume (user_id, ts) is UNIQUE
  per event stream (true of the driver's events table). At equal-ts
  collisions Spark asof_join(strict=True) hides ALL right rows at the
  label's ts, while the row-frame oracle would admit same-ts rows with
  a smaller event_id; the library's asof_join itself handles ties by
  the documented side-tag ordering regardless.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

sys.path.insert(0, str(Path(__file__).resolve().parent))

from feagen_spark.functions import windowed as W  # noqa: E402
from feagen_spark.operators import dedup as D  # noqa: E402
from feagen_spark.operators import similarity as S  # noqa: E402
from feagen_spark.operators import textstats as TS  # noqa: E402
from feagen_spark.operators import multimodal as MM  # noqa: E402
from feagen_spark.operators.asof import asof_join  # noqa: E402

SESSION_GAP_S = 1800
EV_ORDER = ("ts", "event_id")  # unique per user → stable total order


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # parquet NTZ → session-TZ(UTC) timestamp so unix_micros == epoch_us
    return _t(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )


def _docs(spark: SparkSession, sf_dir: str, where=None) -> DataFrame:
    """documents with an explicit split: the testdata table is ONE
    parquet row-group, and parquet cannot split inside a row-group, so
    every CPU-heavy map stage (shingling, regex profiling, hashing)
    would otherwise run on a single core. The up-front shuffle is a few
    MB here; a real many-file corpus provides input splits for free and
    wouldn't need this. Measured 2.4x on doc_minhash_pairs at sf0.1.
    ``where`` filters BEFORE the repartition so subset queries never
    shuffle rows they are about to drop."""
    d = _t(spark, sf_dir, "documents")
    if where is not None:
        d = d.where(where)
    return d.repartition(64, "doc_id")


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings with an explicit split (same single-row-group issue as
    _docs): the higher-order-function cosine math runs interpreted, so
    a one-partition scan pins ~15k per-row folds to one core."""
    return _t(spark, sf_dir, "embeddings").repartition(32, "vec_id")


def _us(col) -> F.Column:
    return F.unix_micros(col)


# ---------------------------------------------------------------------------
# events: windowed feature suite (C3-C10, C14)
# ---------------------------------------------------------------------------

def q_ev_lag_lead(spark, sf_dir):
    """Lag/lead (C4) + ts-delta (C3) + leakage-safe cumulative (C6) in
    ONE query: all four operators share the same (user_id → ts,
    event_id) window partitioning, so Catalyst collapses them into one
    Window exec over one exchange. Merged (r5) so every operator keeps a
    driver CORRECTNESS row inside the artifact's 50-entry cap."""
    ev = _events(spark, sf_dir)
    ev = W.add_lag_lead(ev, "user_id", EV_ORDER, "event_type", lags=(1,), leads=(1,))
    ev = W.add_ts_delta(ev, "user_id", EV_ORDER, "ts")
    ev = W.add_cumulative(ev, "user_id", EV_ORDER, F.count(F.lit(1)), "n_so_far")
    ev = W.add_cumulative(ev, "user_id", EV_ORDER, F.sum("value"), "cum_value")
    return ev.select(
        "event_id",
        "user_id",
        F.col("event_type_lag_1").alias("prev_event_type"),
        F.col("event_type_lead_1").alias("next_event_type"),
        F.round("ts_delta_prev_s", 6).alias("ts_delta_prev_s"),
        F.col("n_so_far").cast("long").alias("n_so_far"),
        F.round(F.coalesce("cum_value", F.lit(0.0)), 6).alias("cum_value"),
    )


def q_ev_rolling(spark, sf_dir):
    """The rolling/trailing feature family in one entry: row-frame
    counts (C5, last-10 rows), time-range count (C5, last 600 s),
    trailing DISTINCT count (novelty/diversity signal,
    add_rolling_distinct) and the exponentially time-decayed sum
    (recency-weighted engagement, add_rolling_decayed_sum, half-life
    600 s over the last-10 frame). All four share the user_id
    partitioning — one exchange (the time frame re-sorts within the
    partition)."""
    ev = _events(spark, sf_dir)
    ev = W.add_rolling(
        ev, "user_id", EV_ORDER, F.count(F.lit(1)), "n_last_10", last_n=10
    )
    ev = W.add_rolling(
        ev, "user_id", EV_ORDER, F.sum("value"), "value_sum_last_10", last_n=10
    )
    ev = W.add_rolling_time(
        ev, "user_id", "ts", F.count(F.lit(1)), "n_events_600s", last_seconds=600
    )
    # fused: distinct count + decayed sum share ONE frame list
    # (VERDICT r5 #5 — bit-identical to the standalone operators)
    ev = W.add_rolling_frame_features(
        ev, "user_id", EV_ORDER, "ts", "value",
        distinct_col="event_type", distinct_out="n_types_last_10",
        decay_out="value_decay", half_life_s=600, last_n=10,
    )
    return ev.select(
        "event_id",
        "user_id",
        F.col("n_last_10").cast("long").alias("n_last_10"),
        F.round(F.coalesce("value_sum_last_10", F.lit(0.0)), 6).alias(
            "value_sum_last_10"
        ),
        F.coalesce(F.col("n_events_600s"), F.lit(0)).cast("long").alias(
            "n_events_600s"
        ),
        F.col("n_types_last_10").cast("long").alias("n_types_last_10"),
        (F.round("value_decay", 6) + 0.0).alias("value_decay"),
    )


def q_ev_sessionize(spark, sf_dir):
    """Gap sessionization (C7, add_session_id → session_id_plain) AND
    the capped variant (add_session_id_capped → session_id +
    session_part: gap sessions longer than 15 min split at fixed 15-min
    offsets — the production guard against bot/stuck-client runaway
    sessions). Both operators run; the oracle checks that the capped
    session_id equals the plain one AND the duration slices. The slice
    window refines the key partitioning → still one exchange."""
    ev = _events(spark, sf_dir)
    ev = W.add_session_id(
        ev, "user_id", EV_ORDER, "ts", gap_s=SESSION_GAP_S,
        out="session_id_plain",
    )
    ev = W.add_session_id_capped(
        ev, "user_id", EV_ORDER, "ts",
        gap_s=SESSION_GAP_S, max_duration_s=900,
    )
    return ev.select(
        "event_id", "user_id",
        F.col("session_id").cast("int"),
        F.col("session_part").cast("int"),
        F.col("session_id_plain").cast("int"),
    )


def q_ev_session_attribution(spark, sf_dir):
    """Interval CONTAINMENT join (operators/intervals.interval_join):
    attribute each purchase to the session interval [start, end] that
    contains it — the attribution workload Spark's planner would turn
    into a nested-loop theta join if written naively. Here: intervals
    explode to fixed time chunks, events equi-join on (key, chunk),
    exact containment filters — linear, never quadratic (plan test
    pins no BNLJ/cartesian)."""
    from feagen_spark.operators.intervals import interval_join

    ev = _events(spark, sf_dir)
    sess = W.add_session_id(ev, "user_id", EV_ORDER, "ts", gap_s=SESSION_GAP_S)
    bounds = W.session_aggregates(sess, "user_id", "ts")
    intervals = bounds.select(
        "user_id",
        "session_id",
        F.col("session_start").alias("start"),
        F.col("session_end").alias("end"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    out = interval_join(
        purchases, intervals, on=["user_id"], chunk_span_s=1800
    )
    return out.select(
        "event_id", "user_id", F.col("session_id").cast("int").alias("session_id")
    )


def q_ev_session_aggs(spark, sf_dir):
    ev = _events(spark, sf_dir)
    ev = W.add_session_id(ev, "user_id", EV_ORDER, "ts", gap_s=SESSION_GAP_S)
    aggs = W.session_aggregates(
        ev,
        "user_id",
        "ts",
        extra_aggs=(F.round(F.sum("value"), 6).alias("session_value"),),
    )
    return aggs.select(
        "user_id",
        F.col("session_id").cast("int"),
        F.col("n_rows").cast("long").alias("n_rows"),
        _us(F.col("session_start")).alias("session_start_us"),
        _us(F.col("session_end")).alias("session_end_us"),
        F.round("duration_s", 6).alias("duration_s"),
        "session_value",
    )


def q_ev_asof_purchase_click(spark, sf_dir):
    """For each purchase, the value of the user's latest strictly-prior
    click — the C9 as-of join via the union+window operator."""
    ev = _events(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id"), F.col("value").alias("purchase_value")
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("click_value"), "event_id"
    )
    out = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        values=["click_value"],
        strict=True,
        right_order=("event_id",),
    )
    return out.select(
        "user_id",
        "event_id",
        F.round("purchase_value", 6).alias("purchase_value"),
        F.round("click_value", 6).alias("last_click_value"),
    )


def q_ev_asof_chunked(spark, sf_dir):
    """The skew-safe two-pass as-of join (asof_join_chunked) on the same
    purchase←click workload — value-identical to q_ev_asof_purchase_click
    by construction, so it shares that oracle and gives the chunked
    operator its own driver-level hash check."""
    from feagen_spark.operators.asof import asof_join_chunked

    ev = _events(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id"), F.col("value").alias("purchase_value")
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("click_value"), "event_id"
    )
    out = asof_join_chunked(
        purchases,
        clicks,
        on=["user_id"],
        values=["click_value"],
        strict=True,
        right_order=("event_id",),
        chunk_span_s=6 * 3600,
    )
    return out.select(
        "user_id",
        "event_id",
        F.round("purchase_value", 6).alias("purchase_value"),
        F.round("click_value", 6).alias("last_click_value"),
    )


def q_ev_asof_ttl_nearest(spark, sf_dir):
    """Two as-of variants over the SAME purchase←click workload, merged
    into one driver entry (r5, 50-entry artifact cap):

    1. Staleness-TTL as-of (feature-store semantics, e.g. Feast's ttl):
       the latest strictly-prior click is attached only if it is at most
       600 s older than the purchase — older state is expired (NULL).
       `include_right_ts` emits the matched click's ts (the "feature
       as-of WHEN?" audit column).
    2. Nearest-in-time join (asof_join_nearest — merge_asof
       direction='nearest' analogue): the click with the smallest
       |ts distance| in EITHER direction, bounded to 1200 s; distance
       ties prefer the earlier (backward) click. Two union+window
       passes, no range join.

    The two results are equi-joined on the purchase identity — purely a
    correctness harness step; each operator stays one/two exchanges."""
    from feagen_spark.operators.asof import asof_join_nearest

    ev = _events(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id"), F.col("value").alias("purchase_value")
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("click_value"), "event_id"
    )
    tol = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        values=["click_value"],
        strict=True,
        right_order=("event_id",),
        tolerance_s=600,
        include_right_ts="click_ts",
    ).select(
        "user_id",
        "event_id",
        F.round("purchase_value", 6).alias("purchase_value"),
        F.round("click_value", 6).alias("last_click_value"),
        F.unix_micros(F.col("click_ts").cast("timestamp")).alias(
            "last_click_us"
        ),
    )
    near = asof_join_nearest(
        purchases,
        clicks,
        on=["user_id"],
        values=["click_value"],
        right_order=("event_id",),
        tolerance_s=1200,
        include_right_ts="click_ts",
    ).select(
        "user_id",
        "event_id",
        F.round("click_value", 6).alias("nearest_click_value"),
        F.unix_micros(F.col("click_ts").cast("timestamp")).alias(
            "nearest_click_us"
        ),
    )
    return tol.join(near, on=["user_id", "event_id"])


def q_ev_backfill_state(spark, sf_dir):
    """As-of state snapshot at EVERY event (C10): latest strictly-prior
    click/view values carried forward per user."""
    ev = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(*EV_ORDER)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    click = F.last(
        F.when(F.col("event_type") == "click", F.col("value")), ignorenulls=True
    ).over(w)
    view = F.last(
        F.when(F.col("event_type") == "view", F.col("value")), ignorenulls=True
    ).over(w)
    return ev.select(
        "event_id",
        "user_id",
        F.round(click, 6).alias("last_click_value"),
        F.round(view, 6).alias("last_view_value"),
    )


def q_ev_topk_per_user(spark, sf_dir):
    ev = _events(spark, sf_dir)
    out = W.top_k_per_key(
        ev, "user_id", (F.col("value").desc(), F.col("event_id").asc()), k=3
    )
    return out.select(
        "user_id", "event_id", F.round("value", 6).alias("value"),
        F.col("rank").cast("int").alias("rank"),
    )


def q_ev_user_profile(spark, sf_dir):
    """Per-user profile: generic groupBy aggregates (count/avg) AND the
    pivot operator (fixed-vocabulary event_type count matrix) — merged
    into one entry (r5, 50-entry artifact cap). The two aggregates
    share the user_id grouping; the join is the harness stitch."""
    ev = _events(spark, sf_dir)
    aggs = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.avg("value"), 6).alias("avg_value"),
    )
    pivoted = (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .count()
        .select(
            "user_id",
            *[
                F.coalesce(F.col(c), F.lit(0)).cast("long").alias(f"n_{c}")
                for c in ["click", "view", "purchase", "signup", "error"]
            ],
        )
    )
    return aggs.join(pivoted, on="user_id")


def q_ev_asof_inclusive(spark, sf_dir):
    """Inclusive (<=) as-of variant: snapshot AT the label instant is
    admissible — the opt-in semantics of asof_join(strict=False)."""
    ev = _events(spark, sf_dir)
    labels = ev.where(F.col("event_type") == "signup").select(
        "user_id", "ts", "event_id"
    )
    snaps = ev.where(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("value").alias("view_value"), "event_id"
    )
    out = asof_join(
        labels, snaps, on=["user_id"], values=["view_value"],
        strict=False, right_order=("event_id",),
    )
    return out.select(
        "user_id", "event_id",
        F.round("view_value", 6).alias("last_view_value"),
    )


def q_ev_type_stats(spark, sf_dir):
    """Per-event-type stats in one entry (r6, 50-entry artifact cap —
    merged ev_value_median + ev_json_props, same 5-row event_type row
    set; the freed slot carries ev_stream_decay): exact interpolated
    median + p90 (percentile == DuckDB quantile_cont) AND the
    semi-structured JSON extraction aggregate (events.props is a JSON
    string; get_json_object — JVM-side, no Python — feeds a relational
    aggregate, the standard log-analytics schema-on-read shape). ONE
    groupBy for all six aggregates (code-review r6: the previous
    two-groupBy + inner-join stitch scanned events twice, added a join
    exchange, and would null-reject an event_type=NULL group that the
    single-GROUP-BY oracle keeps)."""
    # repartition (r7): events.parquet is ONE row-group, and this
    # query's map side (JSON extraction + exact-percentile partials)
    # otherwise runs inside the single scan task — the same _docs()
    # rationale. The window queries don't need it (their first exchange
    # is the user_id partitioning; the scan task only decodes), but
    # here the partial aggregation IS the CPU. Measured 3.9 → ~1.3 s at
    # sf1.0.
    ev = _events(spark, sf_dir).repartition(64, "event_id")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("median_value"),
            F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90_value"),
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("k_sum"),
            F.round(F.avg("k"), 6).alias("k_avg"),
            F.sum((F.col("k") > 50).cast("long")).alias("n_k_gt_50"),
        )
    )


# ---------------------------------------------------------------------------
# generic relational ops (Catalyst-native: pushdown, join, agg)
# ---------------------------------------------------------------------------


def q_ev_value_scaling(spark, sf_dir):
    """The feature-scaling trio in one entry (r5, 50-entry artifact
    cap) — three distinct operators over the same event rows:

    1. add_group_zscore (full-group statistic per event_type —
       label-free preprocessing only, see the operator's leakage note);
    2. add_rolling_zscore (LEAKAGE-SAFE: each event normalized against
       its user's previous 10 events only — the trailing frame ends at
       -1; prefix-invariance is property-tested in
       test_leakage_property);
    3. rank normalization: ntile decile + percent_rank within the
       user's history (robust to outliers where z-score is not).

    Windows 2 and 3 share the user_id partitioning (one exchange);
    window 1 adds the event_type exchange."""
    ev = _events(spark, sf_dir)
    ev = W.add_group_zscore(ev, "event_type", "value")
    ev = W.add_rolling_zscore(
        ev, "user_id", "value", order=("ts", "event_id"), n=10
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").asc(), F.col("event_id").asc()
    )
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        (F.round("value_zscore", 6) + 0.0).alias("value_zscore"),
        (F.round("value_zscore_trailing", 6) + 0.0).alias(
            "value_zscore_trailing"
        ),
        F.ntile(10).over(w).cast("int").alias("decile"),
        (F.round(F.percent_rank().over(w), 6) + 0.0).alias("pct_rank"),
    )


def q_ev_stratified_sample(spark, sf_dir):
    """Deterministic stratified downsampling (cleaning.stratified_sample):
    keep 50% of clicks, 20% of views, all purchases, drop everything
    else — the target-mixture curation step. Hash-of-id decisions, so
    the sample is identical across runs/layouts/cluster sizes (never
    sampleBy/rand) and the md5 bridge makes it oracle-exact."""
    from feagen_spark.operators.cleaning import stratified_sample

    ev = _events(spark, sf_dir)
    out = stratified_sample(
        ev,
        "event_type",
        {"click": 0.5, "view": 0.2, "purchase": 1.0},
        id_col="event_id",
    )
    return out.select("event_id", "user_id", "event_type")


def q_li_rollup(spark, sf_dir):
    """Both multi-level aggregate operators in one entry under a
    ``leg`` column (r6, 50-entry artifact cap — the same-shape merge
    pattern r5 used): ROLLUP over (returnflag, linestatus), and
    GROUPING SETS ((returnflag), (linestatus), ()) — the
    generalization rollup/cube are sugar for. Each leg is ONE Expand +
    hash aggregate in Catalyst, not multiple scans; the union is of
    two already-aggregated sketch-sized frames."""
    li = _t(spark, sf_dir, "lineitem")

    def agg_of(grouped):
        return grouped.agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )

    def shaped(df, leg):
        return df.select(
            F.lit(leg).alias("leg"),
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n",
        )

    rollup = agg_of(li.rollup("l_returnflag", "l_linestatus"))
    gsets = agg_of(
        li.groupingSets(
            [["l_returnflag"], ["l_linestatus"], []],
            "l_returnflag",
            "l_linestatus",
        )
    )
    return shaped(rollup, "rollup").unionByName(shaped(gsets, "gsets"))


def q_li_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_join_revenue_by_priority(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# documents: text analysis + dedup
# ---------------------------------------------------------------------------

def q_doc_profile(spark, sf_dir):
    """Per-doc corpus prep in one entry (r6, 50-entry artifact cap —
    VERDICT r5 #1 freed this slot for doc_negatives): the C13 text
    scalars (lengths, ratios, quality, lang id, fingerprint) PLUS the
    exact-dedup keep flag, the deterministic train/val/test hash split
    and (r6) the reproducible global training-order rank
    (cleaning.deterministic_shuffle, md5 mode — the DataFrame
    zipWithIndex pattern: ONE pinned range exchange, pure-JVM mono-id
    local ranks, broadcast offsets) and the EXACT proportional
    stratified-interleave order (cleaning.interleave_strata over lang:
    within-stratum rank r → pos r/(n+1) → global rank, no per-stratum
    window over the corpus) — all one row
    per document, joined on doc_id. The shuffle and interleave run on
    id projections only: both orders are functions of (id, stratum),
    so the corpus text never rides their range exchanges.

    The profile side keeps the ``_docs()`` repartition (regex token
    scan is CPU-heavy over a single-row-group parquet); the dedup/split
    side deliberately does NOT (VERDICT r2 #2: exact_dedup shuffles
    32-char digests, not text — an up-front full-text repartition costs
    more than it buys, measured 2.9× at sf0.1; at 100 TB it's a
    needless full-corpus shuffle). The stitch join exchanges scalars
    only."""
    from feagen_spark.operators.cleaning import (
        deterministic_shuffle,
        hash_split,
        interleave_strata,
    )

    d = TS.text_profile(_docs(spark, sf_dir))
    prof = d.select(
        "doc_id",
        F.col("char_len").cast("long").alias("char_len"),
        F.col("token_count").cast("long").alias("token_count"),
        F.col("bpe_token_count").cast("long").alias("bpe_token_count"),
        F.round("punct_ratio", 6).alias("punct_ratio"),
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        "quality_score",
        "lang_id",
        "fingerprint",
    )
    docs = _t(spark, sf_dir, "documents")
    split = hash_split(
        docs, method="md5", weights={"train": 80, "val": 10, "test": 10}
    ).select("doc_id", "split")
    kept = D.exact_dedup(docs).select("doc_id", F.lit(1).alias("is_kept"))
    keep_split = split.join(kept, on="doc_id", how="left").select(
        "doc_id",
        "split",
        F.coalesce("is_kept", F.lit(0)).cast("int").alias("is_kept"),
    )
    shuf = deterministic_shuffle(
        docs.select("doc_id"), "doc_id", seed=42, method="md5"
    ).select("doc_id", "shuffle_rank")
    il = interleave_strata(
        docs.select("doc_id", "lang"), "lang", seed=42, method="md5"
    ).select(
        "doc_id",
        (F.round("interleave_pos", 6) + 0.0).alias("interleave_pos"),
        "interleave_rank",
    )
    return (
        prof.join(keep_split, on="doc_id")
        .join(shuf, on="doc_id")
        .join(il, on="doc_id")
    )


def q_doc_dup_audit(spark, sf_dir):
    """Dedup audit: per lang, docs vs distinct normalized fingerprints."""
    d = TS.add_fingerprint(_docs(spark, sf_dir))
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("fingerprint").alias("n_unique"),
    )


def q_doc_scrub_chunks(spark, sf_dir):
    """Two legs over the doc_id % 5 == 0 subset (merged r6):

    - ``chunks``: PII scrub → fixed-size overlapped chunking
      (context-window prep), 1→N JVM explode — unchanged.
    - ``para_dedup``: cross-document PARAGRAPH dedup (C4/CCNet): the
      subset is concatenated into 20 multi-paragraph fixture docs
      (group (doc_id//5) % 20, members '\\n'-joined in doc_id order —
      DuckDB rebuilds the identical fixture with string_agg), then
      ``paragraph_dedup`` keeps only each normalized paragraph's FIRST
      (group, position) occurrence corpus-wide. In this leg chunk_idx
      carries n_paras_dropped, and chunk_len/chunk_md5 hash the full
      reassembled text — drops + content both value-checked.
    - ``boilerplate`` (r6): ``boilerplate_scrub`` over the same
      fixture at min_count=2 — the C4 complement that drops EVERY
      occurrence of a repeated line (para_dedup keeps the first);
      chunk_idx carries n_lines_dropped, md5/len hash the scrubbed
      reassembly."""
    from feagen_spark.operators.cleaning import chunk_text, scrub_pii

    docs = _docs(spark, sf_dir, where=F.col("doc_id") % 5 == 0)
    scrubbed = scrub_pii(docs)
    chunks = chunk_text(scrubbed, chunk_chars=512, overlap=64).select(
        "doc_id",
        "chunk_idx",
        F.length("chunk").cast("long").alias("chunk_len"),
        F.md5("chunk").alias("chunk_md5"),
        F.lit("chunks").alias("leg"),
    )
    grouped = docs.groupBy(
        (F.floor(F.col("doc_id") / 5) % 20).cast("long").alias("g")
    ).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("doc_id", "text"))),
                lambda s: s["text"],
            ),
            "\n",
        ).alias("text")
    )
    cleaned = D.paragraph_dedup(
        grouped, id_col="g", text_col="text", min_chars=1
    ).select(
        F.col("g").alias("doc_id"),
        F.col("n_paras_dropped").alias("chunk_idx"),
        F.length("text").cast("long").alias("chunk_len"),
        F.md5("text").alias("chunk_md5"),
        F.lit("para_dedup").alias("leg"),
    )
    scrub_bp = D.boilerplate_scrub(
        grouped, min_count=2, id_col="g", text_col="text", min_chars=1
    ).select(
        F.col("g").alias("doc_id"),
        F.col("n_lines_dropped").alias("chunk_idx"),
        F.length("text").cast("long").alias("chunk_len"),
        F.md5("text").alias("chunk_md5"),
        F.lit("boilerplate").alias("leg"),
    )
    return chunks.unionByName(cleaned).unionByName(scrub_bp)


def q_doc_quality_signals(spark, sf_dir):
    """Three per-doc quality-signal families in one entry (r5/r6,
    50-entry artifact cap):

    1. Repetitiousness: duplicated word-n-gram ratio (Gopher-style
       repetition filter), JVM map-only. n=2: the synthetic corpus
       draws from a ~50-word vocabulary, so bigrams carry real
       duplicate mass (5-grams are all-distinct → zero signal).
    2. CCNet-style mean unigram negative log-probability under the
       corpus's own unigram distribution (textstats.unigram_logprob —
       tf groupBy + term-total window + broadcast corpus total).
    3. The Gopher rule set (r6, textstats.add_gopher_flags): every
       rule input (word count, mean word length, symbol/bullet/
       ellipsis-line/alpha-word ratios, required-stopword hits) plus
       the 0/1 keep verdict at the published default thresholds — all
       JVM map-only, DuckDB recomputes each signal AND the verdict.

    Joined on doc_id for the harness; each operator keeps its own plan
    shape. The pin (r7) stops the three branches from each re-running
    the scan + repartition of the single-row-group testdata."""
    docs = _docs(spark, sf_dir).localCheckpoint()
    rep = TS.add_dup_ngram_ratio(docs, n=2).select(
        "doc_id",
        F.col("dup_ngram_ratio_n").alias("n_grams"),
        F.round("dup_ngram_ratio", 6).alias("dup_ratio"),
    )
    lp = TS.unigram_logprob(docs).select(
        "doc_id",
        "n_tokens",
        (F.round("neg_logprob", 6) + 0.0).alias("neg_logprob"),
    )
    gop = TS.add_gopher_flags(docs).select(
        "doc_id",
        F.col("gq_n_words").alias("g_words"),
        (F.round("gq_mean_word_len", 6) + 0.0).alias("g_mwl"),
        (F.round("gq_symbol_ratio", 6) + 0.0).alias("g_sym"),
        (F.round("gq_bullet_ratio", 6) + 0.0).alias("g_bullet"),
        (F.round("gq_ellipsis_line_ratio", 6) + 0.0).alias("g_ell"),
        (F.round("gq_alpha_word_ratio", 6) + 0.0).alias("g_alpha"),
        F.col("gq_stop_hits").cast("int").alias("g_stop"),
        F.col("gopher_keep").alias("g_keep"),
    )
    return rep.join(lp, on="doc_id").join(gop, on="doc_id")


def q_doc_tfidf(spark, sf_dir):
    """Per-(doc, term) TF-IDF (smooth idf) over a doc subset — emitted
    as the full pair set (not top-k) so the oracle compare has no
    dependence on float ordering across ln implementations."""
    docs = _docs(spark, sf_dir, where=F.col("doc_id") % 3 == 0)
    out = TS.tfidf_terms(docs)
    return out.select(
        "doc_id", "term", "tf", F.round("tfidf", 6).alias("tfidf")
    )


_MH_INDEX_DIRS: dict = {}


def q_doc_ngram_pairs(spark, sf_dir):
    """Two legs over the doc_id % 5 == 0 subset (merged r6 so the
    incremental-dedup path gets driver-artifact evidence inside the
    50-entry cap):

    - ``ngram``: exact n-gram Jaccard pairs (τ=0.5), unchanged.
    - ``minhash_incr``: the PERSISTED-INDEX path — the subset splits
      into corpus (odd multiples of 5) and increment (multiples of 10);
      ``write_minhash_index`` banding the corpus once, then
      ``minhash_probe_increment`` probing only the increment against it
      (md5 mode, same τ=0.8 / max_bucket=200 operating point as
      doc_minhash_pairs). By the tested restriction property, the probe
      result EQUALS the one-shot operator over the union restricted to
      increment-touching pairs — which is exactly what the DuckDB
      oracle recomputes end-to-end (signatures, bands, cap, est)."""
    import os
    import tempfile

    docs = _docs(spark, sf_dir, where=F.col("doc_id") % 5 == 0)
    ngram = D.ngram_jaccard_pairs(docs, n=3, threshold=0.5).select(
        "id_a",
        "id_b",
        F.col("jaccard").alias("sim"),
        F.lit("ngram").alias("leg"),
    )
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    inc = docs.where(F.col("doc_id") % 10 == 0)
    # per-PROCESS unique index dir (mkdtemp), cached per sf_dir: a fixed
    # /tmp path would race concurrent crosscheck/driver runs — one
    # process's overwrite deleting files under another's lazy scan
    # (code-review r6)
    idx_path = _MH_INDEX_DIRS.get(sf_dir)
    if idx_path is None:
        idx_path = os.path.join(
            tempfile.mkdtemp(prefix="feagen_mh_index_"), "idx"
        )
        _MH_INDEX_DIRS[sf_dir] = idx_path
    D.write_minhash_index(
        corpus, idx_path, k=32, bands=8, n=3, hash_mode="md5"
    )
    probe = D.minhash_probe_increment(
        spark, idx_path, inc, k=32, bands=8, n=3, threshold=0.8,
        max_bucket=200, hash_mode="md5",
    ).select(
        "id_a",
        "id_b",
        F.col("est_jaccard").alias("sim"),
        F.lit("minhash_incr").alias("leg"),
    )
    return ngram.unionByName(probe)


def q_doc_contamination(spark, sf_dir):
    """Benchmark decontamination (cross_ngram_overlap): docs with
    doc_id % 10 == 1 stand in for a held-out eval set; the query flags
    every remaining corpus doc sharing ≥5 distinct word-3-grams with a
    bench doc (template near-dups across the split — the contamination
    a training pipeline must drop). Bench grams broadcast; the corpus
    side never shuffles raw text."""
    corpus = _docs(spark, sf_dir, where=F.col("doc_id") % 10 != 1)
    bench = _docs(spark, sf_dir, where=F.col("doc_id") % 10 == 1)
    return D.cross_ngram_overlap(
        corpus, bench, n=3, min_shared=5
    ).select("corpus_id", "bench_id", F.col("shared").cast("long").alias("shared"))


def _doc_clusters(spark, sf_dir):
    """Shared construction for the cluster queries: docs subset → exact
    n-gram-Jaccard pairs (τ=0.5) → connected components. Returns
    (docs, (doc_id, cluster_id))."""
    docs = _docs(spark, sf_dir, where=F.col("doc_id") % 5 == 0)
    # fused pair-gen → edge reduction (r7): the cluster queries consume
    # only CONNECTIVITY, so the blocked tasks union-find their
    # certain-above-τ pairs in place and ship star rows instead of the
    # 18.9M-row qualifying pair list (at sf1.0); the ±1e-6 boundary
    # band still passes through the bit-exact JVM jaccard filter.
    # Components provably equal ngram_jaccard_pairs' (parity-tested).
    edges = D.ngram_jaccard_cluster_edges(docs, n=3, threshold=0.5)
    # sketch-sized pair graph: small fixed parallelism cuts the
    # per-round task-scheduling overhead (1.35x measured at sf0.1)
    clusters = D.connected_components(edges, target_partitions=4).select(
        F.col("id").alias("doc_id"), "cluster_id"
    )
    return docs, clusters


def q_doc_dup_clusters(spark, sf_dir):
    """Dedup cluster formation: exact n-gram-Jaccard pairs (τ=0.5) →
    distributed connected components → (doc_id, cluster_id) with
    cluster_id = the canonical (min-id) survivor. The DuckDB oracle
    recomputes the same components via a recursive transitive-closure
    CTE over the identical pair set, so label propagation is value-
    checked end-to-end (iteration count, tie handling, symmetry)."""
    _, clusters = _doc_clusters(spark, sf_dir)
    return clusters


def q_doc_dedup_canonical(spark, sf_dir):
    """The dedup pass OUTPUT (what actually ships downstream): the
    corpus with every near-dup cluster collapsed to its canonical
    (min-id) member — non-canonical members anti-joined away, singleton
    docs untouched. Composition of the exact-Jaccard pair set +
    connected components + one broadcastable anti-join; the text rides
    as md5 so the oracle compare stays fixed-width."""
    docs, clusters = _doc_clusters(spark, sf_dir)
    drop = clusters.where(F.col("doc_id") != F.col("cluster_id")).select(
        "doc_id"
    )
    kept = docs.join(F.broadcast(drop), "doc_id", "left_anti")
    return kept.select("doc_id", F.md5(F.col("text")).alias("text_md5"))


# ---------------------------------------------------------------------------
# embeddings: similarity + bundle
# ---------------------------------------------------------------------------

def q_emb_topk(spark, sf_dir):
    """Exact ANN baseline AND the IVF scale path in ONE entry (merged
    r6 to free a registry slot for emb_semantic_dedup): method='brute'
    is cosine_topk; method='ivf_exhaustive' is ivf_topk probed at
    nprobe == n_centroids, where every inverted list is visited and the
    result PROVABLY equals brute force — so both methods share one
    DuckDB top-k oracle (cross-joined with the two method labels). A
    divergence in the IVF machinery (k-means training, list
    assignment, probe join, re-rank) breaks the ivf_exhaustive half of
    the value hash. Pruned-probe recall is covered by pytest."""
    emb = _embs(spark, sf_dir)
    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    brute = S.cosine_topk(emb, q, k=5).withColumn("method", F.lit("brute"))
    cent = S.train_ivf_centroids(emb, n_centroids=8, seed=42)
    ivf = S.ivf_topk(emb, q, cent, k=5, nprobe=8).withColumn(
        "method", F.lit("ivf_exhaustive")
    )
    return brute.unionByName(ivf)


def q_emb_semantic_dedup(spark, sf_dir):
    """SemDeDup semantic near-duplicate pruning (similarity.
    semantic_dedup) with a FULL value oracle: the corpus is the random
    embeddings (max pairwise cosine < 0.9 at every sf) plus 50 planted
    identical twins (the emb_near_dups pattern), clustered on
    seed_centroids' md5-ordered zero-iteration seeds — a clustering
    DuckDB recomputes exactly (row_number over md5 order, argmax
    cosine). The only pairs above τ=0.95 are the twins; each twin pair
    has IDENTICAL rounded cent_sim, so the drop rule deterministically
    removes the higher (planted) id. The hash covers assignment,
    cent_sim, and the keep flag for every corpus row."""
    emb = _embs(spark, sf_dir).select("vec_id", "embedding")
    twins = emb.where(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    corpus = emb.unionByName(twins)
    cent = S.seed_centroids(corpus, n_centroids=16)
    return S.semantic_dedup(corpus, cent, threshold=0.95)


def q_emb_bundle(spark, sf_dir):
    """Bundle op (A9/C15) + int8 storage quantization (r6): embedding
    ++ [l2_norm, label] as one array<double>, then EXPLODED to scalar
    (vec_id, pos, value) rows — the driver's canonicalizer sorts result
    columns with pandas, which cannot hash array cells; scalar rows
    keep the same values fully hash-checkable (oracle twin: DuckDB
    parallel unnest). Each embedding position also carries its
    symmetric per-vector int8 code (`q8` — similarity.
    quantize_embeddings, the 4x storage-compression path; NULL on the
    appended norm/label tail), so the quantizer's exact integer codes
    are part of the value hash."""
    from feagen_spark.operators.similarity import quantize_embeddings

    emb = _embs(spark, sf_dir)
    norm = F.sqrt(
        F.aggregate(
            "embedding",
            F.lit(0.0),
            lambda a, x: a + x.cast("double") * x.cast("double"),
        )
    )
    q = quantize_embeddings(emb, "embedding")
    bundled = q.select(
        "vec_id",
        F.concat(
            # + 0.0 normalizes IEEE -0.0 to 0.0 (matches the oracle)
            F.transform("embedding", lambda x: F.round(x.cast("double"), 4) + 0.0),
            F.array(F.round(norm, 4) + 0.0, F.col("label").cast("double")),
        ).alias("features"),
        F.concat(
            # operator codes are tinyint (real int8 storage width);
            # widen to int for the driver artifact (oracle INT twin)
            F.col("q_vec").cast("array<int>"),
            F.array(F.lit(None).cast("int"), F.lit(None).cast("int")),
        ).alias("q8s"),
    )
    z = F.posexplode(F.arrays_zip("features", "q8s"))
    return bundled.select("vec_id", z.alias("pos", "zz")).select(
        "vec_id",
        F.col("pos").cast("int").alias("pos"),
        F.col("zz.features").alias("value"),
        F.col("zz.q8s").alias("q8"),
    )


DOC_LANGS = ("de", "en", "es", "fr", "zh")


def q_doc_sparse_features(spark, sf_dir):
    """Sparse feature block (feagen h5sparse parity): one-hot(lang) ++
    token_count ++ quality_score as a CSR-row struct via bundle_sparse,
    exploded to scalar (doc_id, size, idx, val) rows for the driver
    hash. Zeros are dropped on both sides (OOV one-hot positions,
    zero-quality docs)."""
    from feagen_spark.operators.bundle import bundle_sparse, one_hot

    d = TS.text_profile(_docs(spark, sf_dir))
    d = d.withColumn("lang_onehot", one_hot("lang", DOC_LANGS))
    b = bundle_sparse(
        d,
        {"features": ["lang_onehot", "token_count", "quality_score"]},
        keys=("doc_id",),
    )
    iv = F.explode(
        F.arrays_zip(
            F.col("features.indices").alias("idx"),
            F.col("features.values").alias("val"),
        )
    )
    return b.select(
        "doc_id", F.col("features.size").alias("size"), iv.alias("iv")
    ).select(
        "doc_id",
        "size",
        F.col("iv.idx").alias("idx"),
        (F.round(F.col("iv.val"), 6) + 0.0).alias("val"),
    )


def q_ev_feature_dag(spark, sf_dir):
    """FLAGSHIP COMPOSITION with a full value oracle: the DAG engine
    (A1-A6 — resolution, template expansion, toposort, execution) runs
    an 11-feature suite over the driver's `events` table; every feature
    is SQL-expressible so the whole engine path gets a DuckDB hash
    check (VERDICT r1 #2). Two features come from regex TEMPLATES
    (last_click_value, event_type_lag_2) to exercise A2 expansion; the
    r5 trailing-distinct and decayed-sum nodes ride along so the
    engine-path hash covers them too."""
    from feagen_spark.core.dag import FeatureDAG
    from feagen_spark.core.engine import Engine
    from feagen_spark.features.events import event_nodes, event_templates

    ev = _events(spark, sf_dir)
    dag = FeatureDAG(
        nodes=event_nodes(),
        templates=event_templates(),
        input_columns=tuple(ev.columns),
    )
    eng = Engine(dag, store=None, keys=("user_id", "event_id"))
    out = eng.generate(
        ev,
        [
            "prev_event_type", "ts_delta_prev_s", "n_so_far", "cum_value",
            "value_sum_last_10", "n_events_600s", "session_id",
            "last_click_value", "event_type_lag_2",
            "n_types_last_10", "value_decay_600s",
        ],
    )
    return out.select(
        "event_id",
        "user_id",
        "prev_event_type",
        F.round("ts_delta_prev_s", 6).alias("ts_delta_prev_s"),
        F.col("n_so_far").cast("long").alias("n_so_far"),
        F.round("cum_value", 6).alias("cum_value"),
        F.round("value_sum_last_10", 6).alias("value_sum_last_10"),
        F.col("n_events_600s").cast("long").alias("n_events_600s"),
        F.col("session_id").cast("int").alias("session_id"),
        F.round("last_click_value", 6).alias("last_click_value"),
        F.col("event_type_lag_2").alias("event_type_lag_2"),
        F.col("n_types_last_10").cast("long").alias("n_types_last_10"),
        (F.round("value_decay_600s", 6) + 0.0).alias("value_decay_600s"),
    )


def q_ev_incremental_refresh(spark, sf_dir):
    """Incremental data refresh (operators/incremental.py) with a value
    oracle: a synthetic "new batch" (every 97th event) touches a set of
    users; the operator recomputes features for EXACTLY those users from
    their full history. The oracle recomputes the same features over the
    events of the affected users — O(touched), not O(table), yet
    value-identical to a full recompute restricted to those users."""
    from feagen_spark.core.dag import FeatureDAG
    from feagen_spark.core.engine import Engine
    from feagen_spark.features.events import event_nodes, event_templates
    from feagen_spark.operators.incremental import refresh_conversations

    ev = _events(spark, sf_dir)
    new_batch = ev.where(F.col("event_id") % 97 == 0)
    dag = FeatureDAG(
        nodes=event_nodes(),
        templates=event_templates(),
        input_columns=tuple(ev.columns),
    )
    eng = Engine(dag, store=None, keys=("user_id", "event_id"))
    out = refresh_conversations(
        eng, ev, new_batch, ["n_so_far", "cum_value", "session_id"],
        key="user_id",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("n_so_far").cast("long").alias("n_so_far"),
        F.round("cum_value", 6).alias("cum_value"),
        F.col("session_id").cast("int").alias("session_id"),
    )


def q_doc_lsh_recall(spark, sf_dir):
    """Self-verifying recall for the probabilistic dedup family
    (VERDICT r1 #8): MinHash-LSH candidates at a generous operating
    point (k=64, bands=32 → per-pair catch probability 1-(1-j²)³² ≥
    1-1e-23 at j ≥ 0.9) must recover EVERY exact n-gram-Jaccard pair at
    τ=0.9, so the deterministic oracle is recall = 1.0 exactly. A miss
    shows up as a hash mismatch at the driver. Subset doc_id%2 keeps the
    exact-Jaccard ground truth affordable while containing genuine
    near-dup pairs at every sf.

    r7 restructure, same output: the original ran minhash_lsh_pairs at
    the recall operating point (r=2 bands, max_bucket=None,
    threshold=0.0) and semi-joined the full candidate set — but
    2-row bands over a templated corpus put whole template families in
    one bucket, so candidate generation materialized ~Σ B² ≈ 1.6B pair
    rows at sf1.0 (measured >985 s) only for the semi-join to keep the
    few thousand true pairs. With NO bucket cap and threshold 0.0,
    `pair ∈ candidates ⟺ the two signatures agree on ≥ 1 band`, so the
    query now computes the SAME membership per TRUE pair directly:
    broadcast the exact-Jaccard pairs onto the signature table (the
    identical k=64/seed-42/xxh64 signatures minhash_lsh_pairs builds)
    and test band agreement with one `exists` over the 32 band slices —
    |true_pairs| work instead of Σ B². n_true/n_found/recall are
    provably unchanged."""
    docs = _docs(spark, sf_dir, where=F.col("doc_id") % 2 == 0)
    true_pairs = D.ngram_jaccard_pairs(docs, n=3, threshold=0.9).select(
        "id_a", "id_b"
    )
    k, bands = 64, 32
    r = k // bands
    sig = D.minhash_signatures(docs, k=k, n=3)
    sa = sig.select(F.col("doc_id").alias("id_a"), F.col("signature").alias("__sa"))
    sb = sig.select(F.col("doc_id").alias("id_b"), F.col("signature").alias("__sb"))
    band_hit = F.exists(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.forall(
            F.sequence(F.lit(0), F.lit(r - 1)),
            lambda i: F.element_at(F.col("__sa"), (b * r + i + 1).cast("int"))
            == F.element_at(F.col("__sb"), (b * r + i + 1).cast("int")),
        ),
    )
    found = (
        F.broadcast(F.broadcast(true_pairs).join(sa, "id_a"))
        .join(sb, "id_b")
        .where(band_hit)
        .select("id_a", "id_b")
    )
    return (
        true_pairs.agg(F.count(F.lit(1)).alias("n_true"))
        .crossJoin(found.agg(F.count(F.lit(1)).alias("n_found")))
        .select(
            "n_true",
            "n_found",
            # vacuous recall (no true pairs) = 1.0, matching the oracle's
            # constant; try_divide avoids the ANSI divide-by-zero crash
            F.round(
                F.coalesce(
                    F.try_divide(F.col("n_found"), F.col("n_true")),
                    F.lit(1.0),
                ),
                6,
            ).alias("recall"),
        )
    )


def q_ev_session_aggs_streaming(spark, sf_dir):
    """Structured-Streaming twin of ev_session_aggs with the SAME DuckDB
    oracle (VERDICT r2 #6): the events parquet is drained through a real
    streaming query (file source → watermark → session_window →
    availableNow into a memory sink), then session ordinals are assigned
    batch-side (row_number over session_start — the streaming engine has
    no per-key ordinal concept). Window-end inclusivity (split at delta >
    gap) matches the batch sessionizer on Spark 4, so the drained result
    is row-identical to the batch oracle."""
    import tempfile
    import uuid

    from feagen_spark.streaming.incremental import (
        run_available_now,
        streaming_session_value_aggs,
    )

    static = _t(spark, sf_dir, "events")
    stream = (
        spark.readStream.schema(static.schema)
        # file source needs a directory/glob; the [p] glob matches only
        # events.parquet without making the path a literal file
        .parquet(f"{sf_dir}/events.[p]arquet")
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    aggs = streaming_session_value_aggs(
        stream, key="user_id", ts_col="ts", value_col="value",
        gap_s=SESSION_GAP_S,
    )
    name = f"ev_sess_stream_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="ckpt_stream_")
    run_available_now(aggs, name, ckpt, output_mode="complete")
    res = spark.table(name)
    w = Window.partitionBy("user_id").orderBy("session_start")
    out = res.select(
        "user_id",
        (F.row_number().over(w) - 1).cast("int").alias("session_id"),
        F.col("n_rows").cast("long").alias("n_rows"),
        _us(F.col("session_start")).alias("session_start_us"),
        _us(F.col("session_end")).alias("session_end_us"),
        F.round(
            (_us(F.col("session_end")) - _us(F.col("session_start")))
            / F.lit(1_000_000.0),
            6,
        ).alias("duration_s"),
        F.round("session_value", 6).alias("session_value"),
    )
    # materialize, then release the per-call resources: without this,
    # every invocation pins the full drained result in driver memory
    # (memory-sink table) and leaks a /tmp checkpoint dir for the life
    # of the session (code-review r3 finding)
    import shutil

    out = out.localCheckpoint(eager=True)
    spark.catalog.dropTempView(name)
    shutil.rmtree(ckpt, ignore_errors=True)
    return out


def q_ev_stream_attribution(spark, sf_dir):
    """Streaming twin of ev_session_attribution with the SAME DuckDB
    oracle (VERDICT r4 #10): the events parquet is drained through a
    real streaming query (file source → watermark → session_window
    carrying a collect_list of purchase ids per session → availableNow
    into a memory sink); session ordinals are assigned batch-side
    (row_number over session_start) and the id lists exploded — the
    result must be row-identical to the batch interval-attribution
    oracle."""
    import shutil
    import tempfile
    import uuid

    from feagen_spark.streaming.incremental import (
        run_available_now,
        streaming_session_attribution,
    )

    static = _t(spark, sf_dir, "events")
    stream = (
        spark.readStream.schema(static.schema)
        .parquet(f"{sf_dir}/events.[p]arquet")
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    attrib = streaming_session_attribution(
        stream, key="user_id", ts_col="ts", gap_s=SESSION_GAP_S,
        target_type="purchase",
    )
    name = f"ev_stream_attr_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="ckpt_stream_attr_")
    run_available_now(attrib, name, ckpt, output_mode="complete")
    res = spark.table(name)
    w = Window.partitionBy("user_id").orderBy("session_start")
    out = res.select(
        "user_id",
        (F.row_number().over(w) - 1).cast("int").alias("session_id"),
        "target_ids",
    ).select(
        F.explode("target_ids").alias("event_id"), "user_id", "session_id"
    )
    out = out.localCheckpoint(eager=True)
    spark.catalog.dropTempView(name)
    shutil.rmtree(ckpt, ignore_errors=True)
    return out


def q_doc_quality_quota(spark, sf_dir):
    """Curation quota sampling: the top 20 docs PER LANGUAGE by quality
    score (ties broken by doc_id) — the stratified keep-list a corpus
    curator feeds to training. Composition of the quality scorer and
    the generic top-k-per-key operator; one shuffle on lang."""
    d = TS.add_quality_score(_docs(spark, sf_dir))
    out = W.top_k_per_key(
        d, "lang", (F.col("quality_score").desc(), F.col("doc_id").asc()), k=20
    )
    return out.select(
        "lang",
        "doc_id",
        F.col("quality_score").alias("quality_score"),
        F.col("rank").cast("int").alias("rank"),
    )


def q_doc_dsir_sample(spark, sf_dir):
    """DSIR importance resampling (Xie et al. 2023, r6): hashed
    unigram+bigram bucket distributions fit on a deterministic pseudo-
    target subset (doc_id % 7 == 0) vs the whole corpus, per-doc
    importance log-weight, then a deterministic Gumbel-top-k draw of
    200 docs with probability ∝ exp(weight) — the end-to-end "select
    raw docs that look like the target corpus" curation step. md5
    mode throughout so DuckDB replays weights AND the draw exactly.

    Scale shape: gram strings hash map-side (never shuffle), the
    ln-ratio table is bucket-sized and broadcast, per-doc sum is one
    groupBy, and the top-k compiles to TakeOrderedAndProject (per-
    partition top-k + one reduce, no global sort)."""
    from feagen_spark.operators.cleaning import gumbel_topk

    # pin the repartitioned corpus: raw and target are two consumers
    # of the same scan, and the driver testdata is a single
    # unsplittable row-group — without the pin each branch re-reads
    # and re-shuffles the parquet (measured 14 s → ~2 s at sf0.1)
    docs = _docs(spark, sf_dir).localCheckpoint()
    target = docs.where(F.col("doc_id") % 7 == 0)
    w = TS.dsir_logweight(
        docs, target, n_buckets=4096, alpha=0.5, method="md5"
    )
    picked = gumbel_topk(w, "dsir_logweight", k=200, method="md5")
    return picked.select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        (F.round("dsir_logweight", 6) + 0.0).alias("dsir_logweight"),
        (F.round("gumbel_key", 6) + 0.0).alias("gumbel_key"),
    )


def q_doc_cluster_split(spark, sf_dir):
    """Leakage-safe train/val/test split: near-duplicate CLUSTERS (not
    documents) are the split unit, so two near-dup docs can never land
    in different folds and leak eval content into training — the
    composition of connected_components and the portable md5 hash_split
    keyed on the canonical cluster id. Singleton docs are their own
    cluster."""
    from feagen_spark.operators.cleaning import hash_split

    docs, clusters = _doc_clusters(spark, sf_dir)
    with_cluster = (
        docs.select("doc_id")
        .join(clusters, on="doc_id", how="left")
        .withColumn("cluster_id", F.coalesce("cluster_id", F.col("doc_id")))
    )
    out = hash_split(
        with_cluster, id_col="cluster_id", method="md5",
        weights={"train": 80, "val": 10, "test": 10},
    )
    return out.select("doc_id", "cluster_id", "split")


def q_emb_label_centroids(spark, sf_dir):
    """Per-label mean embedding (similarity.label_centroids): the class-
    centroid aggregate behind IVF quantizers, prototype classifiers and
    embedding-drift monitoring. One groupBy with 64 scalar avg
    aggregates (map-side combinable, shuffle rows = n_labels) — never a
    row-per-dimension explode. Emitted one row per (label, pos) for the
    value compare."""
    emb = _embs(spark, sf_dir)
    out = S.label_centroids(emb, dim=64)
    return out.select(
        "label", "n", F.posexplode("centroid").alias("pos", "mean_val")
    ).select(
        F.col("label").cast("int").alias("label"),
        "n",
        F.col("pos").cast("int").alias("pos"),
        (F.round("mean_val", 6) + 0.0).alias("mean_val"),
    )


def q_doc_negatives(spark, sf_dir):
    """Deterministic negative sampling with a FULL VALUE ORACLE
    (VERDICT r5 #1): every anchor (1-in-10 docs) draws k=4
    pseudo-random negatives from the whole corpus via the hash-bucket
    probe — method='md5' so DuckDB reproduces bucket assignment, the
    per-draw ranking hash AND the duplicate collapse bit-for-bit.
    Never all-pairs: |anchors|·k probe rows equi-join 1/n_buckets-sized
    corpus buckets."""
    from feagen_spark.operators.cleaning import deterministic_negatives

    docs = _t(spark, sf_dir, "documents")
    anchors = docs.where(F.col("doc_id") % 10 == 0).select("doc_id")
    # repartition the candidate side (r7): the testdata parquet is ONE
    # row-group, so the probe join + per-candidate ranking hash would
    # run single-task (measured 354 s at sf1.0 — the md5 over
    # |anchors|·k·|corpus|/n_buckets joined rows is the whole cost and
    # it parallelizes embarrassingly; 50k skinny shuffle rows buy 32
    # cores). Same _docs() rationale.
    corpus = docs.select("doc_id").repartition(64, "doc_id")
    out = deterministic_negatives(
        anchors, corpus, "doc_id", "doc_id",
        k=4, n_buckets=32, method="md5",
    )
    return out.select("doc_id", "draw", "neg_id")


def q_ev_stream_decay(spark, sf_dir):
    """Streaming O(1)-state exponential decay with the batch value
    oracle (VERDICT r5 #7): the events parquet is drained through a
    real streaming query (file source → applyInPandasWithState
    recurrence S ← S·2^(−Δt/h) + v → availableNow into a memory sink);
    the emitted per-row engagement score must equal DuckDB's direct
    Σ vᵢ·2^(−ageᵢ/h) over ALL strictly-prior rows. Rounded to 4 dp —
    the recurrence and the direct sum are algebraically equal but
    associate floating point differently (~1e-11 worst-case drift on
    these chains), so 6 dp would flake roughly once per driver run
    while 4 dp has ~1e-2 collision odds per full sf0.01 drain."""
    import shutil
    import tempfile
    import uuid

    from feagen_spark.streaming.incremental import (
        run_available_now,
        streaming_decayed_sum,
    )

    static = _t(spark, sf_dir, "events")
    stream = (
        spark.readStream.schema(static.schema)
        .parquet(f"{sf_dir}/events.[p]arquet")
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    dec = streaming_decayed_sum(
        stream, key="user_id", ts_col="ts", value_col="value",
        half_life_s=600.0,
    )
    name = f"ev_stream_decay_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="ckpt_stream_decay_")
    try:
        # finally-cleanup (code-review r6): a failed drain/select must
        # not leak the checkpoint dir or the uuid temp view into the
        # session shared by every other query
        run_available_now(dec, name, ckpt, output_mode="update")
        res = spark.table(name)
        out = res.select(
            "user_id",
            _us(F.col("ts")).alias("ts_us"),
            (F.round("value_decay", 4) + 0.0).alias("value_decay"),
        )
        out = out.localCheckpoint(eager=True)
    finally:
        try:
            spark.catalog.dropTempView(name)
        except Exception:
            pass
        shutil.rmtree(ckpt, ignore_errors=True)
    return out


def q_doc_mixture_report(spark, sf_dir):
    """Corpus mixture report — the curation dashboard aggregate: per
    (lang, source) document count, total whitespace tokens and mean doc
    length, PLUS (r6) the stratum's skew profile from
    skew.key_skew_report (share of corpus, ratio to a uniform key,
    heaviness rank — the pre-flight question a 100 TB shuffle asks of
    its key). top_k covers every stratum here, so the report and the
    mixture aggregate share one row set and ONE driver entry; the
    operator's TakeOrderedAndProject top-k path gets full oracle
    evidence through the share/uniform_ratio/rank hashes. Drives
    mixture-weight decisions (what stratified_sample then enforces) —
    and (r6) carries them out in-row: cleaning.temperature_budgets at
    T=2 over a 1M-token budget emits each stratum's mT5-style
    temperature weight and integer budget (pow/renormalize recomputed
    in SQL), the numbers sample_to_token_budget /
    repeat_to_token_budget enforce."""
    from feagen_spark.operators.cleaning import temperature_budgets
    from feagen_spark.operators.skew import key_skew_report

    docs = _docs(spark, sf_dir)  # repartition: token regex is CPU-heavy
    out = TS.add_token_count(docs)
    mix = out.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("token_count").cast("bigint").alias("total_tokens"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
    ).localCheckpoint()  # r7: pin the 97-row stratum frame — it feeds
    # BOTH temperature_budgets and the final join, and without the pin
    # each consumer re-runs the full tokenize+aggregate corpus pass
    # (the dsir docs-pin rationale, at aggregate granularity)
    skew = key_skew_report(docs, ["lang", "source"], top_k=100_000).select(
        "lang", "source", "share", "uniform_ratio",
        F.col("rank").cast("int").alias("skew_rank"),
    )
    # feed the ALREADY-aggregated per-stratum totals (one row per
    # stratum) — running the operator over the per-doc frame would
    # re-scan and re-tokenize the corpus for an identical result
    # (code-review r6). \x1f separator: lang/source cannot collide
    # through a control character the way 'a#b'+'c' vs 'a'+'b#c' can.
    tb = temperature_budgets(
        mix.withColumn("__ls", F.concat_ws("\x1f", "lang", "source")),
        "__ls",
        "total_tokens",
        total_budget=1_000_000,
        temperature=2.0,
    ).select(
        "__ls",
        (F.round("weight", 6) + 0.0).alias("temp_weight"),
        F.col("budget").alias("temp_budget"),
    )
    return (
        mix.join(skew, on=["lang", "source"])
        .withColumn("__ls", F.concat_ws("\x1f", "lang", "source"))
        .join(tb, on="__ls")
        .drop("__ls")
    )


def q_emb_near_dups(spark, sf_dir):
    """Embedding near-duplicate detection (cosine_near_dup_pairs) with a
    full value oracle. The synthetic embeddings are random 64-dim (max
    pairwise cosine < 0.9 at every sf — verified), so the query plants
    50 deterministic twins (vec_id + 100000, identical vector) and runs
    the banded hyperplane-LSH + exact-verify operator at τ=0.95 over the
    union. IDENTICAL vectors produce identical signatures, so twins
    collide in every band at ANY (n_planes, bands) — determinism does
    not need a generous operating point, and the SELECTIVE one
    (n_planes=64, bands=4 → r=16 bits/bucket) keeps candidate
    generation sub-quadratic: a random pair (cos≈0, per-plane agreement
    ≈0.5) collides with P ≈ 4·2⁻¹⁶, so candidates ≈ twins + a handful
    of noise pairs the exact verify filters. (r=1 banding measured
    123 s at sf0.1 — half the corpus per bucket IS the all-pairs join.)
    The oracle is the EXACT O(n²) cosine pair set in DuckDB — a silent
    LSH miss or a spurious pair both surface as a hash mismatch."""
    emb = _embs(spark, sf_dir).select("vec_id", "embedding")
    twins = emb.where(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    corpus = emb.unionByName(twins)
    return S.cosine_near_dup_pairs(
        corpus, threshold=0.95, n_planes=64, bands=4, dim=64
    )


def q_emb_lsh_recall(spark, sf_dir):
    """Self-verifying recall for hyperplane-LSH ANN (VERDICT r2 #1,
    doc_lsh_recall pattern): at the generous operating point bands ==
    n_planes (r=1, any shared signature BIT admits a candidate) the
    candidate set of a query excludes only corpus vectors whose 16
    seeded hyperplane bits ALL differ — for the top-5 true neighbors
    (high cosine → per-plane disagreement θ/π « 1) the exclusion
    probability is < (θ/π)^16, vanishing; with the fixed seed + data it
    is deterministically zero (asserted here, hash-checked by the
    driver). Candidates ⊇ exact top-k ⇒ lsh_topk's shared re-rank
    returns EXACTLY the brute-force set, so recall = 1.0 exactly."""
    emb = _embs(spark, sf_dir)
    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = S.cosine_topk(emb, q, k=5).select("query_id", "vec_id")
    approx = S.lsh_topk(
        emb, q, k=5, n_planes=16, bands=16, dim=64
    ).select("query_id", "vec_id")
    found = exact.join(approx, on=["query_id", "vec_id"], how="left_semi")
    return (
        exact.agg(F.count(F.lit(1)).alias("n_true"))
        .crossJoin(found.agg(F.count(F.lit(1)).alias("n_found")))
        .select(
            "n_true",
            "n_found",
            F.round(
                F.coalesce(
                    F.try_divide(F.col("n_found"), F.col("n_true")), F.lit(1.0)
                ),
                6,
            ).alias("recall"),
        )
    )


# ---------------------------------------------------------------------------
# doc_minhash_pairs / doc_simhash: oracle-backed since r3 (portable md5
# hashing); mm_image_features since r4 (md5-chain fake decode);
# tr_golden_features since r5 (self-written parquet fixture). The ONE
# remaining rows-only query is mm_audio_features (real binary WAV
# decode — no SQL twin exists for a codec). emb_lsh_topk's standalone
# entry was retired in r5 (its values are fully covered by the
# hash-checked emb_lsh_recall, which runs the same lsh_topk operator
# against brute force).
# ---------------------------------------------------------------------------

def q_doc_minhash_pairs(spark, sf_dir):
    """Oracle-backed since r3: hash_mode='md5' makes the KM base hash
    engine-portable, so DuckDB recomputes the full signatures, band
    keys, bucket cap, and estimated Jaccard bit-for-bit. Near-dup
    operating point τ=0.8; max_bucket bounds the candidate join against
    the corpus's giant template clusters (one B-member bucket otherwise
    yields B² candidates)."""
    # r7 note: dict_hash=True (hash the 377-shingle domain once,
    # broadcast back, skip 7.5M per-occurrence md5s) was A/B-measured
    # at sf1.0 and came out a wash (8.8-10.1 s vs 8.1-9.9 s warm
    # interleaved) — the distinct+broadcast build job eats exactly what
    # the cheaper hashing saves, matching the sf0.1 measurement in the
    # operator docstring. Left at the default.
    return D.minhash_lsh_pairs(
        _docs(spark, sf_dir), k=32, bands=8, threshold=0.8,
        max_bucket=200, hash_mode="md5",
    )


def q_doc_simhash(spark, sf_dir):
    """Oracle-backed since r3: the token hash is md5-derived (first 8
    bytes of md5(token), big-endian), so DuckDB recomputes the exact
    64-bit SimHash — including the signed bit-63 packing — per row."""
    return D.add_simhash(_docs(spark, sf_dir)).select(
        "doc_id", "simhash"
    )


def q_mm_image_features(spark, sf_dir):
    """Oracle-backed since r4: the fake decoder expands payload bytes
    via an md5 CHAIN (block i = md5(payload || '|' || i)) and the fake
    phash is md5(payload || '|phash')[:8] signed — both recomputable in
    DuckDB from the same synthetic asset derivation, so mean_intensity
    and phash carry a full value oracle (VERDICT r3 #3). The decode
    itself (binary → Arrow batch → mapInPandas) is the real plumbing."""
    assets = MM.synthetic_assets(spark, n=64).repartition(8, "asset_id")
    out = MM.decode_image_features(assets, fake=True)
    return out.select(
        "asset_id", "width", "height", "n_bytes",
        (F.round("mean_intensity", 6) + 0.0).alias("mean_intensity"),
        "phash",
    )


def q_mm_audio_features(spark, sf_dir):
    """REAL codec path, not a stub: genuine 16-bit PCM WAV payloads
    decoded by the stdlib wave module inside mapInPandas (sample rate,
    duration and RMS come from the actual container/samples)."""
    assets = MM.synthetic_wav_assets(spark, n=48).repartition(8, "asset_id")
    out = MM.decode_audio_features(assets, fake=False)
    return out.select(
        "asset_id", "sample_rate", "duration_ms", "n_bytes",
        F.round("rms", 6).alias("rms"),
    )


# CHECKED-IN fixture (fixtures/, 340 KB): both engines read the same
# committed bytes, so the oracle never depends on the Spark query
# having run first in the same process/sandbox.
# tests/test_features.py::test_checked_in_tr_fixture_matches_datagen
# pins the file to the deterministic generator — regenerate with
#   datagen.transcripts.transcripts(spark, 300, 3, 2000)
#     .coalesce(1).write.parquet(TR_FIXTURE_PATH)
TR_FIXTURE_PATH = str(
    Path(__file__).resolve().parent / "fixtures" / "tr_golden_fixture.parquet"
)


def q_tr_golden_features(spark, sf_dir):
    """Flagship transcript feature DAG over the synthetic transcript
    table (BASELINE.json input_hint shape) — FULL ORACLE since r5
    (VERDICT r4 #2): both engines read the CHECKED-IN deterministic
    fixture and oracle_sql() recomputes every golden feature over the
    same bytes in DuckDB window SQL, so the north-star artifact itself
    carries a value hash. ``role_lag_3`` comes from the regex TEMPLATE
    (A2 expansion) — not a registered node."""
    from feagen_spark.core.dag import FeatureDAG
    from feagen_spark.core.engine import Engine
    from feagen_spark.features.turns import transcript_nodes, transcript_templates

    df = spark.read.parquet(TR_FIXTURE_PATH).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    dag = FeatureDAG(
        nodes=transcript_nodes(),
        templates=transcript_templates(),
        input_columns=tuple(df.columns),
    )
    eng = Engine(dag, store=None)
    out = eng.generate(
        df,
        [
            "text_len", "is_tool_turn", "prev_role", "role_lag_3",
            "ts_delta_prev", "turns_so_far", "cum_tool_calls",
            "user_turns_last_10", "tool_calls_last_10",
            "tool_calls_last_600s", "session_id", "turn_in_session",
            "session_start_ts",
        ],
    )
    return out.select(
        "conv_id",
        "turn_idx",
        F.col("text_len").cast("int").alias("text_len"),
        F.col("is_tool_turn").cast("int").alias("is_tool_turn"),
        "prev_role",
        "role_lag_3",
        (F.round("ts_delta_prev", 6) + 0.0).alias("ts_delta_prev"),
        F.col("turns_so_far").cast("int").alias("turns_so_far"),
        F.col("cum_tool_calls").cast("int").alias("cum_tool_calls"),
        F.col("user_turns_last_10").cast("int").alias("user_turns_last_10"),
        F.col("tool_calls_last_10").cast("int").alias("tool_calls_last_10"),
        F.col("tool_calls_last_600s").cast("int").alias("tool_calls_last_600s"),
        F.col("session_id").cast("int").alias("session_id"),
        F.col("turn_in_session").cast("int").alias("turn_in_session"),
        _us(F.col("session_start_ts")).alias("session_start_us"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: as-of state backfill over sf0.001 events."""
    return q_ev_backfill_state(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry contract (r5): the driver's CORRECTNESS artifact records
    at most the FIRST 50 entries in dict order (r4 recorded exactly
    entries 1-50 of 59, dropping the tail — VERDICT r4 #1), so this
    registry (a) stays at ≤50 entries by merging queries that share a
    row set (each merged entry still exercises every named operator and
    its oracle covers all merged columns), and (b) orders oracle-backed
    entries first with the single rows-only entry (mm_audio_features —
    real WAV codec, no SQL twin) last, so any future cap shrink drops
    the weakest evidence first. tools/crosscheck.py enforces both
    properties."""
    return {
        "ev_lag_lead": q_ev_lag_lead,
        "ev_rolling": q_ev_rolling,
        "ev_sessionize": q_ev_sessionize,
        "ev_session_attribution": q_ev_session_attribution,
        "ev_session_aggs": q_ev_session_aggs,
        "ev_asof_purchase_click": q_ev_asof_purchase_click,
        "ev_asof_chunked": q_ev_asof_chunked,
        "ev_asof_ttl_nearest": q_ev_asof_ttl_nearest,
        "ev_asof_inclusive": q_ev_asof_inclusive,
        "ev_backfill_state": q_ev_backfill_state,
        "ev_topk_per_user": q_ev_topk_per_user,
        "ev_user_profile": q_ev_user_profile,
        "ev_type_stats": q_ev_type_stats,
        "ev_value_scaling": q_ev_value_scaling,
        "ev_stratified_sample": q_ev_stratified_sample,
        "ev_feature_dag": q_ev_feature_dag,
        "ev_incremental_refresh": q_ev_incremental_refresh,
        "ev_session_aggs_streaming": q_ev_session_aggs_streaming,
        "ev_stream_attribution": q_ev_stream_attribution,
        "ev_stream_decay": q_ev_stream_decay,
        "li_rollup": q_li_rollup,
        "li_pricing_summary": q_li_pricing_summary,
        "join_revenue_by_priority": q_join_revenue_by_priority,
        "doc_profile": q_doc_profile,
        "doc_negatives": q_doc_negatives,
        "doc_dup_audit": q_doc_dup_audit,
        "doc_tfidf": q_doc_tfidf,
        "doc_quality_signals": q_doc_quality_signals,
        "doc_scrub_chunks": q_doc_scrub_chunks,
        "doc_ngram_pairs": q_doc_ngram_pairs,
        "doc_dup_clusters": q_doc_dup_clusters,
        "doc_dedup_canonical": q_doc_dedup_canonical,
        "doc_mixture_report": q_doc_mixture_report,
        "doc_cluster_split": q_doc_cluster_split,
        "doc_contamination": q_doc_contamination,
        "doc_quality_quota": q_doc_quality_quota,
        "doc_dsir_sample": q_doc_dsir_sample,
        "doc_minhash_pairs": q_doc_minhash_pairs,
        "doc_simhash": q_doc_simhash,
        "doc_lsh_recall": q_doc_lsh_recall,
        "doc_sparse_features": q_doc_sparse_features,
        "emb_topk": q_emb_topk,
        "emb_semantic_dedup": q_emb_semantic_dedup,
        "emb_bundle": q_emb_bundle,
        "emb_label_centroids": q_emb_label_centroids,
        "emb_lsh_recall": q_emb_lsh_recall,
        "emb_near_dups": q_emb_near_dups,
        "mm_image_features": q_mm_image_features,
        "tr_golden_features": q_tr_golden_features,
        # rows-only (real binary WAV decode — no SQL twin for a codec):
        "mm_audio_features": q_mm_audio_features,
    }


# ---------------------------------------------------------------------------
# DuckDB oracle SQL
# ---------------------------------------------------------------------------

_STOP_EN = TS.STOPWORDS_EN
_LANGS = TS.LANG_MARKERS


def _sql_hits(expr: str, words) -> str:
    padded = f"(' ' || lower({expr}) || ' ')"
    parts = [
        f"((length({padded}) - length(replace({padded}, ' {w} ', ''))) / {len(w) + 2})"
        for w in words
    ]
    return "CAST((" + " + ".join(parts) + ") AS INT)"


def _sql_lang_id(expr: str) -> str:
    scores = {
        lang: _sql_hits(expr, words) for lang, words in _LANGS.items()
    }
    m = "greatest(" + ", ".join(scores[l] for l in sorted(scores)) + ")"
    cases = " ".join(
        f"WHEN {scores[l]} = __m THEN '{l}'" for l in sorted(scores)
    )
    return (
        f"(SELECT CASE WHEN __m <= 0 THEN 'und' {cases} END "
        f"FROM (SELECT {m} AS __m))"
    )


# non-empty split segments — mirrors textstats._token_count exactly
# (code-review r6: the old trim-based CASE counted phantom segments
# around tab/newline edges); move the two together
_TOKENS = (
    "len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != ''))"
)
_NORM = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"


def oracle_sql() -> dict[str, str]:
    ev_w = "PARTITION BY user_id ORDER BY ts, event_id"
    sql = {}

    sql["ev_lag_lead"] = f"""
        SELECT event_id, user_id,
               lag(event_type, 1) OVER ({ev_w}) AS prev_event_type,
               lead(event_type, 1) OVER ({ev_w}) AS next_event_type,
               round((epoch_us(ts) - lag(epoch_us(ts), 1) OVER ({ev_w})) / 1000000.0, 6)
                   AS ts_delta_prev_s,
               count(*) OVER ({ev_w} ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS n_so_far,
               round(coalesce(sum(value) OVER
                   ({ev_w} ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0), 6)
                   AS cum_value
        FROM events
    """

    # decay constant shared bit-for-bit with add_rolling_decayed_sum
    # (same python double, half-life 600 s, per-microsecond)
    import math as _math

    _lam = repr(_math.log(2.0) / (600.0 * 1e6))
    sql["ev_rolling"] = f"""
        SELECT event_id, user_id,
               count(*) OVER ({ev_w} ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)
                   AS n_last_10,
               round(coalesce(sum(value) OVER
                   ({ev_w} ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING), 0), 6)
                   AS value_sum_last_10,
               coalesce(count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                   RANGE BETWEEN 600000000 PRECEDING AND 1 PRECEDING), 0)
                   AS n_events_600s,
               count(DISTINCT event_type) OVER
                   ({ev_w} ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)
                   AS n_types_last_10,
               CASE WHEN ts IS NULL THEN NULL  -- engine: no reference instant
                    ELSE round(coalesce(list_sum(list_transform(
                        list(struct_pack(us := epoch_us(ts),
                                         v := coalesce(value, 0.0))) OVER
                            ({ev_w} ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING),
                        p -> p.v * exp(-{_lam} * (epoch_us(ts) - p.us))
                    )), 0.0), 6) + 0.0 END AS value_decay
        FROM events
    """

    session_cte = f"""
        WITH flagged AS (
            SELECT *,
                   CASE WHEN lag(ts) OVER ({ev_w}) IS NULL THEN 0
                        WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER ({ev_w})
                             > {SESSION_GAP_S} * 1000000 THEN 1
                        ELSE 0 END AS is_new
            FROM events
        ), sessions AS (
            SELECT *,
                   CAST(sum(is_new) OVER ({ev_w}
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT)
                       AS session_id
            FROM flagged
        )
    """

    sql["ev_sessionize"] = session_cte + """
        SELECT event_id, user_id, session_id,
               CAST(FLOOR((epoch_us(ts)
                           - min(epoch_us(ts)) OVER
                             (PARTITION BY user_id, session_id))
                          / (900 * 1000000.0)) AS INT) AS session_part,
               session_id AS session_id_plain
        FROM sessions
    """

    sql["ev_session_attribution"] = session_cte + """
        , bounds AS (
            SELECT user_id, session_id, min(ts) AS s, max(ts) AS e
            FROM sessions GROUP BY user_id, session_id
        )
        SELECT p.event_id, p.user_id, b.session_id
        FROM events p JOIN bounds b
          ON p.user_id = b.user_id AND p.ts >= b.s AND p.ts <= b.e
        WHERE p.event_type = 'purchase'
    """

    sql["ev_session_aggs"] = session_cte + """
        SELECT user_id, session_id,
               count(*) AS n_rows,
               min(epoch_us(ts)) AS session_start_us,
               max(epoch_us(ts)) AS session_end_us,
               round((max(epoch_us(ts)) - min(epoch_us(ts))) / 1000000.0, 6)
                   AS duration_s,
               round(sum(value), 6) AS session_value
        FROM sessions
        GROUP BY user_id, session_id
    """

    # the streaming drains must be row-identical to their batch twins
    sql["ev_session_aggs_streaming"] = sql["ev_session_aggs"]
    sql["ev_stream_attribution"] = sql["ev_session_attribution"]
    # streaming decayed sum: the state recurrence processes rows in
    # (ts, value) order per key (no event_id reaches the operator), so
    # the oracle window orders the same way; the UNBOUNDED frame is the
    # point — O(1) streaming state replaces the batch frame cap. 4 dp:
    # recurrence vs direct-sum float association (see q_ev_stream_decay)
    sql["ev_stream_decay"] = f"""
        SELECT user_id, epoch_us(ts) AS ts_us,
               CASE WHEN ts IS NULL THEN NULL
                    ELSE round(coalesce(list_sum(list_transform(
                        list(struct_pack(us := epoch_us(ts),
                                         v := coalesce(value, 0.0))) OVER
                            (PARTITION BY user_id ORDER BY ts, value
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        p -> p.v * exp(-{_lam} * (epoch_us(ts) - p.us))
                    )), 0.0), 4) + 0.0 END AS value_decay
        FROM events
    """

    sql["ev_asof_purchase_click"] = f"""
        WITH st AS (
            SELECT *,
                   last_value(CASE WHEN event_type = 'click' THEN value END
                       IGNORE NULLS) OVER ({ev_w}
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS last_click_value
            FROM events
        )
        SELECT user_id, event_id,
               round(value, 6) AS purchase_value,
               round(last_click_value, 6) AS last_click_value
        FROM st WHERE event_type = 'purchase'
    """

    sql["ev_asof_chunked"] = sql["ev_asof_purchase_click"]

    # TTL leg: carried last-click discarded when older than 600 s.
    # Nearest leg: correlated LATERAL subquery ranked by |distance| with
    # the operator's exact tie rules (backward on cross-side ties; max
    # id within backward, min id within forward). Joined on the
    # purchase identity — mirrors the merged Spark entry.
    sql["ev_asof_ttl_nearest"] = f"""
        WITH st AS (
            SELECT *,
                   last_value(CASE WHEN event_type = 'click' THEN value END
                       IGNORE NULLS) OVER ({ev_w}
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS last_click_value,
                   last_value(CASE WHEN event_type = 'click'
                       THEN epoch_us(ts) END
                       IGNORE NULLS) OVER ({ev_w}
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS last_click_us
            FROM events
        )
        SELECT p.user_id, p.event_id,
               round(p.value, 6) AS purchase_value,
               CASE WHEN epoch_us(p.ts) - p.last_click_us <= 600000000
                    THEN round(p.last_click_value, 6) END AS last_click_value,
               CASE WHEN epoch_us(p.ts) - p.last_click_us <= 600000000
                    THEN p.last_click_us END AS last_click_us,
               sub.v AS nearest_click_value,
               sub.us AS nearest_click_us
        FROM st p
        LEFT JOIN LATERAL (
            SELECT round(c.value, 6) AS v, epoch_us(c.ts) AS us
            FROM events c
            WHERE c.user_id = p.user_id AND c.event_type = 'click'
              AND abs(epoch_us(c.ts) - epoch_us(p.ts)) <= 1200000000
            ORDER BY abs(epoch_us(c.ts) - epoch_us(p.ts)),
                     (epoch_us(c.ts) > epoch_us(p.ts)),
                     CASE WHEN epoch_us(c.ts) <= epoch_us(p.ts)
                          THEN -c.event_id ELSE c.event_id END
            LIMIT 1
        ) sub ON TRUE
        WHERE p.event_type = 'purchase'
    """

    sql["ev_backfill_state"] = f"""
        SELECT event_id, user_id,
               round(last_value(CASE WHEN event_type = 'click' THEN value END
                   IGNORE NULLS) OVER ({ev_w}
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 6)
                   AS last_click_value,
               round(last_value(CASE WHEN event_type = 'view' THEN value END
                   IGNORE NULLS) OVER ({ev_w}
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 6)
                   AS last_view_value
        FROM events
    """

    sql["ev_topk_per_user"] = """
        SELECT user_id, event_id, round(value, 6) AS value, rank FROM (
            SELECT user_id, event_id, value,
                   CAST(row_number() OVER (PARTITION BY user_id
                       ORDER BY value DESC, event_id ASC) AS INT) AS rank
            FROM events
        ) WHERE rank <= 3
    """

    sql["ev_user_profile"] = """
        SELECT user_id,
               count(*) AS n_events,
               round(avg(value), 6) AS avg_value,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
               CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error
        FROM events GROUP BY user_id
    """

    sql["ev_asof_inclusive"] = f"""
        WITH st AS (
            SELECT *,
                   last_value(CASE WHEN event_type = 'view' THEN value END
                       IGNORE NULLS) OVER ({ev_w}
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS lv
            FROM events
        )
        SELECT user_id, event_id, round(lv, 6) AS last_view_value
        FROM st WHERE event_type = 'signup'
    """

    # r6 merge (50-entry cap): median/p90 + the JSON schema-on-read
    # aggregate share the event_type row set
    sql["ev_type_stats"] = """
        SELECT event_type,
               round(quantile_cont(value, 0.5), 6) AS median_value,
               round(quantile_cont(value, 0.9), 6) AS p90_value,
               count(*) AS n,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT) AS k_sum,
               round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6)
                   AS k_avg,
               CAST(sum(CASE WHEN CAST(json_extract_string(props, '$.k')
                                       AS BIGINT) > 50
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_k_gt_50
        FROM events GROUP BY event_type
    """

    sql["ev_value_scaling"] = """
        SELECT event_id, user_id, event_type,
               round((value - avg(value) OVER wg)
                     / nullif(stddev_samp(value) OVER wg, 0), 6) + 0.0
                   AS value_zscore,
               round((value - avg(value) OVER wt)
                     / nullif(stddev_samp(value) OVER wt, 0), 6) + 0.0
                   AS value_zscore_trailing,
               CAST(ntile(10) OVER wr AS INT) AS decile,
               round(percent_rank() OVER wr, 6) + 0.0 AS pct_rank
        FROM events
        WINDOW wg AS (PARTITION BY event_type),
               wt AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING),
               wr AS (PARTITION BY user_id ORDER BY value, event_id)
    """

    sql["emb_label_centroids"] = """
        WITH sizes AS (
            SELECT label, count(*) AS n FROM embeddings GROUP BY label
        ), x AS (
            SELECT label,
                   unnest(embedding) AS v,
                   unnest(range(0, len(embedding))) AS pos
            FROM embeddings
        ), m AS (
            SELECT label, pos, avg(CAST(v AS DOUBLE)) AS mean_val
            FROM x GROUP BY label, pos
        )
        SELECT CAST(m.label AS INT) AS label, s.n,
               CAST(m.pos AS INT) AS pos,
               round(m.mean_val, 6) + 0.0 AS mean_val
        FROM m JOIN sizes s USING (label)
    """

    sql["doc_mixture_report"] = f"""
        WITH mix AS (
            SELECT lang, source,
                   count(*) AS n_docs,
                   CAST(sum({_TOKENS}) AS BIGINT) AS total_tokens,
                   round(avg(n_chars), 6) AS avg_chars
            FROM documents GROUP BY lang, source
        )
        , mixq AS (
            -- temperature mixture (r6): w ∝ p^(1/T) at T=2 (windows
            -- layered in CTEs — DuckDB cannot nest window calls)
            SELECT *, pow(total_tokens
                          / CAST(sum(total_tokens) OVER () AS DOUBLE), 0.5)
                      AS rawq
            FROM mix
        )
        SELECT lang, source, n_docs, total_tokens, avg_chars,
               round(n_docs / CAST(sum(n_docs) OVER () AS DOUBLE), 6)
                   AS share,
               round(n_docs * CAST(count(*) OVER () AS DOUBLE)
                     / CAST(sum(n_docs) OVER () AS DOUBLE), 6)
                   AS uniform_ratio,
               CAST(row_number() OVER (
                   ORDER BY n_docs DESC, lang, source) AS INT) AS skew_rank,
               round(rawq / sum(rawq) OVER (), 6) + 0.0 AS temp_weight,
               CAST(round(1000000.0 * rawq / sum(rawq) OVER ())
                    AS BIGINT) AS temp_budget
        FROM mixq
    """

    sql["ev_stratified_sample"] = """
        SELECT event_id, user_id, event_type
        FROM events
        WHERE CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 8))
                   AS UBIGINT) % 1000000
              < CASE event_type WHEN 'click' THEN 500000
                                WHEN 'view' THEN 200000
                                WHEN 'purchase' THEN 1000000
                                ELSE 0 END
    """

    sql["li_rollup"] = """
        SELECT 'rollup' AS leg,
               coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               count(*) AS n
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        UNION ALL
        SELECT 'gsets' AS leg,
               coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               count(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """

    sql["li_pricing_summary"] = """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(avg(l_discount), 6) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """

    sql["join_revenue_by_priority"] = """
        SELECT o_orderpriority,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS n_items
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
    """

    punct = "length(regexp_replace(text, '[^.,;:!?]', '', 'g'))"
    stop_hits = _sql_hits("text", _STOP_EN)
    bpe = "CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT)"
    mean_tok = f"CASE WHEN ({_TOKENS}) = 0 THEN 0.0 ELSE CAST(length(text) AS DOUBLE) / ({_TOKENS}) END"
    stop_ratio = (
        f"CASE WHEN ({_TOKENS}) = 0 THEN 0.0 "
        f"ELSE CAST({stop_hits} AS DOUBLE) / ({_TOKENS}) END"
    )
    punct_ratio = (
        f"CASE WHEN length(text) = 0 THEN 0.0 "
        f"ELSE CAST({punct} AS DOUBLE) / length(text) END"
    )
    quality = f"""
        round(greatest(
            (CASE WHEN length(text) BETWEEN 50 AND 10000 THEN 0.4 ELSE 0.0 END)
            + (CASE WHEN ({mean_tok}) >= 3 AND ({mean_tok}) <= 12 THEN 0.3 ELSE 0.0 END)
            + least(({stop_ratio}) * 3, 0.2)
            - least({punct_ratio}, 0.2),
        0.0), 6)
    """
    sql["doc_profile"] = f"""
        WITH il AS (
            -- stratified interleave (r6): within-lang rank by the md5
            -- key -> pos r/(n+1); global order by (pos, key, id)
            SELECT doc_id,
                   md5('42:' || CAST(doc_id AS VARCHAR)) AS ikey,
                   (row_number() OVER (PARTITION BY lang
                        ORDER BY md5('42:' || CAST(doc_id AS VARCHAR)),
                                 doc_id))
                     / CAST(count(*) OVER (PARTITION BY lang) + 1 AS DOUBLE)
                     AS ipos
            FROM documents
        ), base AS (
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS char_len,
               CAST({_TOKENS} AS BIGINT) AS token_count,
               {bpe} AS bpe_token_count,
               round({punct_ratio}, 6) AS punct_ratio,
               round({stop_ratio}, 6) AS stopword_ratio,
               {quality} AS quality_score,
               {_sql_lang_id("text")} AS lang_id,
               md5({_NORM}) AS fingerprint,
               CASE WHEN b < 80 THEN 'train'
                    WHEN b < 90 THEN 'val'
                    ELSE 'test' END AS split,
               CAST(CASE WHEN doc_id = keeper THEN 1 ELSE 0 END AS INT)
                   AS is_kept,
               CAST(row_number() OVER (
                   ORDER BY md5('42:' || CAST(doc_id AS VARCHAR)), doc_id
               ) - 1 AS BIGINT) AS shuffle_rank
        FROM (
            SELECT *,
                   CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                        AS UBIGINT) % 100 AS b,
                   min(doc_id) OVER (PARTITION BY {_NORM}) AS keeper
            FROM documents
        )
        )
        SELECT base.*,
               round(il.ipos, 6) + 0.0 AS interleave_pos,
               CAST(row_number() OVER (ORDER BY il.ipos, il.ikey, il.doc_id)
                    - 1 AS BIGINT) AS interleave_rank
        FROM base JOIN il USING (doc_id)
    """

    # negatives oracle: reruns the md5 hash-bucket probe end-to-end in
    # SQL — corpus bucket, (anchor, draw) probe bucket, hex-string rank
    # order and the lowest-draw duplicate collapse (VERDICT r5 #1)
    sql["doc_negatives"] = """
        WITH cand AS (
            SELECT doc_id AS neg_id,
                   CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                        AS UBIGINT) % 32 AS bkt
            FROM documents
        ), probes AS (
            SELECT a.doc_id AS anchor, j.draw,
                   CAST(('0x' || substring(md5(CAST(a.doc_id AS VARCHAR) || ':'
                             || CAST(j.draw AS VARCHAR)), 1, 8))
                        AS UBIGINT) % 32 AS bkt
            FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 0) a,
                 (SELECT unnest(range(4)) AS draw) j
        ), ranked AS (
            SELECT anchor, draw, neg_id,
                   row_number() OVER (PARTITION BY anchor, draw
                       ORDER BY md5(CAST(anchor AS VARCHAR) || ':'
                                    || CAST(draw AS VARCHAR) || ':'
                                    || CAST(neg_id AS VARCHAR)),
                                neg_id) AS rn
            FROM probes JOIN cand USING (bkt)
            WHERE neg_id != anchor
        ), collapsed AS (
            SELECT anchor, draw, neg_id,
                   row_number() OVER (PARTITION BY anchor, neg_id
                       ORDER BY draw) AS dn
            FROM ranked WHERE rn = 1
        )
        SELECT anchor AS doc_id, CAST(draw AS INT) AS draw, neg_id
        FROM collapsed WHERE dn = 1
    """

    # curation quota: top 20 per lang by the SAME rounded quality
    # formula (identical 6dp values on both engines ⇒ identical
    # deterministic ordering incl. the doc_id tie-break)
    sql["doc_quality_quota"] = f"""
        SELECT lang, doc_id, quality_score, rank FROM (
            SELECT lang, doc_id, {quality} AS quality_score,
                   CAST(row_number() OVER (PARTITION BY lang
                       ORDER BY {quality} DESC, doc_id ASC) AS INT) AS rank
            FROM documents
        ) WHERE rank <= 20
    """

    # DSIR: hashed unigram+bigram buckets (md5 bridge), smoothed
    # log-ratio of target (doc_id % 7 == 0) vs raw distributions,
    # per-doc weight, Gumbel key from md5('42:'||doc_id), top 200 by
    # exact key (ties impossible at the boundary in practice; id
    # tie-break pinned in both engines)
    sql["doc_dsir_sample"] = """
        WITH tok AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                               x -> x != '') AS toks
            FROM documents
        ), g AS (
            SELECT doc_id, unnest(toks) AS gram FROM tok
            UNION ALL
            SELECT doc_id,
                   unnest(list_transform(
                       range(1, greatest(len(toks) - 1, 0) + 1),
                       i -> toks[CAST(i AS INT)] || ' '
                            || toks[CAST(i AS INT) + 1])) AS gram
            FROM tok
        ), f AS (
            SELECT doc_id,
                   CAST(('0x' || substring(md5(gram), 1, 8)) AS UBIGINT)
                       % 4096 AS bkt
            FROM g
        ), f2 AS (
            SELECT doc_id, bkt, count(*) AS cnt FROM f GROUP BY 1, 2
        ), tc AS (
            SELECT bkt, count(*) AS tgt_n FROM f
            WHERE doc_id % 7 = 0 GROUP BY 1
        ), rc AS (
            SELECT bkt, sum(cnt) AS raw_n FROM f2 GROUP BY 1
        ), tt AS (
            SELECT CAST(coalesce(sum(tgt_n), 0) AS DOUBLE) AS tgt_total FROM tc
        ), rt AS (
            SELECT CAST(sum(raw_n) AS DOUBLE) AS raw_total FROM rc
        ), w AS (
            SELECT f2.doc_id,
                   sum(cnt) AS n_grams,
                   sum(cnt * (
                       ln((coalesce(tgt_n, 0) + 0.5) / (tgt_total + 0.5 * 4096))
                       - ln((raw_n + 0.5) / (raw_total + 0.5 * 4096)))) AS wt
            FROM f2
            JOIN rc USING (bkt)
            LEFT JOIN tc USING (bkt)
            CROSS JOIN tt CROSS JOIN rt
            GROUP BY f2.doc_id
        ), keyed AS (
            SELECT doc_id, n_grams, wt,
                   wt + -ln(-ln((CAST(('0x' || substring(
                            md5('42:' || CAST(doc_id AS VARCHAR)), 1, 8))
                            AS UBIGINT) % 1000000 + 0.5) / 1000000.0)) AS gk
            FROM w
        )
        SELECT doc_id,
               CAST(n_grams AS BIGINT) AS n_grams,
               round(wt, 6) + 0.0 AS dsir_logweight,
               round(gk, 6) + 0.0 AS gumbel_key
        FROM keyed
        ORDER BY gk DESC, doc_id ASC
        LIMIT 200
    """

    sql["doc_dup_audit"] = f"""
        SELECT lang, count(*) AS n_docs,
               count(DISTINCT md5({_NORM})) AS n_unique
        FROM documents GROUP BY lang
    """

    sql["doc_quality_signals"] = """
        WITH t AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                               x -> x != '') AS toks
            FROM documents
        ), g AS (
            SELECT doc_id, len(toks) - 1 AS k,
                   list_transform(range(1, greatest(len(toks) - 1, 1) + 1),
                        i -> array_to_string(list_slice(toks, CAST(i AS INT),
                                                        CAST(i + 1 AS INT)), ' '))
                       AS grams
            FROM t
        ), rep AS (
            SELECT doc_id,
                   CAST(greatest(k, 0) AS BIGINT) AS n_grams,
                   round(CASE WHEN k <= 0 THEN 0.0
                              ELSE 1.0 - len(list_distinct(grams)) / CAST(k AS DOUBLE)
                         END, 6) AS dup_ratio
            FROM g
        ), toksu AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS term
            FROM documents
        ), tf AS (
            SELECT doc_id, term, count(*) AS tf
            FROM toksu WHERE term != '' GROUP BY 1, 2
        ), tt AS (
            SELECT term, sum(tf) AS term_total FROM tf GROUP BY 1
        ), tot AS (
            SELECT CAST(sum(tf) AS DOUBLE) AS total_tokens FROM tf
        ), sc AS (
            SELECT doc_id,
                   CAST(sum(tf) AS BIGINT) AS n_tokens,
                   -sum(tf * ln(term_total / total_tokens)) / sum(tf) AS nl
            FROM tf JOIN tt USING (term) CROSS JOIN tot
            GROUP BY doc_id
        ), gtoks AS (
            -- Gopher rule inputs (r6): same tokenizer, lines split on
            -- the literal newline; ltrim/rtrim pinned to space-only to
            -- match Spark's defaults
            SELECT doc_id, text,
                   list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                               x -> x != '') AS toks,
                   string_split(text, chr(10)) AS lines
            FROM documents
        ), gsig AS (
            SELECT doc_id,
                   CAST(len(toks) AS BIGINT) AS g_words,
                   CASE WHEN len(toks) > 0 THEN
                       list_sum(list_transform(toks, t -> length(t)))
                           / CAST(len(toks) AS DOUBLE)
                   END AS mwl,
                   CASE WHEN len(toks) > 0 THEN
                       ( (length(text) - length(replace(text, '#', '')))
                       + (length(text) - length(replace(text, '…', '')))
                       + (length(text) - length(replace(text, '...', ''))) / 3.0
                       ) / CAST(len(toks) AS DOUBLE)
                   END AS sym,
                   len(list_filter(lines,
                       l -> substr(ltrim(l, ' '), 1, 1) IN ('-', '*', '•')))
                       / CAST(len(lines) AS DOUBLE) AS bul,
                   len(list_filter(lines,
                       l -> ends_with(rtrim(l, ' '), '...')
                         OR ends_with(rtrim(l, ' '), '…')))
                       / CAST(len(lines) AS DOUBLE) AS ell,
                   CASE WHEN len(toks) > 0 THEN
                       len(list_filter(toks, t -> regexp_matches(t, '[a-z]')))
                           / CAST(len(toks) AS DOUBLE)
                   END AS alpha,
                   CAST(list_contains(toks, 'the') AS INT)
                     + CAST(list_contains(toks, 'be') AS INT)
                     + CAST(list_contains(toks, 'to') AS INT)
                     + CAST(list_contains(toks, 'of') AS INT)
                     + CAST(list_contains(toks, 'and') AS INT)
                     + CAST(list_contains(toks, 'that') AS INT)
                     + CAST(list_contains(toks, 'have') AS INT)
                     + CAST(list_contains(toks, 'with') AS INT) AS stop_hits
            FROM gtoks
        ), gkeep AS (
            -- verdict on the UNROUNDED signals, like the operator
            SELECT doc_id, g_words, mwl, sym, bul, ell, alpha, stop_hits,
                   CAST(coalesce(
                       g_words BETWEEN 50 AND 100000
                       AND mwl BETWEEN 3.0 AND 10.0
                       AND sym < 0.1 AND bul < 0.9 AND ell < 0.3
                       AND alpha >= 0.8 AND stop_hits >= 2, false) AS INT)
                       AS g_keep
            FROM gsig
        )
        SELECT r.doc_id, r.n_grams, r.dup_ratio,
               coalesce(sc.n_tokens, 0) AS n_tokens,
               round(sc.nl, 6) + 0.0 AS neg_logprob,
               gk.g_words,
               round(gk.mwl, 6) + 0.0 AS g_mwl,
               round(gk.sym, 6) + 0.0 AS g_sym,
               round(gk.bul, 6) + 0.0 AS g_bullet,
               round(gk.ell, 6) + 0.0 AS g_ell,
               round(gk.alpha, 6) + 0.0 AS g_alpha,
               CAST(gk.stop_hits AS INT) AS g_stop,
               gk.g_keep
        FROM rep r LEFT JOIN sc USING (doc_id) JOIN gkeep gk USING (doc_id)
    """

    # SimHash: recompute the 64-bit sketch in SQL — md5-derived token
    # hash (first 16 hex chars as UBIGINT), per-bit ±1 sums over token
    # OCCURRENCES (multiplicity counts), bit set iff sum > 0, packed as
    # signed int64 (bit 63 contributes -2^63). Docs with no tokens → 0
    # (NULL bit sums fail every `> 0` test).
    _bitsums = ", ".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(64)
    )
    _packed = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(63)
    )
    sql["doc_simhash"] = f"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(list_filter(
                       regexp_split_to_array(lower(text), '\\s+'),
                       x -> x != '')) AS tok
            FROM documents
        ), h AS (
            SELECT doc_id,
                   CAST(('0x' || substring(md5(tok), 1, 16)) AS UBIGINT) AS h
            FROM toks
        ), b AS (
            SELECT doc_id, {_bitsums} FROM h GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(({_packed})
                    - (CASE WHEN b63 > 0 THEN {1 << 63} ELSE 0 END) AS BIGINT)
                   AS simhash
        FROM documents d LEFT JOIN b USING (doc_id)
    """

    # mm_image_features: rebuild the synthetic assets from range(64)
    # (payload = repeat(sha256(id), 8), dims from id), replay the md5
    # CHAIN expansion (block i = md5(payload || '|' || i), 16 bytes per
    # block, last block truncated to wh mod 16) for mean_intensity, and
    # the md5 '|phash' tag for the signed-64 phash — byte-for-byte what
    # multimodal._fake_decode_bytes/_fake_phash64 compute in the UDF.
    sql["mm_image_features"] = """
        WITH assets AS (
            SELECT CAST(r.range AS BIGINT) AS asset_id,
                   repeat(sha256(CAST(r.range AS VARCHAR)), 8) AS payload,
                   CAST(32 + r.range % 64 AS INT) AS width,
                   CAST(32 + (r.range * 7) % 64 AS INT) AS height
            FROM range(64) r
        ), sized AS (
            SELECT *, width * height AS wh,
                   CAST(length(payload) AS INT) AS n_bytes
            FROM assets
        ), blocks AS (
            SELECT asset_id, wh, payload,
                   unnest(range(0, (wh + 15) // 16)) AS blk
            FROM sized
        ), sums AS (
            SELECT asset_id,
                   SUM(list_sum(list_transform(
                       range(0, LEAST(16, wh - blk * 16)),
                       i -> CAST(('0x' || substr(
                                md5(payload || '|' || CAST(blk AS VARCHAR)),
                                CAST(1 + 2 * i AS INT), 2)) AS INT)
                   ))) AS px_sum
            FROM blocks GROUP BY asset_id
        ), ph AS (
            SELECT asset_id,
                   CAST(('0x' || substr(md5(payload || '|phash'), 1, 16))
                        AS UBIGINT) AS u
            FROM sized
        )
        SELECT s.asset_id, s.width, s.height, s.n_bytes,
               round(CAST(m.px_sum AS DOUBLE) / s.wh, 6) + 0.0
                   AS mean_intensity,
               CAST(CAST(p.u AS HUGEINT)
                    - (CASE WHEN p.u >= 9223372036854775808
                            THEN 18446744073709551616 ELSE 0 END)
                    AS BIGINT) AS phash
        FROM sized s
        JOIN sums m USING (asset_id)
        JOIN ph p USING (asset_id)
    """

    _scrub = (
        "regexp_replace(regexp_replace(regexp_replace(text, "
        "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), "
        "'\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b', '<IP>', 'g'), "
        "'\\+?\\d[\\d\\s().-]{7,}\\d', '<PHONE>', 'g')"
    )
    sql["doc_scrub_chunks"] = f"""
        WITH d AS (
            SELECT doc_id, {_scrub} AS t
            FROM documents WHERE doc_id % 5 = 0
        ), par AS (
            SELECT doc_id, t,
                   greatest(CAST(ceil((length(t) - 64.0) / 448.0) AS INT), 1) AS nc
            FROM d WHERE length(t) > 0
        ), chunks AS (
            SELECT doc_id,
                   CAST(unnest(range(0, nc)) AS INT) AS chunk_idx,
                   CAST(unnest(list_transform(range(0, nc),
                        i -> length(substr(t, CAST(i * 448 + 1 AS INT), 512)))) AS BIGINT)
                       AS chunk_len,
                   unnest(list_transform(range(0, nc),
                        i -> md5(substr(t, CAST(i * 448 + 1 AS INT), 512))))
                       AS chunk_md5
            FROM par
        ),
        -- para_dedup leg: rebuild the SAME 20-group fixture, then keep
        -- each normalized paragraph's first (g, pos) occurrence and
        -- reassemble in position order (C4-style cross-doc para dedup)
        grp AS (
            SELECT CAST((doc_id // 5) % 20 AS BIGINT) AS g,
                   string_agg(text, chr(10) ORDER BY doc_id) AS t
            FROM documents WHERE doc_id % 5 = 0 GROUP BY 1
        ), paras AS (
            SELECT g,
                   CAST(unnest(range(0, len(string_split(t, chr(10))))) AS INT)
                       AS pos,
                   unnest(string_split(t, chr(10))) AS para
            FROM grp
        ), ranked AS (
            SELECT g, pos, para,
                   regexp_replace(lower(trim(para)), '\\s+', ' ', 'g') AS np,
                   row_number() OVER (
                       PARTITION BY regexp_replace(lower(trim(para)), '\\s+', ' ', 'g')
                       ORDER BY g, pos
                   ) AS rn
            FROM paras
        ), kept AS (
            SELECT g, pos, para FROM ranked WHERE length(np) < 1 OR rn = 1
        ), tot AS (
            SELECT g, count(*) AS na FROM paras GROUP BY 1
        ), reb AS (
            SELECT g, count(*) AS nk,
                   string_agg(para, chr(10) ORDER BY pos) AS ct
            FROM kept GROUP BY g
        ), para_rows AS (
            SELECT tot.g AS doc_id,
                   CAST(tot.na - coalesce(reb.nk, 0) AS INT) AS chunk_idx,
                   CAST(length(coalesce(reb.ct, '')) AS BIGINT) AS chunk_len,
                   md5(coalesce(reb.ct, '')) AS chunk_md5
            FROM tot LEFT JOIN reb USING (g)
        )
        -- boilerplate leg (r6): drop EVERY occurrence of a line whose
        -- normalized text repeats (count >= 2) corpus-wide; short
        -- lines are structural (np length < 1 can't happen at
        -- min_chars=1 except empties, which survive)
        -- `ranked` already carries the normalized line np — reuse it
        -- (one normalization definition; code-review r6)
        , hotlines AS (
            SELECT np FROM ranked WHERE length(np) >= 1
            GROUP BY np HAVING count(*) >= 2
        ), bp_kept AS (
            SELECT g, pos, para FROM ranked
            WHERE length(np) < 1 OR np NOT IN (SELECT np FROM hotlines)
        ), bp_reb AS (
            SELECT g, count(*) AS nk,
                   string_agg(para, chr(10) ORDER BY pos) AS ct
            FROM bp_kept GROUP BY g
        ), bp_rows AS (
            SELECT tot.g AS doc_id,
                   CAST(tot.na - coalesce(bp_reb.nk, 0) AS INT) AS chunk_idx,
                   CAST(length(coalesce(bp_reb.ct, '')) AS BIGINT) AS chunk_len,
                   md5(coalesce(bp_reb.ct, '')) AS chunk_md5
            FROM tot LEFT JOIN bp_reb USING (g)
        )
        SELECT *, 'chunks' AS leg FROM chunks
        UNION ALL
        SELECT *, 'para_dedup' AS leg FROM para_rows
        UNION ALL
        SELECT *, 'boilerplate' AS leg FROM bp_rows
    """

    sql["doc_tfidf"] = """
        WITH d AS (
            SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
        ), toks AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS term
            FROM d
        ), tf AS (
            SELECT doc_id, term, count(*) AS tf
            FROM toks WHERE term != '' GROUP BY 1, 2
        ), dfreq AS (
            SELECT term, count(*) AS dfr FROM tf GROUP BY 1
        ), nd AS (
            SELECT count(*) AS n FROM d
        )
        SELECT doc_id, term, CAST(tf AS BIGINT) AS tf,
               round(tf * (ln((n + 1.0) / (dfr + 1.0)) + 1.0), 6) AS tfidf
        FROM tf JOIN dfreq USING (term) CROSS JOIN nd
    """

    def ngram_pairs_sql(threshold: float, modulus: int = 5) -> str:
        return f"""
        WITH d AS (
            SELECT doc_id, {_NORM} AS t FROM documents WHERE doc_id % {modulus} = 0
        ), sh AS (
            SELECT DISTINCT doc_id, shingle FROM (
                SELECT doc_id,
                       unnest(list_transform(range(1, greatest(length(t) - 2, 1) + 1),
                              i -> substr(t, CAST(i AS INT), 3))) AS shingle
                FROM d
            ) WHERE length(shingle) = 3
        ), sz AS (
            SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
        ), inter AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
            FROM sh a JOIN sh b USING (shingle)
            WHERE a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT id_a, id_b, jaccard FROM (
            SELECT id_a, id_b,
                   round(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 6) AS jaccard
            FROM inter
            JOIN sz sa ON sa.doc_id = id_a
            JOIN sz sb ON sb.doc_id = id_b
        ) WHERE jaccard >= {threshold}
    """

    # (doc_ngram_pairs is assigned below, after minhash_pairs_sql is
    # defined — the r6 entry unions the exact-Jaccard leg with the
    # incremental-index probe leg.)

    # connected components as a recursive transitive-closure CTE over
    # the same exact-Jaccard pair set: reach(v) = every vertex reachable
    # from v, cluster = min reachable id (bounded: dup components are
    # small template families at this τ)
    sql["doc_dup_clusters"] = f"""
        WITH RECURSIVE pairs AS (
            {ngram_pairs_sql(0.5)}
        ), edges AS (
            SELECT id_a AS s, id_b AS d FROM pairs
            UNION
            SELECT id_b, id_a FROM pairs
        ), reach(v, r) AS (
            SELECT s, s FROM (SELECT DISTINCT s FROM edges)
            UNION
            SELECT e.s, reach.r FROM edges e JOIN reach ON reach.v = e.d
        )
        SELECT v AS doc_id, min(r) AS cluster_id FROM reach GROUP BY v
    """

    # dedup pass output: same recursive-CTE components, then drop every
    # non-canonical cluster member from the corpus
    sql["doc_dedup_canonical"] = f"""
        WITH RECURSIVE pairs AS (
            {ngram_pairs_sql(0.5)}
        ), edges AS (
            SELECT id_a AS s, id_b AS d FROM pairs
            UNION
            SELECT id_b, id_a FROM pairs
        ), reach(v, r) AS (
            SELECT s, s FROM (SELECT DISTINCT s FROM edges)
            UNION
            SELECT e.s, reach.r FROM edges e JOIN reach ON reach.v = e.d
        ), cl AS (
            SELECT v AS doc_id, min(r) AS cluster_id FROM reach GROUP BY v
        )
        SELECT d.doc_id, md5(d.text) AS text_md5
        FROM documents d
        LEFT JOIN cl ON cl.doc_id = d.doc_id
        WHERE d.doc_id % 5 = 0   -- same docs subset the Spark side scans
          AND (cl.doc_id IS NULL OR cl.doc_id = cl.cluster_id)
    """

    # decontamination oracle: same distinct word-3-grams per doc on both
    # sides, inner join on the gram STRING (Spark joins on the same
    # strings), pair count >= 5
    sql["doc_contamination"] = """
        WITH t AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                               x -> x != '') AS toks
            FROM documents
        ), g AS (
            SELECT doc_id, unnest(list_distinct(list_transform(
                       range(1, greatest(len(toks) - 2, 0) + 1),
                       i -> array_to_string(
                           list_slice(toks, CAST(i AS INT), CAST(i + 2 AS INT)),
                           ' ')))) AS gram
            FROM t WHERE len(toks) >= 3
        ), corpus AS (
            SELECT * FROM g WHERE doc_id % 10 != 1
        ), bench AS (
            SELECT * FROM g WHERE doc_id % 10 = 1
        )
        SELECT c.doc_id AS corpus_id, b.doc_id AS bench_id,
               count(*) AS shared
        FROM corpus c JOIN bench b USING (gram)
        GROUP BY 1, 2
        HAVING count(*) >= 5
    """

    # cluster-keyed split: same recursive components, then the md5 fold
    # function applied to the CANONICAL id (singletons = own doc_id)
    sql["doc_cluster_split"] = f"""
        WITH RECURSIVE pairs AS (
            {ngram_pairs_sql(0.5)}
        ), edges AS (
            SELECT id_a AS s, id_b AS d FROM pairs
            UNION
            SELECT id_b, id_a FROM pairs
        ), reach(v, r) AS (
            SELECT s, s FROM (SELECT DISTINCT s FROM edges)
            UNION
            SELECT e.s, reach.r FROM edges e JOIN reach ON reach.v = e.d
        ), clusters AS (
            SELECT v AS doc_id, min(r) AS cluster_id FROM reach GROUP BY v
        ), keyed AS (
            SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id
            FROM documents d LEFT JOIN clusters c USING (doc_id)
            WHERE d.doc_id % 5 = 0
        )
        SELECT doc_id, cluster_id,
               CASE WHEN b < 80 THEN 'train'
                    WHEN b < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM (
            SELECT doc_id, cluster_id,
                   CAST(('0x' || substring(md5(CAST(cluster_id AS VARCHAR)), 1, 8))
                        AS UBIGINT) % 100 AS b
            FROM keyed
        )
    """

    # MinHash-LSH pairs, recomputed END-TO-END in SQL (hash_mode='md5'):
    # KM base hash from md5('42' || shingle) hex halves (h2 forced odd),
    # g_i = (h1 + i*h2) mod 2^32, 32 min-aggregates → signature; band
    # keys are the EXACT 4-slice tuples (Spark buckets by xxhash64 of
    # the slice — equal modulo 2^-64 collisions, and any pair at est ≥
    # 0.8 has ≥ 26 equal positions ⇒ ≤ 6 unequal ⇒ by pigeonhole ≥ 2
    # fully-equal bands, so the two groupings emit identical pairs);
    # same >200 bucket cap; est = equal-position fraction.
    _mh_mins = ", ".join(
        f"min((h1 + {i} * h2) % 4294967296) AS mh{i}" for i in range(32)
    )
    _mh_keys = ", ".join(
        "concat_ws(',', " + ", ".join(f"mh{4 * b + j}" for j in range(4)) + ")"
        for b in range(8)
    )
    _mh_eq = " + ".join(
        f"(CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END)" for i in range(32)
    )
    def minhash_pairs_sql(where: str = "TRUE") -> str:
        return f"""
        WITH d AS (
            SELECT doc_id, {_NORM} AS t FROM documents WHERE {where}
        ), sh AS (
            SELECT DISTINCT doc_id, shingle FROM (
                SELECT doc_id,
                       unnest(list_transform(range(1, greatest(length(t) - 2, 1) + 1),
                              i -> substr(t, CAST(i AS INT), 3))) AS shingle
                FROM d
            ) WHERE length(shingle) = 3
        ), h AS (
            SELECT doc_id,
                   CAST(('0x' || substring(md5('42' || shingle), 1, 8)) AS UBIGINT)
                       AS h1,
                   CAST(('0x' || substring(md5('42' || shingle), 9, 8)) AS UBIGINT)
                       | 1 AS h2
            FROM sh
        ), sig AS (
            SELECT doc_id, {_mh_mins} FROM h GROUP BY doc_id
        ), bands AS (
            SELECT doc_id,
                   CAST(unnest(range(0, 8)) AS INT) AS band,
                   unnest([{_mh_keys}]) AS key
            FROM sig
        ), hot AS (
            SELECT band, key FROM bands GROUP BY band, key HAVING count(*) > 200
        ), cold AS (
            SELECT b.* FROM bands b ANTI JOIN hot USING (band, key)
        ), cand AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM cold a JOIN cold b USING (band, key)
            WHERE a.doc_id < b.doc_id
        )
        SELECT id_a, id_b, est_jaccard FROM (
            SELECT id_a, id_b, round(({_mh_eq}) / 32.0, 6) AS est_jaccard
            FROM cand
            JOIN sig sa ON sa.doc_id = id_a
            JOIN sig sb ON sb.doc_id = id_b
        ) WHERE est_jaccard >= 0.8
    """

    sql["doc_minhash_pairs"] = minhash_pairs_sql()

    # doc_ngram_pairs r6: exact-Jaccard leg + the incremental-index leg.
    # The probe path (corpus index + increment probe) provably equals
    # the one-shot MinHash operator over the union restricted to pairs
    # touching an increment doc (tests/test_pipeline_ops.py parity,
    # incl. the hot-bucket cap counting corpus+increment), so the
    # oracle is the SAME end-to-end SQL recompute over the %5 subset,
    # restricted to multiples of 10.
    sql["doc_ngram_pairs"] = f"""
        SELECT id_a, id_b, jaccard AS sim, 'ngram' AS leg
        FROM ({ngram_pairs_sql(0.5)})
        UNION ALL
        SELECT id_a, id_b, est_jaccard AS sim, 'minhash_incr' AS leg
        FROM ({minhash_pairs_sql("doc_id % 5 = 0")})
        WHERE id_a % 10 = 0 OR id_b % 10 = 0
    """

    # recall oracle: the LSH operating point (k=64, bands=32) catches a
    # j>=0.9 pair with probability 1-(1-j^2)^32 >= 1-1e-23 — recall over
    # the exact pair set is deterministically 1.0
    sql["doc_lsh_recall"] = f"""
        WITH pairs AS ({ngram_pairs_sql(0.9, modulus=2)})
        SELECT count(*) AS n_true, count(*) AS n_found,
               round(1.0, 6) AS recall
        FROM pairs
    """

    # shared exact-top-k base: emb_topk methodizes it; emb_lsh_recall's
    # `exact` CTE keeps the unmethodized single set
    _topk_base = """
        WITH q AS (
            SELECT vec_id AS query_id, embedding AS query_vec
            FROM embeddings WHERE vec_id < 3
        ), scored AS (
            SELECT q.query_id, e.vec_id,
                   round(list_cosine_similarity(
                       CAST(e.embedding AS DOUBLE[]),
                       CAST(q.query_vec AS DOUBLE[])), 6) AS cosine
            FROM embeddings e CROSS JOIN q
        )
        SELECT query_id, vec_id, cosine, rank FROM (
            SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY cosine DESC, vec_id ASC) AS INT) AS rank
            FROM scored
        ) WHERE rank <= 5
    """

    # brute force and exhaustive IVF provably return the SAME rows, so
    # the merged entry is the base set under each method label
    sql["emb_topk"] = f"""
        WITH base AS ({_topk_base})
        SELECT base.*, m.method
        FROM base CROSS JOIN (VALUES ('brute'), ('ivf_exhaustive')) m(method)
    """

    # SemDeDup replay: same union corpus, md5-ordered zero-iteration
    # seeds, argmax-cosine assignment (ties -> lower centroid id),
    # within-cluster pairs at tau=0.95, drop the higher-rounded-cent_sim
    # member (pairs ordered id_a < id_b, so ties drop the higher id)
    sql["emb_semantic_dedup"] = """
        WITH c AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
            UNION ALL
            SELECT vec_id + 100000, CAST(embedding AS DOUBLE[])
            FROM embeddings WHERE vec_id < 50
        ), seeds AS (
            SELECT CAST(row_number() OVER (
                       ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
                   ) AS INT) - 1 AS centroid_id,
                   v AS cv
            FROM c
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
            LIMIT 16
        ), assigned AS (
            SELECT vec_id, v, centroid_id,
                   round(sim_raw, 6) + 0.0 AS cent_sim
            FROM (
                SELECT c.vec_id, c.v, s.centroid_id,
                       list_cosine_similarity(c.v, s.cv) AS sim_raw,
                       row_number() OVER (PARTITION BY c.vec_id
                           ORDER BY list_cosine_similarity(c.v, s.cv) DESC,
                                    s.centroid_id ASC) AS rn
                FROM c CROSS JOIN seeds s
            ) WHERE rn = 1
        ), dropped AS (
            SELECT DISTINCT CASE WHEN a.cent_sim > b.cent_sim
                                 THEN a.vec_id ELSE b.vec_id END AS vec_id
            FROM assigned a JOIN assigned b
              ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
            WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.95
        )
        SELECT a.vec_id, a.centroid_id, a.cent_sim,
               d.vec_id IS NULL AS keep
        FROM assigned a LEFT JOIN dropped d ON a.vec_id = d.vec_id
    """

    # exact O(n²) cosine pairs over corpus + planted twins: catches both
    # a silent LSH miss (twin pairs MUST collide in every band) and any
    # spurious pair the verify step failed to filter
    sql["emb_near_dups"] = """
        WITH c AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
            UNION ALL
            SELECT vec_id + 100000, CAST(embedding AS DOUBLE[])
            FROM embeddings WHERE vec_id < 50
        )
        SELECT id_a, id_b, cosine FROM (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(a.v, b.v), 6) AS cosine
            FROM c a JOIN c b ON a.vec_id < b.vec_id
        ) WHERE cosine >= 0.95
    """

    # LSH recall oracle: at bands == n_planes the LSH candidate set
    # provably contains every exact top-k row (see q_emb_lsh_recall), so
    # n_found == n_true and recall is deterministically 1.0
    sql["emb_lsh_recall"] = f"""
        WITH exact AS ({_topk_base})
        SELECT count(*) AS n_true, count(*) AS n_found,
               round(1.0, 6) AS recall
        FROM exact
    """

    # q8: the int8 quantizer recomputed per element — scale captured as
    # an outer column in the list lambda; ties-away-from-zero round()
    # matches Spark's HALF_UP on both signs
    sql["emb_bundle"] = """
        WITH base AS (
            SELECT vec_id, label,
                   CAST(embedding AS DOUBLE[]) AS e,
                   list_max(list_transform(
                       CAST(embedding AS DOUBLE[]), x -> abs(x))) AS scale
            FROM embeddings
        ), bundled AS (
            SELECT vec_id,
                   list_concat(
                       list_transform(e, x -> round(x, 4) + 0.0),
                       [round(sqrt(list_aggregate(
                            list_transform(e, x -> x * x),
                            'sum')), 4) + 0.0,
                        CAST(label AS DOUBLE)]
                   ) AS features,
                   list_concat(
                       CASE WHEN scale > 0
                            THEN list_transform(
                                e, x -> CAST(round(x / scale * 127) AS INT))
                            ELSE list_transform(e, x -> 0) END,
                       [CAST(NULL AS INT), CAST(NULL AS INT)]
                   ) AS q8s
            FROM base
        )
        SELECT vec_id,
               CAST(unnest(range(0, len(features))) AS INT) AS pos,
               unnest(features) AS value,
               unnest(q8s) AS q8
        FROM bundled
    """

    sql["ev_incremental_refresh"] = f"""
        WITH affected AS (
            SELECT DISTINCT user_id FROM events WHERE event_id % 97 = 0
        ), sub AS (
            SELECT e.* FROM events e JOIN affected USING (user_id)
        ), flagged AS (
            SELECT *,
                   CASE WHEN lag(ts) OVER ({ev_w}) IS NULL THEN 0
                        WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER ({ev_w})
                             > {SESSION_GAP_S} * 1000000 THEN 1
                        ELSE 0 END AS is_new
            FROM sub
        )
        SELECT event_id, user_id,
               count(*) OVER ({ev_w} ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS n_so_far,
               round(coalesce(sum(value) OVER
                   ({ev_w} ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0), 6)
                   AS cum_value,
               CAST(sum(is_new) OVER ({ev_w}
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT)
                   AS session_id
        FROM flagged
    """

    onehot = ",\n                ".join(
        f"CASE WHEN lang = '{l}' THEN 1.0 ELSE 0.0 END" for l in DOC_LANGS
    )
    sql["doc_sparse_features"] = f"""
        WITH prof AS (
            SELECT doc_id,
               [{onehot},
                CAST({_TOKENS} AS DOUBLE),
                {quality}] AS dense
            FROM documents
        ), expl AS (
            SELECT doc_id, CAST(len(dense) AS INT) AS size,
                   CAST(unnest(range(0, len(dense))) AS INT) AS idx,
                   unnest(dense) AS val
            FROM prof
        )
        SELECT doc_id, size, idx, round(val, 6) + 0.0 AS val
        FROM expl WHERE val != 0
    """

    sql["ev_feature_dag"] = session_cte + f"""
        SELECT event_id, user_id,
               lag(event_type, 1) OVER ({ev_w}) AS prev_event_type,
               round((epoch_us(ts) - lag(epoch_us(ts), 1) OVER ({ev_w})) / 1000000.0, 6)
                   AS ts_delta_prev_s,
               count(*) OVER ({ev_w} ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS n_so_far,
               round(coalesce(sum(value) OVER
                   ({ev_w} ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0), 6)
                   AS cum_value,
               round(coalesce(sum(value) OVER
                   ({ev_w} ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING), 0), 6)
                   AS value_sum_last_10,
               coalesce(count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                   RANGE BETWEEN 600000000 PRECEDING AND 1 PRECEDING), 0)
                   AS n_events_600s,
               session_id,
               round(last_value(CASE WHEN event_type = 'click' THEN value END
                   IGNORE NULLS) OVER ({ev_w}
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 6)
                   AS last_click_value,
               lag(event_type, 2) OVER ({ev_w}) AS event_type_lag_2,
               count(DISTINCT event_type) OVER
                   ({ev_w} ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)
                   AS n_types_last_10,
               CASE WHEN ts IS NULL THEN NULL  -- engine: no reference instant
                    ELSE round(coalesce(list_sum(list_transform(
                        list(struct_pack(us := epoch_us(ts),
                                         v := coalesce(value, 0.0))) OVER
                            ({ev_w} ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING),
                        p -> p.v * exp(-{_lam} * (epoch_us(ts) - p.us))
                    )), 0.0), 6) + 0.0 END AS value_decay_600s
        FROM sessions
    """

    # tr_golden_features: both engines read the CHECKED-IN fixture at
    # TR_FIXTURE_PATH (no run-order dependency — see the constant's
    # comment), and this oracle recomputes the full golden feature
    # suite over the SAME parquet bytes — the north-star artifact's value hash (VERDICT r4
    # #2). Every feature is the window-SQL twin of features/turns.py;
    # trailing frames end at 1 PRECEDING (leakage contract), the 600s
    # frame ends at 1 µs PRECEDING on the epoch_us ordering.
    tr_w = "PARTITION BY conv_id ORDER BY turn_idx"
    sql["tr_golden_features"] = f"""
        WITH src AS (
            SELECT * FROM read_parquet('{TR_FIXTURE_PATH}/*.parquet')
        ), flagged AS (
            SELECT *,
                   CASE WHEN lag(ts) OVER ({tr_w}) IS NULL THEN 0
                        WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER ({tr_w})
                             > 1800 * 1000000 THEN 1
                        ELSE 0 END AS is_new
            FROM src
        ), sessions AS (
            SELECT *,
                   CAST(sum(is_new) OVER ({tr_w}
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT)
                       AS session_id
            FROM flagged
        )
        SELECT conv_id, turn_idx,
               CAST(length(text) AS INT) AS text_len,
               CAST(CASE WHEN role = 'tool' THEN 1 ELSE 0 END AS INT)
                   AS is_tool_turn,
               lag(role, 1) OVER ({tr_w}) AS prev_role,
               lag(role, 3) OVER ({tr_w}) AS role_lag_3,
               round((epoch_us(ts) - lag(epoch_us(ts), 1) OVER ({tr_w}))
                     / 1000000.0, 6) + 0.0 AS ts_delta_prev,
               CAST(count(*) OVER ({tr_w}
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS INT)
                   AS turns_so_far,
               CAST(coalesce(sum(CASE WHEN role = 'tool' THEN 1 ELSE 0 END)
                   OVER ({tr_w}
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS INT)
                   AS cum_tool_calls,
               CAST(coalesce(sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END)
                   OVER ({tr_w}
                   ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING), 0) AS INT)
                   AS user_turns_last_10,
               CAST(coalesce(sum(CASE WHEN role = 'tool' THEN 1 ELSE 0 END)
                   OVER ({tr_w}
                   ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING), 0) AS INT)
                   AS tool_calls_last_10,
               CAST(coalesce(sum(CASE WHEN role = 'tool' THEN 1 ELSE 0 END)
                   OVER (PARTITION BY conv_id ORDER BY epoch_us(ts)
                   RANGE BETWEEN 600000000 PRECEDING AND 1 PRECEDING), 0) AS INT)
                   AS tool_calls_last_600s,
               session_id,
               CAST(row_number() OVER (PARTITION BY conv_id, session_id
                   ORDER BY turn_idx) - 1 AS INT) AS turn_in_session,
               min(epoch_us(ts)) OVER (PARTITION BY conv_id, session_id)
                   AS session_start_us
        FROM sessions
    """

    return sql
