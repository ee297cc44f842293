"""spark-submit entry for the continuous-ingest dedup pipeline: probe
each arriving batch of documents against the persisted MinHash index,
keep only near-dup-free survivors, and grow the index/corpus — the
deployment wrapper around
``feagen_spark.streaming.incremental.streaming_ingest_dedup``.

    python jobs/make_demo_inputs.py          # writes the demo doc stream
    ./tools/make_dist.sh
    spark-submit --master local[4] --py-files dist/feagen_spark.zip \
        jobs/ingest_dedup.py --config conf/ingest.yml

Config keys (conf/ingest.yml is the runnable demo):

- ``index_path`` / ``corpus_path`` / ``checkpoint``: the three state
  locations. The index + corpus are ``ingest_batch``-partitioned,
  replay-idempotent sinks; the checkpoint is the streaming engine's.
- ``bootstrap.input_path`` (optional): an EXISTING deduped corpus to
  band into the index (``ingest_batch=-1``) before the stream starts —
  skipped when the index already has data, so restarts are cheap.
- ``stream.input_glob``: file-source glob of arriving document parquet.
  ``stream.max_files_per_trigger`` bounds batch size;
  ``stream.available_now`` (default true) drains what exists and
  stops — set false for a long-running ``processing_interval`` stream.
- ``minhash``: k / bands / n / threshold / max_bucket / hash_mode /
  seed — MUST stay fixed for the life of one index (band keys are a
  pure function of them).
- ``monitor`` (optional): ``{"path": ..., "capacity": N,
  "threshold": T}`` — append a Misra-Gries token summary of each
  batch's survivors (the incremental heavy-hitter table) and report
  the exact tokens with corpus count >= T in the final JSON line via
  ``heavy_hitters_from_summaries`` (history never re-summarized).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from run_features import load_config  # noqa: E402 (same config dialect)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    args = ap.parse_args()
    cfg = load_config(args.config)

    from pyspark.sql import SparkSession

    from feagen_spark.operators import dedup as D
    from feagen_spark.operators.incremental import _dynamic_overwrite
    from feagen_spark.streaming.incremental import streaming_ingest_dedup

    spark = SparkSession.builder.appName(
        cfg.get("app_name", "feagen_ingest_dedup")
    ).getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    mh = dict(cfg.get("minhash", {}))
    kw = dict(
        k=int(mh.get("k", 32)),
        bands=int(mh.get("bands", 8)),
        n=int(mh.get("n", 3)),
        threshold=float(mh.get("threshold", 0.7)),
        id_col=mh.get("id_col", "doc_id"),
        text_col=mh.get("text_col", "text"),
        seed=int(mh.get("seed", 42)),
        max_bucket=(
            int(mh["max_bucket"]) if mh.get("max_bucket") is not None else None
        ),
        hash_mode=mh.get("hash_mode", "xxh64"),
    )
    index_path = cfg["index_path"]
    corpus_path = cfg["corpus_path"]

    def _index_rows():
        try:
            return spark.read.parquet(index_path).count()
        except Exception:
            return 0

    bootstrapped = False
    bs = cfg.get("bootstrap")
    if bs and _index_rows() == 0:
        base = spark.read.parquet(bs["input_path"])
        D.write_minhash_index(
            base,
            index_path,
            k=kw["k"],
            bands=kw["bands"],
            n=kw["n"],
            id_col=kw["id_col"],
            text_col=kw["text_col"],
            seed=kw["seed"],
            hash_mode=kw["hash_mode"],
            ingest_batch=-1,
        )
        from pyspark.sql import functions as F

        _dynamic_overwrite(
            base.withColumn("ingest_batch", F.lit(-1)),
            corpus_path,
            ["ingest_batch"],
        )
        bootstrapped = True

    st = cfg.get("stream") or {}
    glob = st["input_glob"]
    # file source needs a schema up front: sniff it from the same glob
    schema = spark.read.parquet(glob).schema
    reader = spark.readStream.schema(schema)
    if st.get("max_files_per_trigger"):
        reader = reader.option(
            "maxFilesPerTrigger", int(st["max_files_per_trigger"])
        )
    stream = reader.parquet(glob)

    mon = cfg.get("monitor") or {}
    if mon:
        kw["monitor_path"] = mon["path"]
        kw["monitor_capacity"] = int(mon.get("capacity", 4096))
    writer = streaming_ingest_dedup(
        stream, index_path, corpus_path, **kw
    ).option("checkpointLocation", cfg["checkpoint"])
    if st.get("available_now", True):
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    else:
        q = writer.trigger(
            processingTime=st.get("processing_interval", "30 seconds")
        ).start()
        q.awaitTermination()

    kept = spark.read.parquet(corpus_path)
    summary = {
        "status": "ok",
        "bootstrapped": bootstrapped,
        "corpus_rows": kept.count(),
        "index_rows": _index_rows(),
        "corpus": corpus_path,
        "index": index_path,
    }
    if mon:
        # exact heavy tokens over the MONITORED batches: merge the
        # appended per-batch summaries, verify against exactly the
        # corpus partitions those summaries cover. The verify side
        # must not include unsummarized batches (the bootstrap corpus,
        # or batches ingested before the monitor was enabled) — the MG
        # absent-item bound only holds for summarized data, so a heavy
        # token living in an unmonitored batch would be silently
        # missing rather than guarded (code-review r6). The covered
        # batch list is reported so a reader can see the scope.
        from pyspark.sql import functions as F

        from feagen_spark.operators.sketches import (
            heavy_hitters_from_summaries,
        )
        from feagen_spark.operators.textstats import _ws_tokens

        try:
            summ = spark.read.parquet(mon["path"])
        except Exception:
            # monitor enabled but no batch ever fired (empty stream)
            summary["heavy_tokens"] = None
            summary["monitored_batches"] = []
        else:
            batches = sorted(
                r["ingest_batch"]
                for r in summ.select("ingest_batch").distinct().collect()
            )
            toks = kept.where(
                F.col("ingest_batch").isin(batches)
            ).select(
                F.explode(_ws_tokens(F.col(kw["text_col"]))).alias("__tok")
            )
            hh = heavy_hitters_from_summaries(
                summ,
                toks,
                "__tok",
                threshold=int(mon.get("threshold", 100)),
            )
            # cap the driver-side report (ADVICE r6 / guide §5): a low
            # threshold over a large token domain would otherwise
            # collect and print an unbounded map — the MG D-bound
            # guards completeness, not result size. The full result
            # stays computable on the cluster; the printed summary
            # carries the top-N plus the total so truncation is loud.
            top_n = int(mon.get("report_top_n", 100))
            top = hh.orderBy(F.col("n").desc(), "item").limit(
                top_n + 1
            ).collect()  # slow-path-ok: bounded by .limit above
            summary["heavy_tokens"] = {
                r["item"]: r["n"] for r in top[:top_n]
            }
            summary["heavy_tokens_truncated"] = len(top) > top_n
            summary["monitored_batches"] = batches
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
