"""Write the demo inputs conf/run.yml expects (transcripts + labels),
so the documented spark-submit drive runs out of the box:

    python jobs/make_demo_inputs.py
    ./tools/make_dist.sh
    spark-submit --master local[4] --py-files dist/feagen_spark.zip \
        jobs/run_features.py --config conf/run.yml
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TRANSCRIPTS = "/tmp/feagen_demo_transcripts"
LABELS = "/tmp/feagen_demo_labels"
DOCS_BASE = "/tmp/feagen_demo_docs_base"
DOCS_STREAM = "/tmp/feagen_demo_docs_stream"
BENCH = "/tmp/feagen_demo_bench"
TARGET = "/tmp/feagen_demo_target"


def main() -> None:
    import shutil

    from pyspark.sql import functions as F

    from feagen_spark.datagen.transcripts import labels, transcripts
    from feagen_spark.session import get_spark

    spark = get_spark(
        app_name="feagen_demo_inputs", master="local[4]", shuffle_partitions=4
    )
    df = transcripts(spark, n_conv=100, giant_convs=1, giant_turns=500)
    df.write.mode("overwrite").parquet(TRANSCRIPTS)
    labels(spark, df).write.mode("overwrite").parquet(LABELS)

    # conf/ingest.yml inputs: a deduped base corpus + a two-file doc
    # stream exercising every drop class. Texts are a pure function of
    # the id: residue id%7 < 5 -> a base-template body (dup of base doc
    # `residue`); residue >= 5 -> a "unique" body keyed on id%10 (docs
    # sharing that key are dups of each other across batches).
    # bodies must differ in MOST of their 3-gram shingles (a one-digit
    # edit would leave jaccard ~0.9 and everything would near-dup
    # everything at tau=0.7)
    base_bodies = [
        "the feature engine computes trailing windows over each conversation",
        "parquet scan pruning relies on partition directories and footers",
        "broadcast joins keep the small dimension on every executor core",
        "watermarks bound streaming state for late arriving session events",
        "checkpoint manifests record lineage fingerprints per feature node",
    ]
    unique_bodies = [
        "zero weights decay exponentially with the configured half life",
        "one salted aggregation splits the hottest conversation keys",
        "two phase chunked as of joins cap the per task row count",
        "three gram shingles feed the minhash signature aggregation",
        "four byte codes quantize embeddings for the storage tier",
        "five stage pipelines compose dedup quality and packing steps",
        "six band lsh buckets admit candidate pairs for verification",
        "seven day retention vacuums stale checkpoint aside directories",
        "eight executors share one shuffle exchange in the golden plan",
        "nine probes read only their centroid lists from the ivf index",
    ]

    def docs(ids: list[int]):
        rows = spark.createDataFrame([(i,) for i in ids], "doc_id long")
        template = F.element_at(
            F.array(*[F.lit(s) for s in base_bodies]),
            (F.col("doc_id") % 7 + 1).cast("int"),
        )
        unique = F.element_at(
            F.array(*[F.lit(s) for s in unique_bodies]),
            (F.col("doc_id") % 10 + 1).cast("int"),
        )
        return rows.select(
            "doc_id",
            F.when(F.col("doc_id") % 7 < 5, template)
            .otherwise(unique)
            .alias("text"),
        )

    base = docs(list(range(5)))  # one doc per base template -> deduped
    base.write.mode("overwrite").parquet(DOCS_BASE)
    shutil.rmtree(DOCS_STREAM, ignore_errors=True)
    # batch 0: 100-102 base dups; 103/104 unique keeps (u3/u4);
    #          107 intra dup of 100's template (both drop via base)
    docs([100, 101, 102, 103, 104, 107]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(DOCS_STREAM)
    # batch 1: 201/202 unique keeps (u1/u2); 243 = u3 -> dup of KEPT
    #          103 through the index (cross-batch); 200/204 base dups
    docs([200, 201, 202, 204, 243]).coalesce(1).write.mode(
        "append"
    ).parquet(DOCS_STREAM)

    # conf/curate.yml's bench set: a slice of the sf0.001 documents
    # table, so the curation demo's decontaminate stage has real
    # contamination to drop (the corpus contains these very docs)
    bench = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).where(F.col("doc_id") % 10 == 1)
    bench.select("doc_id", "text").write.mode("overwrite").parquet(BENCH)

    # conf/curate.yml's DSIR target set: a disjoint slice of the same
    # corpus acting as the "small high-quality exemplar corpus" the
    # dsir: stage resamples toward (doc_id % 10 == 2 never overlaps
    # the bench slice above)
    target = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).where(F.col("doc_id") % 10 == 2)
    target.select("doc_id", "text").write.mode("overwrite").parquet(TARGET)

    print(
        f"wrote {TRANSCRIPTS} ({df.count()} turns), {LABELS}, "
        f"{DOCS_BASE} (5 docs), {DOCS_STREAM} (2 stream files; "
        f"expected keeps: 103 104 201 202), {BENCH} "
        f"({bench.count()} bench docs) and {TARGET} "
        f"({target.count()} DSIR target docs)"
    )


if __name__ == "__main__":
    main()
