"""Scale evidence for the persisted-MinHash-index incremental dedup
path (r6): at 100 TB the alternative to `minhash_probe_increment` is
re-running the one-shot `minhash_lsh_pairs` over corpus ∪ increment on
every ingest batch — re-shingling and re-hashing the ENTIRE corpus to
dedup a batch that is a fraction of a percent of it. This measures both
on the sf0.1 documents table with a 1-in-100 increment split, plus the
one-time index build the incremental path amortizes. Writes the
"## Incremental dedup" section of BENCH/SKEW.md.

Usage: python tools/bench_incr.py [--sf-dir /root/testdata/sf0.1]

NB: run on an idle box (load < 1) — same weather rules as bench.py.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SEC = "## Incremental dedup (persisted MinHash index vs full re-dedup)"

KW = dict(k=32, bands=8, n=3, threshold=0.8)


def _replace_section(md_path: Path, header: str, section: str) -> None:
    import re

    text = md_path.read_text()
    if header in text:
        text = re.sub(
            re.escape(header) + r".*?(?=\n## |\Z)",
            lambda _m: section,
            text,
            flags=re.S,
        )
    else:
        text = text.rstrip() + "\n\n" + section
    md_path.write_text(text)


def _time(fn, reps: int = 2) -> tuple[float, float]:
    """(best, spread) of `reps` runs."""
    runs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    best = min(runs)
    return best, max(runs) / max(best, 1e-9)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument(
        "--scale",
        type=int,
        default=20,
        help="corpus replication factor (max 26): sf0.1 has only 5k "
        "docs, where per-job overhead hides the shingle-cost asymmetry "
        "the operator exists for; each doc becomes `scale` variants "
        "under distinct Caesar shifts — shingle sets are disjoint "
        "ACROSS variants (no synthetic dup cliques) while the corpus's "
        "own template-dup structure is preserved WITHIN each variant — "
        "same synthesis spirit as tools/bench_skew*.py",
    )
    args = ap.parse_args()

    from feagen_spark.operators import dedup as D
    from feagen_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark(
        master="local[32]", shuffle_partitions=32, app_name="bench_incr"
    )
    base = spark.read.parquet(f"{args.sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    if not 1 <= args.scale <= 26:
        raise SystemExit("--scale must be in [1, 26] (distinct shifts)")
    alpha = "abcdefghijklmnopqrstuvwxyz"
    shifted = F.translate(F.col("text"), alpha, alpha)
    for r in range(1, args.scale):
        shifted = F.when(
            F.col("__rep") == r,
            F.translate(F.col("text"), alpha, alpha[r:] + alpha[:r]),
        ).otherwise(shifted)
    docs = (
        base.crossJoin(
            spark.range(args.scale).select(F.col("id").alias("__rep"))
        )
        .select(
            (F.col("doc_id") * args.scale + F.col("__rep")).alias("doc_id"),
            shifted.alias("text"),
        )
        .repartition(64)  # driver parquet is single-row-group
    )
    docs = docs.localCheckpoint()  # pin: every leg reads identical bytes
    n_docs = docs.count()
    corpus = docs.where(F.col("doc_id") % 100 != 0)
    inc = docs.where(F.col("doc_id") % 100 == 0)
    n_inc = inc.count()

    tmp = tempfile.mkdtemp(prefix="bench_incr_")
    idx_path = str(Path(tmp) / "mh_index")

    def run_full():
        D.minhash_lsh_pairs(docs, max_bucket=200, **KW).write.mode(
            "overwrite"
        ).format("noop").save()

    def run_build():
        D.write_minhash_index(
            corpus, idx_path, k=KW["k"], bands=KW["bands"], n=KW["n"]
        )

    def run_probe():
        D.minhash_probe_increment(
            spark, idx_path, inc, max_bucket=200, **KW
        ).write.mode("overwrite").format("noop").save()

    # warm the JVM/Python workers on the cheap leg first
    run_build()

    full_s, full_spread = _time(run_full, args.reps)
    build_s, build_spread = _time(run_build, args.reps)
    probe_s, probe_spread = _time(run_probe, args.reps)
    shutil.rmtree(tmp, ignore_errors=True)

    speedup = full_s / max(probe_s, 1e-9)
    out = {
        "metric": "incremental_dedup_sf01",
        "n_docs": n_docs,
        "n_increment": n_inc,
        "full_rededup_sec": round(full_s, 3),
        "index_build_sec": round(build_s, 3),
        "probe_sec": round(probe_s, 3),
        "probe_speedup_vs_full": round(speedup, 2),
        "spreads": {
            "full": round(full_spread, 2),
            "build": round(build_spread, 2),
            "probe": round(probe_spread, 2),
        },
    }
    print(json.dumps(out))

    section = f"""{SEC}

Every-ingest-batch alternative at 100 TB: re-run the one-shot
`minhash_lsh_pairs` over corpus ∪ increment — re-shingling the whole
corpus to dedup a {100 * n_inc / max(n_docs, 1):.1f}% batch. The
persisted-index path pays the corpus shingle+signature cost ONCE
(`write_minhash_index`, amortized over every later batch) and each
batch then costs only its own signatures plus a broadcast probe of the
band-partitioned index (the index never shuffles — plan-asserted in
tests/test_plans.py).

sf0.1 documents × {args.scale} Caesar-shift variants ({n_docs:,} docs —
shingle sets disjoint across variants, the corpus's own template-dup
structure preserved within each; increment = doc_id % 100 == 0 →
{n_inc:,} docs), k=32 bands=8 τ=0.8 max_bucket=200, local[32],
best-of-{args.reps}:

| leg | sec | spread |
|---|---|---|
| full re-dedup (corpus ∪ increment) | {full_s:.2f} | {full_spread:.2f}x |
| index build (one-time, corpus only) | {build_s:.2f} | {build_spread:.2f}x |
| incremental probe (per batch) | {probe_s:.2f} | {probe_spread:.2f}x |

**Per-batch cost drops {speedup:.1f}x** (probe vs full re-dedup); the
one-time index build is ~the cost of a single full run, repaid after
the first batch. At 100 TB the gap widens further: the full path
re-reads and re-hashes the corpus text every batch (I/O-bound on the
whole corpus), while the probe reads only the increment's text plus a
column-pruned (id, signature, band, bucket) index scan.

Regenerate: `python tools/bench_incr.py` (idle box).
"""
    _replace_section(REPO / "BENCH" / "SKEW.md", SEC, section)
    spark.stop()


if __name__ == "__main__":
    main()
