"""Scale/skew evidence for pack_sequences (VERDICT r5 #2): measure the
operator on a heavy-tailed token-length corpus at several bucket sizes
(docs-per-bucket is THE scale knob — applyInPandas materializes one
bucket per task), plus a pure-Python microbench of the r6 bisect
best-fit against the r5 linear first-fit scan it replaced. Writes the
"## Sequence packing" section of BENCH/SKEW.md.

Usage: python tools/bench_pack.py [--n-docs 4000000]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SEC_PACK = "## Sequence packing (bucket sizing + bisect best-fit)"


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


def _skewed_lengths(seed: int, n: int):
    """Deterministic heavy-tailed length column, JVM-side: ~90% short
    (50-500 tok), ~9% medium (500-4k), ~1% long (4k-64k, oversize vs
    the 8192 budget) — the shape of a web-scrape corpus."""
    from pyspark.sql import functions as F

    h = F.pmod(F.xxhash64(F.lit(seed), F.col("id")), F.lit(10_000))
    h2 = F.pmod(F.xxhash64(F.lit(seed + 1), F.col("id")), F.lit(1_000_000))
    return (
        F.when(h < 9_000, 50 + h2 % 450)
        .when(h < 9_900, 500 + h2 % 3_500)
        .otherwise(4_000 + h2 % 60_000)
        .cast("long")
    )


def _py_microbench() -> list[str]:
    """Linear first-fit (r5) vs bisect best-fit (r6) on one in-memory
    bucket of skewed lengths — the per-bucket algorithmic story."""
    import random
    from bisect import bisect_left, insort

    rng = random.Random(42)

    def lengths(n):
        out = []
        for _ in range(n):
            r = rng.random()
            if r < 0.90:
                out.append(rng.randint(50, 500))
            elif r < 0.99:
                out.append(rng.randint(500, 4000))
            else:
                out.append(rng.randint(4000, 64000))
        out.sort(reverse=True)
        return out

    MAXL = 8192

    def linear_ffd(ls):
        bins = []
        for ln in ls:
            if ln > MAXL:
                bins.append(0)
                continue
            for i, cap in enumerate(bins):
                if cap >= ln:
                    bins[i] = cap - ln
                    break
            else:
                bins.append(MAXL - ln)
        return len(bins)

    def bisect_bfd(ls):
        open_bins = []
        n_bins = 0
        for ln in ls:
            if ln > MAXL:
                n_bins += 1
                continue
            i = bisect_left(open_bins, (ln, -1))
            if i < len(open_bins):
                cap, b = open_bins.pop(i)
                if cap > ln:
                    insort(open_bins, (cap - ln, b))
            else:
                if ln < MAXL:
                    insort(open_bins, (MAXL - ln, n_bins))
                n_bins += 1
        return n_bins

    rows = []
    for n in (50_000, 200_000):
        ls = lengths(n)
        t0 = time.perf_counter()
        nb_l = linear_ffd(ls)
        t_lin = time.perf_counter() - t0
        t0 = time.perf_counter()
        nb_b = bisect_bfd(ls)
        t_bis = time.perf_counter() - t0
        rows.append(
            f"| {n:,} | {t_lin:.2f} | {t_bis:.2f} | "
            f"{t_lin / max(t_bis, 1e-9):.0f}x | {nb_l:,} / {nb_b:,} |"
        )
    # bisect-only at 1M: the size one bucket is ALLOWED to reach under
    # the default max_docs_per_bucket
    ls = lengths(1_000_000)
    t0 = time.perf_counter()
    nb = bisect_bfd(ls)
    t_1m = time.perf_counter() - t0
    rows.append(f"| 1,000,000 | (skipped) | {t_1m:.2f} | — | {nb:,} |")
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=4_000_000)
    args = ap.parse_args()

    print("python microbench (linear first-fit vs bisect best-fit)...")
    micro_rows = _py_microbench()
    for r in micro_rows:
        print(" ", r)

    from feagen_spark.session import get_spark

    spark = get_spark(
        master="local[32]", shuffle_partitions=32,
        extra_conf={"spark.driver.memory": "48g"},
    )
    from pyspark.sql import functions as F  # noqa: F401

    from feagen_spark.operators.cleaning import pack_sequences

    docs = (
        spark.range(args.n_docs)
        .withColumn("n_tok", _skewed_lengths(7, args.n_docs))
        .withColumnRenamed("id", "doc_id")
        .repartition(64)
        .localCheckpoint()
    )
    docs.count()

    spark_rows = []
    for n_buckets in (64, 256, 1024):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            pack_sequences(
                docs, "doc_id", "n_tok", max_len=8192, n_buckets=n_buckets
            ).write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        per_bucket = args.n_docs // n_buckets
        spark_rows.append(
            f"| {n_buckets} | {per_bucket:,} | {best:.2f} |"
        )
        print(f"  n_buckets={n_buckets}: {best:.2f}s")

    section = f"""{SEC_PACK}

pack_sequences on a deterministic heavy-tailed corpus ({args.n_docs:,}
docs: ~90% 50-500 tok, ~9% 500-4k, ~1% 4k-64k; max_len=8192, so the
tail is oversize singletons), local[32], best of 2, noop sink. The
scale knob is docs-per-bucket — one applyInPandas task materializes a
whole bucket, and per-bucket packing is O(n log n) bisect best-fit
(r6), so wall time stays flat as buckets grow coarser until a bucket
no longer fits a task:

| n_buckets | docs/bucket | sec (best of 2) |
|---|---|---|
{chr(10).join(spark_rows)}

Per-bucket algorithm (pure-Python microbench, one bucket, same length
mix): the r5 linear first-fit scan is O(docs x open-bins) — open bins
number ~total_tokens/max_len, so a heavy-tailed million-doc bucket is
quadratic-ish — while the r6 bisect best-fit stays n log n:

| docs in bucket | linear first-fit s | bisect best-fit s | speedup | bins (ffd/bfd) |
|---|---|---|---|---|
{chr(10).join(micro_rows)}

`rows_hint`/`max_docs_per_bucket` derive n_buckets from corpus size so
a bucket never exceeds ~10^6 docs by default (tests enforce the
contract). Regenerate: `python tools/bench_pack.py`.
"""
    _replace_section(REPO / "BENCH" / "SKEW.md", SEC_PACK, section)
    print("BENCH/SKEW.md updated")


if __name__ == "__main__":
    main()
