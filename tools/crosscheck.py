"""Local replica of the driver's correctness gate: run each
__spark_entry__.queries() entry on Spark AND its oracle_sql() twin on
DuckDB over the same sf dir; compare row count, column set, and
order-insensitive values.

Usage: python tools/crosscheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        col = df[c]
        if col.dtype == object and len(col) and isinstance(
            col.dropna().iloc[0] if col.notna().any() else None, (list, np.ndarray)
        ):
            df[c] = col.map(
                lambda v: tuple(np.round(np.asarray(v, dtype=float), 6))
                if v is not None
                else None
            )
        elif col.dtype.kind == "f":
            df[c] = col.round(6)
        elif str(col.dtype).startswith("datetime"):
            df[c] = col.astype("datetime64[us]")
    df = df.sort_values(list(df.columns), na_position="first").reset_index(drop=True)
    return df


def compare(name: str, got: pd.DataFrame, exp: pd.DataFrame) -> list[str]:
    problems = []
    if len(got) != len(exp):
        problems.append(f"rows {len(got)} != {len(exp)}")
    if sorted(got.columns) != sorted(exp.columns):
        problems.append(f"cols {sorted(got.columns)} != {sorted(exp.columns)}")
        return problems
    g, e = canon(got), canon(exp)
    if len(g) != len(e):
        return problems
    for c in g.columns:
        gc, ec = g[c], e[c]
        if gc.dtype.kind == "f" or ec.dtype.kind == "f":
            gv = pd.to_numeric(gc, errors="coerce").astype(float).to_numpy()
            ev = pd.to_numeric(ec, errors="coerce").astype(float).to_numpy()
            # rtol MUST be 0 (code-review r6): the numpy default 1e-5
            # scales tolerance with magnitude — a nullable BIGINT
            # epoch-us column lands here as float64 and would tolerate
            # ~4.7 HOURS of drift; counts would tolerate ~10 per
            # million. Values are pre-rounded on both sides, so a flat
            # 1e-6 is the whole contract.
            ok = np.allclose(gv, ev, rtol=0, atol=1e-6, equal_nan=True)
        else:
            ok = (
                gc.fillna("__n__").astype(str) == ec.fillna("__n__").astype(str)
            ).all()
        if not ok:
            bad = None
            try:
                if gc.dtype.kind == "f":
                    diffs = np.abs(gv - ev)
                    i = int(np.nanargmax(diffs))
                    bad = f"max diff {np.nanmax(diffs)} at row {i}: {gv[i]} vs {ev[i]}"
                else:
                    mism = gc.fillna("__n__").astype(str) != ec.fillna("__n__").astype(str)
                    i = int(np.argmax(mism.to_numpy()))
                    bad = f"row {i}: {gc.iloc[i]!r} vs {ec.iloc[i]!r}"
            except Exception:
                pass
            problems.append(f"values differ in {c} ({bad})")
    # dtype advisory (driver may compare schemas)
    for c in g.columns:
        if g[c].dtype != e[c].dtype:
            problems.append(f"DTYPE-WARN {c}: spark={g[c].dtype} duck={e[c].dtype}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from feagen_spark.session import get_spark

    spark = get_spark(app_name="crosscheck", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = E.queries(), E.oracle_sql()
    failures = 0

    # a typo'd filter name must not produce a vacuous 'failures: 0'
    # (code-review r6): every requested name has to exist
    unknown = sorted(only - set(qs))
    if unknown:
        print(f"FAIL filter: unknown query name(s) {unknown}")
        failures += 1

    # Registry guards (VERDICT r4 #1): the driver's CORRECTNESS artifact
    # records at most the FIRST 50 queries() entries in dict order (r4:
    # exactly entries 1-50 of 59 were recorded, the tail silently
    # dropped), so a registry past 50 entries CANNOT get full driver
    # evidence — fail loudly here instead of losing rows silently.
    DRIVER_CAP = 50
    if len(qs) > DRIVER_CAP:
        print(
            f"FAIL registry: {len(qs)} queries() entries > driver artifact "
            f"cap {DRIVER_CAP} — entries beyond #{DRIVER_CAP} get no "
            f"CORRECTNESS row; merge same-row-set queries instead"
        )
        failures += 1
    orphans = sorted(set(oracles) - set(qs))
    if orphans:
        print(f"FAIL registry: oracle_sql() keys without queries(): {orphans}")
        failures += 1
    rows_only = [k for k in qs if k not in oracles]
    tail = list(qs)[len(qs) - len(rows_only):] if rows_only else []
    if rows_only and rows_only != tail:
        print(
            f"FAIL registry: rows-only entries {rows_only} must be LAST in "
            f"queries() order (oracle-backed evidence drops first otherwise)"
        )
        failures += 1

    printed: set[str] = set()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        printed.add(name)
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error: {str(ex).splitlines()[0][:160]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(got)} rows")
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {str(ex).splitlines()[0][:160]}")
            failures += 1
            continue
        problems = compare(name, got, exp)
        hard = [p for p in problems if not p.startswith("DTYPE-WARN")]
        status = "OK  " if not hard else "FAIL"
        if hard:
            failures += 1
        print(f"{status} {name}: {len(got)} rows" + (f" | {problems}" if problems else ""))

    # full runs must emit one verdict line per registry entry. Under the
    # current loop this is true by construction (every branch prints) —
    # the check is a structural TRIPWIRE for future refactors that add a
    # skip/continue path, not a live guard (code-review r5).
    if not only:
        missing = sorted(set(qs) - printed)
        if missing:
            print(f"FAIL coverage: no verdict line for {missing}")
            failures += 1
    print(f"entries: {len(qs)} (oracle-backed {len(qs) - len(rows_only)}, "
          f"rows-only {len(rows_only)})")
    print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
