"""Scaffold a run config (feagen-init analogue, SURVEY.md §2.A A11:
feagen/tools/feagen_runner.py console script `feagen-init`, ~L70,
unverified — reconstructed from public knowledge, mount empty §0).

    python jobs/init_config.py [target_dir]

Writes <target_dir>/run.yml with the documented knobs; edit and run via
spark-submit --py-files dist/feagen_spark.zip jobs/run_features.py
--config <target_dir>/run.yml.
"""

from __future__ import annotations

import sys
from pathlib import Path

TEMPLATE = """\
# feagen_spark run config (jobs/run_features.py)
app_name: feagen_spark_run
input_path: /path/to/transcripts          # parquet/iceberg table of (conv_id, turn_idx, role, text, tool, ts)
input_format: parquet                     # or iceberg (needs runtime jar + catalog conf)
repartition_key: conv_id                  # co-locate conversations before the window suite
keys: ["conv_id", "turn_idx"]
input_snapshot: snapshot-1                # bump to invalidate all checkpoints for new input
checkpoint_root: /path/to/checkpoints     # omit to disable resume
features: ["text_len", "prev_role", "turns_so_far", "tool_calls_last_10", "session_id", "turn_in_session"]
checkpoint_nodes: ["session_id", "tool_calls_last_10"]
bundle_structure: {"label": "is_tool_turn", "features": ["text_len", "turns_so_far", "tool_calls_last_10"]}
output_path: /path/to/feature_snapshots
output_format: parquet
output_mode: overwrite
# optional backfill stage (C10): as-of feature snapshots at each label
# point; labels table needs the `on` keys + a timestamp column (ts_col)
# backfill: {"labels_path": "/path/to/labels", "output_path": "/path/to/snapshots", "on": ["conv_id"], "ts_col": "ts", "strict": True}
"""


def main() -> None:
    target = Path(sys.argv[1] if len(sys.argv) > 1 else ".")
    target.mkdir(parents=True, exist_ok=True)
    out = target / "run.yml"
    if out.exists():
        raise SystemExit(f"{out} already exists; not overwriting")
    out.write_text(TEMPLATE)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
