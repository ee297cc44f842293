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


def main() -> None:
    from feagen_spark.datagen.transcripts import labels, transcripts
    from feagen_spark.session import get_spark

    spark = get_spark(
        app_name="feagen_demo_inputs", master="local[4]", shuffle_partitions=4
    )
    df = transcripts(spark, n_conv=100, giant_convs=1, giant_turns=500)
    df.write.mode("overwrite").parquet(TRANSCRIPTS)
    labels(spark, df).write.mode("overwrite").parquet(LABELS)
    print(f"wrote {TRANSCRIPTS} ({df.count()} turns) and {LABELS}")


if __name__ == "__main__":
    main()
