#!/bin/sh
# Build dist/feagen_spark.zip for spark-submit --py-files
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/feagen_spark.zip
python - <<'PY'
import zipfile, pathlib
root = pathlib.Path(".")
with zipfile.ZipFile("dist/feagen_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted((root / "feagen_spark").rglob("*.py")):
        z.write(p, p.as_posix())
print("wrote dist/feagen_spark.zip")
PY
