#!/usr/bin/env bash
# Package the engine and run the resumable build via spark-submit --py-files
# (the north-rule ship shape). Usage: scripts/submit.sh [--sf 0.01] [...]
set -euo pipefail
cd "$(dirname "$0")/.."
ZIP=/tmp/butterfly_osm_spark.zip
rm -f "$ZIP"
python - <<'EOF'
import zipfile, os
with zipfile.ZipFile("/tmp/butterfly_osm_spark.zip", "w") as z:
    for root, _, files in os.walk("butterfly_osm_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                z.write(os.path.join(root, f))
EOF
exec spark-submit --master "local[${SPARK_GRAFT_CPUS:-32}]" \
    --py-files "$ZIP" butterfly_osm_spark/main.py "$@"
