#!/usr/bin/env bash
# Cluster launch recipe (north rule: "spark-submit --py-files on a
# multi-executor cluster").  Packages the engine into a zip and submits the
# ER driver.  On a real cluster replace --master with the cluster manager
# (yarn / k8s / spark://...) and size --num-executors; everything below the
# master URL is identical — the pipeline itself contains no local-mode
# assumptions (all parallelism is derived from
# spark.sparkContext.defaultParallelism at runtime).
#
# Usage: scripts/submit.sh [--master local[8]] [main.py args...]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
MASTER="local[8]"
if [[ "${1:-}" == "--master" ]]; then MASTER="$2"; shift 2; fi

PKG_ZIP="$(mktemp -d)/liblevenshtein_rust_spark.zip"
(cd "$REPO" && python - "$PKG_ZIP" <<'EOF'
import sys, zipfile
from pathlib import Path

dest = sys.argv[1]
root = Path("liblevenshtein_rust_spark")
with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted(root.rglob("*.py")):
        z.write(p, p.as_posix())
EOF
)

exec spark-submit \
  --master "$MASTER" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --py-files "$PKG_ZIP" \
  "$REPO/main.py" "$@"
