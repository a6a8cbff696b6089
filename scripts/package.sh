#!/usr/bin/env bash
# Build engine.zip for `spark-submit --py-files engine.zip jobs/run_algo.py ...`
set -euo pipefail
cd "$(dirname "$0")/.."
rm -f engine.zip
if command -v zip >/dev/null 2>&1; then
  zip -qr engine.zip parallel_betweenness_centrality_using_bsp_spark \
    -x '*__pycache__*' -x '*.pyc'
else
  python - <<'PY'
import zipfile, pathlib
with zipfile.ZipFile("engine.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for p in pathlib.Path("parallel_betweenness_centrality_using_bsp_spark").rglob("*.py"):
        if "__pycache__" not in str(p):
            z.write(p)
PY
fi
echo "wrote engine.zip"
