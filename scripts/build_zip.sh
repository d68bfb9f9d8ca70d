#!/bin/sh
# Package the engine for spark-submit --py-files.
set -eu
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/logcrawler_spark.zip
python - <<'EOF'
import os
import zipfile

with zipfile.ZipFile("dist/logcrawler_spark.zip", "w") as z:
    for root, _dirs, files in os.walk("logcrawler_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/logcrawler_spark.zip")
EOF
