#!/bin/sh
# Build the --py-files artifact for spark-submit.
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/gnarly_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/gnarly_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("gnarly_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                z.write(os.path.join(root, f))
print("dist/gnarly_spark.zip written")
EOF
