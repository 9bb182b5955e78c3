#!/usr/bin/env bash
# Build dist/replicheck_spark.zip for spark-submit --py-files.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/replicheck_spark.zip
zip -qr dist/replicheck_spark.zip replicheck_spark -x '*__pycache__*'
echo "dist/replicheck_spark.zip:"
unzip -l dist/replicheck_spark.zip | tail -2
echo
echo "usage: spark-submit --py-files dist/replicheck_spark.zip jobs/dedup.py --pages <table> --ckpt <dir>"
