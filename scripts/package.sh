#!/bin/sh
# Build dist/kdtree_spark.zip for `spark-submit --py-files`.
# (session.py builds the same zip on the fly for local runs; this is the
# artifact a cluster submit ships.)
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/kdtree_spark.zip
# top-level package dir inside the zip so `import kdtree_spark` works
find kdtree_spark -name '*.py' | zip -q dist/kdtree_spark.zip -@
echo "dist/kdtree_spark.zip"
