"""Probe-fraction tuning experiment (kNN seed-bound quality vs cost).

One process per KDS_PROBE_FRACTION setting (probes bake into the index
at build; index.PROBE_FRACTION reads the env at import). Reports kNN
k=10 wall (best of REPS) plus the scanned-pts/leaves-per-query audit at
sf0.1 / Grid(8). Run several settings interleaved from the shell:

    for r in 1 2 3; do for f in 32 16 8; do
        KDS_PROBE_FRACTION=$f python scripts/probe_tune.py; done; done
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(os.environ.get("PROBE_TUNE_REPS", "3"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from pyspark.sql import functions as F

    from kdtree_spark import points
    from kdtree_spark.grid import Grid
    from kdtree_spark.index import PROBE_FRACTION, SpatialIndex
    from kdtree_spark.queries.knn import knn_join, knn_scan_stats
    from kdtree_spark.session import get_spark

    spark = get_spark("probe-tune", cpus=CPUS,
                      shuffle_partitions=max(CPUS, 8))
    spark.range(1_000_000).selectExpr("id % 97 AS g").groupBy("g") \
        .count().count()
    pts = points.load_points(spark, SF_DIR, "uniform") \
        .select("pid", "x", "y")
    n = pts.count()
    idx = SpatialIndex.build(spark, pts, grid=Grid(8), n_hint=n)
    q = points.load_query_points(spark, SF_DIR, "uniform")
    nq = q.count()
    knn_join(idx, q.limit(64), 10).count()  # warm workers
    walls = []
    for _ in range(REPS):
        t0 = time.time()
        knn_join(idx, q, 10).count()
        walls.append(round(time.time() - t0, 3))
    row = (knn_scan_stats(idx, q, 10)
           .agg(F.avg("scanned").alias("s"),
                F.avg("leaves").alias("l")).collect()[0])
    print(json.dumps({
        "probe_fraction": PROBE_FRACTION,
        "knn_walls": walls,
        "knn_best_sec": min(walls),
        "knn_best_q_per_sec": round(nq / min(walls), 1),
        "scanned_per_query": round(row["s"], 1),
        "leaves_per_query": round(row["l"], 2),
    }))


if __name__ == "__main__":
    main()
