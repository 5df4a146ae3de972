"""Per-phase latency breakdown of one knn_join at the sf0.1 gate shape.

Times each materialization boundary of the kNN plan separately (seed
bound, candidate cells, checkpoint, phase-3 scan, final window) plus
the whole join, best of REPS. The per-phase sum exceeds the e2e wall
(phases re-run work the real plan shares); the value is the RATIO —
which boundary dominates at gate scale.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(os.environ.get("PHASE_REPS", "3"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def best(fn) -> float:
    w = []
    for _ in range(REPS):
        t0 = time.time()
        fn()
        w.append(time.time() - t0)
    return round(min(w), 3)


def main() -> None:
    from kdtree_spark import points
    from kdtree_spark.grid import Grid
    from kdtree_spark.index import SpatialIndex
    from kdtree_spark.queries import knn as K
    from kdtree_spark.session import get_spark

    spark = get_spark("knn-profile", cpus=CPUS,
                      shuffle_partitions=max(CPUS, 8))
    spark.range(1_000_000).selectExpr("id % 97 AS g").groupBy("g") \
        .count().count()
    pts = points.load_points(spark, SF_DIR, "uniform") \
        .select("pid", "x", "y")
    n = pts.count()
    idx = SpatialIndex.build(spark, pts, grid=Grid(8), n_hint=n)
    q = points.load_query_points(spark, SF_DIR, "uniform")
    nq = q.count()
    k = 10
    cc = list(idx.coord_cols)
    K.knn_join(idx, q.limit(64), k).count()  # warm

    out = {"n": n, "nq": nq}
    out["p1_seed_enum"] = best(
        lambda: K._seed_enum(idx, q, cc, k).count())
    out["p12_candidates"] = best(
        lambda: K.knn_candidates(idx, q, k).count())
    out["p12_checkpointed"] = best(
        lambda: K.knn_candidates(idx, q, k)
        .localCheckpoint(eager=True).count())
    cand = K.knn_candidates(idx, q, k).localCheckpoint(eager=True)

    def p3():
        maker = K._cell_knn_maker(cc, K._cdt(idx), k)
        schema = "qid long, nid long, dist_sq double, rank int, fin boolean"
        K._scan_local(idx, cand.withColumn(
            "_fin", cand["cell"].isNotNull()), maker, schema).count()

    out["p3_scan_given_cand"] = best(p3)
    out["e2e_knn_join"] = best(lambda: K.knn_join(idx, q, k).count())
    print(json.dumps(out))


if __name__ == "__main__":
    main()
