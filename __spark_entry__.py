"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    — flagship: build the two-level spatial index over
                  sf0.001 points and run the kNN k=10 join.
queries()       — one entry per implemented operator (SURVEY.md §2 +
                  training-pipeline extensions).
oracle_sql()    — DuckDB-equivalent SQL per query (same column names,
                  BIGINT-typed outputs, deterministic tie-breaks).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _ship_package(spark: SparkSession) -> None:
    """Make kdtree_spark importable on executors (driver-created session)."""
    try:
        from kdtree_spark.session import _package_zip
        spark.sparkContext.addPyFile(_package_zip())
    except Exception:
        pass  # already added, or local import suffices


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ship_package(spark)
    from kdtree_spark import points
    from kdtree_spark.grid import Grid
    from kdtree_spark.index import SpatialIndex
    from kdtree_spark.queries.knn import knn_join

    sf_dir = "/root/testdata/sf0.001"
    pts = points.load_points(spark, sf_dir, "uniform").select("pid", "x", "y")
    idx = SpatialIndex.build(spark, pts, grid=Grid(4))
    q = points.load_query_points(spark, sf_dir, "uniform")
    return knn_join(idx, q, 10)


# The driver's correctness sweep writes at most 50 rows (r3 and r4
# evidence), so the registered set must fit in one sweep. Redundant
# gates whose engine path is strictly covered by a stronger registered
# gate are retired from the DRIVER registry only — the query functions
# stay in kdtree_spark.driver_queries (bench.py still times them, and
# scripts/gate_check.py can still check them by name):
#   cell_assign          -> index_stats (identical oracle SQL; the index
#                           gate additionally exercises the full build)
#   knn_k1               -> same engine path as knn_k10; k=1 remains
#                           gated via incr_build_and_query's k=1 probes
#   range_count          -> range_count_10k (same plan, 333x the boxes)
#   range_report         -> range_report_10k + range_report_d5 (mixed
#                           size classes at d=5)
#   insert_then_count    -> update_then_knn + insert_ratio_sweep +
#                           incremental_build
#   delete_then_count    -> update_then_knn + delete_ratio_sweep +
#                           incremental_delete
#   update_then_knn_d3   -> update machinery is d-generic, gated at
#                           d=2 / d=5 / f64; d=3 kNN stays (knn_k10_d3)
#   knn_k10_f64          -> update_then_knn_f64 (same kNN join over the
#                           f64 index, after the stronger tag=2 updates)
#   range_count_f64      -> range_report_f64 (strictly stronger: emits
#                           the double coords bit-for-bit)
#   circle_count_f64     -> circle kernel gated at d=2/d=5 int; f64
#                           family representatives: update_then_knn_f64
#                           + range_report_f64
#   minhash_bands        -> dedup_minhash (verifies the bands end to
#                           end through candidate generation)
#   sliding_window_count -> sliding_window_knn (same insert/evict loop,
#                           stronger per-slice probe)
#   circle_count         -> circle_count_d5 (same d-generic ball kernel
#                           at the superset dims; d=2 circles stay
#                           covered by pytest + gate_check) — retired
#                           to make sweep room for distance_join
#   simhash              -> simhash_pairs + dedup_components (signatures
#                           computed end-to-end inside both; retired to
#                           make sweep room for dedup_components)
#   incremental_build    -> incr_build_and_query (identical slice-wise
#                           batchInsert loop, kNN-probed at every third
#                           state) + the range gates for the final
#                           count; retired to make room for rect_join
#   update_then_knn      -> update_then_knn_d5 (the exact checkCorrect
#                           tag=2 config, strictly stronger) +
#                           update_then_knn_f64; the d=2 int kernel
#                           stays gated via knn_k10 + the ratio sweeps;
#                           retired to make room for image_spatial_phash
#   knn_k10_d16          -> beyond-reference d=16 extension; its
#                           dense-matmul kernel is pytest-gated
#                           (test_localtree d>=9 configs) and the
#                           dims-keyed grid path is driver-gated at
#                           d=5; retired to make room for
#                           polygon_overlay
#   regex_token_stats    -> not a retirement but a budget exclusion:
#                           the sweep is at its 50-row cap; this
#                           narrow-map op stays verified by
#                           scripts/gate_check.py (hash vs DuckDB
#                           regexp_extract_all) + pytest
#   dbscan               -> budget exclusion like regex_token_stats;
#                           verified by gate_check (DuckDB recursive-
#                           CTE oracle) + an independent union-find
#                           brute force in tests/test_dbscan.py
#   kernel_density       -> budget exclusion; gate_check hash-green
#                           (pure-int64 Epanechnikov sum) + numpy pytest
#   closest_pair         -> budget exclusion; gate_check hash-green
#                           (argmin-with-tie-break oracle) + numpy pytest
_RETIRED = frozenset({
    "cell_assign", "knn_k1", "range_count", "range_report",
    "insert_then_count", "delete_then_count", "update_then_knn_d3",
    "knn_k10_f64", "range_count_f64", "circle_count_f64",
    "minhash_bands", "sliding_window_count", "circle_count", "simhash",
    "incremental_build", "update_then_knn", "knn_k10_d16",
    "regex_token_stats", "dbscan", "kernel_density", "closest_pair",
})

# Never-driver-verified gates run first so even a truncated sweep
# covers them: the 9 gates with no CORRECTNESS_r04 row, then the
# gates new this round (d=5 circle/k=100 and the salted hot-cell
# fan-out path).
_FRONT = ("ann_srp_lsh", "ann_ivf", "image_phash_dedup", "image_meta",
          "image_knn", "simhash_pairs", "ann_cosine_topk",
          "embedding_neardup", "circle_count_d5", "knn_k100_d5",
          "hot_cell_knn", "distance_join", "dedup_components",
          "rect_join", "image_spatial_phash", "polygon_overlay")


def _registry() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from kdtree_spark.driver_queries import imaging, pipeline, spatial

    return {**spatial.QUERIES, **pipeline.QUERIES, **imaging.QUERIES}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged = _registry()
    ordered = [n for n in _FRONT if n in merged and n not in _RETIRED]
    ordered += [n for n in merged
                if n not in _FRONT and n not in _RETIRED]
    out: dict[str, Callable] = {}
    for name in ordered:
        def wrapped(spark, sf_dir, _fn=merged[name]):
            _ship_package(spark)
            return _fn(spark, sf_dir)
        out[name] = wrapped
    return out


def oracle_sql() -> dict[str, str]:
    from kdtree_spark.driver_queries import imaging, pipeline, spatial

    merged = {**spatial.ORACLES, **pipeline.ORACLES, **imaging.ORACLES}
    return {n: s for n, s in merged.items() if n not in _RETIRED}
