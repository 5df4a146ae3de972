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


# Gates the round-3 driver sweep dropped (budget exhausted at the tail
# of registration order) run first so a truncated sweep still covers
# them; they are cheap (~15 s total at sf0.01).
_FRONT = ("media_meta", "video_frame_sample", "audio_features",
          "image_decode_stats")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from kdtree_spark.driver_queries import imaging, pipeline, spatial

    merged = {**spatial.QUERIES, **pipeline.QUERIES, **imaging.QUERIES}
    ordered = [n for n in _FRONT if n in merged]
    ordered += [n for n in merged if n not in _FRONT]
    out: dict[str, Callable] = {}
    for name in ordered:
        def wrapped(spark, sf_dir, _fn=merged[name]):
            _ship_package(spark)
            return _fn(spark, sf_dir)
        out[name] = wrapped
    return out


def oracle_sql() -> dict[str, str]:
    from kdtree_spark.driver_queries import imaging, pipeline, spatial

    return {**spatial.ORACLES, **pipeline.ORACLES, **imaging.ORACLES}
