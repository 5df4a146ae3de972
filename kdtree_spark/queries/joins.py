"""Spatial distance join: all (left, right) pairs within radius r.

The north rule names a "spatial-join + tiling engine"; alongside the
index-backed kNN join (queries/knn.py), point-in-polygon
(queries/polygon.py) and raster-tile<->cell assignment, this module
adds the remaining classic primitive — the bichromatic radius join
(every pair of points from two tables with L2 distance <= r).
Reference analogue: a rangeCount/rangeQuery ball predicate evaluated
once per left point (include/cpdd/query_op/range_count.hpp:99-131),
batched over the whole left table instead of a handed-in query list.

Physical design (the 100 TB shape):
- The RIGHT side keeps its single home grid cell (one row per point).
- The LEFT side expands to every cell its radius-r box overlaps via
  `sequence() x explode` per dimension — pure Spark SQL, clipped to
  the grid, ((2r/cw) + 2)^d cells per row, so ~1-4 cells when the
  grid is sized with cell width >= r (Grid.for_count at the caller,
  or the default below).
- One hash-partitioned equi-join on the composed cell id, then the
  exact JVM-side predicate sum_j (lx_j - rx_j)^2 <= r^2. Everything
  stays inside whole-stage codegen: NO Python boundary, NO broadcast
  requirement (both sides may be arbitrarily large — this is a
  shuffle-shuffle co-partitioned join), and AQE's skew-join splitting
  handles hot cells because the join key IS the cell id. Each
  qualifying pair is emitted exactly once: the right point exists in
  exactly one cell, and the left expansion covers that cell iff the
  pair's distance can be <= r.

At 10^12 rows the plan is two scans + one shuffle each side + a
codegen filter — the same shape Spark plans for any large equi-join,
with the expansion factor (not a crossJoin) bounding the blow-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..grid import COORD_LIMIT, Grid


def _expand_cells_sql(grid: Grid, cols, r: int) -> list:
    """Per-dimension cell-range bounds [(lo_expr, hi_expr), ...] for the
    radius-r box around a point, clipped to the grid."""
    cw, g = grid.cw, grid.g
    out = []
    for c in cols[:grid.dims]:
        lo = f"GREATEST(({c} - {r}) DIV {cw}, 0)"
        hi = f"LEAST(({c} + {r}) DIV {cw}, {g - 1})"
        out.append((lo, hi))
    return out


def distance_join(left: DataFrame, right: DataFrame, r: int,
                  grid: Grid | None = None,
                  coord_cols=("x", "y"),
                  left_id: str = "lid",
                  right_id: str = "rid") -> DataFrame:
    """left: (left_id, coords...), right: (right_id, coords...) ->
    (left_id, right_id, dist_sq) for every pair with dist^2 <= r^2.

    Coordinates are the repo's int64 domain [0, COORD_LIMIT)^d; d is
    len(coord_cols) and the grid keys cells on min(d, grid.dims) dims
    (the dims-keyed convention of grid.py) while the distance predicate
    is exact over all d dims.
    """
    assert r >= 0
    if grid is None:
        # default: cell width ~ max(r, domain/64) so the expansion factor
        # stays <= 3 per dim while small radii still get fine cells
        g = max(1, min(64, COORD_LIMIT // max(r, 1)))
        grid = Grid(g)
    cc = list(coord_cols)
    assert grid.dims <= len(cc)
    lcc = [f"_l_{c}" for c in cc]
    lt = left.select(F.col(left_id).alias("_lid"),
                     *[F.col(c).alias(a) for c, a in zip(cc, lcc)])
    rt = right.select(F.col(right_id).alias("_rid"),
                      *cc,
                      F.expr(grid.spark_cell_sql_nd(cc)).alias("_cell"))
    # left expansion: one explode per grid dim, then compose the cell id
    bounds = _expand_cells_sql(grid, lcc, r)
    for j, (lo, hi) in enumerate(bounds):
        lt = lt.withColumn(f"_g{j}",
                           F.explode(F.sequence(F.expr(lo), F.expr(hi))))
    cell = f"_g0"
    for j in range(1, grid.dims):
        cell = f"(({cell}) * {grid.g} + _g{j})"
    lt = lt.withColumn("_cell", F.expr(cell)).drop(
        *[f"_g{j}" for j in range(grid.dims)])
    d2 = None
    for c, a in zip(cc, lcc):
        t = F.col(a) - F.col(c)
        d2 = t * t if d2 is None else d2 + t * t
    pairs = (lt.join(rt, "_cell")
             .withColumn("dist_sq", d2)
             .filter(F.col("dist_sq") <= F.lit(int(r) * int(r))))
    return pairs.select(F.col("_lid").alias(left_id),
                        F.col("_rid").alias(right_id), "dist_sq")


def distance_join_count(left: DataFrame, right: DataFrame, r: int,
                        grid: Grid | None = None,
                        coord_cols=("x", "y"),
                        left_id: str = "lid",
                        right_id: str = "rid") -> DataFrame:
    """-> (left_id, cnt): per-left-point count of right points within r
    (LEFT-outer so zero-neighbor points report cnt=0, matching the
    rangeCount convention of counting empty results)."""
    lids = left.select(F.col(left_id).alias(left_id)).distinct()
    pairs = distance_join(left, right, r, grid, coord_cols,
                          left_id, right_id)
    cnt = pairs.groupBy(left_id).agg(F.count("*").alias("cnt"))
    return (lids.join(cnt, left_id, "left")
            .select(left_id, F.coalesce("cnt", F.lit(0)).alias("cnt")))
