"""Orthogonal range count / range report / circle count (Q4-Q7, H4-H5).

Two-level plan mirroring the reference's 3-way recursion
(`query_op/range_count.hpp:9-96`): cells disjoint from a box are never
touched (bbox-stats filter — the partition-pruning analogue); cells whose
data-bbox is *contained* contribute their stored count straight from the
stats table, aggregated metadata-only without ever reaching a blob (the
"contained -> node.size" shortcut, range_count.hpp:78-80); boundary
cells go to a cogrouped pandas UDF that runs the per-cell tree's
vectorized count/report — with hot (salted) cells re-keyed per
(cell, salt) so one popular cell's boundary scans fan out across tasks
(queries/skew.py).

The stats side is a plain DataFrame agg + broadcast join — Catalyst
keeps it whole-stage-codegen'd; only boundary cells pay the Arrow hop.

Boxes are inclusive [lo, hi] on int64 coords, matching `within_box`
(`utility/box_op.hpp:9-20`).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..index import SpatialIndex
from ..localtree import LocalKDTree
from .skew import hot_blobs, split_by_salt


def _scan_counts(index: SpatialIndex, bnd: DataFrame, scan, schema: str
                 ) -> DataFrame:
    """Run the boundary-cell scan cogroup with the cold/hot split: cold
    cells cogroup on `cell`; hot cells fan out per (cell, salt) blob.
    Each blob side is first pruned by a broadcast semi-join on its
    side's distinct boundary cells (the update() touched-cells pattern,
    index.py) so only boundary-cell blobs are serialized through the
    Arrow hop — contained and disjoint cells never ship, and bytes
    scale with the query set's boundary, not with index size. The
    broadcast semi-join preserves the cached blob table's hash-
    partitioning on `cell`, keeping the cogroup's exchange reuse.
    `bnd` must carry `maxsalt` (consumed by the split) and must be
    checkpointed by the caller (its lineage must not reach index.df, or
    the semi-join would trip the self-join analyzer); `scan` is
    additive across a cell's blobs (counts sum / reported rows union),
    so per-salt partial results compose in the caller's final
    aggregation."""
    cold, hot = split_by_salt(bnd)
    cold_blobs = index.df.join(
        F.broadcast(cold.select("cell").distinct()), "cell", "semi")
    hblobs = hot_blobs(index).join(
        F.broadcast(hot.select("cell").distinct()), "cell", "semi")
    return (cold.groupby("cell")
            .cogroup(cold_blobs.groupby("cell"))
            .applyInPandas(scan, schema)
            .unionByName(
                hot.groupby("cell", "salt")
                .cogroup(hblobs.groupby("cell", "salt"))
                .applyInPandas(scan, schema)))


def _box_cols(d: int) -> tuple[list, list]:
    """Box lo/hi column names: 2-D keeps the historical bxlo/bylo/bxhi/
    byhi names; dims >= 2 add blo{j}/bhi{j}, mirroring the stats tables'
    mn{j}/mx{j} (index.cell_stats)."""
    lo = ["bxlo", "bylo"] + [f"blo{j}" for j in range(2, d)]
    hi = ["bxhi", "byhi"] + [f"bhi{j}" for j in range(2, d)]
    return lo, hi


def _stats_cols(d: int) -> tuple[list, list]:
    lo = ["xmin", "ymin"] + [f"mn{j}" for j in range(2, d)]
    hi = ["xmax", "ymax"] + [f"mx{j}" for j in range(2, d)]
    return lo, hi


def _box_conds(d: int):
    """(overlap, contained) full-d Spark conditions between a box row
    and a stats row — the reference's 3-way box classification
    (range_count.hpp:9-96) as whole-stage-codegen'd SQL."""
    blo, bhi = _box_cols(d)
    slo, shi = _stats_cols(d)
    overlap = contained = F.lit(True)
    for bl, bh, sl, sh in zip(blo, bhi, slo, shi):
        overlap = overlap & (F.col(sl) <= F.col(bh)) \
            & (F.col(sh) >= F.col(bl))
        contained = contained & (F.col(sl) >= F.col(bl)) \
            & (F.col(sh) <= F.col(bh))
    return overlap, contained


def _boxes_df(index: SpatialIndex, boxes) -> DataFrame:
    """boxes: sequence of (box_id, lo0..lo{d-1}, hi0..hi{d-1}) — for
    d=2 the historical (box_id, xlo, ylo, xhi, yhi) — -> DataFrame
    (Arrow path via pandas — createDataFrame over python tuples is
    row-at-a-time and stalls the driver for 1e5+ query batches)."""
    d = len(index.coord_cols)
    arr = np.asarray(boxes, dtype=np.int64).reshape(-1, 1 + 2 * d)
    lo, hi = _box_cols(d)
    cols = {"box_id": arr[:, 0]}
    for j, c in enumerate(lo + hi):
        cols[c] = arr[:, 1 + j]
    return index.spark.createDataFrame(pd.DataFrame(cols))


def _cell_stats_df(index: SpatialIndex) -> DataFrame:
    """Per-cell union bbox + live count (no blobs touched) — the cached
    Spark-side stats table (index.cell_stats); nothing is collected to
    the driver, so pruning scales to arbitrary cell counts."""
    return index.cell_stats()


def _prune_join(index: SpatialIndex, qdf: DataFrame, n_queries: int,
                cond, ext=None, contained=None) -> DataFrame:
    """query-shapes ⋈ cell-stats, pruned hierarchically.

    Small grids (g <= 64): each shape geometrically enumerates the fine
    cells its extent `ext` spans (pure integer SQL on the regular grid
    — the same trick as kNN phase 2), then an EQUI-join on `cell`
    against the stats table applies the exact data-bbox condition
    `cond`. No nested-loop join anywhere: this is O(overlap pairs) and
    broadcasts whichever equi-join side is smaller (Catalyst/AQE).

    Large grids: the stats PYRAMID (index.stats_pyramid) makes the
    enumeration O(perimeter), not O(area): shapes enumerate the
    COARSEST level (<= 64 per dim, so <= 4096 cells even for a
    domain-sized shape), and each level classifies its cells with the
    same data-bbox exprs — disjoint cells drop (`cond`), cells passing
    `contained` are emitted AS pairs immediately (their aggregated
    ccnt answers count queries metadata-only; maxsalt=0 and the
    caller's own contained test re-evaluates true on the coarse bbox,
    so they never reach a blob cogroup), and only BOUNDARY cells
    explode into their PYRAMID_FACTOR² children for the next level.
    `contained=None` (range report needs actual points) descends every
    overlapping cell instead. This is the reference's answer-from-high-
    nodes recursion (range_count.hpp:9-96) over the distributed grid.

    Assumes the index's domain contract: coords in [0, COORD_LIMIT)
    (grid.py docstring), so every populated cell id lies in
    [0, g^dims - 1] and clipped enumeration misses nothing.

    ext: per-gridded-dim (lo_col, hi_col) column names of the query
    shape's extent; defaults to the box columns of the grid's dims."""
    from ..index import PYRAMID_FACTOR
    grid = index.grid
    gd = grid.dims
    if ext is None:
        blo, bhi = _box_cols(gd)
        ext = list(zip(blo, bhi))
    par = index.spark.sparkContext.defaultParallelism
    if n_queries > 4 * par:
        qdf = qdf.repartition(par)

    def enum_top(df, g, cw):
        def clip(c):  # monotone clip => lo<=hi survives, seq ascends
            return f"LEAST(GREATEST({c} DIV {cw}, 0), {g - 1})"
        cols = []
        for j, (lo, hi) in enumerate(ext):
            df = df.selectExpr(
                "*",
                f"explode(sequence({clip(lo)}, {clip(hi)})) AS _c{j}")
            cols.append(f"_c{j}")
        return (df.selectExpr("*", f"{grid.compose_sql(cols, g)} AS cell")
                .drop(*cols))

    levels = index.stats_pyramid()  # fine+1 .. coarsest
    if not levels:
        pairs = enum_top(qdf, grid.g, grid.cw)
        return pairs.join(_cell_stats_df(index), "cell").filter(cond)

    qcols = qdf.columns
    topg, topcw, _ = levels[-1]
    frontier = enum_top(qdf, topg, topcw)
    emitted = []
    walk = list(reversed(levels))  # coarsest .. fine+1
    for i, (lg, lcw, stats_l) in enumerate(walk):
        j = frontier.join(stats_l, "cell").filter(cond)
        if contained is not None:
            emitted.append(j.filter(contained))
            j = j.filter(~contained)
        childg = walk[i + 1][0] if i + 1 < len(walk) else grid.g
        fac = PYRAMID_FACTOR
        frontier = j.select(*qcols, "cell")
        ccols = []
        for cj, (lo, hi) in enumerate(
                grid.child_ranges_sql("cell", lg, fac, childg)):
            frontier = frontier.selectExpr(
                "*", f"explode(sequence({lo}, {hi})) AS _c{cj}")
            ccols.append(f"_c{cj}")
        frontier = (frontier.drop("cell")
                    .selectExpr(
                        "*", f"{grid.compose_sql(ccols, childg)} AS cell")
                    .drop(*ccols))
    out = frontier.join(_cell_stats_df(index), "cell").filter(cond)
    for e in emitted:
        out = out.unionByName(e.select(*out.columns))
    return out


def range_count(index: SpatialIndex, boxes) -> DataFrame:
    """-> (box_id, cnt). Exact, inclusive bounds; d-generic (the
    reference's correctness sweep runs range count at d=5,
    script/checkCorrect.sh) — cell enumeration keys on the two grid
    dims, classification and the kernel scan use all d."""
    d = len(index.coord_cols)
    blo_c, bhi_c = _box_cols(d)
    bdf = _boxes_df(index, boxes)
    # fully-contained cells take their stored count from the stats row
    # (the "contained -> node.size" shortcut, range_count.hpp:78-80)
    # and aggregate METADATA-ONLY — at EVERY pyramid level (a large
    # box's interior resolves at coarse levels; _prune_join) — they
    # never shuffle into the blob cogroup; only boundary pairs pay the
    # Arrow hop + tree scan
    overlap, contained = _box_conds(d)
    joined = _prune_join(index, bdf, len(boxes), overlap,
                         contained=contained)
    # the (box, cell) prune join feeds three consumers (contained agg,
    # cold scan, hot scan); checkpoint it so it is computed once
    pairs = joined.withColumn("full", contained).select(
        "box_id", *blo_c, *bhi_c, "cell", "ccnt", "full",
        "maxsalt").localCheckpoint(eager=False)
    full_counts = (pairs.filter(F.col("full"))
                   .groupBy("box_id").agg(F.sum("ccnt").alias("cnt")))
    bnd = pairs.filter(~F.col("full")).select(
        "box_id", *blo_c, *bhi_c, "cell", "maxsalt")

    def scan(key, bpdf: pd.DataFrame, ipdf: pd.DataFrame) -> pd.DataFrame:
        if len(bpdf) == 0 or len(ipdf) == 0:
            return pd.DataFrame(columns=["box_id", "cnt"])
        qboxes = bpdf[blo_c + bhi_c].to_numpy(np.int64)
        part = np.zeros(len(bpdf), np.int64)
        for blob in ipdf["blob"]:
            part += LocalKDTree.from_bytes(blob).range_count(qboxes)
        return pd.DataFrame({"box_id": bpdf["box_id"].to_numpy(np.int64),
                             "cnt": part})

    all_counts = _scan_counts(index, bnd, scan, "box_id long, cnt long") \
        .unionByName(full_counts)

    # boxes with zero matches must still appear with cnt=0; broadcast
    # the aggregated side (<= one row per box) — build-left on a left
    # outer join is unsupported, so hinting bdf would be a no-op
    return (bdf.select("box_id")
            .join(F.broadcast(
                all_counts.groupBy("box_id").agg(F.sum("cnt").alias("c"))),
                  "box_id", "left")
            .select("box_id", F.coalesce("c", F.lit(0)).alias("cnt")))


def range_report(index: SpatialIndex, boxes) -> DataFrame:
    """-> (box_id, pid, <coord cols>): every live point inside each
    box (all d coordinate columns, named as the index's coord_cols).
    Coordinates come back LONG on integer indexes, DOUBLE on float-mode
    indexes (boxes stay integer bounds either way — an inclusive
    compare of a double against an exact integer bound is the same
    predicate in numpy, Spark and DuckDB)."""
    d = len(index.coord_cols)
    cc = list(index.coord_cols)
    blo_c, bhi_c = _box_cols(d)
    ct = "double" if index.float_coords else "long"
    bdf = _boxes_df(index, boxes)
    overlap, _ = _box_conds(d)
    pairs = _prune_join(index, bdf, len(boxes), overlap) \
        .select("box_id", *blo_c, *bhi_c, "cell", "maxsalt") \
        .localCheckpoint(eager=False)  # consumed by both scan branches
        # (lazy: plan truncation is immediate, materialization
        # folds into the first consumer job — same as knn_join)

    def scan(key, bpdf: pd.DataFrame, ipdf: pd.DataFrame) -> pd.DataFrame:
        if len(bpdf) == 0 or len(ipdf) == 0:
            return pd.DataFrame(columns=["box_id", "pid", *cc])
        qboxes = bpdf[blo_c + bhi_c].to_numpy(np.int64)
        bids = bpdf["box_id"].to_numpy(np.int64)
        outs = []
        for blob in ipdf["blob"]:
            bi, pp, ii = LocalKDTree.from_bytes(blob).range_report(qboxes)
            if len(ii):
                out = {"box_id": bids[bi], "pid": ii}
                for j, c in enumerate(cc):
                    out[c] = pp[:, j]
                outs.append(pd.DataFrame(out))
        if not outs:
            return pd.DataFrame(columns=["box_id", "pid", *cc])
        return pd.concat(outs, ignore_index=True)

    coord_schema = ", ".join(f"{c} {ct}" for c in cc)
    return _scan_counts(index, pairs, scan,
                        f"box_id long, pid long, {coord_schema}")


def circle_count(index: SpatialIndex, circles) -> DataFrame:
    """circles: (circle_id, c0..c{d-1}, r) — at d=2 the historical
    (circle_id, cx, cy, r) — -> (circle_id, cnt).

    Counts points with squared distance <= r² (range_count.hpp:99-131);
    d-generic: ball-vs-bbox min/max distance² over all dims.
    """
    spark = index.spark
    d = len(index.coord_cols)
    ctr_c = ["cx", "cy"] + [f"ctr{j}" for j in range(2, d)]
    arr = np.asarray(circles, dtype=np.int64).reshape(-1, d + 2)
    cols = {"circle_id": arr[:, 0]}
    for j, c in enumerate(ctr_c):
        cols[c] = arr[:, 1 + j]
    cols["r"] = arr[:, d + 1]
    cdf = spark.createDataFrame(pd.DataFrame(cols))
    # circle's bounding box (grid dims) drives the cell enumeration;
    # the exact full-d min-dist² <= r² test below refines it
    gd = index.grid.dims
    blo, bhi = _box_cols(gd)
    cdf = cdf.selectExpr(
        "*", *[f"{ctr_c[j]} - r AS {blo[j]}" for j in range(gd)],
        *[f"{ctr_c[j]} + r AS {bhi[j]}" for j in range(gd)])
    slo, shi = _stats_cols(d)
    mind2 = maxd2 = None
    for c, sl, sh in zip(ctr_c, slo, shi):
        nearc = F.greatest(F.col(sl) - F.col(c), F.col(c) - F.col(sh),
                           F.lit(0))
        farc = F.greatest(F.abs(F.col(c) - F.col(sl)),
                          F.abs(F.col(c) - F.col(sh)))
        mind2 = nearc * nearc if mind2 is None else mind2 + nearc * nearc
        maxd2 = farc * farc if maxd2 is None else maxd2 + farc * farc
    r2 = F.col("r") * F.col("r")
    joined = _prune_join(index, cdf, len(circles), mind2 <= r2,
                         contained=maxd2 <= r2)
    pairs = joined.withColumn("full", maxd2 <= r2).select(
        "circle_id", *ctr_c, "r", "cell", "ccnt", "full", "maxsalt") \
        .localCheckpoint(eager=False)  # three consumers, compute once
    full_counts = (pairs.filter(F.col("full"))
                   .groupBy("circle_id").agg(F.sum("ccnt").alias("cnt")))
    bnd = pairs.filter(~F.col("full")).select(
        "circle_id", *ctr_c, "r", "cell", "maxsalt")

    def scan(key, cpdf: pd.DataFrame, ipdf: pd.DataFrame) -> pd.DataFrame:
        if len(cpdf) == 0 or len(ipdf) == 0:
            return pd.DataFrame(columns=["circle_id", "cnt"])
        centers = cpdf[ctr_c].to_numpy(np.int64)
        radii = cpdf["r"].to_numpy(np.float64)
        part = np.zeros(len(cpdf), np.int64)
        for blob in ipdf["blob"]:
            part += LocalKDTree.from_bytes(blob).circle_count(
                centers, radii)
        return pd.DataFrame({"circle_id": cpdf["circle_id"].to_numpy(np.int64),
                             "cnt": part})

    all_counts = _scan_counts(index, bnd, scan, "circle_id long, cnt long") \
        .unionByName(full_counts)
    return (cdf.select("circle_id")
            .join(F.broadcast(
                all_counts.groupBy("circle_id").agg(F.sum("cnt").alias("c"))),
                  "circle_id", "left")
            .select("circle_id", F.coalesce("c", F.lit(0)).alias("cnt")))
