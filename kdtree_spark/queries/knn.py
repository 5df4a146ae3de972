"""Distributed exact kNN join (Q1/Q2/Q3 + H3 of SURVEY §2).

The reference answers each kNN query by descending one in-memory tree,
visiting the sibling subtree only when its bounding-box min-distance
beats the current kth-best (`query_op/nn_search.hpp:83-126`). Across a
cluster that sibling-pruning becomes *cell* pruning:

  phase 1  queries cogroup with their HOME cell -> a cheap block-scan
           probe (LocalKDTree.knn_bound: kth distance within the
           deepest >=max(2k,128)-point enclosing subtree block) gives a
           per-query VALID upper bound ub on the kth distance
  phase 2  candidate (query, cell) pairs, fully Spark-side: each query
           geometrically enumerates the grid cells inside its ub-radius
           square (pure numpy on the regular grid — no stats broadcast,
           work proportional to output), then an equi-join on `cell`
           against the cluster-resident cell-stats table refines with
           the data-bbox min-distance² <= ub test
           (p2b_min_distance analogue, nn_search.hpp:22-35) and drops
           empty cells. Queries with ub = inf (< k found at home) or a
           radius covering > ENUM_CAP cells fall back to a join against
           the full stats table, where a prefix-sum window over cells
           ordered by bbox min-dist² derives a VALID finite bound (the
           max-dist² to the minimal prefix of cells holding >= k live
           points) — so even those queries reach phase 3 with a tight
           candidate set instead of scanning every blob; only this
           metadata pass scales with cell count
  phase 3  candidates shuffle to their cells; per-blob batched tree
           search with ub as the prune bound -> local top-k per cell
  phase 4  global top-k: min-k over per-cell top-k's via a window on
           (dist², nid) — deterministic tie-break identical to the
           DuckDB oracle's ORDER BY

Exactness: any true neighbour at distance d <= true-kth <= ub lies in a
cell whose bbox min-dist <= ub, so phase 2 never drops it; phase 3's
per-cell top-k keeps everything that can reach the global top-k.

Distances are squared L2 on int64 coords — exact in float64 (< 2^53),
emitted as BIGINT so oracle hashes match bit-for-bit.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..index import SpatialIndex
from ..localtree import LocalKDTree
from .skew import FANOUT_MIN_BLOBS
from .skew import hot_blobs as _hot_blobs
from .skew import split_by_salt as _split_by_salt


def _group_knn(qpts: np.ndarray, blobs, k: int, ub: np.ndarray | None,
               stats: dict | None = None):
    """Best-k over every blob of one cell group; returns (dist2, ids)."""
    m = qpts.shape[0]
    best_d = np.full((m, k), np.inf)
    best_i = np.full((m, k), -1, np.int64)
    bound = None if ub is None else np.asarray(ub, np.float64).copy()
    for blob in blobs:
        tree = LocalKDTree.from_bytes(blob)
        d, i = tree.knn(qpts, k, ub=bound, stats=stats)
        cat_d = np.concatenate([best_d, d], axis=1)
        cat_i = np.concatenate([best_i, i], axis=1)
        ordr = np.lexsort((cat_i, cat_d), axis=1)[:, :k]
        rows = np.arange(m)[:, None]
        best_d = cat_d[rows, ordr]
        best_i = cat_i[rows, ordr]
        if bound is not None:
            bound = np.minimum(bound, best_d[:, k - 1])
    return best_d, best_i


ENUM_CAP = 4096  # max geometrically-enumerated cells per query; beyond
                 # this (or ub = inf) the query joins the full stats table


def _candidate_cells(index: SpatialIndex, with_ub: DataFrame, cc: list,
                     coord_schema: str, k: int) -> DataFrame:
    """Phase 2: (qid, coords, ub, cell, maxsalt) candidate pairs.

    Per query, enumerate grid cells in the square of half-width
    floor(sqrt(ub))+1 around the query point (regular grid => pure
    arithmetic, no metadata needed), then equi-join on `cell` with the
    cell-stats table to (a) drop empty cells and (b) keep only cells
    whose data-bbox min-dist² <= ub — the same <= test the reference's
    p2b_min_distance makes, so equal-distance candidates survive for the
    (dist, id) tie-break. Queries whose square exceeds ENUM_CAP cells
    (or whose home probe found < k points, ub = inf) emit a sentinel
    (cell = -1) and join against the full stats table; a prefix-sum
    window over that join (cells ordered by min-dist², cumulate live
    counts until >= k, bound = max max-dist² over that prefix) replaces
    inf with a VALID finite kth-distance bound, so no query ever
    reaches phase 3 with an unbounded candidate set.

    Exactness of the window bound: the minimal prefix of cells (by
    min-dist²) whose live counts sum to >= k contains k live points,
    each at distance² <= the prefix's max max-dist²; hence the true
    kth distance² <= that bound. All distance arithmetic here is exact
    (int64 diffs < 2^26, squares/sums < 2^53 in float64), matching the
    phase-3 kernels bit-for-bit.
    """
    grid = index.grid
    g, cw = grid.g, grid.cw
    xcol, ycol = cc[0], cc[1]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            qx = pdf[xcol].to_numpy(np.int64)
            qy = pdf[ycol].to_numpy(np.int64)
            ub = pdf["ub"].to_numpy(np.float64)
            finite = np.isfinite(ub)
            # +1 guards the (theoretical) downward rounding of sqrt at
            # the boundary; over-coverage is corrected by the bbox join
            r = np.zeros(n, np.int64)
            r[finite] = np.floor(np.sqrt(ub[finite])).astype(np.int64) + 1
            cx0 = np.clip((qx - r) // cw, 0, g - 1)
            cx1 = np.clip((qx + r) // cw, 0, g - 1)
            cy0 = np.clip((qy - r) // cw, 0, g - 1)
            cy1 = np.clip((qy + r) // cw, 0, g - 1)
            nx, ny = cx1 - cx0 + 1, cy1 - cy0 + 1
            ncand = nx * ny
            small = finite & (ncand <= ENUM_CAP)
            idx = np.flatnonzero(small)
            counts = ncand[idx]
            total = int(counts.sum())
            # flat enumeration of each query's (cx0..cx1)x(cy0..cy1) block
            qrep = np.repeat(idx, counts)
            starts = np.zeros(len(idx), np.int64)
            if len(idx):
                starts[1:] = np.cumsum(counts)[:-1]
            within = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
            nyr = np.repeat(ny[idx], counts)
            cells = ((within // nyr + np.repeat(cx0[idx], counts)) * g
                     + within % nyr + np.repeat(cy0[idx], counts))
            big = np.flatnonzero(~small)
            rows_i = np.concatenate([qrep, big])
            cellcol = np.concatenate([cells, np.full(len(big), -1, np.int64)])
            out = {"qid": pdf["qid"].to_numpy(np.int64)[rows_i]}
            for c in cc:
                out[c] = pdf[c].to_numpy(np.int64)[rows_i]
            out["ub"] = ub[rows_i]
            out["cell"] = cellcol
            yield pd.DataFrame(out)

    enum = with_ub.mapInPandas(
        gen, f"qid long, {coord_schema}, ub double, cell long")
    stats = index.cell_stats()
    near = enum.filter(F.col("cell") >= 0).join(stats, "cell")
    far = enum.filter(F.col("cell") < 0).drop("cell").crossJoin(stats)
    # exact bbox min-dist² <= ub over ALL dims (stats carry the full-d
    # data bbox, so d>2 pruning is tight, not xy-only), all JVM-side
    # codegen; the double math (exact int diff -> one multiply -> adds
    # left-to-right) matches numpy float64
    mind2 = (F.pow(F.greatest(F.col("xmin") - F.col(xcol),
                              F.col(xcol) - F.col("xmax"), F.lit(0)), 2)
             + F.pow(F.greatest(F.col("ymin") - F.col(ycol),
                                F.col(ycol) - F.col("ymax"), F.lit(0)), 2))
    # farthest-corner distance² to the cell's data bbox (>= any point in
    # the cell): per-dim max(q - lo, hi - q) is >= 0 whenever lo <= hi
    maxd2 = (F.pow(F.greatest(F.col(xcol) - F.col("xmin"),
                              F.col("xmax") - F.col(xcol)), 2)
             + F.pow(F.greatest(F.col(ycol) - F.col("ymin"),
                                F.col("ymax") - F.col(ycol)), 2))
    for j in range(2, len(cc)):
        mind2 = mind2 + F.pow(
            F.greatest(F.col(f"mn{j}") - F.col(cc[j]),
                       F.col(cc[j]) - F.col(f"mx{j}"), F.lit(0)), 2)
        maxd2 = maxd2 + F.pow(
            F.greatest(F.col(cc[j]) - F.col(f"mn{j}"),
                       F.col(f"mx{j}") - F.col(cc[j])), 2)

    keep = ["qid", *cc, "ub", "cell", "maxsalt"]
    near_out = near.filter(mind2 <= F.col("ub")).select(*keep)

    # fallback path: derive the finite window bound, then prune with it.
    # One qid-partitioned window (metadata-only rows), no blobs touched.
    wq = Window.partitionBy("qid")
    wcum = (wq.orderBy(F.col("mind2").asc(), F.col("cell").asc())
            .rowsBetween(Window.unboundedPreceding, -1))
    far_out = (far.withColumn("mind2", mind2).withColumn("maxd2", maxd2)
               .withColumn("cum", F.coalesce(F.sum("ccnt").over(wcum),
                                             F.lit(0)))
               .withColumn("ubw", F.max(F.when(F.col("cum") < k,
                                               F.col("maxd2"))).over(wq))
               .withColumn("ub", F.least("ub", F.coalesce("ubw", "ub")))
               .filter(F.col("mind2") <= F.col("ub"))
               .select(*keep))
    return near_out.unionByName(far_out)


def knn_candidates(index: SpatialIndex, queries: DataFrame, k: int
                   ) -> DataFrame:
    """Phases 1+2: (qid, coords, ub, cell, maxsalt) candidate pairs.
    Exposed separately so bench can audit pruning quality (candidate
    cells per query — the reference's visited-node counters analogue,
    testFramework.h:505-517)."""
    grid = index.grid
    cc = list(index.coord_cols)
    qcell = queries.selectExpr(
        "qid", *cc, f"{grid.spark_cell_sql(cc[0], cc[1])} AS cell")
    coord_schema = ", ".join(f"{c} long" for c in cc)

    # ---- phase 1: home-cell upper bound. A cheap VALID bound (deepest
    # >=max(2k,128)-point block's kth distance, LocalKDTree.knn_bound)
    # replaces the exact home-cell search: the bound is slightly looser
    # (a few % more phase-2/3 candidates) but ~20x cheaper at per-cell
    # batch sizes, and phase 3 recomputes exactly under it anyway.
    def home_ub(key, qpdf: pd.DataFrame, ipdf: pd.DataFrame) -> pd.DataFrame:
        if len(qpdf) == 0:
            return pd.DataFrame(columns=["qid", *cc, "ub"])
        out = qpdf[["qid", *cc]].copy()
        if len(ipdf) == 0:
            out["ub"] = np.inf
            return out
        qpts = qpdf[cc].to_numpy(np.int64)
        ub = np.full(len(qpdf), np.inf)
        for blob in ipdf["blob"]:
            tree = LocalKDTree.from_bytes(blob)
            ub = np.minimum(ub, tree.knn_bound(qpts, k))
        out["ub"] = ub
        return out

    ub_schema = f"qid long, {coord_schema}, ub double"
    # queries in salted home cells probe one blob per (cell, salt) task
    # and take the min bound; the left join marks them (null => cold).
    # The join keys on `cell`, the same partitioning the cogroup needs,
    # so it folds into the shuffle phase 1 pays anyway.
    qstat = qcell.join(index.cell_stats().select("cell", "maxsalt"),
                       "cell", "left")
    hot_pred = F.coalesce(F.col("maxsalt"), F.lit(0)) + 1 >= FANOUT_MIN_BLOBS
    cold_q = qstat.filter(~hot_pred).drop("maxsalt")
    hot_q = (qstat.filter(hot_pred)
             .withColumn("salt", F.explode(
                 F.sequence(F.lit(0), F.col("maxsalt"))))
             .drop("maxsalt"))
    cold_ub = (cold_q.groupby("cell")
               .cogroup(index.df.groupby("cell"))
               .applyInPandas(home_ub, ub_schema))
    hot_ub = (hot_q.groupby("cell", "salt")
              .cogroup(_hot_blobs(index).groupby("cell", "salt"))
              .applyInPandas(home_ub, ub_schema)
              .groupBy("qid", *cc).agg(F.min("ub").alias("ub")))
    with_ub = cold_ub.unionByName(hot_ub)

    # ---- phase 2: candidate (qid, cell) pairs, Spark-side
    return _candidate_cells(index, with_ub, cc, coord_schema, k)


def knn_join(index: SpatialIndex, queries: DataFrame, k: int) -> DataFrame:
    """queries: (qid long, <coord cols> long) -> (qid, rank, nid, dist_sq).

    d >= 2 supported: distances use all coord dims; the cell-level bbox
    pruning (phase 2) uses only the two grid dims — a lower bound on the
    full-d distance, so exactness is preserved for any d."""
    cc = list(index.coord_cols)
    # the cold/hot split consumes the candidate set twice; checkpoint
    # the (small, O(queries x cells-per-query)) candidates so phases
    # 1+2 — two cogroups and a stats join — run once, not once per
    # branch (blocks are freed by the ContextCleaner once the result
    # is no longer referenced)
    cand = knn_candidates(index, queries, k).localCheckpoint(eager=True)

    # ---- phase 3: per-cell local top-k with ub pruning; hot (salted)
    # cells fan out to one task per blob (cogroup on (cell, salt)) so
    # varden-style clustering can't serialize a cell's queries on one
    # task — the per-blob searches lose cross-blob bound tightening,
    # which phase 4's exact merge absorbs
    def cell_knn(key, qpdf: pd.DataFrame, ipdf: pd.DataFrame) -> pd.DataFrame:
        if len(qpdf) == 0 or len(ipdf) == 0:
            return pd.DataFrame(columns=["qid", "nid", "dist_sq"])
        qpts = qpdf[cc].to_numpy(np.int64)
        ub = qpdf["ub"].to_numpy(np.float64)
        d, i = _group_knn(qpts, ipdf["blob"], k, ub)
        qid = np.repeat(qpdf["qid"].to_numpy(np.int64), k)
        dd = d.ravel()
        ii = i.ravel()
        ok = np.isfinite(dd)
        return pd.DataFrame({"qid": qid[ok], "nid": ii[ok],
                             "dist_sq": dd[ok]})

    out_schema = "qid long, nid long, dist_sq double"
    cold, hot = _split_by_salt(cand)
    local = (cold.groupby("cell")
             .cogroup(index.df.groupby("cell"))
             .applyInPandas(cell_knn, out_schema)
             .unionByName(
                 hot.groupby("cell", "salt")
                 .cogroup(_hot_blobs(index).groupby("cell", "salt"))
                 .applyInPandas(cell_knn, out_schema)))

    # ---- phase 4: global exact top-k
    w = Window.partitionBy("qid").orderBy(F.col("dist_sq").asc(),
                                          F.col("nid").asc())
    return (local.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "rank", "nid",
                    F.col("dist_sq").cast("long").alias("dist_sq")))


def knn_scan_stats(index: SpatialIndex, queries: DataFrame, k: int
                   ) -> DataFrame:
    """Per-query work counters for the exact kNN join: (qid, scanned,
    leaves) — points distance-compared and leaf blocks visited across
    all candidate cells (phase-3 work only; the phase-1 bound probe
    scans one fixed-size block per query by construction). This is the
    bench-side analogue of the reference's visited-node kNN audit
    (tests/testFramework.h:505-517, knn.csv last column); it reruns the
    search with counting on, so it is for audits, not the hot path."""
    cc = list(index.coord_cols)
    cand = knn_candidates(index, queries, k).localCheckpoint(eager=True)

    def cell_count(key, qpdf: pd.DataFrame, ipdf: pd.DataFrame
                   ) -> pd.DataFrame:
        if len(qpdf) == 0 or len(ipdf) == 0:
            return pd.DataFrame(columns=["qid", "scanned", "leaves"])
        qpts = qpdf[cc].to_numpy(np.int64)
        ub = qpdf["ub"].to_numpy(np.float64)
        st: dict = {}
        _group_knn(qpts, ipdf["blob"], k, ub, stats=st)
        return pd.DataFrame({"qid": qpdf["qid"].to_numpy(np.int64),
                             "scanned": st["scanned"],
                             "leaves": st["leaves"]})

    cnt_schema = "qid long, scanned long, leaves long"
    cold, hot = _split_by_salt(cand)
    per_cell = (cold.groupby("cell")
                .cogroup(index.df.groupby("cell"))
                .applyInPandas(cell_count, cnt_schema)
                .unionByName(
                    hot.groupby("cell", "salt")
                    .cogroup(_hot_blobs(index).groupby("cell", "salt"))
                    .applyInPandas(cell_count, cnt_schema)))
    return (per_cell.groupBy("qid")
            .agg(F.sum("scanned").alias("scanned"),
                 F.sum("leaves").alias("leaves")))
