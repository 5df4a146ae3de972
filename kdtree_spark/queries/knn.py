"""Distributed exact kNN join (Q1/Q2/Q3 + H3 of SURVEY §2).

The reference answers each kNN query by descending one in-memory tree,
visiting the sibling subtree only when its bounding-box min-distance
beats the current kth-best (`query_op/nn_search.hpp:83-126`). Across a
cluster that sibling-pruning becomes *cell* pruning:

  phase 1  queries cogroup with their HOME cell -> local top-k gives a
           per-query upper bound ub on the kth distance
  phase 2  per-cell bbox stats (driver-broadcast numpy) -> every cell
           whose data-bbox min-distance² <= ub is a candidate
           (p2b_min_distance analogue, nn_search.hpp:22-35); queries
           that found < k neighbours at home get ub = inf
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

from ..grid import box_min_dist2
from ..index import SpatialIndex
from ..localtree import LocalKDTree


def _group_knn(qpts: np.ndarray, blobs, k: int, ub: np.ndarray | None):
    """Best-k over every blob of one cell group; returns (dist2, ids)."""
    m = qpts.shape[0]
    best_d = np.full((m, k), np.inf)
    best_i = np.full((m, k), -1, np.int64)
    bound = None if ub is None else np.asarray(ub, np.float64).copy()
    for blob in blobs:
        tree = LocalKDTree.from_bytes(blob)
        d, i = tree.knn(qpts, k, ub=bound)
        cat_d = np.concatenate([best_d, d], axis=1)
        cat_i = np.concatenate([best_i, i], axis=1)
        ordr = np.lexsort((cat_i, cat_d), axis=1)[:, :k]
        rows = np.arange(m)[:, None]
        best_d = cat_d[rows, ordr]
        best_i = cat_i[rows, ordr]
        if bound is not None:
            bound = np.minimum(bound, best_d[:, k - 1])
    return best_d, best_i


def knn_join(index: SpatialIndex, queries: DataFrame, k: int) -> DataFrame:
    """queries: (qid long, <coord cols> long) -> (qid, rank, nid, dist_sq).

    d >= 2 supported: distances use all coord dims; the cell-level bbox
    pruning (phase 2) uses only the two grid dims — a lower bound on the
    full-d distance, so exactness is preserved for any d."""
    spark = index.spark
    grid = index.grid
    cc = list(index.coord_cols)
    qcell = queries.selectExpr(
        "qid", *cc, f"{grid.spark_cell_sql(cc[0], cc[1])} AS cell")
    coord_schema = ", ".join(f"{c} long" for c in cc)

    # ---- phase 1: home-cell upper bound
    def home_ub(key, qpdf: pd.DataFrame, ipdf: pd.DataFrame) -> pd.DataFrame:
        if len(qpdf) == 0:
            return pd.DataFrame(columns=["qid", *cc, "ub"])
        out = qpdf[["qid", *cc]].copy()
        if len(ipdf) == 0:
            out["ub"] = np.inf
            return out
        qpts = qpdf[cc].to_numpy(np.int64)
        d, _ = _group_knn(qpts, ipdf["blob"], k, None)
        out["ub"] = d[:, k - 1]
        return out

    with_ub = (qcell.groupby("cell")
               .cogroup(index.df.groupby("cell"))
               .applyInPandas(home_ub, f"qid long, {coord_schema}, ub double"))

    # ---- phase 2: candidate (qid, cell) pairs from broadcast cell stats
    stats = index.stats()
    agg = stats[stats["cnt"] > 0].groupby("cell").agg(
        xmin=("xmin", "min"), ymin=("ymin", "min"),
        xmax=("xmax", "max"), ymax=("ymax", "max")).reset_index()
    cells_np = agg["cell"].to_numpy(np.int64)
    boxes_np = agg[["xmin", "ymin", "xmax", "ymax"]].to_numpy(np.int64)
    bc = spark.sparkContext.broadcast((cells_np, boxes_np))

    def gen_candidates(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cells, boxes = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            qx = pdf[cc[0]].to_numpy(np.int64)
            qy = pdf[cc[1]].to_numpy(np.int64)
            ub = pdf["ub"].to_numpy(np.float64)
            mind2 = box_min_dist2(qx, qy, boxes)  # (nq, ncell), xy bound
            # <= (not <): equal-distance candidates matter for id tie-break
            hit_q, hit_c = np.nonzero(mind2 <= ub[:, None])
            out = {"qid": pdf["qid"].to_numpy(np.int64)[hit_q]}
            for c in cc:
                out[c] = pdf[c].to_numpy(np.int64)[hit_q]
            out["ub"] = ub[hit_q]
            out["cell"] = cells[hit_c]
            yield pd.DataFrame(out)

    cand = with_ub.mapInPandas(
        gen_candidates, f"qid long, {coord_schema}, ub double, cell long")

    # ---- phase 3: per-cell local top-k with ub pruning
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

    local = (cand.groupby("cell")
             .cogroup(index.df.groupby("cell"))
             .applyInPandas(cell_knn, "qid long, nid long, dist_sq double"))

    # ---- phase 4: global exact top-k
    w = Window.partitionBy("qid").orderBy(F.col("dist_sq").asc(),
                                          F.col("nid").asc())
    return (local.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "rank", "nid",
                    F.col("dist_sq").cast("long").alias("dist_sq")))
