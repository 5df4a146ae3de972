"""Orthogonal range count / range report / circle count (Q4-Q7, H4-H5).

Two-level plan mirroring the reference's 3-way recursion
(`query_op/range_count.hpp:9-96`): cells disjoint from a box are never
touched (bbox-stats filter — the partition-pruning analogue); cells whose
data-bbox is *contained* contribute their stored count without reading a
blob (the "contained -> node.size" shortcut, range_count.hpp:78-80);
boundary cells go to a cogrouped pandas UDF that runs the per-cell tree's
vectorized count/report.

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


def _boxes_df(index: SpatialIndex, boxes) -> DataFrame:
    """boxes: list of (box_id, xlo, ylo, xhi, yhi) -> small DataFrame."""
    return index.spark.createDataFrame(
        [(int(b), int(x0), int(y0), int(x1), int(y1))
         for b, x0, y0, x1, y1 in boxes],
        "box_id long, bxlo long, bylo long, bxhi long, byhi long")


def _cell_stats_df(index: SpatialIndex) -> DataFrame:
    """Per-cell union bbox + live count (no blobs touched) — the cached
    Spark-side stats table (index.cell_stats); nothing is collected to
    the driver, so pruning scales to arbitrary cell counts."""
    return index.cell_stats()


def range_count(index: SpatialIndex, boxes) -> DataFrame:
    """-> (box_id, cnt). Exact, inclusive bounds."""
    bdf = _boxes_df(index, boxes)
    stats = _cell_stats_df(index)
    joined = stats.join(
        F.broadcast(bdf),
        (F.col("xmin") <= F.col("bxhi")) & (F.col("xmax") >= F.col("bxlo"))
        & (F.col("ymin") <= F.col("byhi")) & (F.col("ymax") >= F.col("bylo")))
    contained = ((F.col("xmin") >= F.col("bxlo")) & (F.col("xmax") <= F.col("bxhi"))
                 & (F.col("ymin") >= F.col("bylo")) & (F.col("ymax") <= F.col("byhi")))
    full = (joined.filter(contained)
            .groupBy("box_id").agg(F.sum("ccnt").alias("cnt")))
    partial_pairs = joined.filter(~contained).select(
        "box_id", "bxlo", "bylo", "bxhi", "byhi", "cell")

    def scan(key, bpdf: pd.DataFrame, ipdf: pd.DataFrame) -> pd.DataFrame:
        if len(bpdf) == 0 or len(ipdf) == 0:
            return pd.DataFrame(columns=["box_id", "cnt"])
        qboxes = bpdf[["bxlo", "bylo", "bxhi", "byhi"]].to_numpy(np.int64)
        total = np.zeros(len(bpdf), np.int64)
        for blob in ipdf["blob"]:
            total += LocalKDTree.from_bytes(blob).range_count(qboxes)
        return pd.DataFrame({"box_id": bpdf["box_id"].to_numpy(np.int64),
                             "cnt": total})

    part = (partial_pairs.groupby("cell")
            .cogroup(index.df.groupby("cell"))
            .applyInPandas(scan, "box_id long, cnt long"))

    all_counts = full.unionByName(part)
    # boxes with zero matches must still appear with cnt=0
    return (F.broadcast(bdf.select("box_id"))
            .join(all_counts.groupBy("box_id").agg(F.sum("cnt").alias("c")),
                  "box_id", "left")
            .select("box_id", F.coalesce("c", F.lit(0)).alias("cnt")))


def range_report(index: SpatialIndex, boxes) -> DataFrame:
    """-> (box_id, pid, x, y): every live point inside each box."""
    bdf = _boxes_df(index, boxes)
    stats = _cell_stats_df(index)
    pairs = stats.join(
        F.broadcast(bdf),
        (F.col("xmin") <= F.col("bxhi")) & (F.col("xmax") >= F.col("bxlo"))
        & (F.col("ymin") <= F.col("byhi")) & (F.col("ymax") >= F.col("bylo"))
    ).select("box_id", "bxlo", "bylo", "bxhi", "byhi", "cell")

    def scan(key, bpdf: pd.DataFrame, ipdf: pd.DataFrame) -> pd.DataFrame:
        if len(bpdf) == 0 or len(ipdf) == 0:
            return pd.DataFrame(columns=["box_id", "pid", "x", "y"])
        qboxes = bpdf[["bxlo", "bylo", "bxhi", "byhi"]].to_numpy(np.int64)
        bids = bpdf["box_id"].to_numpy(np.int64)
        outs = []
        for blob in ipdf["blob"]:
            bi, pp, ii = LocalKDTree.from_bytes(blob).range_report(qboxes)
            if len(ii):
                outs.append(pd.DataFrame({
                    "box_id": bids[bi], "pid": ii,
                    "x": pp[:, 0], "y": pp[:, 1]}))
        if not outs:
            return pd.DataFrame(columns=["box_id", "pid", "x", "y"])
        return pd.concat(outs, ignore_index=True)

    return (pairs.groupby("cell")
            .cogroup(index.df.groupby("cell"))
            .applyInPandas(scan, "box_id long, pid long, x long, y long"))


def circle_count(index: SpatialIndex, circles) -> DataFrame:
    """circles: list of (circle_id, cx, cy, r) -> (circle_id, cnt).

    Counts points with squared distance <= r² (range_count.hpp:99-131).
    """
    spark = index.spark
    cdf = spark.createDataFrame(
        [(int(c), int(x), int(y), int(r)) for c, x, y, r in circles],
        "circle_id long, cx long, cy long, r long")
    stats = _cell_stats_df(index)
    dx = F.greatest(F.col("xmin") - F.col("cx"), F.col("cx") - F.col("xmax"),
                    F.lit(0))
    dy = F.greatest(F.col("ymin") - F.col("cy"), F.col("cy") - F.col("ymax"),
                    F.lit(0))
    mind2 = dx * dx + dy * dy
    fx = F.greatest(F.abs(F.col("cx") - F.col("xmin")),
                    F.abs(F.col("cx") - F.col("xmax")))
    fy = F.greatest(F.abs(F.col("cy") - F.col("ymin")),
                    F.abs(F.col("cy") - F.col("ymax")))
    maxd2 = fx * fx + fy * fy
    r2 = F.col("r") * F.col("r")
    joined = stats.join(F.broadcast(cdf), mind2 <= r2)
    full = (joined.filter(maxd2 <= r2)
            .groupBy("circle_id").agg(F.sum("ccnt").alias("cnt")))
    partial = joined.filter(maxd2 > r2).select("circle_id", "cx", "cy", "r",
                                               "cell")

    def scan(key, cpdf: pd.DataFrame, ipdf: pd.DataFrame) -> pd.DataFrame:
        if len(cpdf) == 0 or len(ipdf) == 0:
            return pd.DataFrame(columns=["circle_id", "cnt"])
        centers = cpdf[["cx", "cy"]].to_numpy(np.int64)
        radii = cpdf["r"].to_numpy(np.float64)
        total = np.zeros(len(cpdf), np.int64)
        for blob in ipdf["blob"]:
            total += LocalKDTree.from_bytes(blob).circle_count(centers, radii)
        return pd.DataFrame({"circle_id": cpdf["circle_id"].to_numpy(np.int64),
                             "cnt": total})

    part = (partial.groupby("cell")
            .cogroup(index.df.groupby("cell"))
            .applyInPandas(scan, "circle_id long, cnt long"))
    all_counts = full.unionByName(part)
    return (F.broadcast(cdf.select("circle_id"))
            .join(all_counts.groupBy("circle_id").agg(F.sum("cnt").alias("c")),
                  "circle_id", "left")
            .select("circle_id", F.coalesce("c", F.lit(0)).alias("cnt")))
