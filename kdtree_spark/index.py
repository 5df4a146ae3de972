"""The two-level distributed spatial index.

Top level: grid-cell partition key (grid.py) — the shuffle that plays the
role of the reference's sampled 6-level top-of-tree + counting-sort bucket
shuffle (`build_tree.hpp:49-121`). Bottom level: a serialized numpy
kd-tree per (cell, salt) built inside `applyInPandas` (localtree.py).

Skew handling (the dummy-leaf / INBALANCE analogue at the distributed
level, plus what BASELINE.json calls out): cells whose row count exceeds
`hot_cell_cap` are salted into multiple index rows; every query operator
cogroups on `cell` and scans all of a cell's blobs vectorized, so salting
is invisible to query semantics. AQE skew-join handles residual imbalance.

Updates are log-structured at BOTH levels (I1/D1/D2 of SURVEY §2):
inside a cell, new rows append to the extra log / tombstone set and
rebuild only past the INBALANCE_RATIO=30 threshold (`tree_node.hpp:
127-131` analogue); across the index, each batch produces a
checkpointed touched-cell DELTA fragment layered over the inherited
fragments with broadcast anti-joins, compacted every COMPACT_EVERY
generations — untouched cells are never shuffled, deserialized, or
rewritten. Deletes are partial-cover tolerant (`batch_delete.hpp:
95-107`).

Persistence is write-audit-publish: parquet + JSON manifest written to a
temp dir, audited (row counts), then atomically renamed — the checkpoint
/ lineage story. Each manifest records per-cell counts, depths and build
metrics (the analogue of the reference's per-run timing lines).
"""

from __future__ import annotations

import json
import os
import time
import uuid

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .grid import Grid
from .localtree import LocalKDTree

INDEX_SCHEMA = ("cell long, salt int, cnt long, nextra long, ntomb long, "
                "depth int, xmin long, ymin long, xmax long, ymax long, "
                "bbox array<bigint>, probe array<bigint>, blob binary")

# float-coordinate mode (the reference's double-coordinate test build,
# comparator.h:10-79): same layout, double-typed coordinate metadata
INDEX_SCHEMA_F64 = INDEX_SCHEMA.replace(
    "xmin long, ymin long, xmax long, ymax long",
    "xmin double, ymin double, xmax double, ymax double").replace(
    "array<bigint>", "array<double>", 1).replace(
    "probe array<bigint>", "probe array<double>")

PYRAMID_FACTOR = 4  # per-dim coarsening per stats-pyramid level

SUPER_MAX_CELLS = 4096  # super-cell stats table row cap: small enough
# to broadcast for the sparse-query kNN fallback at ANY scale (1.2e8
# fine cells at the 1e12-row projection coarsen to these 4096). The
# per-dim cap follows from the grid's dims: 64 for 2-D, 16 for 3-D.


def _super_max_g(dims: int) -> int:
    return max(1, int(SUPER_MAX_CELLS ** (1.0 / dims)))

STATS_COLS = ["cell", "salt", "cnt", "nextra", "ntomb", "depth",
              "xmin", "ymin", "xmax", "ymax"]

HOT_CELL_CAP = 131_072  # rows per index blob before salting splits it

COMPACT_EVERY = int(os.environ.get("KDS_COMPACT_EVERY", "8"))
# delta-update generations before a full compaction checkpoint

PROBE_CAP = int(os.environ.get("KDS_PROBE_CAP", "1024"))
PROBE_FRACTION = int(os.environ.get("KDS_PROBE_FRACTION", "32"))
# sample at least 1/PROBE_FRACTION of the blob's live points
# live-sample points per blob for kNN bound-seeding (localtree.
# probe_sample). The seed bound tightens as (blob/cap)^(1/d) in radius;
# sampling a bounded FRACTION (>= a d-scaled floor) caps the looseness
# factor at PROBE_FRACTION^(2/d) in distance² for every blob size —
# oversized blobs (salted hot cells, coarse test grids) would otherwise
# dilute a fixed-size sample into a useless bound. Sample bytes stay
# <= ~3% of blob bytes, and only queried home cells' samples ever ship.
# High-d floors: looseness costs candidate cells quadratically in the
# two gridded dims while sample bytes grow only linearly; measured at
# sf0.1/d=5 (alternated A/B, best-of-3): floor 1024 -> 15.6s, 4096 ->
# 11.2s for the kNN k=10 leg.


def _probe_cap(d: int, n_live: int) -> int:
    floor = PROBE_CAP * min(2 ** (d - 2), 4) if d > 2 else PROBE_CAP
    return max(floor, n_live // PROBE_FRACTION)


def _tree_row(cell: int, salt: int, tree: LocalKDTree) -> dict:
    d = tree.pts.shape[1]
    cdt = tree.cdtype
    if tree.n_base:
        root = tree.nbox[0]
        lo = root[:d].astype(cdt).copy()
        hi = root[d:].astype(cdt).copy()
    else:
        lo = np.zeros(d, cdt)
        hi = np.full(d, -1, cdt)
    # widen bbox to cover the extra log (stats must stay a valid superset)
    if len(tree.extra_ids):
        lo = np.minimum(lo, tree.extra_pts.min(axis=0))
        hi = np.maximum(hi, tree.extra_pts.max(axis=0))
    # xmin..ymax: the two grid dims (fast path for 2-D range ops);
    # bbox: all d dims, the tight phase-2 kNN bound for d > 2
    return dict(cell=cell, salt=salt, cnt=tree.n_live,
                nextra=len(tree.extra_ids), ntomb=len(tree.tomb_ids),
                depth=tree.depth,
                xmin=lo[0].item(), ymin=lo[1].item(),
                xmax=hi[0].item(), ymax=hi[1].item(),
                bbox=np.concatenate([lo, hi]).tolist(),
                probe=tree.probe_sample(cap=_probe_cap(d, tree.n_live)),
                blob=tree.to_bytes())


def _build_group(pdf: pd.DataFrame) -> pd.DataFrame:
    cell = int(pdf["cell"].iloc[0])
    salt = int(pdf["salt"].iloc[0])
    coord_cols = [c for c in pdf.columns
                  if c not in ("pid", "cell", "salt")]
    pts = pdf[coord_cols].to_numpy()
    pts = pts.astype(np.float64 if pts.dtype.kind == "f" else np.int64,
                     copy=False)
    ids = pdf["pid"].to_numpy(np.int64)
    tree = LocalKDTree.build(pts, ids)
    return pd.DataFrame([_tree_row(cell, salt, tree)])


class SpatialIndex:
    def __init__(self, spark: SparkSession, grid: Grid, df: DataFrame,
                 manifest: dict | None = None,
                 coord_cols: tuple = ("x", "y")):
        self.spark = spark
        self.grid = grid
        self.df = df
        self.manifest = manifest or {}
        self.coord_cols = tuple(coord_cols)
        # float-coordinate mode is carried by the blob table's own
        # schema (double metadata columns), so load()/snapshots keep it
        from pyspark.sql.types import DoubleType
        self.float_coords = isinstance(df.schema["xmin"].dataType,
                                       DoubleType)
        self._stats_pd: pd.DataFrame | None = None
        self._cell_stats: DataFrame | None = None
        self._super_stats: DataFrame | None = None
        self._pyramid: list | None = None
        # delta versioning (update()): df == union of fragments; each
        # update checkpoints ONLY its touched-cell delta and layers a
        # broadcast anti-join over inherited fragments. _ckpt_handles
        # maps fragment key -> materialized-RDD handle (for freeing
        # checkpoint blocks); _cached_frames lists cache()d frames this
        # version's plan still references (for successor-aware release).
        self._frags: list[DataFrame] = [df]
        self._ckpt_handles: dict[str, object] = {}
        self._cached_frames: list[DataFrame] = []

    # ------------------------------------------------------------------ build
    @classmethod
    def build(cls, spark: SparkSession, points: DataFrame,
              grid: Grid | None = None, n_hint: int | None = None,
              hot_cell_cap: int = HOT_CELL_CAP,
              coord_cols: tuple = ("x", "y")) -> "SpatialIndex":
        """points: DataFrame(pid long, <coord_cols> long|double). Bulk
        load (B1-B7). d = len(coord_cols) >= 2; the grid cell (top
        level) always keys on the first two dims — for d>2 the per-cell
        trees split on all d (max-stretch), and xy-only cell pruning
        remains a valid lower bound. Double coordinates switch the
        whole index (blobs, stats, probes) to float mode — the
        reference's double test build (comparator.h:10-79); exact-
        integer mode is the default and matches its `long` coords."""
        t0 = time.time()
        n = n_hint if n_hint is not None else points.count()
        grid = grid or Grid.for_count(n)
        assert grid.dims <= len(coord_cols), (grid.dims, coord_cols)
        from pyspark.sql.types import DoubleType, FloatType
        fmode = isinstance(points.schema[coord_cols[0]].dataType,
                           (DoubleType, FloatType))
        cols = list(coord_cols)
        if fmode:
            cexprs = [f"CAST({c} AS double) AS {c}" for c in coord_cols]
            cell_sql = grid.spark_cell_sql_f64_nd(cols)
        else:
            # int32 coords/cell through the shuffle + Arrow hop (coords
            # are < 1e6, cell < g^dims < 2^31): 1/3 fewer bytes on the
            # hot path
            cexprs = [f"CAST({c} AS int) AS {c}" for c in coord_cols]
            cell_sql = grid.spark_cell_sql_nd(cols)
        cell_t = "int" if grid.g ** grid.dims < 2 ** 31 else "long"
        pts = points.selectExpr(
            "pid", *cexprs, f"CAST({cell_sql} AS {cell_t}) AS cell")

        # salting plan from per-cell counts (the sampled-pivot round's
        # analogue: one cheap agg instead of a sample)
        counts = pts.groupBy("cell").agg(F.count("*").alias("c"))
        nsplit = counts.select(
            "cell",
            (F.floor((F.col("c") - 1) / F.lit(hot_cell_cap)) + 1)
            .cast("int").alias("nsplit"))
        pts = (pts.join(F.broadcast(nsplit), "cell")
               .withColumn("salt",
                           F.when(F.col("nsplit") <= 1, F.lit(0))
                           .otherwise(F.pmod(F.col("pid"), F.col("nsplit")))
                           .cast("int"))
               .drop("nsplit"))

        built = pts.groupBy("cell", "salt").applyInPandas(
            _build_group, INDEX_SCHEMA_F64 if fmode else INDEX_SCHEMA)
        # cache pre-clustered by cell: every query cogroups on "cell", and
        # a cached HashPartitioning(cell) lets the planner skip re-shuffling
        # the blob side on each query (exchange reuse across jobs)
        df = built.repartition("cell").cache()
        ncells = df.count()  # materialize
        manifest = dict(kind="build", n=n, grid_g=grid.g,
                        grid_dims=grid.dims, cells=ncells,
                        wall_sec=time.time() - t0,
                        coord_cols=list(coord_cols),
                        version=str(uuid.uuid4())[:8])
        idx = cls(spark, grid, df, manifest, coord_cols=coord_cols)
        idx._cached_frames = [df]
        return idx

    def cell_sql(self, x: str, y: str) -> str:
        """Grid-cell SQL matching this index's coordinate mode (2-D
        grids; d>2 coord columns beyond the grid dims are ignored)."""
        return self.cell_sql_nd([x, y])

    def cell_sql_nd(self, cols) -> str:
        """Grid-cell SQL over coordinate column names (first grid.dims
        are keyed), matching this index's coordinate mode."""
        return (self.grid.spark_cell_sql_f64_nd(cols) if self.float_coords
                else self.grid.spark_cell_sql_nd(cols))

    # ------------------------------------------------------------------ stats
    def stats(self) -> pd.DataFrame:
        """Per-blob stats (no blobs) as driver pandas — DIAGNOSTIC ONLY
        (validate()); O(cells) driver memory. Query pruning uses
        cell_stats() instead, which never leaves the cluster."""
        if self._stats_pd is None:
            self._stats_pd = self.df.select(*STATS_COLS).toPandas()
        return self._stats_pd

    def cell_stats(self) -> DataFrame:
        """Per-cell union bbox + live count, as a cached DataFrame —
        the pruning metadata for kNN phase 2 and range partition-pruning.
        Stays Spark-side: at 1.2e8 cells (the Grid.for_count projection
        for 1e12 rows) this is a few-GB cluster-resident table joined on
        `cell`, never a driver collect."""
        if self._cell_stats is None:
            d = len(self.coord_cols)
            # maxsalt: highest salt among NONEMPTY blobs — query operators
            # use it to split a hot (salted) cell's work across tasks; salts
            # in between with empty blobs are enumerated but match nothing
            aggs = [F.min("xmin").alias("xmin"), F.min("ymin").alias("ymin"),
                    F.max("xmax").alias("xmax"), F.max("ymax").alias("ymax"),
                    F.sum("cnt").alias("ccnt"),
                    F.max("salt").alias("maxsalt")]
            # dims >= 2: elementwise bbox union from the array column,
            # giving kNN phase 2 the tight full-d bound
            for j in range(2, d):
                aggs.append(F.min(F.col("bbox")[j]).alias(f"mn{j}"))
                aggs.append(F.max(F.col("bbox")[d + j]).alias(f"mx{j}"))
            agg = (self.df.filter(F.col("cnt") > 0)
                   .groupBy("cell").agg(*aggs))
            # re-alias every column: fresh expression ids, so queries can
            # join/cogroup stats-derived frames against index.df without
            # tripping the ambiguous-self-join analyzer check
            self._cell_stats = agg.select(
                *[F.col(c).alias(c) for c in agg.columns]).cache()
        return self._cell_stats

    def probes(self) -> DataFrame:
        """(cell, probe): per-blob live-point samples (localtree.
        probe_sample) — the phase-1 kNN bound-seeding side. A plain
        column projection of the cached index table: the per-query-job
        semi-join on home cells happens in queries/knn.py, so only the
        samples of cells a batch actually queries are ever shipped."""
        if "probe" in self.df.columns:
            return self.df.filter(F.col("cnt") > 0).select("cell", "probe")
        # legacy blobs (pre-probe snapshots): no samples — every query
        # seeds from the super-cell stats fallback instead
        return (self.df.limit(0)
                .select("cell", F.array().cast("array<bigint>")
                        .alias("probe")))

    def stats_pyramid(self) -> list:
        """Coarse stats levels above the fine grid for hierarchical
        range pruning: [(g_l, cw_l, stats_df)] from one level above
        fine upward, factor PYRAMID_FACTOR per dim per level, until a
        level is <= SUPER_MAX_G per dim (empty for small grids — the
        driver-gate Grid(8) runs level-free, exactly the old plan).

        Each level aggregates (ccnt, data bbox) from the level below
        and adds maxsalt=0 (coarse rows never reach a blob cogroup).
        Level ids nest by integer division, and a level cell's
        geometric width is exactly cw * F^l (x DIV (F*cw) ==
        (x DIV cw) DIV F), so geometric enumeration and id arithmetic
        agree at every level. This is the distributed analogue of the
        reference answering a large box from HIGH tree nodes
        (range_count.hpp:78-80) instead of visiting every leaf: a box
        costs O(perimeter) cells per level, never O(area) fine cells.
        """
        if getattr(self, "_pyramid", None) is None:
            F_ = PYRAMID_FACTOR
            levels = []
            cur = self.cell_stats()
            curg, curw = self.grid.g, self.grid.cw
            while curg > _super_max_g(self.grid.dims):
                ng = (curg + F_ - 1) // F_
                parent = F.expr(
                    self.grid.parent_cell_sql("cell", curg, F_, ng))
                aggs = [F.sum("ccnt").alias("ccnt"),
                        F.min("xmin").alias("xmin"),
                        F.min("ymin").alias("ymin"),
                        F.max("xmax").alias("xmax"),
                        F.max("ymax").alias("ymax")]
                for j in range(2, len(self.coord_cols)):
                    aggs.append(F.min(f"mn{j}").alias(f"mn{j}"))
                    aggs.append(F.max(f"mx{j}").alias(f"mx{j}"))
                agg = (cur.groupBy(parent.alias("cell")).agg(*aggs)
                       .withColumn("maxsalt", F.lit(0)))
                nxt = agg.select(
                    *[F.col(c).alias(c) for c in agg.columns]).cache()
                curg, curw = ng, curw * F_
                levels.append((curg, curw, nxt))
                cur = nxt
            self._pyramid = levels
        return self._pyramid

    def super_grid(self) -> tuple:
        """(S, sg): fine cells coarsen by S per dim into an sg-per-dim
        super grid with sg^dims <= SUPER_MAX_CELLS (<= 4096 rows)."""
        g = self.grid.g
        smax = _super_max_g(self.grid.dims)
        S = (g + smax - 1) // smax
        sg = (g + S - 1) // S
        return S, sg

    def super_stats(self) -> DataFrame:
        """Coarse-level stats: cell_stats re-aggregated onto the super
        grid — (scell, ccnt, xmin, ymin, xmax, ymax[, mn{j}, mx{j}]).
        At most 4096 rows at ANY index size (SUPER_MAX_G), so sparse
        kNN queries can bound their radius against it with a broadcast
        join instead of a crossJoin against the full O(cells) stats
        table (the reference analogue: the top levels of one global
        tree, build_tree.hpp:49-70, which every query can afford to
        descend)."""
        if self._super_stats is None:
            d = len(self.coord_cols)
            g = self.grid.g
            S, sg = self.super_grid()
            cs = self.cell_stats()
            scell = F.expr(self.grid.parent_cell_sql("cell", g, S, sg))
            aggs = [F.sum("ccnt").alias("ccnt"),
                    F.min("xmin").alias("xmin"), F.min("ymin").alias("ymin"),
                    F.max("xmax").alias("xmax"), F.max("ymax").alias("ymax")]
            for j in range(2, d):
                aggs.append(F.min(f"mn{j}").alias(f"mn{j}"))
                aggs.append(F.max(f"mx{j}").alias(f"mx{j}"))
            agg = cs.groupBy(scell.alias("scell")).agg(*aggs)
            self._super_stats = agg.select(
                *[F.col(c).alias(c) for c in agg.columns]).cache()
        return self._super_stats

    # ---------------------------------------------------------------- updates
    def update(self, inserts: DataFrame | None = None,
               deletes: DataFrame | None = None) -> "SpatialIndex":
        """Batch insert/delete (I1, D1/D2). Both args: (pid, <coord_cols>).

        Physical plan (the reference rebuilds only tagged subtrees,
        `inner_tree.hpp:78-95`; the distributed analogue is touching only
        updated cells): the distinct touched cells are broadcast; a
        broadcast semi-join feeds ONLY touched blobs into the Python
        cogroup, and the new version is the checkpointed touched-cell
        DELTA unioned with the inherited fragments behind broadcast
        anti-joins — untouched blobs are neither shuffled, deserialized,
        nor rewritten to storage, so a 0.01% batch pays O(batch), not
        O(index), in both compute AND materialized bytes. Every
        COMPACT_EVERY generations a full compaction checkpoint bounds
        the fragment count. Touched cells go log-structured with
        threshold rebuild. (For batches touching a large fraction of a
        huge grid, the broadcast of touched-cell ids grows with the
        batch, never with the index — at that ratio a rebuild is the
        honest competitor anyway.)

        Dimension-generic: works for any d = len(coord_cols) >= 2, same
        as the reference's dim-templated batch ops (`batch_insert.hpp:
        60-191`, `batch_delete.hpp:75-107`).

        Same-batch semantics: DELETES APPLY BEFORE INSERTS within one
        call. Deletes are routed by membership against the PRE-batch
        index, so a pid that appears in both `deletes` and `inserts` of
        the same batch has its old point removed (if present) and its
        new point inserted — the delete never targets the same batch's
        insert. Feeding the same pid twice through `inserts` of one
        batch is a caller error (ids are unique in the data model).
        """
        t0 = time.time()
        grid = self.grid
        cc = list(self.coord_cols)
        cdt = np.float64 if self.float_coords else np.int64
        schema = INDEX_SCHEMA_F64 if self.float_coords else INDEX_SCHEMA
        cell_sql = self.cell_sql_nd(cc)
        parts = []
        if inserts is not None:
            parts.append(inserts.selectExpr(
                "pid", *cc, f"{cell_sql} AS cell", "CAST(1 AS int) AS op"))
        if deletes is not None:
            parts.append(deletes.selectExpr(
                "pid", *cc, f"{cell_sql} AS cell", "CAST(0 AS int) AS op"))
        if not parts:
            return self
        ups = parts[0]
        for p in parts[1:]:
            ups = ups.unionByName(p)

        def apply_updates(key, updf: pd.DataFrame, idxdf: pd.DataFrame
                          ) -> pd.DataFrame:
            cell = int(key[0])
            if len(updf) == 0:
                return idxdf  # passthrough (unreachable post-semi-join)
            ins = updf[updf["op"] == 1]
            del_ = updf[updf["op"] == 0]
            out = []
            if len(idxdf) == 0:
                # brand-new cell: build from inserts alone
                if len(ins):
                    tree = LocalKDTree.build(
                        ins[cc].to_numpy(cdt),
                        ins["pid"].to_numpy(np.int64))
                    out.append(_tree_row(cell, 0, tree))
                return pd.DataFrame(out) if out else idxdf.iloc[0:0]
            nsalt = len(idxdf)
            ins_pts = ins[cc].to_numpy(cdt)
            ins_ids = ins["pid"].to_numpy(np.int64)
            del_pts = del_[cc].to_numpy(cdt)
            del_ids = del_["pid"].to_numpy(np.int64)
            ins_salt = (ins_ids % nsalt) if nsalt > 1 else np.zeros(
                len(ins_ids), np.int64)
            for j in range(len(idxdf)):
                row = idxdf.iloc[j]
                tree = LocalKDTree.from_bytes(row["blob"])
                m = ins_salt == j
                # deletes are routed by membership (exact, partial-cover)
                own = (np.isin(del_ids, tree.ids)
                       | np.isin(del_ids, tree.extra_ids))
                t2 = tree.with_updates(ins_pts[m], ins_ids[m],
                                       del_pts[own], del_ids[own])
                out.append(_tree_row(cell, int(row["salt"]), t2))
            return pd.DataFrame(out)

        # the touched-cell set outlives this call: the anti-join layer
        # keeps it in every descendant version's plan until compaction,
        # so its lineage must not reference the caller's input frames
        # (a streaming caller deletes evicted slice files) — checkpoint
        # truncates it to an O(batch) materialized list of cell ids
        # lazy: materializes inside the delta's checkpoint job below
        # (one fewer Spark job per update)
        touched = (ups.select("cell").distinct()
                   .localCheckpoint(eager=False))
        try:
            touched_rdd = touched._jdf.queryExecution().logical().rdd()
        except Exception:
            touched_rdd = None
        touched_blobs = self.df.join(F.broadcast(touched), "cell", "semi")
        new_blobs = (ups.groupby("cell")
                     .cogroup(touched_blobs.groupby("cell"))
                     .applyInPandas(apply_updates, schema))
        # DELTA versioning: checkpoint ONLY the rebuilt touched-cell
        # blobs — O(batch) materialization, never O(index). The new
        # version's df is the inherited fragments each filtered by a
        # broadcast anti-join on the touched cells (untouched blobs are
        # neither shuffled, deserialized, NOR rewritten to storage),
        # unioned with the delta. localCheckpoint truncates the delta's
        # lineage (which references the parent via the semi-join), so
        # chained updates grow the plan by one anti-join per fragment —
        # linear, not exponential.
        delta = new_blobs.localCheckpoint(eager=True)
        # handle to the checkpoint's materialized RDD (the LogicalRDD
        # the checkpointed frame wraps — queryExecution().toRdd() is
        # only a wrapper over it): DataFrame.unpersist is a cache-
        # manager call and does NOT free localCheckpoint blocks, so
        # unpersist() releases them through this handle instead of
        # waiting for nondeterministic GC + ContextCleaner
        try:
            delta_rdd = delta._jdf.queryExecution().logical().rdd()
        except Exception:
            delta_rdd = None
        frags = [f.join(F.broadcast(touched), "cell", "left_anti")
                 for f in self._frags] + [delta]
        handles = dict(self._ckpt_handles)
        handles[str(uuid.uuid4())[:8]] = delta_rdd
        handles[str(uuid.uuid4())[:8]] = touched_rdd
        cached = list(self._cached_frames)
        compacted = False
        if len(frags) > COMPACT_EVERY:
            # compaction: one full materialization every COMPACT_EVERY
            # generations bounds both fragment count and the anti-join
            # stack; the pre-compaction fragments' blocks are freed when
            # superseded versions call unpersist(successor=...) — they
            # are NOT inherited past this point.
            union = frags[0]
            for f in frags[1:]:
                union = union.unionByName(f)
            full = union.localCheckpoint(eager=True)
            try:
                full_rdd = full._jdf.queryExecution().logical().rdd()
            except Exception:
                full_rdd = None
            frags = [full]
            handles = {str(uuid.uuid4())[:8]: full_rdd}
            cached = []
            compacted = True
        new_df = frags[0]
        for f in frags[1:]:
            new_df = new_df.unionByName(f)
        # no per-update blob-row count: nothing load-bearing reads it
        # (save() audits its own row counts) and it cost a Spark job
        # per chained update
        manifest = dict(kind="update", base_version=self.manifest.get("version"),
                        frags=len(frags), compacted=compacted,
                        wall_sec=time.time() - t0,
                        coord_cols=cc, version=str(uuid.uuid4())[:8])
        new = SpatialIndex(self.spark, grid, new_df, manifest,
                           coord_cols=self.coord_cols)
        new._frags = frags
        new._ckpt_handles = handles
        new._cached_frames = cached
        # the touched-cell set (O(batch), never O(index)) lets an
        # incremental snapshot commit (catalog.SnapshotStore) rewrite
        # only the buckets this update changed
        new.touched_cells_df = touched
        return new

    def cache(self) -> "SpatialIndex":
        """Cache this version's blob table and register the cached frame
        for successor-aware release (used after load())."""
        self.df = self.df.cache()
        self._frags = [self.df]
        self._cached_frames = [self.df]
        return self

    def unpersist(self, successor: "SpatialIndex | None" = None) -> None:
        """Release this version's storage (streaming indexers call this
        on superseded versions to bound executor storage): the cached
        stats table always; cached blob frames and localCheckpoint RDD
        blocks ONLY where `successor` (the version that replaced this
        one) does not still reference them — a delta-update child shares
        its parent's fragments, so freeing those would sever the child's
        truncated lineage. After a compaction the child inherits
        nothing, and the superseded version's whole storage is freed."""
        pyramid = [s for _, _, s in (getattr(self, "_pyramid", None) or [])]
        for st in (self._cell_stats, self._super_stats, *pyramid):
            try:
                if st is not None:
                    st.unpersist()
            except Exception:
                pass
        succ_cached = successor._cached_frames if successor is not None else []
        succ_keys = (set(successor._ckpt_handles)
                     if successor is not None else set())
        for fr in self._cached_frames:
            if not any(fr is sc for sc in succ_cached):
                try:
                    fr.unpersist()
                except Exception:
                    pass
        for key, h in self._ckpt_handles.items():
            if key not in succ_keys and h is not None:
                try:
                    h.unpersist(False)
                except Exception:
                    pass

    # -------------------------------------------------------------- persist
    def save(self, path: str) -> str:
        """Write-audit-publish: parquet + manifest, atomic rename."""
        tmp = path + f".tmp-{uuid.uuid4().hex[:8]}"
        self.df.write.mode("overwrite").parquet(os.path.join(tmp, "index"))
        # audit metrics via one Spark agg (no O(cells) driver collect)
        row = self.df.agg(F.sum("cnt").alias("t"), F.count("*").alias("c"),
                          F.max("depth").alias("d")).collect()[0]
        audit = dict(self.manifest)
        audit["total_rows"] = int(row["t"] or 0)
        audit["cells"] = int(row["c"])
        audit["max_depth"] = int(row["d"] or 0)
        audit["grid_g"] = self.grid.g
        audit["grid_dims"] = self.grid.dims
        with open(os.path.join(tmp, "manifest.json"), "w") as f:
            json.dump(audit, f, indent=1)
        # audit: re-read row count matches
        back = self.spark.read.parquet(os.path.join(tmp, "index")).count()
        if back != audit["cells"]:  # not assert: must survive python -O
            raise RuntimeError(
                f"audit failed: re-read {back} rows != {audit['cells']}")
        if os.path.exists(path):
            os.rename(path, path + f".old-{uuid.uuid4().hex[:8]}")
        os.rename(tmp, path)
        return path

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "SpatialIndex":
        with open(os.path.join(path, "manifest.json")) as f:
            manifest = json.load(f)
        df = spark.read.parquet(os.path.join(path, "index"))
        grid = Grid(int(manifest["grid_g"]),
                    dims=int(manifest.get("grid_dims", 2)))
        return cls(spark, grid, df, manifest,
                   coord_cols=tuple(manifest.get("coord_cols", ["x", "y"])))

    # ------------------------------------------------------------ validation
    def validate(self, expected_n: int | None = None) -> dict:
        """Structural invariants (utility/validation.hpp analogue)."""
        stats = self.stats()
        total = int(stats["cnt"].sum())
        if expected_n is not None:
            assert total == expected_n, (total, expected_n)
        live = stats[stats["cnt"] > 0]
        assert (live["xmin"] <= live["xmax"]).all()
        assert (live["ymin"] <= live["ymax"]).all()
        # every blob's bbox sits inside its cell's geometric bounds
        # (only for unsalted, tomb-free cells built straight from data)
        xlo, ylo, xhi, yhi = self.grid.cell_bounds(live["cell"].to_numpy())
        fresh = (live["nextra"].to_numpy() == 0) & (live["ntomb"].to_numpy() == 0)
        assert (live["xmin"].to_numpy()[fresh] >= xlo[fresh]).all()
        assert (live["xmax"].to_numpy()[fresh] <= xhi[fresh]).all()
        assert (live["ymin"].to_numpy()[fresh] >= ylo[fresh]).all()
        assert (live["ymax"].to_numpy()[fresh] <= yhi[fresh]).all()
        return dict(total=total, cells=len(stats),
                    max_depth=int(stats["depth"].max()) if len(stats) else 0)
