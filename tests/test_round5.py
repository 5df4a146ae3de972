"""Round-5 additions: fused seed+enum kNN phases, polygon broadcast
guard, d=5 circle fixtures."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from kdtree_spark import fixtures, points
from kdtree_spark.grid import COORD_LIMIT, Grid
from kdtree_spark.index import SpatialIndex


def _pts(spark, n=4000, seed=5):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame({
        "pid": np.arange(n, dtype=np.int64),
        "x": rng.integers(0, COORD_LIMIT, n, dtype=np.int64),
        "y": rng.integers(0, COORD_LIMIT, n, dtype=np.int64),
    })
    return spark.createDataFrame(pdf), pdf


def _brute_knn(pdf, qx, qy, k):
    d = (pdf.x.to_numpy() - qx) ** 2 + (pdf.y.to_numpy() - qy) ** 2
    order = np.lexsort((pdf.pid.to_numpy(), d))
    return d[order[:k]], pdf.pid.to_numpy()[order[:k]]


def test_fused_knn_clustered_queries(spark):
    """Queries live far from most data and on cell borders; exact match
    vs brute force through the fused probe+enum path."""
    from kdtree_spark.queries.knn import knn_join
    df, pdf = _pts(spark)
    idx = SpatialIndex.build(spark, df, grid=Grid(8))
    qs = [(0, 3, 7), (1, COORD_LIMIT - 1, COORD_LIMIT - 1),
          (2, COORD_LIMIT // 2, COORD_LIMIT // 2),
          (3, COORD_LIMIT // 8, 0)]  # cell-border x
    qdf = spark.createDataFrame(
        pd.DataFrame(qs, columns=["qid", "x", "y"]))
    out = knn_join(idx, qdf, 7).toPandas()
    for qid, qx, qy in qs:
        got = out[out.qid == qid].sort_values("rank")
        ed, ei = _brute_knn(pdf, qx, qy, 7)
        assert np.array_equal(got.nid.to_numpy(), ei), qid
        assert np.array_equal(got.dist_sq.to_numpy(np.int64), ed), qid


def test_fused_knn_needy_path(spark):
    """k above the probe pool forces the sentinel -2 super-stats
    fallback; results must stay exact."""
    from kdtree_spark.queries.knn import knn_join
    df, pdf = _pts(spark, n=3000)
    idx = SpatialIndex.build(spark, df, grid=Grid(4))
    # per-cell live counts ~187 < PROBE_SAMPLE, so the pool holds the
    # home cell's full live set; k > pool size triggers the fallback
    # only when the home cell holds fewer than k points
    k = 400
    qdf = spark.createDataFrame(
        pd.DataFrame([(0, 11, 22)], columns=["qid", "x", "y"]))
    out = knn_join(idx, qdf, k).toPandas().sort_values("rank")
    ed, ei = _brute_knn(pdf, 11, 22, k)
    assert np.array_equal(out.nid.to_numpy(), ei)
    assert np.array_equal(out.dist_sq.to_numpy(np.int64), ed)


def test_polygon_broadcast_guard(spark, monkeypatch):
    """Results are identical whether the polygon-cell side is pinned
    broadcast (small enumeration) or left to AQE (cap exceeded)."""
    from kdtree_spark.queries import polygon as P
    df, _ = _pts(spark, n=2000)
    polys = fixtures.gen_polygons(4)
    base = (P.point_in_polygon(df, polys, grid=Grid(8))
            .toPandas().sort_values(["poly_id", "pid"]).reset_index(drop=True))
    monkeypatch.setattr(P, "BROADCAST_CELL_CAP", 0)  # force no-hint path
    nohint = (P.point_in_polygon(df, polys, grid=Grid(8))
              .toPandas().sort_values(["poly_id", "pid"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(base, nohint)
    assert len(base) > 0


def test_gen_circles_d_shape():
    cs = fixtures.gen_circles_d(6, 5)
    assert all(len(c) == 7 for c in cs)
    sql = fixtures.circles_values_sql_d(cs, 5)
    assert "ctr4" in sql and "circle_id" in sql
    # radii stay on-domain
    assert all(0 < c[-1] <= COORD_LIMIT // 2 for c in cs)


def test_knn_and_range_d9(spark):
    """Mid-range dimension parity (the reference sweeps d in
    {2,3,5,7,9,10,12,16}, tests/test.cpp:569-617): exact kNN + range
    count at d=9 through the dims-keyed grid (3-D cell key)."""
    from kdtree_spark.queries.knn import knn_join
    from kdtree_spark.queries.ranges import range_count
    d = 9
    rng = np.random.default_rng(9)
    n = 3000
    arr = rng.integers(0, COORD_LIMIT, (n, d), dtype=np.int64)
    cols = [f"c{j}" for j in range(d)]
    pdf = pd.DataFrame(arr, columns=cols)
    pdf.insert(0, "pid", np.arange(n, dtype=np.int64))
    df = spark.createDataFrame(pdf)
    idx = SpatialIndex.build(spark, df, grid=Grid(4, dims=3),
                             coord_cols=tuple(cols))
    # kNN k=5 for 12 queries vs brute force
    qarr = rng.integers(0, COORD_LIMIT, (12, d), dtype=np.int64)
    qpdf = pd.DataFrame(qarr, columns=cols)
    qpdf.insert(0, "qid", np.arange(12, dtype=np.int64))
    out = knn_join(idx, spark.createDataFrame(qpdf), 5).toPandas()
    for qi in range(12):
        dist = ((arr - qarr[qi]) ** 2).sum(axis=1)
        order = np.lexsort((pdf.pid.to_numpy(), dist))[:5]
        got = out[out.qid == qi].sort_values("rank")
        assert np.array_equal(got.nid.to_numpy(), order), qi
        assert np.array_equal(got.dist_sq.to_numpy(np.int64), dist[order]), qi
    # range count vs numpy over d-dim boxes
    boxes = fixtures.gen_boxes_d(8, d, seed=19)
    rc = (range_count(idx, boxes).toPandas()
          .set_index("box_id")["cnt"].to_dict())
    for b in boxes:
        bid, lo, hi = b[0], np.array(b[1:1 + d]), np.array(b[1 + d:])
        exp = int(((arr >= lo) & (arr <= hi)).all(axis=1).sum())
        assert rc[bid] == exp, bid


def test_inbalance_ratio_env_override(monkeypatch):
    """Reference parity: INBALANCE_RATIO is env-overridable
    (tree_node.hpp:118-124; the summary suite sweeps inba 3/10/30)."""
    from kdtree_spark import localtree as lt
    pts = np.arange(200, dtype=np.int64).reshape(100, 2)
    t = lt.LocalKDTree.build(pts, np.arange(100, dtype=np.int64))
    t2 = t.with_updates(ins_pts=pts[:20] + 1_000,
                        ins_ids=np.arange(1000, 1020, dtype=np.int64))
    # churn 20% of 100: below the default 30 threshold, above 10
    monkeypatch.setattr(lt, "INBALANCE_RATIO", 30)
    assert not t2.needs_rebuild()
    monkeypatch.setattr(lt, "INBALANCE_RATIO", 10)
    assert t2.needs_rebuild()


def test_registry_fits_sweep_budget():
    import __spark_entry__ as e
    q = e.queries()
    o = e.oracle_sql()
    assert len(q) <= 50, "driver sweep writes at most 50 rows"
    assert set(q) == set(o)
    # never-verified gates lead the sweep
    assert list(q)[:3] == ["ann_srp_lsh", "ann_ivf", "image_phash_dedup"]


def test_probe_enum_empty_guard_schema(spark):
    """The probes-only-key defensive branch of _seed_enum returns an
    empty frame whose columns are DERIVED from the declared cogroup
    schema (they once drifted apart when the r5 fusion widened the
    schema but not the guard). This exercises the exact shape the
    guard emits — an all-object-dtype empty pandas frame — through a
    real applyInPandas hop against the same schema string."""
    schema = "qid long, x long, y long, ub double, cell long, fin0 boolean"
    cols = [f.split()[0] for f in schema.split(", ")]

    def kernel(key, left, right):
        return pd.DataFrame(columns=cols)

    left = spark.createDataFrame([(1, 0, 0)], "cell long, qid long, x long")
    right = spark.createDataFrame([(1, 9)], "cell long, v long")
    out = (left.groupby("cell").cogroup(right.groupby("cell"))
           .applyInPandas(kernel, schema))
    assert out.count() == 0
    assert out.columns == cols


def test_knn_config_matrix(spark):
    """Interaction sweep of the fused distributed kNN: d x k x dtype x
    grid-key dims x duplicate floods x salted fan-out crossed in one
    session, each config exact (ids, distances) vs numpy brute force.
    The single-axis variants are covered elsewhere; this catches
    interactions (e.g. duplicate-flood ties at k=17 through the fin0
    bypass, f64 enum rounding, d=7 through a 3-D cell key)."""
    from kdtree_spark import bruteforce as bf
    from kdtree_spark.queries.knn import knn_join
    configs = [
        # (d, k, hi, fmode, grid, cap)   - why
        (2, 17, 40, False, Grid(8), None),      # duplicate flood + ties
        (3, 3, COORD_LIMIT, False, Grid(4, dims=3), None),
        (5, 17, COORD_LIMIT, False, Grid(3, dims=4), None),
        (2, 5, float(COORD_LIMIT), True, Grid(8), None),  # f64 end to end
        (7, 1, COORD_LIMIT, False, Grid(4, dims=3), None),
        # salting crossed with high-d and f64: cap=8 over ~31 pts/cell
        # puts every cell past FANOUT_MIN_BLOBS, so the whole batch
        # takes the (cell, salt) fan-out branch
        (5, 10, COORD_LIMIT, False, Grid(3, dims=4), 8),
        (2, 5, float(COORD_LIMIT), True, Grid(4), 8),
    ]
    n, m = 2500, 40
    for ci, (d, k, hi, fmode, grid, cap) in enumerate(configs):
        rng = np.random.default_rng(100 + ci)
        if fmode:
            arr = rng.uniform(0, hi, size=(n, d))
            q = rng.uniform(0, hi, size=(m, d))
        else:
            arr = rng.integers(0, hi, size=(n, d), dtype=np.int64)
            q = rng.integers(0, hi, size=(m, d), dtype=np.int64)
        q[:8] = arr[:8]                  # on-point queries
        q[8] = 0                         # domain corners / cell borders
        q[9] = hi - (0.5 if fmode else 1)
        cols = [f"c{j}" for j in range(d)]
        pdf = pd.DataFrame(arr, columns=cols)
        ids = (rng.permutation(n).astype(np.int64) * 7 + 1)
        pdf.insert(0, "pid", ids)
        kw = {} if cap is None else {"hot_cell_cap": cap}
        idx = SpatialIndex.build(spark, spark.createDataFrame(pdf),
                                 grid=grid, coord_cols=tuple(cols), **kw)
        if cap is not None:
            from kdtree_spark.queries.skew import FANOUT_MIN_BLOBS
            assert (idx.cell_stats().agg(F.max("maxsalt")).collect()[0][0]
                    + 1 >= FANOUT_MIN_BLOBS), ci
        qpdf = pd.DataFrame(q, columns=cols)
        qpdf.insert(0, "qid", np.arange(m, dtype=np.int64))
        out = (knn_join(idx, spark.createDataFrame(qpdf), k)
               .toPandas().sort_values(["qid", "rank"]))
        assert len(out) == m * k, (ci, len(out))
        gd, gi = bf.knn(arr, ids, q, k)
        np.testing.assert_array_equal(
            out["nid"].to_numpy(np.int64).reshape(m, k), gi,
            err_msg=f"config {ci}")
        if fmode:
            np.testing.assert_allclose(
                out["dist_sq"].to_numpy().reshape(m, k), gd,
                err_msg=f"config {ci}")
        else:
            np.testing.assert_array_equal(
                out["dist_sq"].to_numpy(np.int64).reshape(m, k),
                gd.astype(np.int64), err_msg=f"config {ci}")


def test_range_circle_config_matrix(spark):
    """Range-side interaction sweep: box count + report + circle count
    at (d, dtype, grid dims, duplicate floods, salted fan-out) crossed
    in one session, each exact vs numpy. Complements the kNN matrix."""
    from kdtree_spark.queries.ranges import (circle_count, range_count,
                                             range_report)
    configs = [
        # (d, hi, fmode, grid, cap)
        (2, 40, False, Grid(8), None),           # duplicate flood
        (3, COORD_LIMIT, False, Grid(4, dims=3), None),
        (5, COORD_LIMIT, False, Grid(3, dims=4), None),
        (2, float(COORD_LIMIT), True, Grid(8), None),  # f64 end to end
        # salted fan-out crossed with d=5 (count + report + circle)
        (5, COORD_LIMIT, False, Grid(3, dims=4), 8),
    ]
    n = 2500
    for ci, (d, hi, fmode, grid, cap) in enumerate(configs):
        rng = np.random.default_rng(200 + ci)
        if fmode:
            arr = rng.uniform(0, hi, size=(n, d))
        else:
            arr = rng.integers(0, hi, size=(n, d), dtype=np.int64)
        cols = [f"c{j}" for j in range(d)]
        pdf = pd.DataFrame(arr, columns=cols)
        ids = rng.permutation(n).astype(np.int64) * 3 + 1
        pdf.insert(0, "pid", ids)
        kw = {} if cap is None else {"hot_cell_cap": cap}
        idx = SpatialIndex.build(spark, spark.createDataFrame(pdf),
                                 grid=grid, coord_cols=tuple(cols), **kw)
        if cap is not None:
            from kdtree_spark.queries.skew import FANOUT_MIN_BLOBS
            assert (idx.cell_stats().agg(F.max("maxsalt")).collect()[0][0]
                    + 1 >= FANOUT_MIN_BLOBS), ci
        if hi == 40:  # flood domain: hand-sized boxes over the tiny cube
            boxes = [(i, *([i] * d), *([i + 7] * d)) for i in range(8)]
            circles = [(i, *([i * 4] * d), 9) for i in range(6)]
        else:
            boxes = fixtures.gen_boxes_d(8, d, seed=50 + ci)
            circles = fixtures.gen_circles_d(6, d, seed=60 + ci)
        lo = np.array([b[1:1 + d] for b in boxes], dtype=arr.dtype)
        hb = np.array([b[1 + d:] for b in boxes], dtype=arr.dtype)
        inbox = ((arr[None, :, :] >= lo[:, None, :])
                 & (arr[None, :, :] <= hb[:, None, :])).all(axis=2)
        # count
        rc = (range_count(idx, boxes).toPandas()
              .set_index("box_id")["cnt"].sort_index())
        np.testing.assert_array_equal(rc.to_numpy(), inbox.sum(axis=1),
                                      err_msg=f"config {ci} count")
        # report: multiset of (box_id, pid)
        rep = range_report(idx, boxes).toPandas()
        exp_pairs = sorted((int(b), int(p))
                           for bi, b in enumerate(r[0] for r in boxes)
                           for p in ids[inbox[bi]])
        got_pairs = sorted(zip(rep.box_id.astype(int), rep.pid.astype(int)))
        assert got_pairs == exp_pairs, f"config {ci} report"
        # circle
        ctr = np.array([c[1:1 + d] for c in circles], dtype=np.float64)
        r2 = np.array([c[-1] for c in circles], dtype=np.float64) ** 2
        d2 = ((arr[None, :, :].astype(np.float64)
               - ctr[:, None, :]) ** 2).sum(axis=2)
        cc = (circle_count(idx, circles).toPandas()
              .set_index("circle_id")["cnt"].sort_index())
        np.testing.assert_array_equal(cc.to_numpy(),
                                      (d2 <= r2[:, None]).sum(axis=1),
                                      err_msg=f"config {ci} circle")


def test_update_salted_hot_cell_exact(spark):
    """Batch insert into and delete from a SALTED hot cell (the one
    index shape no update test covered): inserts land in some blob of
    the cell, deletes are membership-routed across all its blobs, and
    kNN + range count after the update must equal brute force over the
    live set — inside the cluster and in the sparse background."""
    from kdtree_spark import bruteforce as bf
    from kdtree_spark.queries.knn import knn_join
    from kdtree_spark.queries.ranges import range_count
    rng = np.random.default_rng(17)
    n = 8000
    pts = np.concatenate([
        rng.integers(0, 1000, size=(n - 1000, 2)),    # one-cell cluster
        rng.integers(0, 1_000_000, size=(1000, 2)),   # sparse background
    ]).astype(np.int64)
    ids = np.arange(n, dtype=np.int64)
    df = spark.createDataFrame(pd.DataFrame(
        {"pid": ids, "x": pts[:, 0], "y": pts[:, 1]}))
    idx = SpatialIndex.build(spark, df, grid=Grid(16), n_hint=n,
                             hot_cell_cap=1024)
    assert idx.df.groupBy("cell").count().filter("count > 1").count() >= 1
    # inserts: 300 new points INTO the hot cluster + 50 background
    ins_p = np.concatenate([
        rng.integers(0, 1000, size=(300, 2)),
        rng.integers(0, 1_000_000, size=(50, 2))]).astype(np.int64)
    ins_i = np.arange(n, n + 350, dtype=np.int64)
    # deletes: 400 cluster points + 100 background points
    kill = np.concatenate([rng.permutation(n - 1000)[:400],
                           n - 1000 + rng.permutation(1000)[:100]])
    ins_df = spark.createDataFrame(pd.DataFrame(
        {"pid": ins_i, "x": ins_p[:, 0], "y": ins_p[:, 1]}))
    del_df = spark.createDataFrame(pd.DataFrame(
        {"pid": ids[kill], "x": pts[kill, 0], "y": pts[kill, 1]}))
    idx2 = idx.update(inserts=ins_df, deletes=del_df)
    keep = np.setdiff1d(np.arange(n), kill)
    live_p = np.concatenate([pts[keep], ins_p])
    live_i = np.concatenate([ids[keep], ins_i])
    assert idx2.validate()["total"] == len(live_i)
    q = np.concatenate([
        rng.integers(0, 1000, size=(15, 2)),
        rng.integers(0, 1_000_000, size=(15, 2))]).astype(np.int64)
    qdf = spark.createDataFrame(pd.DataFrame(
        {"qid": np.arange(len(q)), "x": q[:, 0], "y": q[:, 1]}))
    got = knn_join(idx2, qdf, 10).toPandas().sort_values(["qid", "rank"])
    ed, ei = bf.knn(live_p, live_i, q, 10)
    np.testing.assert_array_equal(
        got["nid"].to_numpy(np.int64).reshape(len(q), 10), ei)
    np.testing.assert_array_equal(
        got["dist_sq"].to_numpy(np.int64).reshape(len(q), 10),
        ed.astype(np.int64))
    boxes = [(0, 0, 0, 999, 999), (1, 0, 0, 500, 500),
             (2, 400_000, 400_000, 600_000, 600_000)]
    rc = (range_count(idx2, boxes).toPandas()
          .set_index("box_id")["cnt"].sort_index())
    lo = np.array([b[1:3] for b in boxes])
    hb = np.array([b[3:] for b in boxes])
    exp = ((live_p[None, :, :] >= lo[:, None, :])
           & (live_p[None, :, :] <= hb[:, None, :])).all(axis=2).sum(axis=1)
    np.testing.assert_array_equal(rc.to_numpy(), exp)


def test_hot_cell_knn_gate_fans_out_and_is_exact(spark):
    """The hot_cell_knn driver gate at sf0.01 must actually reach the
    salted (cell, salt) fan-out branch — at least one cell with >=
    FANOUT_MIN_BLOBS blobs — and still match brute force exactly.
    (At the default 131,072-row cap no gate-scale cell salts, which is
    why the gate pins hot_cell_cap=512.)"""
    from kdtree_spark.driver_queries import spatial as dq
    from kdtree_spark.queries.skew import FANOUT_MIN_BLOBS, hot_blobs

    sf_dir = "/root/testdata/sf0.01"
    got = (dq.q_hot_cell_knn(spark, sf_dir).toPandas()
           .sort_values(["qid", "rank"]))
    idx = dq._INDEX_CACHE[(id(spark), sf_dir, "varden_hot512")]
    maxblobs = (idx.cell_stats().agg(F.max("maxsalt")).collect()[0][0]) + 1
    assert maxblobs >= FANOUT_MIN_BLOBS, maxblobs
    assert hot_blobs(idx).count() >= FANOUT_MIN_BLOBS

    pts = (points.load_points(spark, sf_dir, "varden")
           .select("pid", "x", "y").toPandas())
    qs = (points.load_query_points(spark, sf_dir, "varden", qdist="uniform")
          .toPandas().sort_values("qid"))
    px = pts.x.to_numpy(np.int64)
    py = pts.y.to_numpy(np.int64)
    pid = pts.pid.to_numpy(np.int64)
    d = ((px[None, :] - qs.x.to_numpy(np.int64)[:, None]) ** 2
         + (py[None, :] - qs.y.to_numpy(np.int64)[:, None]) ** 2)
    order = np.lexsort((np.broadcast_to(pid, d.shape), d), axis=1)[:, :10]
    np.testing.assert_array_equal(
        got["nid"].to_numpy(np.int64).reshape(len(qs), 10),
        pid[order])
    np.testing.assert_array_equal(
        got["dist_sq"].to_numpy(np.int64).reshape(len(qs), 10),
        np.take_along_axis(d, order, axis=1))
