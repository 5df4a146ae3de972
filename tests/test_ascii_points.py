"""Reference ASCII .in point-file reader parity.

The reference reads its point sets from whitespace ASCII files with an
``N Dim`` header and file-position ids (tests/testFramework.h:993-1023;
files written by tests/data_generate.cpp:55-60). `read_ascii_points`
must reproduce ids and coords exactly and feed the index unchanged.
"""

from __future__ import annotations

import numpy as np
import pytest

from kdtree_spark import bruteforce as bf
from kdtree_spark import points


def _write_in(tmp_path, name, arr, trailing_space=True, float_fmt=None):
    """Emit the generator's exact layout: 'N Dim' header then one point
    per line (data_generate.cpp writes a trailing space per coord)."""
    n, d = arr.shape
    sep = " " if trailing_space else ""
    lines = [f"{n} {d}"]
    for row in arr:
        if float_fmt:
            lines.append(" ".join(float_fmt % v for v in row) + sep)
        else:
            lines.append(" ".join(str(int(v)) for v in row) + sep)
    p = tmp_path / name
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_ascii_roundtrip_int_d2(spark, tmp_path):
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 1_000_000, size=(500, 2), dtype=np.int64)
    path = _write_in(tmp_path, "u500_2.in", arr)
    got = points.read_ascii_points(spark, path).toPandas()
    got = got.sort_values("pid").reset_index(drop=True)
    assert list(got.columns) == ["pid", "x", "y"]
    assert got.pid.tolist() == list(range(500))
    assert np.array_equal(got[["x", "y"]].to_numpy(dtype=np.int64), arr)


def test_ascii_roundtrip_d5_and_partition_splits(spark, tmp_path):
    # enough rows that local[8] text reads land in multiple splits only
    # at tiny maxPartitionBytes — force it to exercise the offset join
    rng = np.random.default_rng(11)
    arr = rng.integers(0, 1_000_000, size=(2000, 5), dtype=np.int64)
    path = _write_in(tmp_path, "u2000_5.in", arr)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4096")
    try:
        got = points.read_ascii_points(spark, path).toPandas()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    got = got.sort_values("pid").reset_index(drop=True)
    assert list(got.columns) == ["pid", *points.dim_cols(5)]
    assert got.pid.tolist() == list(range(2000))
    assert np.array_equal(
        got[list(points.dim_cols(5))].to_numpy(dtype=np.int64), arr)


def test_ascii_float64_mode(spark, tmp_path):
    rng = np.random.default_rng(13)
    arr = rng.uniform(0, 1_000_000, size=(300, 2))
    path = _write_in(tmp_path, "f300_2.in", arr, float_fmt="%.17g")
    got = points.read_ascii_points(spark, path, dtype="float64").toPandas()
    got = got.sort_values("pid").reset_index(drop=True)
    assert got.x.dtype == np.float64
    # %.17g round-trips IEEE doubles bit-exactly
    assert np.array_equal(got[["x", "y"]].to_numpy(), arr)


def test_ascii_validation_errors(spark, tmp_path):
    arr = np.arange(20, dtype=np.int64).reshape(10, 2)
    # header overstates N
    p = tmp_path / "bad_n.in"
    p.write_text("11 2\n" + "\n".join(f"{a} {b} " for a, b in arr) + "\n")
    with pytest.raises(ValueError, match="declares 11"):
        points.read_ascii_points(spark, str(p))
    # non-numeric coord
    p2 = tmp_path / "bad_tok.in"
    p2.write_text("2 2\n1 2 \n3 oops \n")
    with pytest.raises(ValueError, match="unparseable"):
        points.read_ascii_points(spark, str(p2))
    # empty file
    p3 = tmp_path / "empty.in"
    p3.write_text("")
    with pytest.raises(ValueError, match="empty point file"):
        points.read_ascii_points(spark, str(p3))


def test_ascii_writer_roundtrip(spark, tmp_path):
    """write_ascii_points emits the reference writeToFile layout
    (test.cpp:224-234) and read_ascii_points recovers it exactly —
    int64 and float64, pid order = file order."""
    pts = points.synth_points(spark, 400).selectExpr(
        "CAST(pid % 400 AS BIGINT) AS pid", "x", "y")
    # make pids the contiguous 0..n-1 the positional format encodes
    pts = (pts.groupBy("pid").agg({"x": "min", "y": "min"})
           .selectExpr("pid", "`min(x)` AS x", "`min(y)` AS y"))
    p = str(tmp_path / "out_i.in")
    n = points.write_ascii_points(pts, p)
    assert n == pts.count()
    first = open(p).readline().split()
    assert first == [str(n), "2"]
    back = points.read_ascii_points(spark, p).toPandas()
    orig = pts.toPandas().sort_values("pid").reset_index(drop=True)
    back = back.sort_values("pid").reset_index(drop=True)
    assert back.equals(orig[["pid", "x", "y"]].astype({"pid": "int64"}))

    # float64: shortest-round-trip rendering must re-read bit-exactly
    fpts = pts.selectExpr(
        "pid", "x + pid / CAST(997 AS DOUBLE) AS x",
        "y + pid / CAST(991 AS DOUBLE) AS y")
    pf = str(tmp_path / "out_f.in")
    points.write_ascii_points(fpts, pf)
    fback = (points.read_ascii_points(spark, pf, dtype="float64")
             .toPandas().sort_values("pid").reset_index(drop=True))
    forig = fpts.toPandas().sort_values("pid").reset_index(drop=True)
    assert np.array_equal(fback[["x", "y"]].to_numpy(),
                          forig[["x", "y"]].to_numpy())


def test_knn_graph_writer(spark, tmp_path):
    """H10 sink: WeightedAdjacencyGraph layout (testFramework.h:779-814)
    — header/n/m, i*k offsets, rank-ordered edges, then weights —
    checked against the brute-force oracle."""
    from kdtree_spark.grid import Grid
    from kdtree_spark.index import SpatialIndex
    from kdtree_spark.queries.knn import knn_join

    rng = np.random.default_rng(23)
    n, k = 300, 4
    arr = rng.integers(0, 1_000_000, size=(n, 2), dtype=np.int64)
    pts = spark.createDataFrame(
        [(int(i), int(x), int(y)) for i, (x, y) in enumerate(arr)],
        "pid long, x long, y long")
    idx = SpatialIndex.build(spark, pts, grid=Grid(3))
    res = knn_join(idx, pts.selectExpr("pid AS qid", "x", "y"), k)
    gpath = str(tmp_path / "graph.wag")
    m = points.write_knn_graph(res, gpath, n, k)
    assert m == n * k

    lines = open(gpath).read().splitlines()
    assert lines[0] == "WeightedAdjacencyGraph"
    assert lines[1] == str(n) and lines[2] == str(m)
    offs = [int(v) for v in lines[3:3 + n]]
    assert offs == [i * k for i in range(n)]
    edges = np.array([int(v) for v in lines[3 + n:3 + n + m]])
    weights = np.array([float(v) for v in lines[3 + n + m:3 + n + 2 * m]])
    assert len(weights) == m
    exp_d, exp_i = bf.knn(arr, np.arange(n), arr, k)
    assert np.array_equal(edges.reshape(n, k), exp_i)
    assert np.allclose(weights.reshape(n, k), exp_d)

    # wrong row count is refused (a query short of k neighbours would
    # silently shift every later query's edge block)
    with pytest.raises(ValueError, match="expected n\\*k"):
        points.write_knn_graph(res.limit(50), gpath, n, k)


def test_ascii_points_feed_the_index(spark, tmp_path):
    """End-to-end: .in file -> index build -> exact kNN vs brute force."""
    from kdtree_spark.grid import Grid
    from kdtree_spark.index import SpatialIndex
    from kdtree_spark.queries.knn import knn_join

    rng = np.random.default_rng(17)
    arr = rng.integers(0, 1_000_000, size=(1200, 2), dtype=np.int64)
    path = _write_in(tmp_path, "idx1200_2.in", arr)
    pts = points.read_ascii_points(spark, path)
    idx = SpatialIndex.build(spark, pts, grid=Grid(4))
    q = pts.where("pid < 40").selectExpr("pid AS qid", "x", "y")
    got = knn_join(idx, q, 5).toPandas()
    exp_d, exp_i = bf.knn(arr, np.arange(1200), arr[:40], 5)
    got = got.sort_values(["qid", "rank"]).reset_index(drop=True)
    assert len(got) == 40 * 5
    for qi in range(40):
        g = got[got.qid == qi]
        assert g.nid.tolist() == exp_i[qi].tolist(), f"qid {qi}"
        assert np.allclose(g.dist_sq.to_numpy(np.float64), exp_d[qi])
