"""Structured-Streaming sliding-window index (H8): file-source stream,
foreachBatch maintenance, checkpoint-resume."""

from __future__ import annotations

import os

import pytest

from kdtree_spark import fixtures, points
from kdtree_spark.grid import Grid
from kdtree_spark.queries.ranges import range_count
from kdtree_spark.streaming.window_index import run_file_stream


def _write_slices(spark, sf_dir, out_dir, slices):
    pts = points.load_points(spark, sf_dir, "varden")
    for t in slices:
        (pts.filter(f"slice = {t}")
         .select("pid", "x", "y", "slice")
         .coalesce(1).write.mode("overwrite")
         .parquet(os.path.join(out_dir, f"t={t}.parquet")))
    # file source wants a flat dir of files; move part files up
    import glob
    import shutil
    for t in slices:
        d = os.path.join(out_dir, f"t={t}.parquet")
        part = glob.glob(os.path.join(d, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(out_dir, f"slice-{t:03d}.parquet"))
        shutil.rmtree(d)


def test_sliding_window_stream_matches_batch(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    _write_slices(spark, sf_dir, src, range(10))

    indexer = run_file_stream(spark, src, ckpt, grid=Grid(4), window_len=5)
    # window 5 over slices 0..9 -> live = slices 5..9
    pts = points.load_points(spark, sf_dir, "varden")
    expected_live = pts.filter("slice >= 5").count()
    assert indexer.total_live() == expected_live

    boxes = fixtures.gen_boxes(10)
    got = (range_count(indexer.index, boxes).toPandas()
           .set_index("box_id").cnt)
    live = pts.filter("slice >= 5").toPandas()
    for bid, x0, y0, x1, y1 in boxes:
        exp = ((live.x >= x0) & (live.x <= x1)
               & (live.y >= y0) & (live.y <= y1)).sum()
        assert got[bid] == exp, bid


def test_stream_checkpoint_resume(spark, sf_dir, tmp_path):
    """availableNow + checkpoint: a second run over the same dir is a
    no-op; new files after the checkpoint are picked up."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    _write_slices(spark, sf_dir, src, range(3))

    ix1 = run_file_stream(spark, src, ckpt, grid=Grid(4), window_len=5)
    assert ix1.live_slices == [0, 1, 2]
    n1 = ix1.total_live()

    # resume with no new files: nothing processed
    ix2 = run_file_stream(spark, src, ckpt, grid=Grid(4), window_len=5)
    assert ix2.index is None  # fresh indexer saw zero new batches

    # add slices 3..4, resume: only they stream through
    _write_slices(spark, sf_dir, src, range(3, 5))
    ix3 = run_file_stream(spark, src, ckpt, grid=Grid(4), window_len=5)
    assert ix3.live_slices == [3, 4]
    pts = points.load_points(spark, sf_dir, "varden")
    assert n1 == pts.filter("slice < 3").count()
    assert ix3.total_live() == pts.filter("slice IN (3, 4)").count()


def test_stream_state_restore(spark, sf_dir, tmp_path):
    """With state_dir, a restarted stream restores the full window —
    offsets AND contents — and keeps evicting correctly."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "state")
    os.makedirs(src)
    pts = points.load_points(spark, sf_dir, "varden")

    _write_slices(spark, sf_dir, src, range(3))
    ix1 = run_file_stream(spark, src, ckpt, grid=Grid(4), window_len=5,
                          state_dir=state)
    assert ix1.live_slices == [0, 1, 2]

    # restart: slices 3..6 arrive; window_len=5 -> live = 2..6
    _write_slices(spark, sf_dir, src, range(3, 7))
    ix2 = run_file_stream(spark, src, ckpt, grid=Grid(4), window_len=5,
                          state_dir=state)
    assert ix2.live_slices == [2, 3, 4, 5, 6]
    assert ix2.total_live() == pts.filter("slice BETWEEN 2 AND 6").count()

    # third restart with no new files: state intact, nothing processed
    ix3 = run_file_stream(spark, src, ckpt, grid=Grid(4), window_len=5,
                          state_dir=state)
    assert ix3.live_slices == [2, 3, 4, 5, 6]
    assert ix3.total_live() == pts.filter("slice BETWEEN 2 AND 6").count()

    # the snapshot log records one incremental commit per slice
    assert len(ix3._store.log()) == 7
    # range counts from the restored window match brute force
    boxes = fixtures.gen_boxes(8)
    got = (range_count(ix3.index, boxes).toPandas()
           .set_index("box_id").cnt)
    live = pts.filter("slice BETWEEN 2 AND 6").toPandas()
    for bid, x0, y0, x1, y1 in boxes:
        exp = ((live.x >= x0) & (live.x <= x1)
               & (live.y >= y0) & (live.y <= y1)).sum()
        assert got[bid] == exp, bid
