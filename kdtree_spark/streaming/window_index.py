"""Sliding-window streaming index maintenance (H8 of SURVEY §2.2 —
`insertOsmByTime`, tests/testFramework.h:818-870).

The reference replays OSM time slices: insert slice t, and once
`sliding_window_len = 5` slices are live, delete the oldest
(testFramework.h:27). Its "stream" is a file-per-slice loop; the
Spark-native rendering is Structured Streaming over a file source with
`foreachBatch` driving the index's batch insert/delete — watermarks are
deliberately NOT modeled (the reference has no late data; SURVEY §2.3).

Checkpoint semantics (two layers):
- The stream checkpoint (always on) persists SOURCE OFFSETS: a
  restarted stream processes only files that arrived after the previous
  run.
- With `state_dir` set, the indexer ALSO persists its own state: each
  live slice's points as parquet, the index as incremental snapshots in
  a `catalog.SnapshotStore` (only touched buckets rewritten per slice),
  and an atomically-swapped state.json naming the live slices. A
  restarted indexer restores the full window and continues — offsets
  AND contents survive. Without `state_dir` the window restarts empty
  (tests/test_streaming.py::test_stream_checkpoint_resume codifies
  that; test_stream_state_restore codifies the restoring path).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import SnapshotStore
from ..grid import Grid
from ..index import SpatialIndex

POINT_SCHEMA = "pid long, x long, y long, slice long"


class SlidingWindowIndexer:
    """Maintains a SpatialIndex over the last `window_len` slices."""

    def __init__(self, spark: SparkSession, grid: Grid,
                 window_len: int = 5, state_dir: str | None = None):
        self.spark = spark
        self.grid = grid
        self.window_len = window_len
        self.index: SpatialIndex | None = None
        self.live_slices: list[int] = []
        self._history: dict[int, DataFrame] = {}
        self.state_dir = state_dir
        self._store: SnapshotStore | None = None
        self._snapshot: str | None = None
        if state_dir is not None:
            os.makedirs(os.path.join(state_dir, "slices"), exist_ok=True)
            self._store = SnapshotStore(os.path.join(state_dir, "index"))
            self._restore()

    # ------------------------------------------------------------ durability

    def _state_path(self) -> str:
        return os.path.join(self.state_dir, "state.json")

    def _slice_path(self, t: int) -> str:
        return os.path.join(self.state_dir, "slices", f"slice-{t}.parquet")

    def _restore(self) -> None:
        if not os.path.exists(self._state_path()):
            return
        with open(self._state_path()) as f:
            st = json.load(f)
        self._snapshot = st["snapshot_id"]
        self.index = self._store.load(self.spark, self._snapshot).cache()
        self.live_slices = list(st["live_slices"])
        for t in self.live_slices:
            self._history[t] = self.spark.read.parquet(self._slice_path(t))

    def _persist_slice(self, t: int, sdf: DataFrame) -> DataFrame:
        sdf.write.mode("overwrite").parquet(self._slice_path(t))
        # re-read so the history lineage points at durable files, the
        # same frame a restarted indexer would see
        return self.spark.read.parquet(self._slice_path(t))

    def _commit_state(self) -> None:
        self._snapshot = self._store.commit(self.index,
                                            parent=self._snapshot)
        tmp = self._state_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"snapshot_id": self._snapshot,
                       "live_slices": self.live_slices}, f)
        os.rename(tmp, self._state_path())

    # ------------------------------------------------------------- ingestion

    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        """foreachBatch sink: ingest every slice present in the batch in
        slice order — insert it, evict expired slices."""
        slices = sorted(
            r["slice"] for r in batch.select("slice").distinct().collect())
        for t in slices:
            sdf = (batch.filter(F.col("slice") == t)
                   .select("pid", "x", "y"))
            if self.state_dir is not None:
                sdf = self._persist_slice(t, sdf)
            sdf = sdf.cache()
            sdf.count()
            self._history[t] = sdf
            evicted = None
            if self.index is None:
                self.index = SpatialIndex.build(self.spark, sdf,
                                                grid=self.grid)
            else:
                evict = None
                if len(self.live_slices) >= self.window_len:
                    evicted = self.live_slices.pop(0)
                    evict = self._history.pop(evicted)
                old = self.index
                self.index = old.update(inserts=sdf, deletes=evict)
                # release what the superseded version holds that the new
                # one does not reference (delta updates share fragments,
                # so this frees the stats cache each slice and the full
                # pre-compaction storage at every compaction boundary) —
                # storage stays O(window), not O(stream lifetime)
                old.unpersist(successor=self.index)
                if evict is not None:
                    evict.unpersist()
            self.live_slices.append(t)
            if self.state_dir is not None:
                self._commit_state()
                if evicted is not None:
                    shutil.rmtree(self._slice_path(evicted),
                                  ignore_errors=True)

    def total_live(self) -> int:
        return int(self.index.stats()["cnt"].sum()) if self.index else 0


def run_file_stream(spark: SparkSession, src_dir: str,
                    checkpoint_dir: str, grid: Grid | None = None,
                    window_len: int = 5,
                    state_dir: str | None = None) -> SlidingWindowIndexer:
    """Real Structured Streaming: parquet file source -> foreachBatch ->
    index maintenance, drained with availableNow (processes all files
    then stops; re-running with the same checkpoint resumes where the
    previous run stopped — new files only). With `state_dir`, the window
    CONTENTS also survive the restart (see module docstring)."""
    indexer = SlidingWindowIndexer(spark, grid or Grid(8), window_len,
                                   state_dir=state_dir)
    stream = (spark.readStream.schema(POINT_SCHEMA).parquet(src_dir))
    q = (stream.writeStream
         .foreachBatch(indexer.process_batch)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return indexer
