"""Sliding-window streaming index maintenance (H8 of SURVEY §2.2 —
`insertOsmByTime`, tests/testFramework.h:818-870).

The reference replays OSM time slices: insert slice t, and once
`sliding_window_len = 5` slices are live, delete the oldest
(testFramework.h:27). Its "stream" is a file-per-slice loop; the
Spark-native rendering is Structured Streaming over a file source with
`foreachBatch` driving the index's batch insert/delete — watermarks are
deliberately NOT modeled (the reference has no late data; SURVEY §2.3).

Checkpoint semantics (precise): the stream checkpoint persists SOURCE
OFFSETS only — a restarted stream re-processes new files, not the ones
already consumed, and `run_file_stream` starts with a fresh indexer, so
the rebuilt window contains only slices arriving after the restart
(tests/test_streaming.py::test_stream_checkpoint_resume codifies this).
To carry the window contents across restarts, persist the index with
index.save(path) after each batch and reload it before restarting; the
manifest's lineage + write-audit-publish make that handoff atomic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..grid import Grid
from ..index import SpatialIndex

POINT_SCHEMA = "pid long, x long, y long, slice long"


class SlidingWindowIndexer:
    """Maintains a SpatialIndex over the last `window_len` slices."""

    def __init__(self, spark: SparkSession, grid: Grid,
                 window_len: int = 5):
        self.spark = spark
        self.grid = grid
        self.window_len = window_len
        self.index: SpatialIndex | None = None
        self.live_slices: list[int] = []
        self._history: dict[int, DataFrame] = {}

    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        """foreachBatch sink: ingest every slice present in the batch in
        slice order — insert it, evict expired slices."""
        slices = sorted(
            r["slice"] for r in batch.select("slice").distinct().collect())
        for t in slices:
            sdf = (batch.filter(F.col("slice") == t)
                   .select("pid", "x", "y").cache())
            sdf.count()
            self._history[t] = sdf
            if self.index is None:
                self.index = SpatialIndex.build(self.spark, sdf,
                                                grid=self.grid)
            else:
                evict = None
                if len(self.live_slices) >= self.window_len:
                    oldest = self.live_slices.pop(0)
                    evict = self._history.pop(oldest)
                old = self.index
                self.index = old.update(inserts=sdf, deletes=evict)
                # the new version is materialized (update() counts it);
                # release the superseded version's cache so storage stays
                # O(window), not O(stream lifetime)
                old.unpersist()
                if evict is not None:
                    evict.unpersist()
            self.live_slices.append(t)

    def total_live(self) -> int:
        return int(self.index.stats()["cnt"].sum()) if self.index else 0


def run_file_stream(spark: SparkSession, src_dir: str,
                    checkpoint_dir: str, grid: Grid | None = None,
                    window_len: int = 5) -> SlidingWindowIndexer:
    """Real Structured Streaming: parquet file source -> foreachBatch ->
    index maintenance, drained with availableNow (processes all files
    then stops; re-running with the same checkpoint resumes where the
    previous run stopped — new files only)."""
    indexer = SlidingWindowIndexer(spark, grid or Grid(8), window_len)
    stream = (spark.readStream.schema(POINT_SCHEMA).parquet(src_dir))
    q = (stream.writeStream
         .foreachBatch(indexer.process_batch)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return indexer
