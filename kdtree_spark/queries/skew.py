"""Hot-cell (salted) work fan-out shared by the query operators.

The build salts cells past HOT_CELL_CAP rows into multiple blobs
(index.py), which keeps *build* tasks bounded; these helpers keep
*query* tasks bounded too: instead of cogrouping a hot cell's whole
workload on `cell` (one task no matter how many blobs), its query rows
are replicated once per salt and cogrouped on (cell, salt) against just
the hot blobs — one task per blob. Cold cells (the overwhelming
majority) keep the plain `cell` cogroup, preserving the cached index's
exchange reuse. This is the distributed analogue of the reference's
per-subtree parallelism inside one tree (it never serializes a subtree
on one thread either, kdTreeParallel.h build/query par_do recursion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..index import SpatialIndex


def hot_blobs(index: SpatialIndex) -> DataFrame:
    """Blobs of salted ("hot") cells — the minority side that query
    operators re-key by (cell, salt). Hot-cell ids come from the stats
    table and are broadcast (hot cells are rare by construction)."""
    hot_cells = (index.cell_stats().filter(F.col("maxsalt") > 0)
                 .select("cell"))
    return index.df.join(F.broadcast(hot_cells), "cell", "semi")


def split_by_salt(cand: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(cold, hot): cold rows keep single-blob cells (cogroup on `cell`
    as usual); hot rows are replicated once per salt of their salted
    cell (cogroup on (cell, salt) against hot_blobs). `cand` must carry
    a `maxsalt` column (from the cell-stats join), consumed here."""
    cold = cand.filter(F.col("maxsalt") == 0).drop("maxsalt")
    hot = (cand.filter(F.col("maxsalt") > 0)
           .withColumn("salt", F.explode(
               F.sequence(F.lit(0), F.col("maxsalt"))))
           .drop("maxsalt"))
    return cold, hot
