"""Global grid — the *top* level of the two-level distributed index.

The reference builds the top of its kd-tree by sampling ~2048 points and
picking 63 median pivots per 6-level round (`build_tree.hpp:49-70`), then
counting-sort-shuffling all points into the 64 buckets
(`build_tree.hpp:84-121`). In Spark, that shuffle IS the top of the tree:
we use a fixed integer grid-cell id over the first two coordinate
dimensions as the partition/shuffle key, and per-cell bounding-box stats
(over ALL dims) as the pruning metadata (the analogue of interior-node
bounding boxes, `utility/box_op.hpp`).

Everything here is pure integer arithmetic so the same cell id is
computable in three places with bit-identical results:
  - a Spark SQL expression (JVM-side, codegen, no UDF),
  - a DuckDB SQL expression (the driver's oracle),
  - numpy (inside pandas UDFs for candidate generation).

Domain: coordinates are int64 in [0, COORD_LIMIT) — matching the
reference's `long` coords in [0, 1e6] (`tests/data_generate.cpp:19,33-42`,
`README.md:125`).
"""

from __future__ import annotations

import numpy as np

COORD_LIMIT = 1_000_000  # exclusive upper bound on generated coords


class Grid:
    """g-per-dim row-major cell grid over [0, COORD_LIMIT)^dims.

    dims = number of GRIDDED coordinate dims (the cell/shuffle key);
    default 2. For d >= 3 point sets a dims=3 grid keys cells on the
    first three coords — the kNN candidate region then prunes in three
    dims instead of two (the reference's top-of-tree splits rotate
    through ALL dims, build_tree.hpp:49-70; a 2-D-only key makes every
    z-slab of a column one cell and high-d kNN over-visits). Cell id is
    row-major: ((c0*g + c1)*g + c2)... — dims=2 reproduces the
    historical cx*g + cy exactly."""

    def __init__(self, g: int, dims: int = 2):
        assert g >= 1 and dims >= 2
        self.g = g
        self.dims = dims
        self.cw = (COORD_LIMIT + g - 1) // g  # cell width, ceil

    @staticmethod
    def for_count(n: int, target_per_cell: int = 8192,
                  dims: int = 2) -> "Grid":
        """Pick a grid size so the average cell holds ~target rows.

        The scale story: at 10^12 rows and target 8k/cell this yields a
        ~11k×11k grid (1.2e8 cells) — cells stay executor-memory-sized
        and the stats table stays a few GB (broadcastable in chunks or
        range-partitioned). At test scale it degrades gracefully to a
        handful of cells.
        """
        cells = max(1, n // max(1, target_per_cell))
        g = max(1, int(np.ceil(cells ** (1.0 / dims))))
        return Grid(g, dims=dims)

    # ---- row-major cell-id algebra (shared by Spark SQL and numpy) --
    def coord_sql(self, cell: str, j: int, g: int | None = None) -> str:
        """SQL expr: the j-th grid coordinate of a row-major cell id."""
        g = self.g if g is None else g
        div = g ** (self.dims - 1 - j)
        s = f"({cell} DIV {div})" if div > 1 else f"({cell})"
        return f"({s} % {g})" if j > 0 else s

    def parent_cell_sql(self, cell: str, child_g: int, fac: int,
                        parent_g: int) -> str:
        """SQL: row-major parent id on a parent_g-per-dim grid, each
        parent covering fac x .. x fac children of a child_g-per-dim
        grid (the pyramid / super-cell coarsening)."""
        expr = f"({self.coord_sql(cell, 0, child_g)} DIV {fac})"
        for j in range(1, self.dims):
            expr = (f"({expr} * {parent_g} "
                    f"+ ({self.coord_sql(cell, j, child_g)} DIV {fac}))")
        return expr

    def child_ranges_sql(self, cell: str, parent_g: int, fac: int,
                         child_g: int) -> list:
        """Per-dim (lo, hi) SQL for the children of a coarse cell on the
        child grid — plug into explode(sequence(lo, hi))."""
        out = []
        for j in range(self.dims):
            p = self.coord_sql(cell, j, parent_g)
            out.append((f"{p} * {fac}",
                        f"LEAST({p} * {fac} + {fac - 1}, {child_g - 1})"))
        return out

    def compose_sql(self, coords: list, g: int | None = None) -> str:
        """SQL: row-major cell id from per-dim coordinate exprs."""
        g = self.g if g is None else g
        expr = coords[0]
        for c in coords[1:]:
            expr = f"({expr} * {g} + {c})"
        return expr

    # -- Spark SQL expression (string; plug into F.expr / selectExpr)
    def spark_cell_sql(self, x: str = "x", y: str = "y") -> str:
        return self.spark_cell_sql_nd([x, y] if self.dims == 2 else None)

    def spark_cell_sql_nd(self, cols) -> str:
        """Row-major cell id over the first `dims` coordinate columns."""
        assert len(cols) >= self.dims, (cols, self.dims)
        expr = f"({cols[0]} DIV {self.cw})"
        for c in cols[1:self.dims]:
            expr = f"({expr} * {self.g} + ({c} DIV {self.cw}))"
        return expr

    # -- DuckDB SQL (oracle side)
    def duckdb_cell_sql(self, x: str = "x", y: str = "y") -> str:
        assert self.dims == 2
        return f"(({x} // {self.cw}) * {self.g} + ({y} // {self.cw}))"

    # float-coordinate variants: FLOOR(x / cw) over an IEEE double
    # divide — Spark, DuckDB and numpy floor the SAME correctly-rounded
    # quotient, so the three agree bit-for-bit on every input (what
    # matters is cross-engine consistency, not the exact boundary)
    def spark_cell_sql_f64(self, x: str = "x", y: str = "y") -> str:
        return self.spark_cell_sql_f64_nd([x, y] if self.dims == 2 else None)

    def spark_cell_sql_f64_nd(self, cols) -> str:
        assert len(cols) >= self.dims, (cols, self.dims)
        def fl(c):
            return (f"CAST(FLOOR({c} / CAST({self.cw} AS DOUBLE)) "
                    f"AS BIGINT)")
        expr = fl(cols[0])
        for c in cols[1:self.dims]:
            expr = f"(({expr}) * {self.g} + {fl(c)})"
        return expr

    def duckdb_cell_sql_f64(self, x: str = "x", y: str = "y") -> str:
        return (f"(CAST(FLOOR({x} / {self.cw}.0) AS BIGINT) * {self.g}"
                f" + CAST(FLOOR({y} / {self.cw}.0) AS BIGINT))")

    # -- numpy
    def cell_of(self, x: np.ndarray, y: np.ndarray) -> np.ndarray:
        assert self.dims == 2
        if np.issubdtype(np.asarray(x).dtype, np.floating):
            return (np.floor(x / float(self.cw)).astype(np.int64) * self.g
                    + np.floor(y / float(self.cw)).astype(np.int64))
        return (x // self.cw) * self.g + (y // self.cw)

    def cell_coord(self, cell: np.ndarray, j: int) -> np.ndarray:
        """j-th grid coordinate of a row-major cell id (numpy)."""
        c = cell // (self.g ** (self.dims - 1 - j))
        return c % self.g if j > 0 else c

    def cell_bounds(self, cell: np.ndarray):
        """Geometric bounds of cells in the first two gridded dims:
        (xlo, ylo, xhi, yhi) inclusive."""
        xlo = self.cell_coord(cell, 0) * self.cw
        ylo = self.cell_coord(cell, 1) * self.cw
        return xlo, ylo, xlo + self.cw - 1, ylo + self.cw - 1

    def cells_overlapping_box(self, xlo, ylo, xhi, yhi) -> np.ndarray:
        """All cell ids whose geometric extent intersects the box."""
        cx0 = max(0, int(xlo) // self.cw)
        cx1 = min(self.g - 1, int(xhi) // self.cw)
        cy0 = max(0, int(ylo) // self.cw)
        cy1 = min(self.g - 1, int(yhi) // self.cw)
        if cx1 < cx0 or cy1 < cy0:
            return np.empty(0, np.int64)
        cxs = np.arange(cx0, cx1 + 1, dtype=np.int64)
        cys = np.arange(cy0, cy1 + 1, dtype=np.int64)
        return (cxs[:, None] * self.g + cys[None, :]).ravel()


def box_min_dist2(qx: np.ndarray, qy: np.ndarray, boxes: np.ndarray
                  ) -> np.ndarray:
    """Squared L2 distance from each query to each box (m_q, m_box).

    boxes: (m, 4) [xlo, ylo, xhi, yhi]. The distributed analogue of the
    reference's `p2b_min_distance` (query_op/nn_search.hpp:22-35), used
    to decide which cells a kNN query must visit.
    """
    dx = np.maximum(np.maximum(boxes[None, :, 0] - qx[:, None],
                               qx[:, None] - boxes[None, :, 2]), 0).astype(np.float64)
    dy = np.maximum(np.maximum(boxes[None, :, 1] - qy[:, None],
                               qy[:, None] - boxes[None, :, 3]), 0).astype(np.float64)
    return dx * dx + dy * dy
