"""Deterministic point-set derivations from the driver's testdata tables.

The reference's inputs are ASCII files of uniform or variable-density
("varden") integer points in [0, 1e6]^d (`tests/testFramework.h:967-990`,
`script/gen_ss_varden.sh`). Here, point sets derive *arithmetically* from
the shared parquet tables so that the driver's DuckDB oracle can compute
the identical set with plain SQL — same constants, same integer ops,
bit-identical in both engines.

`pid` is a deterministic 64-bit key from lineitem's unique natural key
(l_orderkey, l_linenumber, l_partkey, l_suppkey). All products stay far
below 2^63 up to sf10, and all operands are non-negative so `%` agrees
between Spark and DuckDB.

uniform:  x, y from multiplicative scrambles of pid — iid-uniform-ish
          over [0, 1e6)² (generate_random_points analogue).
varden:   64 cluster centers (hashed from l_partkey) with per-cluster
          spread in {1e2, 1e4, 2e5} spanning 3 orders of magnitude —
          the hot-cell / skew stressor (ss_varden analogue).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# -- shared arithmetic (same text works in Spark SQL and DuckDB) --------------

PID_SQL = ("(l_orderkey * 2654435761 + l_linenumber * 40503 "
           "+ l_partkey * 2246822519 + l_suppkey * 3266489917)")

UNIFORM_X_SQL = f"((({PID_SQL} % 1000003) * 7919) % 1000000)"
UNIFORM_Y_SQL = f"((({PID_SQL} % 999983) * 104729) % 1000000)"

_CLUSTER_SQL = "(l_partkey % 64)"
_VCX_SQL = f"(({_CLUSTER_SQL} * 2654435761) % 1000000)"
_VCY_SQL = f"(({_CLUSTER_SQL} * 2246822519) % 1000000)"
# spread by cluster id: 100 / 10_000 / 200_000
_SIG_SQL = (f"(CASE WHEN {_CLUSTER_SQL} % 3 = 0 THEN 100 "
            f"WHEN {_CLUSTER_SQL} % 3 = 1 THEN 10000 ELSE 200000 END)")
VARDEN_X_SQL = (f"GREATEST(0, LEAST(999999, {_VCX_SQL} + "
                f"(({PID_SQL} % (2 * {_SIG_SQL} + 1)) - {_SIG_SQL})))")
VARDEN_Y_SQL = (f"GREATEST(0, LEAST(999999, {_VCY_SQL} + "
                f"((({PID_SQL} % 999983) % (2 * {_SIG_SQL} + 1)) - {_SIG_SQL})))")

# third dimension for d=3 workloads (the reference tests d in {2,3,5,...},
# tests/test.cpp:569-617); same multiplicative-scramble family
UNIFORM_Z_SQL = f"((({PID_SQL} % 999979) * 7907) % 1000000)"

# time-slice label for the sliding-window workload (insertOsmByTime analogue,
# tests/testFramework.h:818-870): 10 slices keyed off pid
SLICE_SQL = f"({PID_SQL} % 10)"


def points_select_sql(dist: str = "uniform") -> str:
    """SELECT-list fragment producing (pid, x, y, slice) from lineitem."""
    if dist == "uniform":
        xs, ys = UNIFORM_X_SQL, UNIFORM_Y_SQL
    elif dist == "varden":
        xs, ys = VARDEN_X_SQL, VARDEN_Y_SQL
    else:
        raise ValueError(dist)
    return (f"{PID_SQL} AS pid, {xs} AS x, {ys} AS y, {SLICE_SQL} AS slice")


def points_sql(table: str = "lineitem", dist: str = "uniform") -> str:
    return f"SELECT {points_select_sql(dist)} FROM {table}"


def load_points(spark: SparkSession, sf_dir: str, dist: str = "uniform"
                ) -> DataFrame:
    """Derive the point DataFrame from lineitem parquet.

    Narrow projection: Catalyst prunes the scan to the four key columns
    (check: ReadSchema in `.explain("formatted")`).
    """
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    li.createOrReplaceTempView("_pts_lineitem")
    return spark.sql(points_sql("_pts_lineitem", dist))


# -- query points: a deterministic subset of the data (the reference queries
#    with the first 1% of the dataset itself, testFramework.h:25,471-521) ----

QUERY_FILTER_SQL = f"({PID_SQL} % 101 = 7)"  # ~1% of rows, deterministic


def query_points_sql(table: str = "lineitem", dist: str = "uniform",
                     qdist: str | None = None) -> str:
    """Query set = ~1% sample; optionally drawn from a different
    distribution than the build set (the OOD workload, test.cpp:494-509)."""
    sel = points_select_sql(qdist or dist)
    return (f"SELECT pid AS qid, x, y FROM "
            f"(SELECT {sel} FROM {table} WHERE {QUERY_FILTER_SQL})")


def load_query_points(spark: SparkSession, sf_dir: str, dist: str = "uniform",
                      qdist: str | None = None) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    li.createOrReplaceTempView("_qpts_lineitem")
    return spark.sql(query_points_sql("_qpts_lineitem", dist, qdist))


# -- update batches (insert/delete fixtures; the reference reads a sibling
#    file and takes ratio-sized prefixes, tests/test.cpp:53-74) --------------

INSERT_FILTER_SQL = f"({PID_SQL} % 97 = 13)"   # ~1% batch to insert
DELETE_FILTER_SQL = f"({PID_SQL} % 89 = 11)"   # ~1% batch to delete

# inserted points get fresh pids + shifted coords so they don't collide
INSERT_PID_SQL = f"({PID_SQL} + 4000000000000000)"
INSERT_X_SQL = f"((({PID_SQL} % 1000033) * 6007) % 1000000)"
INSERT_Y_SQL = f"((({PID_SQL} % 999979) * 31771) % 1000000)"


def insert_batch_sql(table: str = "lineitem") -> str:
    return (f"SELECT {INSERT_PID_SQL} AS pid, {INSERT_X_SQL} AS x, "
            f"{INSERT_Y_SQL} AS y FROM {table} WHERE {INSERT_FILTER_SQL}")


def delete_batch_sql(table: str = "lineitem", dist: str = "uniform") -> str:
    """Deletes target existing points (FullCovered semantics on the match)."""
    sel = points_select_sql(dist)
    return (f"SELECT pid, x, y FROM (SELECT {sel} FROM {table} "
            f"WHERE {DELETE_FILTER_SQL})")
