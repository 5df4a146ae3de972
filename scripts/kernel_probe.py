"""Sustained multi-process scaling probe of the hot kernels ALONE
(`LocalKDTree.build`, `LocalKDTree.knn`, `LocalKDTree.range_count`,
and the image payload's `jpeg` decode) — no Spark, no JVM.

Separates the engine's own compute from Spark machinery + host
oversubscription in the BENCH.md scaling argument: each process builds
a 150k-point blob (the Grid(16)/38.4M-row study's cell size) and then
loops the kernel for ~SECONDS seconds; the aggregate rate at 2 vs 8
processes is the kernel's process-scaling efficiency on this host.

Usage: python scripts/kernel_probe.py            # both kernels, 2 and 8
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BLOB = 150_000
K = 10
BATCH = 3_000
SECONDS = float(os.environ.get("PROBE_SECONDS", "12"))


def _build_worker(seed: int) -> float:
    import numpy as np

    from kdtree_spark.localtree import LocalKDTree
    rng = np.random.default_rng(seed)
    pts = rng.integers(0, 62_500, size=(N_BLOB, 2)).astype(np.int64)
    ids = np.arange(N_BLOB, dtype=np.int64)
    LocalKDTree.build(pts, ids)  # warm
    t0 = time.time()
    rows = 0
    while time.time() - t0 < SECONDS:
        LocalKDTree.build(pts, ids)
        rows += N_BLOB
    return rows / (time.time() - t0)


def _knn_worker(seed: int) -> float:
    import numpy as np

    from kdtree_spark.localtree import LocalKDTree
    rng = np.random.default_rng(seed)
    pts = rng.integers(0, 62_500, size=(N_BLOB, 2)).astype(np.int64)
    ids = np.arange(N_BLOB, dtype=np.int64)
    tree = LocalKDTree.build(pts, ids)
    q = rng.integers(0, 62_500, size=(BATCH, 2)).astype(np.int64)
    # production-shaped prune bound: kth into the fractional probe
    # sample (index._probe_cap), exactly what phase 3 receives
    pool = pts[::32]
    ptree = LocalKDTree.build(pool, np.arange(len(pool), dtype=np.int64))
    ub = ptree.knn_bound(q, K)
    tree.knn(q[:256], K, ub=ub[:256])  # warm
    t0 = time.time()
    nq = 0
    while time.time() - t0 < SECONDS:
        tree.knn(q, K, ub=ub)
        nq += BATCH
    return nq / (time.time() - t0)


def _range_worker(seed: int) -> float:
    import numpy as np

    from kdtree_spark.localtree import LocalKDTree
    rng = np.random.default_rng(seed)
    pts = rng.integers(0, 62_500, size=(N_BLOB, 2)).astype(np.int64)
    ids = np.arange(N_BLOB, dtype=np.int64)
    tree = LocalKDTree.build(pts, ids)
    # reference rangeCountFix shape: boxes sized for ~100-point hits
    # (side ~ sqrt(100/density) of the 62,500^2 blob domain)
    side = int(62_500 * (100 / N_BLOB) ** 0.5)
    lo = rng.integers(0, 62_500 - side, size=(BATCH, 2)).astype(np.int64)
    boxes = np.hstack([lo, lo + side])
    tree.range_count(boxes[:256])  # warm
    t0 = time.time()
    nq = 0
    while time.time() - t0 < SECONDS:
        tree.range_count(boxes)
        nq += BATCH
    return nq / (time.time() - t0)


def _jpeg_worker(seed: int) -> float:
    """Image-payload kernel: decode the synth table's jpeg class — the
    per-task work of decode_features/frame_sample over fmt='jpeg' rows
    (embarrassingly parallel across mapInPandas tasks; this measures
    whether the host actually delivers that across processes)."""
    from kdtree_spark import images as im
    from kdtree_spark import jpeg
    encs = [jpeg.encode(im.render_pixels(seed * 100 + i, 24, 24))
            for i in range(64)]
    jpeg.decode(encs[0])  # warm (LUT cache)
    t0 = time.time()
    n = 0
    while time.time() - t0 < SECONDS:
        for e in encs:
            jpeg.decode(e)
        n += len(encs)
    return n / (time.time() - t0)


def probe(worker, procs: int) -> float:
    with mp.Pool(procs) as p:
        rates = p.map(worker, range(procs))
    return sum(rates)


def main() -> None:
    out: dict = {"n_blob": N_BLOB, "k": K, "seconds": SECONDS}
    for name, worker in (("build_rows_per_sec", _build_worker),
                         ("knn_q_per_sec", _knn_worker),
                         ("range_q_per_sec", _range_worker),
                         ("jpeg_decode_img_per_sec", _jpeg_worker)):
        for procs in (2, 8):
            out[f"{name}_p{procs}"] = round(probe(worker, procs), 1)
        out[f"{name}_eff_2to8"] = round(
            out[f"{name}_p8"] / out[f"{name}_p2"] / 4.0, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
