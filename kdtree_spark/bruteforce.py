"""Brute-force numpy oracles (plays the role of the reference's CGAL
differential oracle, `tests/checkCorrectParallel.cpp:316-366`)."""

from __future__ import annotations

import numpy as np


def knn(pts: np.ndarray, ids: np.ndarray, q: np.ndarray, k: int):
    """Exact kNN, tie-break (dist², id). Returns (dist2 (m,k), ids (m,k))."""
    pts = np.asarray(pts, np.float64)
    q = np.asarray(q, np.float64)
    m = q.shape[0]
    out_d = np.full((m, k), np.inf)
    out_i = np.full((m, k), -1, np.int64)
    if len(ids) == 0:
        return out_d, out_i
    diff = q[:, None, :] - pts[None, :, :]
    d2 = np.einsum("ijk,ijk->ij", diff, diff)
    kk = min(k, len(ids))
    ordr = np.lexsort((np.broadcast_to(ids, d2.shape), d2), axis=1)[:, :kk]
    rows = np.arange(m)[:, None]
    out_d[:, :kk] = d2[rows, ordr]
    out_i[:, :kk] = np.broadcast_to(ids, d2.shape)[rows, ordr]
    return out_d, out_i


def range_count(pts: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    pts = np.asarray(pts)
    boxes = np.asarray(boxes)
    d = pts.shape[1]
    blo, bhi = boxes[:, :d], boxes[:, d:]
    inb = np.all((pts[None, :, :] >= blo[:, None, :])
                 & (pts[None, :, :] <= bhi[:, None, :]), axis=2)
    return inb.sum(axis=1).astype(np.int64)


def range_report(pts: np.ndarray, ids: np.ndarray, boxes: np.ndarray):
    d = pts.shape[1]
    blo, bhi = boxes[:, :d], boxes[:, d:]
    out = []
    for b in range(len(boxes)):
        ok = np.all((pts >= blo[b]) & (pts <= bhi[b]), axis=1)
        for i in np.flatnonzero(ok):
            out.append((b, tuple(pts[i]), int(ids[i])))
    return sorted(out)


def circle_count(pts: np.ndarray, centers: np.ndarray, radii: np.ndarray):
    pts = np.asarray(pts, np.float64)
    centers = np.asarray(centers, np.float64)
    diff = centers[:, None, :] - pts[None, :, :]
    d2 = np.einsum("ijk,ijk->ij", diff, diff)
    return (d2 <= (np.asarray(radii, np.float64) ** 2)[:, None]).sum(axis=1)
