"""Precompute the deterministic image phashes into a repo fixture
parquet so the DuckDB oracle can reproduce the Hamming join exactly
(the embeddings-table pattern: deterministic derived values materialized
once, joined by the oracle).

phash is a pure function of the caption text: pixels render from
content_seed(md5(text)) at (w, h) = f(length(text)) (images.py:37-111),
so the fixture keys on caption_md5 — the same doc_id carries different
text across scale factors, the md5 does not collide.

Regenerate with:  python scripts/gen_phash_fixture.py
Output:           fixtures_data/image_phash.parquet
                  (caption_md5 string, phash int64, mean_lum_c int64)

`mean_lum_c` = floor(mean(pixels) * 100) mirrors decode_features'
mean_lum through Spark's F.floor(mean_lum * 100) — identical float64
ops on identical inputs, so the decode-stats oracle joins it exactly.

tests/test_images.py asserts fixture phashes equal freshly-computed
ones, so drift between this file and images.py fails CI.
"""

from __future__ import annotations

import hashlib
import math
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kdtree_spark import images as im  # noqa: E402

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1"]
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "fixtures_data", "image_phash.parquet")


def main() -> None:
    texts: dict[str, str] = {}
    for d in SF_DIRS:
        for (t,) in duckdb.sql(
                f"SELECT DISTINCT text FROM '{d}/documents.parquet'"
        ).fetchall():
            texts[hashlib.md5(t.encode()).hexdigest()] = t
    rows = []
    for md5, t in sorted(texts.items()):
        w = 16 + (len(t) * 40503) % 17   # W_SQL, images.py:41
        h = 16 + (len(t) * 65521) % 17   # H_SQL, images.py:42
        px = im.render_pixels(im.content_seed(t), w, h)
        rows.append((md5, im.phash64(px),
                     math.floor(float(px.mean()) * 100)))
    pdf = pd.DataFrame(rows, columns=["caption_md5", "phash",
                                      "mean_lum_c"])
    pdf["phash"] = pdf["phash"].astype("int64")
    pdf["mean_lum_c"] = pdf["mean_lum_c"].astype("int64")
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pdf.to_parquet(OUT, index=False)
    print(f"wrote {len(pdf)} phashes -> {OUT}")


if __name__ == "__main__":
    main()
