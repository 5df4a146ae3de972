"""Precompute deterministic media features into repo fixture parquets
so the DuckDB oracle can verify the payload-dependent media gates
(`video_frame_sample`, `audio_features`, `image_decode_stats`) exactly —
the same pattern as the phash fixture (scripts/gen_phash_fixture.py):
values that are pure functions of the caption text are materialized once
and joined by the oracle on caption_md5.

Media params: duration derives from length(text) (media.DUR_SQL), but
fps/sample_rate derive from doc_id (media.FPS_SQL / SR_SQL) and the same
text can appear under different doc_ids across scale factors — so the
fixtures key on (caption_md5, fps) / (caption_md5, sr) and enumerate all
three possible fps / sr values per text. The oracle recomputes fps / sr
from doc_id in SQL and joins on both columns.

Regenerate with:  python scripts/gen_media_fixture.py
Outputs:          fixtures_data/media_frames.parquet
                    (caption_md5, fps, frame_idx, ts_ms, frame_phash)
                  fixtures_data/audio_windows.parquet
                    (caption_md5, sr, win_idx, energy, zcross)

tests/test_media.py asserts fixture rows equal freshly-computed ones,
so drift between these files and media.py fails CI.
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kdtree_spark import media as md  # noqa: E402
from kdtree_spark.images import content_seed, phash64  # noqa: E402

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1"]
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "fixtures_data")

FPS_VALUES = (10, 15, 20)        # media.FPS_SQL: 10 + (doc_id % 3) * 5
SR_VALUES = (1000, 2000, 3000)   # media.SR_SQL: 1000 + (doc_id % 3) * 1000


def distinct_texts() -> dict[str, str]:
    texts: dict[str, str] = {}
    for d in SF_DIRS:
        for (t,) in duckdb.sql(
                f"SELECT DISTINCT text FROM '{d}/documents.parquet'"
        ).fetchall():
            texts[hashlib.md5(t.encode()).hexdigest()] = t
    return texts


def frame_rows(md5: str, text: str) -> list[tuple]:
    """Mirror media.frame_sample(every_ms=100) for every possible fps."""
    dur = 200 + (len(text) * 48271) % 1000          # media.DUR_SQL
    seed = content_seed(text)
    rows = []
    for fps in FPS_VALUES:
        n = md.n_frames(dur, fps)
        frames = md.render_frames(seed, n, md.FRAME_W, md.FRAME_H)
        for ts in range(0, dur, 100):
            idx = min(n - 1, (ts * fps) // 1000)
            rows.append((md5, fps, idx, ts, phash64(frames[idx])))
    return rows


def audio_rows(md5: str, text: str, win: int = 256) -> list[tuple]:
    """Mirror media.audio_features(win=256) for every possible sr."""
    dur = 200 + (len(text) * 48271) % 1000
    seed = content_seed(text)
    rows = []
    for sr in SR_VALUES:
        ns = md.n_samples(dur, sr)
        nw = ns // win
        if nw == 0:
            continue
        pcm = md.render_pcm(seed, ns).astype(np.int64)
        x = pcm[:nw * win].reshape(nw, win)
        energy = (x * x).sum(axis=1)
        zc = (np.diff(np.signbit(x), axis=1) != 0).sum(axis=1)
        for i in range(nw):
            rows.append((md5, sr, i, int(energy[i]), int(zc[i])))
    return rows


def main() -> None:
    texts = distinct_texts()
    frames, audio = [], []
    for md5, t in sorted(texts.items()):
        frames.extend(frame_rows(md5, t))
        audio.extend(audio_rows(md5, t))
    os.makedirs(OUT_DIR, exist_ok=True)

    fdf = pd.DataFrame(frames, columns=[
        "caption_md5", "fps", "frame_idx", "ts_ms", "frame_phash"])
    for c in ("fps", "frame_idx", "ts_ms", "frame_phash"):
        fdf[c] = fdf[c].astype("int64")
    fpath = os.path.join(OUT_DIR, "media_frames.parquet")
    fdf.to_parquet(fpath, index=False)
    print(f"wrote {len(fdf)} frame rows -> {fpath}")

    adf = pd.DataFrame(audio, columns=[
        "caption_md5", "sr", "win_idx", "energy", "zcross"])
    for c in ("sr", "win_idx", "energy", "zcross"):
        adf[c] = adf[c].astype("int64")
    apath = os.path.join(OUT_DIR, "audio_windows.parquet")
    adf.to_parquet(apath, index=False)
    print(f"wrote {len(adf)} audio rows -> {apath}")


if __name__ == "__main__":
    main()
