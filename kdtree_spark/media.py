"""Audio/video payload columns — the multimodal plumbing beyond images.

Same design contract as images.py: media rides in opaque `binary`
columns with typed metadata; every pipeline op is an Arrow-batched
`mapInPandas` (schema, partitioning and batch shape are real and
tested); compressed codecs (webm video, opus/mp3 audio) are HONESTLY
STUBBED behind NotImplementedError because no DSP libraries exist in
this container — the synthetic formats (`rawv`/`rawvz` frame stacks,
`pcm16`/`pcmz` int16 PCM) exercise the identical code path losslessly.
Three REAL standard containers ride the same paths: `wav` (RIFF PCM
via the stdlib `wave` module, lossless mono int16), `avi` (RIFF/AVI
with an MJPG stream — one baseline jpeg.py image per frame, avi.py)
and `mp4` (ISO BMFF with a 'jpeg' video track, mp4.py), the video two
lossy at >= 40 dB frame PSNR; the synthesized table keeps its
pcm16/pcmz and rawv/rawvz splits (frozen with the DuckDB oracles) and
wav/avi/mp4 are tested separately (test_media.py, test_avi.py,
test_mp4.py).

Determinism: all metadata derives from (doc_id, text) with pure-SQL
arithmetic (so `media_meta` is oracle-checked against DuckDB), and all
content derives from the caption's md5 seed (so duplicate captions give
byte-identical media, consistent with images.py's dedup story).
Generation is a narrow mapInPandas over `documents` — at 10^12 rows it
parallelizes over input splits with no shuffle.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .images import content_seed, phash64, render_pixels

MEDIA_SCHEMA = ("media_id string, kind string, bytes binary, fmt string, "
                "duration_ms long, fps long, sample_rate long, "
                "w int, h int, caption string")

# metadata derivations — identical text in Spark SQL and DuckDB
KIND_SQL = "(CASE WHEN doc_id % 2 = 0 THEN 'video' ELSE 'audio' END)"
DUR_SQL = "(200 + (length(text) * 48271) % 1000)"          # 200..1199 ms
FPS_SQL = "(CASE WHEN doc_id % 2 = 0 THEN 10 + (doc_id % 3) * 5 ELSE 0 END)"
SR_SQL = ("(CASE WHEN doc_id % 2 = 1 THEN 1000 + (doc_id % 3) * 1000 "
          "ELSE 0 END)")
FRAME_W = FRAME_H = 16

VIDEO_FMTS = ("rawv", "rawvz")      # real, lossless
AUDIO_FMTS = ("pcm16", "pcmz")      # real, lossless (synth table split)
WAV_FMT = "wav"                     # real RIFF container (stdlib wave)
AVI_FMT = "avi"                     # real RIFF/AVI MJPG container (avi.py)
MP4_FMT = "mp4"                     # real ISO BMFF MJPEG container (mp4.py)
STUB_FMTS = ("webm", "opus", "mp3")  # genuinely need DSP codec libraries


def n_frames(duration_ms: int, fps: int) -> int:
    return max(1, (int(duration_ms) * int(fps)) // 1000)


def n_samples(duration_ms: int, sample_rate: int) -> int:
    return max(1, (int(duration_ms) * int(sample_rate)) // 1000)


# ------------------------------------------------------------------ codecs

def encode_video(frames: np.ndarray, fmt: str, fps: int = 10) -> bytes:
    """frames: (n, h, w, 3) uint8 -> container bytes. `fps` is only
    stamped into container formats (avi); raw stacks carry it in the
    table's metadata columns instead."""
    if fmt == "avi":
        from . import avi
        return avi.encode(frames, fps)
    if fmt == "mp4":
        from . import mp4
        return mp4.encode(frames, fps)
    raw = frames.tobytes()
    if fmt == "rawv":
        return raw
    if fmt == "rawvz":
        return zlib.compress(raw, 6)
    raise NotImplementedError(
        f"video codec '{fmt}' not available in this environment (stub)")


def decode_video(data: bytes, fmt: str, n: int, w: int, h: int) -> np.ndarray:
    if fmt in ("avi", "mp4"):
        if fmt == "avi":
            from . import avi as container
        else:
            from . import mp4 as container
        frames, _fps = container.decode(bytes(data))
        if frames.shape != (n, h, w, 3):
            raise ValueError(f"{fmt} carries {frames.shape}, metadata "
                             f"says ({n}, {h}, {w}, 3)")
        return frames
    if fmt == "rawv":
        buf = data
    elif fmt == "rawvz":
        buf = zlib.decompress(data)
    else:
        raise NotImplementedError(
            f"video codec '{fmt}' not available in this environment (stub)")
    return np.frombuffer(buf, np.uint8).reshape(n, h, w, 3)


WAV_RATE = 16_000  # sample rate stamped into wav headers (mono int16)


def _wav_encode(pcm: np.ndarray) -> bytes:
    """Standards-conformant RIFF/WAVE via the stdlib `wave` module:
    mono 16-bit little-endian PCM — a real container any audio tool
    reads, not a stub."""
    import io
    import wave
    bio = io.BytesIO()
    with wave.open(bio, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(WAV_RATE)
        wv.writeframes(pcm.astype("<i2").tobytes())
    return bio.getvalue()


def _wav_decode(data: bytes) -> np.ndarray:
    import io
    import wave
    with wave.open(io.BytesIO(bytes(data)), "rb") as wv:
        if wv.getsampwidth() != 2:
            raise NotImplementedError(
                f"wav sample width {wv.getsampwidth()} unsupported "
                "(int16 only)")
        frames = np.frombuffer(wv.readframes(wv.getnframes()), "<i2")
        if wv.getnchannels() > 1:  # downmix by first channel
            frames = frames[::wv.getnchannels()]
    return frames


def encode_audio(pcm: np.ndarray, fmt: str) -> bytes:
    """pcm: (n,) int16 -> bytes."""
    if fmt == "wav":
        return _wav_encode(pcm)
    raw = pcm.astype("<i2").tobytes()
    if fmt == "pcm16":
        return raw
    if fmt == "pcmz":
        return zlib.compress(raw, 6)
    raise NotImplementedError(
        f"audio codec '{fmt}' not available in this environment (stub)")


def decode_audio(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "wav":
        return _wav_decode(data)
    if fmt == "pcm16":
        buf = data
    elif fmt == "pcmz":
        buf = zlib.decompress(data)
    else:
        raise NotImplementedError(
            f"audio codec '{fmt}' not available in this environment (stub)")
    return np.frombuffer(buf, "<i2")


def render_frames(seed: int, n: int, w: int, h: int) -> np.ndarray:
    """Deterministic video: frame i = render_pixels(seed + i) — low-
    frequency content per frame so frame phashes are discriminative."""
    return np.stack([render_pixels(seed + i, w, h) for i in range(n)])


def render_pcm(seed: int, n: int) -> np.ndarray:
    """Deterministic int16 'PCM': a sum of two integer-phase sinusoids
    plus seeded noise — enough structure for windowed features."""
    rng = np.random.default_rng(seed)
    f1, f2 = rng.integers(2, 40, size=2)
    t = np.arange(n, dtype=np.float64)
    sig = (8000 * np.sin(2 * np.pi * f1 * t / n)
           + 4000 * np.sin(2 * np.pi * f2 * t / n)
           + rng.integers(-500, 500, size=n))
    return np.clip(sig, -32768, 32767).astype(np.int16)


# ------------------------------------------------------------- table synth

def synth_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One media row per document: even doc_ids video, odd audio."""
    docs = spark.sql(
        f"SELECT doc_id, text, {KIND_SQL} AS kind, {DUR_SQL} AS dur, "
        f"{FPS_SQL} AS fps, {SR_SQL} AS sr FROM {{d}}",
        d=spark.read.parquet(f"{sf_dir}/documents.parquet"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text, kind, dur, fps, sr in zip(
                    pdf.doc_id, pdf.text, pdf.kind, pdf.dur, pdf.fps,
                    pdf.sr):
                seed = content_seed(text)
                if kind == "video":
                    fmt = VIDEO_FMTS[(doc_id // 2) % 2]
                    frames = render_frames(seed, n_frames(dur, fps),
                                           FRAME_W, FRAME_H)
                    data = encode_video(frames, fmt)
                    w, h = FRAME_W, FRAME_H
                else:
                    fmt = AUDIO_FMTS[(doc_id // 2) % 2]
                    data = encode_audio(render_pcm(seed, n_samples(dur, sr)),
                                        fmt)
                    w = h = 0
                rows.append((f"med-{doc_id:012d}", kind, data, fmt,
                             int(dur), int(fps), int(sr), w, h, text))
            yield pd.DataFrame(rows, columns=[
                "media_id", "kind", "bytes", "fmt", "duration_ms", "fps",
                "sample_rate", "w", "h", "caption"])

    return docs.mapInPandas(gen, MEDIA_SCHEMA)


# --------------------------------------------------------- pipeline kernels

FRAME_SCHEMA = "media_id string, frame_idx long, ts_ms long, frame_phash long"


def frame_sample(media: DataFrame, every_ms: int = 100) -> DataFrame:
    """Decode videos, sample one frame every `every_ms`, emit its
    perceptual hash — the video feature-extraction stage shape (decode
    -> per-frame kernel -> tall narrow output). Audio rows pass through
    empty; the batch never leaves Arrow."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "frame_idx", "ts_ms",
                                   "frame_phash")}
            for mid, kind, data, fmt, dur, fps, w, h in zip(
                    pdf.media_id, pdf.kind, pdf.bytes, pdf.fmt,
                    pdf.duration_ms, pdf.fps, pdf.w, pdf.h):
                if kind != "video":
                    continue
                n = n_frames(dur, fps)
                frames = decode_video(data, fmt, n, int(w), int(h))
                step_ms = max(1, int(every_ms))
                for ts in range(0, int(dur), step_ms):
                    idx = min(n - 1, (ts * int(fps)) // 1000)
                    out["media_id"].append(mid)
                    out["frame_idx"].append(idx)
                    out["ts_ms"].append(ts)
                    out["frame_phash"].append(phash64(frames[idx]))
            yield pd.DataFrame(out)

    return media.select("media_id", "kind", "bytes", "fmt", "duration_ms",
                        "fps", "w", "h").mapInPandas(gen, FRAME_SCHEMA)


AUDIO_SCHEMA = ("media_id string, win_idx long, energy long, zcross long")


def audio_features(media: DataFrame, win: int = 256) -> DataFrame:
    """Windowed audio features over decoded PCM: integer energy (sum of
    squared samples) and zero-crossing count per window — exact int64,
    vectorized reshape kernels, video rows pass through empty."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for mid, kind, data, fmt in zip(
                    pdf.media_id, pdf.kind, pdf.bytes, pdf.fmt):
                if kind != "audio":
                    continue
                pcm = decode_audio(data, fmt).astype(np.int64)
                nw = len(pcm) // win
                if nw == 0:
                    continue
                x = pcm[:nw * win].reshape(nw, win)
                energy = (x * x).sum(axis=1)
                zc = (np.diff(np.signbit(x), axis=1) != 0).sum(axis=1)
                outs.append(pd.DataFrame({
                    "media_id": mid, "win_idx": np.arange(nw, dtype=np.int64),
                    "energy": energy, "zcross": zc.astype(np.int64)}))
            yield (pd.concat(outs, ignore_index=True) if outs
                   else pd.DataFrame(columns=["media_id", "win_idx",
                                              "energy", "zcross"]))

    return media.select("media_id", "kind", "bytes", "fmt").mapInPandas(
        gen, AUDIO_SCHEMA)
