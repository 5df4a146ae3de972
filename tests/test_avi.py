"""AVI/MJPG container (kdtree_spark/avi.py): round-trip frame fidelity
(>= 40 dB, the input_hint lossy invariant), RIFF structural conformance,
fps metadata, stream selection, error paths, and the Spark frame-sample
path over avi rows vs rawv rows on the same content."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from kdtree_spark import avi
from kdtree_spark import images as im
from kdtree_spark import media as md


def test_roundtrip_psnr_and_fps():
    frames = md.render_frames(321, 9, 16, 16)
    data = avi.encode(frames, fps=25)
    back, fps = avi.decode(data)
    assert fps == 25 and back.shape == frames.shape
    assert all(im.psnr(frames[i], back[i]) >= 40.0 for i in range(9))
    # deterministic bytes (dedup/oracle story)
    assert avi.encode(frames, fps=25) == data


def test_riff_structure_conformant():
    """Walk the emitted RIFF tree independently of the reader: the
    canonical hdrl(avih, strl(strh MJPG, strf MJPG)) / movi / idx1
    layout any AV tool parses."""
    frames = md.render_frames(5, 4, 20, 12)
    data = avi.encode(frames, fps=10)
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    (riff_size,) = struct.unpack("<I", data[4:8])
    assert 8 + riff_size == len(data)
    tops = []
    pos = 12
    while pos + 8 <= len(data):
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        tops.append(data[pos + 8:pos + 12] if fourcc == b"LIST"
                    else fourcc)
        pos += 8 + size + (size & 1)
    assert tops == [b"hdrl", b"movi", b"idx1"]
    # avih carries n/w/h; strh is vids/MJPG; strf biCompression is MJPG
    i = data.find(b"avih")
    n_total, w, h = struct.unpack("<I", data[i + 24:i + 28])[0], \
        struct.unpack("<I", data[i + 40:i + 44])[0], \
        struct.unpack("<I", data[i + 44:i + 48])[0]
    assert (n_total, w, h) == (4, 20, 12)   # (frames, width, height)
    i = data.find(b"strh")
    assert data[i + 8:i + 16] == b"vidsMJPG"
    # every frame chunk is a standalone baseline JPEG
    i = data.find(b"movi") + 4
    count = 0
    while data[i:i + 4] == b"00dc":
        (sz,) = struct.unpack("<I", data[i + 4:i + 8])
        jpg = data[i + 8:i + 8 + sz]
        assert jpg[:2] == b"\xFF\xD8" and jpg[-2:] == b"\xFF\xD9"
        count += 1
        i += 8 + sz + (sz & 1)
    assert count == 4
    # idx1 has one entry per frame with the keyframe flag
    i = data.find(b"idx1")
    (isz,) = struct.unpack("<I", data[i + 4:i + 8])
    assert isz == 16 * 4
    assert data[i + 8:i + 12] == b"00dc"
    assert struct.unpack("<I", data[i + 12:i + 16])[0] == 0x10


def test_error_paths():
    frames = md.render_frames(5, 3, 16, 16)
    good = avi.encode(frames)
    with pytest.raises(ValueError, match="not an AVI"):
        avi.decode(b"RIFX" + good[4:])
    with pytest.raises(ValueError):
        avi.decode(good[:60])          # truncated inside hdrl
    with pytest.raises(ValueError, match="no MJPG video"):
        # flip the stream type so no vids stream exists
        broken = good.replace(b"vidsMJPG", b"audsMJPG")
        avi.decode(broken)
    with pytest.raises(ValueError):
        avi.encode(np.empty((0, 8, 8, 3), np.uint8))


def test_frame_sample_avi_vs_rawv(spark):
    """avi rows ride the same Spark frame_sample path as rawv rows;
    phashes agree frame-for-frame (the JPEG loss never flips a phash
    bit on this content: low-frequency blocks, 43+ dB)."""
    rows_raw, rows_avi = [], []
    for i in range(4):
        dur, fps = 400 + i * 100, 10
        n = md.n_frames(dur, fps)
        fr = md.render_frames(700 + i, n, md.FRAME_W, md.FRAME_H)
        base = (f"m-{i}", "video", int(dur), int(fps), 0,
                md.FRAME_W, md.FRAME_H, f"cap {i}")
        rows_raw.append((base[0], base[1],
                         bytearray(md.encode_video(fr, "rawv")), "rawv",
                         *base[2:]))
        rows_avi.append((base[0], base[1],
                         bytearray(md.encode_video(fr, "avi", fps=fps)),
                         "avi", *base[2:]))
    schema = ("media_id string, kind string, bytes binary, fmt string, "
              "duration_ms long, fps long, sample_rate long, w int, "
              "h int, caption string")
    fa = md.frame_sample(spark.createDataFrame(rows_avi, schema)) \
        .toPandas().sort_values(["media_id", "ts_ms"]).reset_index(drop=True)
    fr_ = md.frame_sample(spark.createDataFrame(rows_raw, schema)) \
        .toPandas().sort_values(["media_id", "ts_ms"]).reset_index(drop=True)
    assert len(fa) == len(fr_) > 0
    assert (fa.frame_idx == fr_.frame_idx).all()
    # >= 95% of sampled frames keep an identical phash through the
    # lossy container; none drift more than a couple of bits
    same = (fa.frame_phash == fr_.frame_phash).mean()
    assert same >= 0.95
    xor = np.bitwise_xor(fa.frame_phash.to_numpy(np.int64),
                         fr_.frame_phash.to_numpy(np.int64))
    ham = np.unpackbits(xor.view(np.uint8)).sum() / len(fa)
    assert ham <= 2.0
