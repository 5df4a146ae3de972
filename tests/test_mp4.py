"""MP4/ISO-BMFF MJPEG container (kdtree_spark/mp4.py): round-trip frame
fidelity (>= 40 dB), box-tree conformance, general stsc chunk-run
resolution, error paths, and Spark frame_sample parity with rawv."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from kdtree_spark import images as im
from kdtree_spark import jpeg
from kdtree_spark import media as md
from kdtree_spark import mp4


def test_roundtrip_psnr_fps_determinism():
    frames = md.render_frames(11, 8, 16, 16)
    data = mp4.encode(frames, fps=12)
    back, fps = mp4.decode(data)
    assert fps == 12 and back.shape == frames.shape
    assert all(im.psnr(frames[i], back[i]) >= 40.0 for i in range(8))
    assert mp4.encode(frames, fps=12) == data


def test_box_tree_conformant():
    frames = md.render_frames(22, 3, 20, 12)
    data = mp4.encode(frames, fps=10)
    pos, tops = 0, []
    while pos < len(data):
        (sz,) = struct.unpack(">I", data[pos:pos + 4])
        tops.append(data[pos + 4:pos + 8])
        pos += sz
    assert tops == [b"ftyp", b"mdat", b"moov"]
    # the stsd entry advertises the 'jpeg' fourcc with correct dims
    i = data.find(b"stsd")
    entry = data[i + 12:]
    assert entry[4:8] == b"jpeg"
    w, h = struct.unpack(">HH", entry[8 + 24:8 + 28])
    assert (w, h) == (20, 12)
    # every sample in mdat is a standalone baseline JPEG, sized by stsz
    j = data.find(b"stsz")
    fixed, n = struct.unpack(">II", data[j + 8:j + 16])
    assert fixed == 0 and n == 3
    sizes = struct.unpack(">3I", data[j + 16:j + 28])
    k = data.find(b"stco")
    (off,) = struct.unpack(">I", data[k + 12:k + 16])
    for sz in sizes:
        jpg = data[off:off + sz]
        assert jpg[:2] == b"\xFF\xD8" and jpg[-2:] == b"\xFF\xD9"
        assert jpeg.decode(jpg).shape == (12, 20, 3)
        off += sz


def test_multichunk_stsc_resolution():
    """A stream whose 8 samples sit in two chunks (3 + 5) through a
    two-run stsc table decodes identically — the reader implements the
    general chunk-run expansion, not just the single-chunk layout the
    writer emits."""
    frames = md.render_frames(33, 8, 16, 16)
    single = mp4.encode(frames, fps=10)
    jpgs = [jpeg.encode(frames[i]) for i in range(8)]
    ftyp = mp4._box(b"ftyp", b"isom" + struct.pack(">I", 0x200)
                    + b"isommp41")
    off1 = len(ftyp) + 8
    off2 = off1 + sum(len(j) for j in jpgs[:3])
    # rebuild the encoded moov with a 2-run stsc and 2-entry stco
    i = single.find(b"moov") - 4
    moov = bytearray(single[i:])
    stsc_new = mp4._full(b"stsc", 0, 0, struct.pack(
        ">I", 2) + struct.pack(">III", 1, 3, 1)
        + struct.pack(">III", 2, 5, 1))
    stco_new = mp4._full(b"stco", 0, 0, struct.pack(">III", 2, off1, off2))
    j = bytes(moov).find(b"stsc") - 4
    (old_sz,) = struct.unpack(">I", moov[j:j + 4])
    k = bytes(moov).find(b"stco") - 4
    (old_co_sz,) = struct.unpack(">I", moov[k:k + 4])
    rebuilt = (bytes(moov[:j]) + stsc_new
               + bytes(moov[j + old_sz:k]) + stco_new
               + bytes(moov[k + old_co_sz:]))
    # fix enclosing box sizes (stbl/minf/mdia/trak/moov all grow)
    growth = (len(stsc_new) - old_sz) + (len(stco_new) - old_co_sz)
    out = bytearray(rebuilt)
    for fourcc in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
        p = bytes(out).find(fourcc) - 4
        (sz,) = struct.unpack(">I", out[p:p + 4])
        out[p:p + 4] = struct.pack(">I", sz + growth)
    data = ftyp + mp4._box(b"mdat", b"".join(jpgs)) + bytes(out)
    back, fps = mp4.decode(data)
    ref, _ = mp4.decode(single)
    assert fps == 10
    np.testing.assert_array_equal(back, ref)


def test_error_paths():
    frames = md.render_frames(44, 3, 16, 16)
    good = mp4.encode(frames)
    with pytest.raises(ValueError):
        mp4.decode(b"\x00\x00\x00\x08xxxx")       # no ftyp/moov
    with pytest.raises(ValueError):
        mp4.decode(good[:100])                     # truncated box tree
    with pytest.raises(NotImplementedError):
        mp4.decode(good + mp4._box(b"moof", b""))  # fragmented
    with pytest.raises(NotImplementedError):
        mp4.decode(good.replace(b"jpeg", b"avc1"))  # non-MJPEG codec
    with pytest.raises(ValueError):
        mp4.encode(np.empty((0, 8, 8, 3), np.uint8))


def test_frame_sample_mp4_vs_rawv(spark):
    rows_raw, rows_mp4 = [], []
    for i in range(3):
        dur, fps = 400 + i * 100, 10
        n = md.n_frames(dur, fps)
        fr = md.render_frames(800 + i, n, md.FRAME_W, md.FRAME_H)
        meta = (int(dur), int(fps), 0, md.FRAME_W, md.FRAME_H, f"c{i}")
        rows_raw.append((f"m-{i}", "video",
                         bytearray(md.encode_video(fr, "rawv")), "rawv",
                         *meta))
        rows_mp4.append((f"m-{i}", "video",
                         bytearray(md.encode_video(fr, "mp4", fps=fps)),
                         "mp4", *meta))
    fa = md.frame_sample(spark.createDataFrame(rows_mp4, md.MEDIA_SCHEMA)) \
        .toPandas().sort_values(["media_id", "ts_ms"]).reset_index(drop=True)
    fr_ = md.frame_sample(spark.createDataFrame(rows_raw, md.MEDIA_SCHEMA)) \
        .toPandas().sort_values(["media_id", "ts_ms"]).reset_index(drop=True)
    assert len(fa) == len(fr_) > 0
    assert (fa.frame_idx == fr_.frame_idx).all()
    assert (fa.frame_phash == fr_.frame_phash).mean() >= 0.9
