"""MP4 (ISO base media file format, ISO/IEC 14496-12) container with a
motion-JPEG video track, pure stdlib.

Completes the container story started by media.py's wav (RIFF audio)
and avi.py (RIFF video): with the baseline JPEG codec (jpeg.py) real,
an MP4 whose samples are JPEG images is real too. The writer emits the
standard progressive layout — ftyp / mdat / moov(mvhd, trak(tkhd,
mdia(mdhd, hdlr 'vide', minf(vmhd, dinf, stbl(stsd 'jpeg', stts, stsc,
stsz, stco))))) — with the QuickTime/ISO 'jpeg' sample-entry fourcc
that standard tools demux. The reader walks the box tree, resolves
sample locations through the stsc/stsz/stco tables (the general
chunk-run expansion, not just the layout we write), and decodes each
sample with jpeg.decode.

Subset: one self-contained video track, all samples sync (motion JPEG
is all-intra); fragmented MP4 (moof) and edit lists are out of scope
and rejected, not mis-parsed.
"""

from __future__ import annotations

import struct

import numpy as np

from . import jpeg

# media timescale is 100*fps ticks/sec with a fixed 100-tick sample
# delta, so ANY integer fps round-trips exactly (a fixed 600-tick scale
# mis-rounds fps values that don't divide it, e.g. 51 -> 55)
_DELTA = 100


def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + fourcc + payload


def _full(fourcc: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(fourcc, struct.pack(">I", (version << 24) | flags) + payload)


def encode(frames: np.ndarray, fps: int = 10, quality: int = 98) -> bytes:
    """frames: (n, h, w, 3) uint8 -> MP4 bytes (one 'jpeg' video track)."""
    n, h, w, _ = frames.shape
    if n == 0:
        raise ValueError("empty video")
    fps = max(1, int(fps))
    jpgs = [jpeg.encode(frames[i], quality) for i in range(n)]
    timescale = _DELTA * fps
    delta = _DELTA
    duration = n * delta

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isommp41")
    mdat_payload = b"".join(jpgs)
    # stco chunk offset: one chunk holding all samples, starting right
    # after ftyp + the mdat header (fixed 8-byte size+fourcc)
    chunk_off = len(ftyp) + 8

    mvhd = _full(b"mvhd", 0, 0, struct.pack(
        ">IIII", 0, 0, timescale, duration)
        + struct.pack(">iH", 0x00010000, 0x0100) + b"\x00" * 10
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24 + struct.pack(">I", 2))
    tkhd = _full(b"tkhd", 0, 7, struct.pack(
        ">IIIII", 0, 0, 1, 0, duration) + b"\x00" * 16
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", w << 16, h << 16))
    mdhd = _full(b"mdhd", 0, 0, struct.pack(
        ">IIII", 0, 0, timescale, duration)
        + struct.pack(">HH", 0x55C4, 0))          # language 'und'
    hdlr = _full(b"hdlr", 0, 0, struct.pack(">I", 0) + b"vide"
                 + b"\x00" * 12 + b"MotionJPEG\x00")
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dinf = _box(b"dinf", _full(b"dref", 0, 0, struct.pack(">I", 1)
                               + _full(b"url ", 0, 1, b"")))
    # VisualSampleEntry, fourcc 'jpeg' (ISO/QT motion-JPEG-in-MP4)
    sample_entry = _box(
        b"jpeg",
        b"\x00" * 6 + struct.pack(">H", 1)            # reserved, dref idx
        + struct.pack(">HHI", 0, 0, 0) + b"\x00" * 8  # pre_defined/reserved
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0) + struct.pack(">H", 1)  # frame_count 1
        + b"\x00" * 32                                 # compressorname
        + struct.pack(">Hh", 24, -1))                  # depth, pre_defined
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + sample_entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, delta))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, n)
                 + b"".join(struct.pack(">I", len(j)) for j in jpgs))
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, chunk_off))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + _box(b"mdat", mdat_payload) + moov


def _iter_boxes(data: bytes, pos: int, end: int):
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos:pos + 4])
        fourcc = data[pos + 4:pos + 8]
        hdr = 8
        if size == 1:                       # 64-bit largesize
            (size,) = struct.unpack(">Q", data[pos + 8:pos + 16])
            hdr = 16
        elif size == 0:                     # box extends to end
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError("MP4 box overruns its parent")
        yield fourcc, pos + hdr, pos + size
        pos += size


def _find(data: bytes, pos: int, end: int, fourcc: bytes):
    for fc, p, pe in _iter_boxes(data, pos, end):
        if fc == fourcc:
            return p, pe
    return None


def decode(data: bytes) -> tuple[np.ndarray, int]:
    """MP4 bytes -> ((n, h, w, 3) uint8 frames, fps). Resolves samples
    through the full stsc chunk-run expansion against stco/stsz."""
    data = bytes(data)
    tops = {}
    try:
        for fc, p, pe in _iter_boxes(data, 0, len(data)):
            tops.setdefault(fc, (p, pe))
    except (struct.error, ValueError) as exc:
        raise ValueError(f"not an MP4 stream ({exc})") from None
    if b"ftyp" not in tops or b"moov" not in tops:
        raise ValueError("not an MP4 stream (missing ftyp/moov)")
    if b"moof" in tops:
        raise NotImplementedError("fragmented MP4 unsupported")
    moov = tops[b"moov"]
    try:
        return _decode_moov(data, moov)
    except (struct.error, IndexError, TypeError):
        # any out-of-bounds unpack/index while walking the box tree is
        # a malformed stream, not an internal error
        raise ValueError("corrupt MP4 stream") from None


def _decode_moov(data: bytes, moov: tuple[int, int]) -> tuple[np.ndarray,
                                                              int]:
    for fc, p, pe in _iter_boxes(data, *moov):
        if fc != b"trak":
            continue
        mdia = _find(data, p, pe, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(data, *mdia, b"hdlr")
        if hdlr is None or data[hdlr[0] + 8:hdlr[0] + 12] != b"vide":
            continue
        mdhd = _find(data, *mdia, b"mdhd")
        version = data[mdhd[0]]
        if version == 1:
            timescale = struct.unpack(
                ">I", data[mdhd[0] + 20:mdhd[0] + 24])[0]
        else:
            timescale = struct.unpack(
                ">I", data[mdhd[0] + 12:mdhd[0] + 16])[0]
        minf = _find(data, *mdia, b"minf")
        stbl = _find(data, *minf, b"stbl")
        stsd = _find(data, *stbl, b"stsd")
        entry_fc = data[stsd[0] + 12:stsd[0] + 16]
        if entry_fc not in (b"jpeg", b"mjpa", b"mjpb"):
            raise NotImplementedError(
                f"MP4 video codec {entry_fc!r} unsupported (motion JPEG "
                "only)")
        # sample tables
        stts = _find(data, *stbl, b"stts")
        (n_tt,) = struct.unpack(">I", data[stts[0] + 4:stts[0] + 8])
        delta = struct.unpack(
            ">I", data[stts[0] + 12:stts[0] + 16])[0] if n_tt else 0
        fps = round(timescale / delta) if delta else 0
        stsz = _find(data, *stbl, b"stsz")
        fixed, n_samples = struct.unpack(
            ">II", data[stsz[0] + 4:stsz[0] + 12])
        if fixed:
            sizes = [fixed] * n_samples
        else:
            sizes = list(struct.unpack(
                f">{n_samples}I",
                data[stsz[0] + 12:stsz[0] + 12 + 4 * n_samples]))
        stco = _find(data, *stbl, b"stco")
        if stco is None:
            stco = _find(data, *stbl, b"co64")
            (n_chunks,) = struct.unpack(
                ">I", data[stco[0] + 4:stco[0] + 8])
            offsets = list(struct.unpack(
                f">{n_chunks}Q",
                data[stco[0] + 8:stco[0] + 8 + 8 * n_chunks]))
        else:
            (n_chunks,) = struct.unpack(
                ">I", data[stco[0] + 4:stco[0] + 8])
            offsets = list(struct.unpack(
                f">{n_chunks}I",
                data[stco[0] + 8:stco[0] + 8 + 4 * n_chunks]))
        stsc = _find(data, *stbl, b"stsc")
        (n_sc,) = struct.unpack(">I", data[stsc[0] + 4:stsc[0] + 8])
        runs = [struct.unpack(
            ">III", data[stsc[0] + 8 + 12 * i:stsc[0] + 20 + 12 * i])
            for i in range(n_sc)]
        # expand chunk runs -> per-sample (offset, size)
        jpgs = []
        sample = 0
        for ri, (first, per_chunk, _desc) in enumerate(runs):
            last = (runs[ri + 1][0] - 1 if ri + 1 < len(runs)
                    else len(offsets))
            for ci in range(first - 1, last):
                off = offsets[ci]
                for _ in range(per_chunk):
                    if sample >= n_samples:
                        break
                    jpgs.append(data[off:off + sizes[sample]])
                    off += sizes[sample]
                    sample += 1
        if sample != n_samples:
            raise ValueError("MP4 sample tables inconsistent")
        frames = [jpeg.decode(j) for j in jpgs]
        shape = frames[0].shape
        if any(f.shape != shape for f in frames):
            raise ValueError("MP4 frames disagree on dimensions")
        return np.stack(frames), int(fps)
    raise ValueError("MP4 has no video track")
