"""AVI (RIFF) container with an MJPG video stream, pure stdlib.

The video-side counterpart of media.py's RIFF/WAVE audio container:
Motion-JPEG is simply one baseline JPEG (jpeg.py) per frame inside the
standard AVI chunk layout, so with the JPEG codec real this container
is real too — the emitted files carry the canonical
RIFF/'AVI '/hdrl(avih,strl(strh,strf))/movi/idx1 structure with an
MJPG fourcc and open in any AV tool. Frames round-trip at the JPEG
codec's fidelity (>= 40 dB decoded-pixel PSNR at the default quality).

Writer subset: one 'vids' stream, 24-bit frames, AVIF_HASINDEX idx1.
Reader subset: first MJPG/unspecified 'vids' stream, '00dc'/'00db'
frame chunks; audio streams and OpenDML extensions are skipped, not
mis-parsed.
"""

from __future__ import annotations

import struct

import numpy as np

from . import jpeg


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode(frames: np.ndarray, fps: int = 10, quality: int = 98) -> bytes:
    """frames: (n, h, w, 3) uint8 -> AVI/MJPG bytes."""
    n, h, w, _ = frames.shape
    if n == 0:
        raise ValueError("empty video")
    fps = max(1, int(fps))
    jpgs = [jpeg.encode(frames[i], quality) for i in range(n)]
    bufsize = max(len(j) for j in jpgs)

    avih = struct.pack(
        "<10I", 1_000_000 // fps, sum(len(j) for j in jpgs) * fps // n,
        0, 0x10, n, 0, 1, bufsize, w, h) + b"\x00" * 16
    strh = (b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIi", 0, 0, 0, 0,
                                            1, fps, 0, n, bufsize, -1 &
                                            0xFFFFFFFF, 0)
            + struct.pack("<4h", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))

    movi_payload = bytearray()
    idx = bytearray()
    for j in jpgs:
        # idx1 offsets point at the chunk fourcc, measured from the
        # 'movi' fourcc itself (the widespread convention)
        idx += b"00dc" + struct.pack("<III", 0x10, 4 + len(movi_payload),
                                     len(j))
        movi_payload += _chunk(b"00dc", j)
    movi = _list(b"movi", bytes(movi_payload))
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _iter_chunks(data: bytes, pos: int, end: int):
    while pos + 8 <= end:
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        payload_end = pos + 8 + size
        if payload_end > end:
            raise ValueError("AVI chunk overruns its parent")
        yield fourcc, pos + 8, payload_end
        pos = payload_end + (size & 1)


def decode(data: bytes) -> tuple[np.ndarray, int]:
    """AVI/MJPG bytes -> ((n, h, w, 3) uint8 frames, fps)."""
    try:
        return _decode_impl(bytes(data))
    except (struct.error, IndexError, TypeError):
        # any out-of-bounds unpack/index while walking the RIFF tree is
        # a malformed stream, not an internal error
        raise ValueError("corrupt AVI stream") from None


def _decode_impl(data: bytes) -> tuple[np.ndarray, int]:
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI stream (missing RIFF/AVI header)")
    (riff_size,) = struct.unpack("<I", data[4:8])
    end = min(len(data), 8 + riff_size)
    fps, stream_fourccs, jpgs = 0, [], []
    video_stream = None
    for fourcc, p, pe in _iter_chunks(data, 12, end):
        if fourcc != b"LIST":
            continue
        ltype = data[p:p + 4]
        if ltype == b"hdrl":
            for f2, p2, pe2 in _iter_chunks(data, p + 4, pe):
                if f2 == b"avih":
                    us = struct.unpack("<I", data[p2:p2 + 4])[0]
                    if us:
                        fps = round(1_000_000 / us)
                elif f2 == b"LIST" and data[p2:p2 + 4] == b"strl":
                    for f3, p3, pe3 in _iter_chunks(data, p2 + 4, pe2):
                        if f3 == b"strh":
                            stream_fourccs.append(
                                (data[p3:p3 + 4], data[p3 + 4:p3 + 8],
                                 struct.unpack("<II",
                                               data[p3 + 20:p3 + 28])))
        elif ltype == b"movi":
            for sid, (styp, handler, (scale, rate)) in enumerate(
                    stream_fourccs):
                if styp == b"vids" and handler in (b"MJPG", b"mjpg",
                                                   b"\x00\x00\x00\x00"):
                    video_stream = sid
                    if scale:
                        fps = round(rate / scale) or fps
                    break
            if video_stream is None:
                raise ValueError("AVI has no MJPG video stream")
            want = f"{video_stream:02d}d".encode()
            for f2, p2, pe2 in _iter_chunks(data, p + 4, pe):
                if f2[:3] == want and f2[3:] in (b"c", b"b"):
                    jpgs.append(data[p2:pe2])
    if not jpgs:
        raise ValueError("AVI contains no video frames")
    frames = [jpeg.decode(j) for j in jpgs]
    shape = frames[0].shape
    if any(f.shape != shape for f in frames):
        raise ValueError("AVI frames disagree on dimensions")
    return np.stack(frames), int(fps)
