"""Baseline JPEG (ITU-T T.81 sequential DCT) in pure numpy + stdlib.

Un-stubs the last codec on the image axis: the BASELINE.json input table
carries lossy-image rows whose per-row invariant is decoded-pixel PSNR
>= 40 dB, which is only a real gate with a real lossy codec. This is a
standards-conformant writer/reader for the subset we emit:

  encoder: 8-bit, 3-component YCbCr (JFIF), 4:4:4 by default, 4:2:0
           (2x2 box-mean chroma, the dominant real-world layout) or
           4:2:2 (horizontal-only pooling, the broadcast layout),
           Annex K quantization tables scaled by `quality` (libjpeg
           scaling formula), Annex K.3 Huffman tables, interleaved
           single-scan baseline, optional restart intervals. Output
           opens in any JPEG decoder.
  decoder: baseline sequential (SOF0/1) AND progressive (SOF2 —
           spectral selection + successive approximation, DC/AC
           first and refinement scans, EOBRUN, G.2), 8-bit, 1 or 3
           components at any sampling factors in {1,2,4} (covers
           4:4:4 / 4:2:2 / 4:2:0 / 4:1:1; nearest-neighbor chroma
           upsampling), restart intervals honored; arithmetic coding
           and lossless/hierarchical modes raise NotImplementedError.
           Progressive correctness is pinned by a bit-exactness
           oracle: libjpeg's sequential and progressive encodings of
           the same pixels decode to IDENTICAL arrays through this
           module (tests/test_jpeg.py).

All per-block math (color transform, DCT, quantize, dequantize, IDCT)
is vectorized numpy over every block at once; only the entropy coder
walks coefficients in Python — a codec-local cost bounded by image
size, not a Spark hot-path kernel (the Spark side ships encoded bytes
and calls this inside Arrow-batched mapInPandas, images.py). The
entropy decoder reads via cached 16-bit Huffman peek LUTs and 40-bit
byte-offset windows (one lookup per symbol, ~100x the naive
bit-at-a-time reader); the encoder pre-extracts all nonzero runs per
component in one vectorized pass. Measured single-core (local[32]
sandbox): ~650/820 img/s encode/decode at the synth table's 24x24
class, ~2 MB/s of pixels each way at 256x256 — honest
pure-Python-entropy numbers that parallelize linearly across
mapInPandas tasks (a production deployment would swap in
libjpeg-turbo behind the same encode/decode surface).
"""

from __future__ import annotations

import struct
from functools import lru_cache

import numpy as np

# ---------------------------------------------------------------- tables

# Annex K.1 / K.2 quantization tables (row-major 8x8)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], np.int32)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], np.int32)

# zigzag position k -> row-major index (Figure A.6)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.3 Huffman specs: (BITS[1..16], HUFFVAL)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical JPEG code assignment (C.2): symbol -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


# orthonormal 8-point DCT-II matrix: forward coef = D @ block @ D.T
_D = np.array([[np.sqrt((1 if u == 0 else 2) / 8.0)
                * np.cos((2 * x + 1) * u * np.pi / 16.0)
                for x in range(8)] for u in range(8)])


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg quality scaling of the Annex K tables."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (QT_LUMA, QT_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int32))
    return out[0], out[1]


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 RGB -> float64 YCbCr (JFIF / BT.601 full range)."""
    r = px[:, :, 0].astype(np.float64)
    g = px[:, :, 1].astype(np.float64)
    b = px[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    return np.stack([y, cb, cr], axis=0)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    """(3, h, w) float -> (h, w, 3) uint8, clamped."""
    y, cb, cr = ycc[0], ycc[1] - 128.0, ycc[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255) \
        .astype(np.uint8)


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) with H,W multiples of 8 -> (n_blocks, 8, 8) row-major MCUs."""
    hh, ww = plane.shape
    return (plane.reshape(hh // 8, 8, ww // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def _from_blocks(blocks: np.ndarray, hh: int, ww: int) -> np.ndarray:
    return (blocks.reshape(hh // 8, ww // 8, 8, 8)
            .transpose(0, 2, 1, 3).reshape(hh, ww))


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:          # byte stuffing (F.1.2.3)
                self.buf.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        """Byte-align with 1-bit padding (before a restart marker)."""
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)

    def raw_marker(self, byte2: int) -> None:
        """Emit an unstuffed FF xx marker into the entropy stream."""
        self.align()
        self.buf += bytes([0xFF, byte2])

    def flush(self) -> bytes:
        self.align()
        return bytes(self.buf)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


# category-by-magnitude lookup for the encoder hot loop (|AC| <= 1023
# after clamping, |DC diff| <= 2046)
_CAT = [v.bit_length() for v in range(2048)]


def _pack_bits(codes: list[int], lens: list[int]) -> bytes:
    """Vectorized MSB-first bit packer for one entropy segment: expand
    every (code, length) pair to its bits via cumsum/searchsorted,
    packbits, pad the final byte with 1-bits, and byte-stuff 0x00
    after each 0xFF (F.1.2.3) — all numpy, no per-bit Python."""
    if not codes:
        return b""
    ln = np.asarray(lens, np.int64)
    cd = np.asarray(codes, np.int64)
    ends = np.cumsum(ln)
    total = int(ends[-1])
    idx = np.arange(total, dtype=np.int64)
    sym = np.searchsorted(ends, idx, side="right")
    j = idx - (ends[sym] - ln[sym])          # bit position within code
    bits = (cd[sym] >> (ln[sym] - 1 - j)) & 1
    pad = (-total) % 8
    if pad:
        bits = np.concatenate([bits, np.ones(pad, np.int64)])
    packed = np.packbits(bits.astype(np.uint8))
    ff = packed == 0xFF
    if not ff.any():
        return packed.tobytes()
    reps = np.where(ff, 2, 1)
    out = np.repeat(packed, reps)
    out[np.cumsum(reps)[ff] - 1] = 0x00      # the inserted stuffing byte
    return out.tobytes()


def _amplitude(v: int, size: int) -> int:
    """Additional bits: v itself if positive, one's complement if negative."""
    return v if v >= 0 else v + (1 << size) - 1


def encode(px: np.ndarray, quality: int = 98,
           restart_interval: int = 0,
           subsampling: str = "444") -> bytes:
    """(h, w, 3) uint8 RGB -> baseline JFIF bytes (single scan).

    Default quality 98: the synthetic table's images carry uniform fine
    noise (images.render_pixels), the hardest content class for a DCT
    codec; a 40-image sweep measured min PSNR 37.8 dB at q=96, 40.0 at
    q=97, 43.3 at q=98 — q=98 clears the input_hint's >= 40 dB per-row
    invariant with ~3 dB margin.

    restart_interval > 0 emits a DRI segment and RSTn markers every N
    MCUs (DC predictors reset, stream byte-aligned) — the standard's
    mechanism for error recovery and chunk-parallel decode.

    subsampling: '444' (default — needed for the 40 dB gate), '420'
    (2x2-box-mean chroma, the dominant real-world layout; ~25% smaller
    streams, chroma fidelity bounded by the subsample itself) or '422'
    (horizontal-only 1x2 chroma pooling, the broadcast-video layout)."""
    h, w, _ = px.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    try:
        sw, sv = {"444": (1, 1), "420": (2, 2), "422": (2, 1)}[subsampling]
    except KeyError:
        raise ValueError(f"unsupported subsampling {subsampling!r}") \
            from None
    qt_l, qt_c = _quality_tables(quality)
    # pad by edge replication (minimizes ringing at edges) to the MCU
    # granularity: 8x8 for 4:4:4, 16x16 for 4:2:0, 16x8 for 4:2:2
    alw, alh = 8 * sw, 8 * sv
    hh, ww = -(-h // alh) * alh, -(-w // alw) * alw
    padded = np.pad(px, ((0, hh - h), (0, ww - w), (0, 0)), mode="edge")
    ycc = _rgb_to_ycbcr(padded) - 128.0
    if sw > 1 or sv > 1:   # box-mean chroma pooling (sv rows x sw cols)
        comp_planes = [ycc[0]] + [
            ycc[c].reshape(hh // sv, sv, ww // sw, sw).mean(axis=(1, 3))
            for c in (1, 2)]
        hvs = ((sw, sv), (1, 1), (1, 1))
    else:
        comp_planes = [ycc[0], ycc[1], ycc[2]]
        hvs = ((1, 1), (1, 1), (1, 1))

    # vectorized DCT + quantization for all blocks of all 3 components
    qts = (qt_l, qt_c, qt_c)
    comp_zz = []
    for c in range(3):
        blocks = _to_blocks(comp_planes[c])               # (n, 8, 8)
        coef = np.einsum("ux,nxy,vy->nuv", _D, blocks, _D)
        # baseline entropy coding is limited to 10-bit AC magnitudes /
        # 11-bit DC diffs (the Annex K tables stop at size 10/11); a
        # +-128 checkerboard at quality 100 (qtable all-1) can reach
        # |1024|, so clamp — only pathological blocks are affected
        q = np.clip(np.round(coef / qts[c].reshape(8, 8)),
                    -1023, 1023).astype(np.int32)
        zz = q.reshape(-1, 64)[:, ZIGZAG]                 # (n, 64) zigzag
        # one vectorized nonzero pass per component: the MCU loop below
        # then only walks plain-int lists (no per-block numpy calls)
        nzb, nzp = np.nonzero(zz[:, 1:])
        bounds = np.searchsorted(nzb, np.arange(zz.shape[0] + 1)).tolist()
        comp_zz.append((zz[:, 0].tolist(), nzp.tolist(),
                        zz[nzb, 1 + nzp].tolist(), bounds,
                        comp_planes[c].shape[1] // 8))

    dc_tabs = (_huff_codes(DC_LUMA_BITS, DC_LUMA_VALS),
               _huff_codes(DC_CHROMA_BITS, DC_CHROMA_VALS))
    ac_tabs = (_huff_codes(AC_LUMA_BITS, AC_LUMA_VALS),
               _huff_codes(AC_CHROMA_BITS, AC_CHROMA_VALS))
    # the hot loop only APPENDS (code, length) pairs; the vectorized
    # packer turns each restart segment into stuffed bytes at the end
    seg_pairs: list[tuple[list[int], list[int]]] = [([], [])]
    codes, lens = seg_pairs[0]
    prev_dc = [0, 0, 0]
    mcu_cols, mcu_rows = ww // alw, hh // alh
    n_mcu = mcu_cols * mcu_rows
    # interleaved block schedule per MCU (A.2.3): comp, then vi, then hi
    sched = [(c, 0 if c == 0 else 1, hv[1], hv[0], dv, dh)
             for c, hv in enumerate(hvs)
             for dv in range(hv[1]) for dh in range(hv[0])]
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            seg_pairs.append(([], []))
            codes, lens = seg_pairs[-1]
            prev_dc = [0, 0, 0]
        mr, mc_ = divmod(m, mcu_cols)
        for c, t, vi, hi, dv, dh in sched:
            dcs, nzp, nzv, bounds, ccols = comp_zz[c]
            bi = (mr * vi + dv) * ccols + (mc_ * hi + dh)
            dc = dcs[bi]
            diff = dc - prev_dc[c]
            prev_dc[c] = dc
            size = _CAT[diff] if diff >= 0 else _CAT[-diff]
            code, ln = dc_tabs[t][size]
            if size:
                codes.append((code << size)
                             | ((diff if diff >= 0
                                 else diff + (1 << size) - 1)
                                & ((1 << size) - 1)))
                lens.append(ln + size)
            else:
                codes.append(code)
                lens.append(ln)
            # AC run-length over zigzag positions 1..63
            ac_t = ac_tabs[t]
            last = -1
            for i in range(bounds[bi], bounds[bi + 1]):
                pos = nzp[i]
                run = pos - last - 1
                last = pos
                while run > 15:
                    code, ln = ac_t[0xF0]                 # ZRL
                    codes.append(code)
                    lens.append(ln)
                    run -= 16
                v = nzv[i]
                size = _CAT[v] if v >= 0 else _CAT[-v]
                code, ln = ac_t[(run << 4) | size]
                codes.append((code << size)
                             | ((v if v >= 0 else v + (1 << size) - 1)
                                & ((1 << size) - 1)))
                lens.append(ln + size)
            if last != 62:
                code, ln = ac_t[0x00]                     # EOB
                codes.append(code)
                lens.append(ln)
    parts = []
    for si, (scodes, slens) in enumerate(seg_pairs):
        if si:
            parts.append(bytes([0xFF, 0xD0 + ((si - 1) & 7)]))
        parts.append(_pack_bits(scodes, slens))
    entropy = b"".join(parts)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xFF\xD8")                          # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid, qt in ((0, qt_l), (1, qt_c)):
        out += seg(0xFFDB, bytes([tid])
                   + bytes(int(v) for v in qt[ZIGZAG]))   # DQT in zigzag
    # SOF0: precision 8, h, w, 3 components with their sampling factors
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for (cid, qid), (hi, vi) in zip(((1, 0), (2, 1), (3, 1)), hvs):
        sof += bytes([cid, (hi << 4) | vi, qid])
    out += seg(0xFFC0, sof)
    for tc_th, bits, vals in ((0x00, DC_LUMA_BITS, DC_LUMA_VALS),
                              (0x10, AC_LUMA_BITS, AC_LUMA_VALS),
                              (0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
                              (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS)):
        out += seg(0xFFC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([3]) + bytes([1, 0x00, 2, 0x11, 3, 0x11]) + b"\x00\x3F\x00"
    out += seg(0xFFDA, sos)
    out += entropy
    out += b"\xFF\xD9"                                    # EOI
    return bytes(out)


# ---------------------------------------------------------------- decoder

@lru_cache(maxsize=32)
def _huff_lut(bits: tuple[int, ...],
              vals: tuple[int, ...]) -> tuple[list[int], list[int]]:
    """16-bit peek lookup for one Huffman table: index by the next 16
    bits of the stream, read (symbol, code length) in O(1) — every code
    is <= 16 bits, so one table lookup replaces the bit-at-a-time walk.
    Entries no code reaches keep length 0 (= invalid code). Cached by
    table content and returned as plain-int lists: in a batch decode
    (the Spark mapInPandas shape) every image carries the same four
    tables, so the 65k-entry expansion is paid once per process."""
    if sum(bits) != len(vals) or sum(bits) > 256:
        raise ValueError("invalid JPEG Huffman table (BITS/HUFFVAL "
                         "mismatch)")
    sym = np.zeros(1 << 16, np.int16)
    ln = np.zeros(1 << 16, np.uint8)
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if code >= (1 << length):
                raise ValueError("invalid JPEG Huffman table (code "
                                 "space overflow)")
            start = code << (16 - length)
            span = 1 << (16 - length)
            sym[start:start + span] = vals[k]
            ln[start:start + span] = length
            code += 1
            k += 1
        code <<= 1
    return sym.tolist(), ln.tolist()


def _entropy_segments(
        data: bytes, pos: int,
) -> tuple[list[tuple[bytes, int | None]], int]:
    """Split the scan's entropy bytes at restart markers and un-stuff
    each piece: ([(unstuffed bytes, terminating RSTn id or None)],
    offset of the terminating marker). Stops at the first non-RST
    marker (EOI, or the next scan header in a progressive stream)."""
    segs: list[tuple[bytes, int | None]] = []
    start = i = pos
    n = len(data)
    end = n
    while True:
        j = data.find(b"\xff", i)
        if j < 0 or j + 1 >= n:
            segs.append((data[start:n], None))
            break
        nxt = data[j + 1]
        if nxt == 0x00:
            i = j + 2
        elif 0xD0 <= nxt <= 0xD7:
            segs.append((data[start:j], nxt - 0xD0))
            start = i = j + 2
        else:
            segs.append((data[start:j], None))
            end = j
            break
    return [(s.replace(b"\xff\x00", b"\xff"), r) for s, r in segs], end


def _seg_windows(buf: bytes) -> tuple[list[int], int]:
    """Precompute the 40-bit big-endian window starting at every byte
    offset (zero-padded tail), so a symbol's Huffman code AND its value
    bits (bit offset <= 7 + code <= 16 + value <= 11 = 34 bits) read
    from ONE indexed window. Returned as a plain-int list: scalar
    indexing in the decode loop beats numpy scalars by ~5x."""
    a = np.frombuffer(buf + b"\x00" * 5, np.uint8).astype(np.uint64)
    w = ((a[:-4] << np.uint64(32)) | (a[1:-3] << np.uint64(24))
         | (a[2:-2] << np.uint64(16)) | (a[3:-1] << np.uint64(8))
         | a[4:])
    return w.tolist(), 8 * len(buf)


def _extend(v: int, size: int) -> int:
    """F.2.2.1 EXTEND: map `size` additional bits to the signed value."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (h, w, 3) uint8 RGB. Supports the subset
    this module emits (plus grayscale and restart intervals)."""
    try:
        return _decode_impl(bytes(data))
    except (struct.error, IndexError):
        # any out-of-bounds unpack/index while parsing is a malformed
        # stream, not an internal error
        raise ValueError("corrupt JPEG stream") from None


def _decode_impl(data: bytes) -> np.ndarray:
    if len(data) < 4 or data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG stream (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[int, dict[tuple[int, int], int]] = {}
    sof = None
    progressive = False
    prog: _ProgState | None = None
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        if data[pos + 1] == 0xFF:    # fill bytes before a marker (B.1.1.2)
            pos += 1
            continue
        marker = data[pos + 1]
        if marker == 0xD9:
            if prog is not None:
                break                # progressive: all scans consumed
            raise ValueError("JPEG EOI before SOS")
        ln = struct.unpack(">H", data[pos + 2:pos + 4])[0]
        payload = data[pos + 4:pos + 2 + ln]
        if ln < 2 or len(payload) != ln - 2:
            raise ValueError("JPEG segment truncated")
        pos += 2 + ln
        if marker == 0xDB:                                # DQT
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 15
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                zz = np.frombuffer(payload[p + 1:p + 65], np.uint8)
                if len(zz) != 64:
                    raise ValueError("JPEG DQT truncated")
                qtabs[tq] = zz.astype(np.int32)[UNZIGZAG].reshape(8, 8)
                p += 65
        elif marker == 0xC4:                              # DHT
            p = 0
            while p < len(payload):
                tc_th = payload[p]
                bits = list(payload[p + 1:p + 17])
                nv = sum(bits)
                vals = list(payload[p + 17:p + 17 + nv])
                htabs[tc_th] = _huff_lut(tuple(bits), tuple(vals))
                p += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):     # SOF0/1 baseline, SOF2 prog
            prec, h, w, nc = struct.unpack(">BHHB", payload[:6])
            if prec != 8:
                raise NotImplementedError("non-8-bit JPEG")
            comps = []
            for i in range(nc):
                cid, samp, qid = payload[6 + 3 * i:9 + 3 * i]
                hi, vi = samp >> 4, samp & 15
                if hi not in (1, 2, 4) or vi not in (1, 2, 4):
                    raise NotImplementedError(
                        f"JPEG sampling factors {hi}x{vi} unsupported")
                comps.append((cid, hi, vi, qid))
            sof = (h, w, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential and progressive (SOF0/1/2) "
                "JPEG supported")
        elif marker == 0xDD:                              # DRI
            restart_interval = struct.unpack(">H", payload[:2])[0]
        elif marker == 0xDA:                              # SOS
            if sof is None:
                raise ValueError("JPEG SOS before SOF")
            ns = payload[0]
            if len(payload) < 1 + 2 * ns + 3:
                raise ValueError("JPEG SOS header truncated")
            scan = []
            for i in range(ns):
                cs, tt = payload[1 + 2 * i], payload[2 + 2 * i]
                scan.append((cs, tt >> 4, tt & 15))
            if not progressive:
                return _decode_scan(data, pos, sof, scan, qtabs, htabs,
                                    restart_interval)
            ss = payload[1 + 2 * ns]
            se = payload[2 + 2 * ns]
            ahal = payload[3 + 2 * ns]
            if prog is None:
                prog = _ProgState(sof)
            pos = _decode_prog_scan(data, pos, prog, scan, ss, se,
                                    ahal >> 4, ahal & 15, htabs,
                                    restart_interval)
        # else: APPn / COM / etc — skipped
    if prog is not None:
        cid_to_qid = {cid: qid for cid, _h, _v, qid in prog.comps}
        meta = []
        for c, (cid, hi, vi, qid) in enumerate(prog.comps):
            qt = qtabs.get(qid)
            if qt is None:
                raise ValueError("JPEG scan references missing table")
            meta.append((qt, hi, vi, prog.cols[c], prog.rows[c]))
        return _reassemble(prog.flat, meta, prog.h, prog.w, prog.hmax,
                           prog.vmax, prog.mcu_rows, prog.mcu_cols)
    raise ValueError("JPEG truncated before SOS")


class _ProgState:
    """Coefficient accumulator across a progressive stream's scans."""

    def __init__(self, sof):
        h, w, comps = sof
        self.h, self.w = h, w
        self.comps = comps                       # (cid, hi, vi, qid)
        self.hmax = max(hi for _, hi, _, _ in comps)
        self.vmax = max(vi for _, _, vi, _ in comps)
        self.mcu_cols = -(-w // (8 * self.hmax))
        self.mcu_rows = -(-h // (8 * self.vmax))
        self.idx = {cid: i for i, (cid, _, _, _) in enumerate(comps)}
        self.cols = [self.mcu_cols * hi for _, hi, _, _ in comps]
        self.rows = [self.mcu_rows * vi for _, _, vi, _ in comps]
        # non-interleaved block grids (A.2.2: ceil over the component's
        # own sample dimensions, NOT padded to MCU boundaries)
        def ceil_div(a, b):
            return -(-a // b)

        self.nbw = [ceil_div(ceil_div(w * hi, self.hmax), 8)
                    for _, hi, _, _ in comps]
        self.nbh = [ceil_div(ceil_div(h * vi, self.vmax), 8)
                    for _, _, vi, _ in comps]
        self.flat = [[0] * (self.rows[c] * self.cols[c] * 64)
                     for c in range(len(comps))]


def _decode_prog_scan(data, pos, state, scan, ss, se, ah, al, htabs,
                      restart_interval):
    """Decode ONE progressive scan (G.2) into state.flat; returns the
    offset of the marker terminating the scan's entropy data."""
    rd = _ScanReader(data, pos)
    nc = len(scan)
    if ss == 0:
        if se != 0:
            raise ValueError("progressive DC scan with Se != 0")
        # DC scan: interleaved MCU order when multi-component,
        # component block raster when single
        tabs = []
        for cs, td, _ta in scan:
            c = state.idx.get(cs)
            if c is None:
                raise ValueError(f"scan references unknown component {cs}")
            dc = htabs.get(td) if ah == 0 else None
            if ah == 0 and dc is None:
                raise ValueError("JPEG scan references missing table")
            tabs.append((c, dc))
        prev = [0] * nc
        if nc > 1:
            units = state.mcu_cols * state.mcu_rows
        else:
            c0 = tabs[0][0]
            units = state.nbw[c0] * state.nbh[c0]
        rst = 0
        for m in range(units):
            if restart_interval and m and m % restart_interval == 0:
                rd.restart(rst)
                rst = (rst + 1) & 7
                prev = [0] * nc
            if nc > 1:
                mr, mc_ = divmod(m, state.mcu_cols)
                sched = []
                for si, (c, dc) in enumerate(tabs):
                    _cid, hi, vi, _q = state.comps[c]
                    for dv in range(vi):
                        for dh in range(hi):
                            sched.append((si, c, dc,
                                          ((mr * vi + dv) * state.cols[c]
                                           + (mc_ * hi + dh)) * 64))
            else:
                c, dc = tabs[0]
                by, bx = divmod(m, state.nbw[c])
                sched = [(0, c, dc, (by * state.cols[c] + bx) * 64)]
            for si, c, dc, base in sched:
                co = state.flat[c]
                if ah == 0:
                    size = rd.huff(dc[0], dc[1])
                    if size:
                        prev[si] += _extend(rd.bits(size), size)
                    co[base] = prev[si] << al
                else:                            # DC refinement: 1 bit
                    if rd.bit():
                        co[base] |= 1 << al
            rd.check()
        return rd.end
    # AC scan: single component, non-interleaved (G.1.1.1.1)
    if nc != 1:
        raise ValueError("progressive AC scan must be single-component")
    cs, _td, ta = scan[0]
    c = state.idx.get(cs)
    if c is None:
        raise ValueError(f"scan references unknown component {cs}")
    ac = htabs.get(0x10 | ta)
    if ac is None:
        raise ValueError("JPEG scan references missing table")
    ac_sym, ac_len = ac
    co = state.flat[c]
    stride = state.cols[c]
    units = state.nbw[c] * state.nbh[c]
    eobrun = 0
    p1 = 1 << al
    m1 = -p1
    rst = 0
    for m in range(units):
        if restart_interval and m and m % restart_interval == 0:
            rd.restart(rst)
            rst = (rst + 1) & 7
            eobrun = 0
        by, bx = divmod(m, state.nbw[c])
        base = (by * stride + bx) * 64
        if ah == 0:                              # first AC scan of band
            if eobrun:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                rs = rd.huff(ac_sym, ac_len)
                r, s = rs >> 4, rs & 15
                if s == 0:
                    if r == 15:
                        k += 16                  # ZRL
                        continue
                    eobrun = (1 << r) - 1        # EOBn
                    if r:
                        eobrun += rd.bits(r)
                    break
                k += r
                if k > se:
                    raise ValueError("JPEG AC coefficient overrun")
                co[base + k] = _extend(rd.bits(s), s) << al
                k += 1
        else:                                    # AC refinement (G.1.2.3)
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = rd.huff(ac_sym, ac_len)
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r != 15:
                            # NO -1 here: the post-loop EOB handler
                            # still consumes the CURRENT block's
                            # correction bits, then decrements
                            eobrun = 1 << r
                            if r:
                                eobrun += rd.bits(r)
                            break
                        val = 0                  # ZRL in refinement
                    elif s == 1:
                        val = p1 if rd.bit() else m1
                    else:
                        raise ValueError(
                            "invalid size in AC refinement scan")
                    while k <= se:
                        if co[base + k]:
                            if rd.bit() and not (co[base + k] & p1):
                                co[base + k] += (p1 if co[base + k] >= 0
                                                 else m1)
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if val and k <= se:
                        co[base + k] = val
                    k += 1
            if eobrun > 0:
                while k <= se:
                    if co[base + k]:
                        if rd.bit() and not (co[base + k] & p1):
                            co[base + k] += (p1 if co[base + k] >= 0
                                             else m1)
                    k += 1
                eobrun -= 1
        rd.check()
    return rd.end


def _decode_scan(data, pos, sof, scan, qtabs, htabs, restart_interval):
    h, w, comps = sof
    cid_to_shape = {cid: (hi, vi, qid) for cid, hi, vi, qid in comps}
    hmax = max(hi for _, hi, _, _ in comps)
    vmax = max(vi for _, _, vi, _ in comps)
    order = []          # (dc_table, ac_table, qtable, hi, vi) per comp
    for cs, td, ta in scan:
        if cs not in cid_to_shape:
            raise ValueError(f"scan references unknown component {cs}")
        hi, vi, qid = cid_to_shape[cs]
        if hmax % hi or vmax % vi:
            raise NotImplementedError(
                "non-integer JPEG chroma upsampling ratio")
        dc = htabs.get(td)
        ac = htabs.get(0x10 | ta)
        qt = qtabs.get(qid)
        if dc is None or ac is None or qt is None:
            raise ValueError("JPEG scan references missing table")
        order.append((dc, ac, qt, hi, vi))
    nc = len(order)
    mcu_cols = -(-w // (8 * hmax))
    mcu_rows = -(-h // (8 * vmax))
    n_mcu = mcu_cols * mcu_rows
    # per-component block-grid widths and per-MCU block schedule: the
    # interleaved order is comp-major, then vi, then hi (A.2.3)
    cols = [mcu_cols * hi for _dc, _ac, _qt, hi, _vi in order]
    rows = [mcu_rows * vi for _dc, _ac, _qt, _hi, vi in order]
    sched = []          # (c, dv, dh, LUTs...) per block of one MCU
    for c, (dc, ac, _qt, hi, vi) in enumerate(order):
        for dv in range(vi):
            for dh in range(hi):
                sched.append((c, vi, hi, dv, dh,
                              dc[0], dc[1], ac[0], ac[1]))
    if len(sched) > 10:
        raise ValueError("JPEG MCU has more than 10 data units (B.2.3)")
    segs, _end = _entropy_segments(data, pos)
    seg_i = 0
    win_l, nbits = _seg_windows(segs[0][0])
    bp = 0
    # flat per-component coefficient lists: plain-list stores in the
    # hot loop, one bulk numpy conversion at the end
    flat = [[0] * (rows[c] * cols[c] * 64) for c in range(nc)]
    prev_dc = [0] * nc
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            # the current segment must be spent (padding bits only) and
            # must have ended at the expected RSTn (F.2.1.3.1)
            if bp > nbits or segs[seg_i][1] != ((m // restart_interval
                                                 - 1) & 7):
                raise ValueError("missing JPEG restart marker")
            seg_i += 1
            if seg_i >= len(segs):
                raise ValueError("missing JPEG restart marker")
            win_l, nbits = _seg_windows(segs[seg_i][0])
            bp = 0
            prev_dc = [0] * nc
        mr, mc_ = divmod(m, mcu_cols)
        for (c, vi, hi, dv, dh,
             dc_sym, dc_len, ac_sym, ac_len) in sched:
            base = ((mr * vi + dv) * cols[c] + (mc_ * hi + dh)) * 64
            co = flat[c]
            try:
                w40 = win_l[bp >> 3]
            except IndexError:
                raise ValueError("JPEG entropy data truncated") from None
            sh = bp & 7
            v16 = (w40 >> (24 - sh)) & 0xFFFF
            ln = dc_len[v16]
            if ln == 0:
                raise ValueError("invalid JPEG Huffman code")
            size = dc_sym[v16]
            val = (w40 >> (40 - sh - ln - size)) & ((1 << size) - 1)
            bp += ln + size
            if size:
                prev_dc[c] += (val if val >= (1 << (size - 1))
                               else val - (1 << size) + 1)
            co[base] = prev_dc[c]
            k = 1
            while k < 64:
                try:
                    w40 = win_l[bp >> 3]
                except IndexError:
                    raise ValueError(
                        "JPEG entropy data truncated") from None
                sh = bp & 7
                v16 = (w40 >> (24 - sh)) & 0xFFFF
                ln = ac_len[v16]
                if ln == 0:
                    raise ValueError("invalid JPEG Huffman code")
                rs = ac_sym[v16]
                run, size = rs >> 4, rs & 15
                if size == 0:
                    bp += ln
                    if run == 15:                          # ZRL
                        k += 16
                        continue
                    break                                  # EOB
                val = (w40 >> (40 - sh - ln - size)) & ((1 << size) - 1)
                bp += ln + size
                k += run
                if k > 63:
                    raise ValueError("JPEG AC coefficient overrun")
                co[base + k] = (val if val >= (1 << (size - 1))
                                else val - (1 << size) + 1)
                k += 1
        if bp > nbits:
            raise ValueError("JPEG entropy data truncated")
    meta = [(qt, hi, vi, cols[c], rows[c])
            for c, (_dc, _ac, qt, hi, vi) in enumerate(order)]
    return _reassemble(flat, meta, h, w, hmax, vmax, mcu_rows, mcu_cols)


def _reassemble(flat, meta, h, w, hmax, vmax, mcu_rows, mcu_cols):
    """Shared decode tail (baseline + progressive): vectorized
    dequantize + IDCT + reassembly per component, each on its own
    block grid, upsampled to the full-resolution MCU grid."""
    nc = len(meta)
    hh, ww = mcu_rows * vmax * 8, mcu_cols * hmax * 8
    planes = np.empty((nc, hh, ww))
    for c, (qt, hi, vi, ccols, crows) in enumerate(meta):
        coefs = np.array(flat[c], np.int32).reshape(-1, 64)
        dq = np.zeros_like(coefs, dtype=np.float64)
        dq[:, ZIGZAG] = coefs * qt.reshape(-1)[ZIGZAG]
        blocks = np.einsum("xu,nuv,yv->nxy", _D.T, dq.reshape(-1, 8, 8),
                           _D.T)
        plane = _from_blocks(blocks, crows * 8, ccols * 8)
        ry, rx = vmax // vi, hmax // hi
        if ry > 1 or rx > 1:       # nearest-neighbor chroma upsampling
            plane = plane.repeat(ry, axis=0).repeat(rx, axis=1)
        planes[c] = plane[:hh, :ww]
    planes += 128.0
    if nc == 1:
        gray = np.clip(np.round(planes[0][:h, :w]), 0, 255).astype(np.uint8)
        return np.repeat(gray[:, :, None], 3, axis=2)
    if nc != 3:
        raise NotImplementedError(f"{nc}-component JPEG unsupported")
    return _ycbcr_to_rgb(planes)[:h, :w]


class _ScanReader:
    """Stateful bit/huffman reader for one (progressive) scan, over the
    unstuffed restart segments; not the baseline hot path (that loop
    inlines the same window mechanics for speed)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.segs, self.end = _entropy_segments(data, pos)
        self.seg_i = 0
        self.win, self.nbits = _seg_windows(self.segs[0][0])
        self.bp = 0

    def restart(self, expect: int) -> None:
        if self.bp > self.nbits or self.segs[self.seg_i][1] != (expect & 7):
            raise ValueError("missing JPEG restart marker")
        self.seg_i += 1
        if self.seg_i >= len(self.segs):
            raise ValueError("missing JPEG restart marker")
        self.win, self.nbits = _seg_windows(self.segs[self.seg_i][0])
        self.bp = 0

    def check(self) -> None:
        if self.bp > self.nbits:
            raise ValueError("JPEG entropy data truncated")

    def bit(self) -> int:
        try:
            w40 = self.win[self.bp >> 3]
        except IndexError:
            raise ValueError("JPEG entropy data truncated") from None
        b = (w40 >> (39 - (self.bp & 7))) & 1
        self.bp += 1
        return b

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        try:
            w40 = self.win[self.bp >> 3]
        except IndexError:
            raise ValueError("JPEG entropy data truncated") from None
        v = (w40 >> (40 - (self.bp & 7) - n)) & ((1 << n) - 1)
        self.bp += n
        return v

    def huff(self, lut_sym: list[int], lut_len: list[int]) -> int:
        try:
            w40 = self.win[self.bp >> 3]
        except IndexError:
            raise ValueError("JPEG entropy data truncated") from None
        v16 = (w40 >> (24 - (self.bp & 7))) & 0xFFFF
        ln = lut_len[v16]
        if ln == 0:
            raise ValueError("invalid JPEG Huffman code")
        self.bp += ln
        return lut_sym[v16]
