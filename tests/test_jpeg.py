"""Baseline JPEG codec (kdtree_spark/jpeg.py): round-trip PSNR >= 40 dB
on the synthetic image family (the input_hint's per-row lossy invariant),
structural conformance of the emitted stream, restart-interval parity,
grayscale decode, error paths, and the Spark decode/feature path."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from kdtree_spark import images as im
from kdtree_spark import jpeg


def test_roundtrip_psnr_gate_synthetic_family():
    """decoded-pixel PSNR >= 40 dB across sizes (incl. non-multiples of
    8) on render_pixels content — the hardest class (uniform noise)."""
    for seed in range(12):
        w, h = 16 + (seed * 5) % 17, 16 + (seed * 11) % 17
        px = im.render_pixels(4000 + seed, w, h)
        back = jpeg.decode(jpeg.encode(px))
        assert back.shape == px.shape
        assert im.psnr(px, back) >= 40.0


def test_roundtrip_hard_content():
    rng = np.random.default_rng(3)
    noise = rng.integers(0, 256, (24, 24, 3)).astype(np.uint8)
    flat = np.full((19, 21, 3), 77, np.uint8)
    checker = (np.indices((16, 16)).sum(0) % 2 * 255).astype(
        np.uint8)[:, :, None].repeat(3, 2)
    assert im.psnr(flat, jpeg.decode(jpeg.encode(flat))) == float("inf")
    assert im.psnr(checker, jpeg.decode(jpeg.encode(checker, 100))) > 40
    # full-range noise at q=100 (qtables all 1) stays near-lossless
    assert im.psnr(noise, jpeg.decode(jpeg.encode(noise, 100))) > 50
    # quality monotonicity: lower q, lower fidelity, smaller stream
    e50, e95 = jpeg.encode(noise, 50), jpeg.encode(noise, 95)
    assert len(e50) < len(e95)
    assert im.psnr(noise, jpeg.decode(e50)) < im.psnr(
        noise, jpeg.decode(e95))


def test_stream_structure_is_conformant_jfif():
    """SOI/APP0-JFIF/DQTx2/SOF0/DHTx4/SOS...EOI with correct dims —
    the byte layout any third-party decoder parses."""
    px = im.render_pixels(77, 20, 17)
    data = jpeg.encode(px)
    assert data[:2] == b"\xFF\xD8" and data[-2:] == b"\xFF\xD9"
    assert data[2:4] == b"\xFF\xE0" and data[6:11] == b"JFIF\x00"
    # walk segments to SOS, collecting marker bytes
    pos, markers = 2, []
    while True:
        assert data[pos] == 0xFF
        m = data[pos + 1]
        markers.append(m)
        ln = struct.unpack(">H", data[pos + 2:pos + 4])[0]
        if m == 0xDA:
            break
        if m == 0xC0:
            prec, h, w, nc = struct.unpack(
                ">BHHB", data[pos + 4:pos + 10])
            assert (prec, h, w, nc) == (8, 17, 20, 3)
        pos += 2 + ln
    assert markers.count(0xDB) == 2 and markers.count(0xC4) == 4
    assert 0xC0 in markers
    # entropy data has every FF stuffed (no accidental markers)
    body = data[pos + 2 + ln:-2]
    i = 0
    while i < len(body):
        if body[i] == 0xFF:
            assert body[i + 1] == 0x00
            i += 2
        else:
            i += 1


def test_restart_intervals_roundtrip_and_markers():
    px = im.render_pixels(555, 33, 26)   # 5x4 = 20 MCUs
    plain = jpeg.encode(px, 98)
    rst = jpeg.encode(px, 98, restart_interval=3)
    assert b"\xFF\xDD" in rst and b"\xFF\xDD" not in plain
    # pixels identical to the non-restart stream (same quantization)
    a, b = jpeg.decode(plain), jpeg.decode(rst)
    assert np.array_equal(a, b)
    # RST cycle wraps modulo 8: 20 MCUs / interval 3 -> 6 markers D0..D5
    for n in range(6):
        assert bytes([0xFF, 0xD0 + n]) in rst


def test_grayscale_decode():
    """1-component baseline stream (crafted with the module's own
    segment writers) decodes to a replicated-channel RGB array."""
    gray = im.render_pixels(9, 16, 16)[:, :, :1].repeat(3, axis=2)
    data = jpeg.encode(gray)     # encoder is 3-component; craft 1-comp
    # build a genuine grayscale stream by re-encoding just the Y plane
    qt_l, _ = jpeg._quality_tables(100)
    y = jpeg._rgb_to_ycbcr(gray.astype(np.uint8))[0] - 128.0
    blocks = jpeg._to_blocks(y)
    coef = np.einsum("ux,nxy,vy->nuv", jpeg._D, blocks, jpeg._D)
    q = np.round(coef / qt_l.reshape(8, 8)).astype(np.int32)
    zz = q.reshape(-1, 64)[:, jpeg.ZIGZAG]
    dc = jpeg._huff_codes(jpeg.DC_LUMA_BITS, jpeg.DC_LUMA_VALS)
    ac = jpeg._huff_codes(jpeg.AC_LUMA_BITS, jpeg.AC_LUMA_VALS)
    bw = jpeg._BitWriter()
    prev = 0
    for m in range(zz.shape[0]):
        diff = int(zz[m, 0]) - prev
        prev = int(zz[m, 0])
        s = jpeg._category(diff)
        c, ln = dc[s]
        bw.put(c, ln)
        if s:
            bw.put(jpeg._amplitude(diff, s), s)
        nz = np.nonzero(zz[m, 1:])[0]
        last = -1
        for p in nz:
            run = int(p) - last - 1
            last = int(p)
            while run > 15:
                c, ln = ac[0xF0]
                bw.put(c, ln)
                run -= 16
            v = int(zz[m, 1 + p])
            s = jpeg._category(v)
            c, ln = ac[(run << 4) | s]
            bw.put(c, ln)
            bw.put(jpeg._amplitude(v, s), s)
        if last != 62:
            c, ln = ac[0x00]
            bw.put(c, ln)

    def seg(marker, payload):
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    stream = (b"\xFF\xD8"
              + seg(0xFFDB, bytes([0]) + bytes(
                  int(v) for v in qt_l[jpeg.ZIGZAG]))
              + seg(0xFFC0, struct.pack(">BHHB", 8, 16, 16, 1)
                    + bytes([1, 0x11, 0]))
              + seg(0xFFC4, bytes([0x00]) + bytes(jpeg.DC_LUMA_BITS)
                    + bytes(jpeg.DC_LUMA_VALS))
              + seg(0xFFC4, bytes([0x10]) + bytes(jpeg.AC_LUMA_BITS)
                    + bytes(jpeg.AC_LUMA_VALS))
              + seg(0xFFDA, bytes([1, 1, 0x00]) + b"\x00\x3F\x00")
              + bw.flush() + b"\xFF\xD9")
    out = jpeg.decode(stream)
    assert out.shape == (16, 16, 3)
    assert np.array_equal(out[:, :, 0], out[:, :, 1])
    assert im.psnr(gray, out) >= 40.0
    # and the normal 3-component path on the same pixels agrees closely
    assert im.psnr(gray, jpeg.decode(data)) >= 40.0


def test_error_paths():
    px = im.render_pixels(1, 16, 16)
    good = jpeg.encode(px)
    with pytest.raises(ValueError):
        jpeg.decode(b"NOPE" + good)
    with pytest.raises(ValueError):
        jpeg.decode(good[:40])              # truncated before SOS
    with pytest.raises(ValueError):
        jpeg.decode(good[:-20])             # truncated entropy data
    # a baseline scan relabeled SOF2 is malformed progressive data
    # (full-band "DC" scan), not mis-decoded
    prog = bytearray(good)
    i = prog.find(b"\xFF\xC0")
    prog[i + 1] = 0xC2
    with pytest.raises(ValueError):
        jpeg.decode(bytes(prog))
    # arithmetic-coded SOF stays an honest NotImplementedError
    arith = bytearray(good)
    arith[i + 1] = 0xC9
    with pytest.raises(NotImplementedError):
        jpeg.decode(bytes(arith))
    # a sampling factor outside {1,2,4} is refused, not mis-parsed
    # (2x2 itself is now a supported layout — see the 4:2:0 tests)
    sub = bytearray(good)
    assert sub[i + 11] == 0x11              # SOF comp 1 sampling field
    sub[i + 11] = 0x33
    with pytest.raises(NotImplementedError):
        jpeg.decode(bytes(sub))
    # metadata/stream dims mismatch surfaces in the images dispatch
    with pytest.raises(ValueError):
        im.decode_pixels(good, "jpeg", 5, 5)


def test_generation2_reencode_stable():
    """decode -> re-encode -> decode (the decode_features round trip)
    keeps PSNR far above the gate — requantization is near-idempotent."""
    px = im.render_pixels(31337, 21, 19)
    g1 = jpeg.decode(jpeg.encode(px))
    g2 = jpeg.decode(jpeg.encode(g1))
    assert im.psnr(g1, g2) >= 40.0


def test_jpeg_through_spark_pipeline(spark):
    """jpeg rows ride the same decode/feature/resize mapInPandas paths
    as raw/rawz/png, and the psnr_db gate is a REAL lossy check."""
    rows = []
    for i in range(6):
        px = im.render_pixels(600 + i, 20, 17)
        rows.append((f"j-{i:03d}", bytearray(im.encode_pixels(px, "jpeg")),
                     20, 17, "jpeg", f"cap {i}", im.phash64(px)))
    df = spark.createDataFrame(rows, im.IMAGE_SCHEMA)
    feats = im.decode_features(df).toPandas()
    assert len(feats) == 6
    assert (feats.psnr_db >= 40.0).all()
    thumbs = im.resize_images(df).toPandas()
    assert len(thumbs) == 6
    assert all(len(t) == 8 * 8 * 3 for t in thumbs.bytes)


def test_420_subsampled_roundtrip():
    """4:2:0 (the dominant real-world layout): smaller streams, decode
    fidelity bounded by the subsample itself — so the codec is judged
    against the ideal DCT-free subsample reference, not the original
    (per-pixel-random chroma makes the ideal reference itself ~22 dB)."""
    for (h, w) in [(16, 16), (17, 23), (1, 1), (34, 50)]:
        px = im.render_pixels(h * 10 + w, w, h)
        d420 = jpeg.encode(px, 95, subsampling="420")
        d444 = jpeg.encode(px, 95)
        back = jpeg.decode(d420)
        assert back.shape == px.shape
        if h >= 16 and w >= 16:   # below MCU size the 16-pad dominates
            assert len(d420) < len(d444)
        # ideal 4:2:0 reference: box-mean + nearest-upsample chroma
        hh, ww = -(-h // 16) * 16, -(-w // 16) * 16
        pad = np.pad(px, ((0, hh - h), (0, ww - w), (0, 0)), mode="edge")
        ycc = jpeg._rgb_to_ycbcr(pad)
        for c in (1, 2):
            d = ycc[c].reshape(hh // 2, 2, ww // 2, 2).mean(axis=(1, 3))
            ycc[c] = d.repeat(2, 0).repeat(2, 1)
        ideal = jpeg._ycbcr_to_rgb(ycc)[:h, :w]
        assert im.psnr(ideal, back) >= 34.0
    # smooth chroma: 4:2:0 stays above the 40 dB gate outright
    smooth = np.zeros((32, 32, 3), np.uint8)
    smooth[:, :, 0] = np.linspace(0, 255, 32).astype(np.uint8)[None, :]
    smooth[:, :, 1] = 128
    smooth[:, :, 2] = 64
    assert im.psnr(smooth, jpeg.decode(
        jpeg.encode(smooth, 95, subsampling="420"))) >= 40.0


def test_420_structure_and_restart():
    px = im.render_pixels(7, 50, 34)
    data = jpeg.encode(px, 95, subsampling="420")
    # SOF advertises 2x2 Y sampling, 1x1 chroma
    i = data.find(b"\xFF\xC0")
    assert data[i + 11] == 0x22 and data[i + 14] == 0x11 \
        and data[i + 17] == 0x11
    # restart intervals compose with subsampling (4x3 = 12 MCUs)
    r = jpeg.encode(px, 95, restart_interval=2, subsampling="420")
    assert b"\xFF\xDD" in r
    assert np.array_equal(jpeg.decode(r), jpeg.decode(data))
    with pytest.raises(ValueError):
        jpeg.encode(px, subsampling="411")


def test_422_subsampled_roundtrip():
    """4:2:2 (horizontal-only chroma pooling, the broadcast layout):
    exercises the non-square-sampling decode branch (hmax=2, vmax=1);
    judged against the ideal DCT-free 1x2 subsample reference."""
    for (h, w) in [(16, 16), (17, 23), (34, 50)]:
        px = im.render_pixels(h * 7 + w, w, h)
        back = jpeg.decode(jpeg.encode(px, 95, subsampling="422"))
        assert back.shape == px.shape
        hh, ww = -(-h // 8) * 8, -(-w // 16) * 16
        pad = np.pad(px, ((0, hh - h), (0, ww - w), (0, 0)), mode="edge")
        ycc = jpeg._rgb_to_ycbcr(pad)
        for c in (1, 2):
            d = ycc[c].reshape(hh, ww // 2, 2).mean(axis=2)
            ycc[c] = d.repeat(2, 1)
        ideal = jpeg._ycbcr_to_rgb(ycc)[:h, :w]
        assert im.psnr(ideal, back) >= 34.0
    # SOF advertises 2x1 Y sampling; restart intervals compose
    data = jpeg.encode(im.render_pixels(1, 32, 16), 95, subsampling="422")
    i = data.find(b"\xFF\xC0")
    assert data[i + 11] == 0x21
    px = im.render_pixels(5, 48, 24)
    r = jpeg.encode(px, 95, restart_interval=2, subsampling="422")
    assert np.array_equal(
        jpeg.decode(r),
        jpeg.decode(jpeg.encode(px, 95, subsampling="422")))


def test_interop_with_jvm_imageio(spark):
    """Two-way interop against an INDEPENDENT implementation — the
    JDK's javax.imageio JPEG codec, reachable through Spark's JVM.
    It must read our 4:4:4 stream in near-exact agreement with our own
    decoder, and our decoder must read its default stream (4:2:0 at
    quality 0.75) with luma agreement >= 45 dB — chroma may differ by
    the upsampling filter (ours nearest, theirs interpolated), which
    is implementation-defined."""
    jvm = spark._jvm
    h, w = 20, 24
    px = im.render_pixels(42, w, h)

    def bimg_to_np(bimg):
        out = np.zeros((h, w, 3), np.uint8)
        for y in range(h):
            for x in range(w):
                rgb = bimg.getRGB(x, y)
                out[y, x] = [(rgb >> 16) & 255, (rgb >> 8) & 255,
                             rgb & 255]
        return out

    # ours -> ImageIO.read
    ours_stream = jpeg.encode(px, 98)
    bimg = jvm.javax.imageio.ImageIO.read(
        jvm.java.io.ByteArrayInputStream(bytearray(ours_stream)))
    assert (bimg.getWidth(), bimg.getHeight()) == (w, h)
    their_read = bimg_to_np(bimg)
    assert im.psnr(their_read, jpeg.decode(ours_stream)) >= 45.0

    # ImageIO.write -> our decoder
    bimg2 = jvm.java.awt.image.BufferedImage(w, h, 1)  # TYPE_INT_RGB
    for y in range(h):
        for x in range(w):
            r, g, b = (int(v) for v in px[y, x])
            bimg2.setRGB(x, y, (r << 16) | (g << 8) | b)
    baos = jvm.java.io.ByteArrayOutputStream()
    jvm.javax.imageio.ImageIO.write(bimg2, "jpeg", baos)
    theirs = bytes(baos.toByteArray())
    back = jpeg.decode(theirs)          # their default: 4:2:0, q~0.75
    assert back.shape == (h, w, 3)
    their_own = bimg_to_np(jvm.javax.imageio.ImageIO.read(
        jvm.java.io.ByteArrayInputStream(bytearray(theirs))))

    def luma(a):
        return (0.299 * a[:, :, 0].astype(np.float64)
                + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2])

    mse = np.mean((luma(back) - luma(their_own)) ** 2)
    assert 20 * np.log10(255.0 / np.sqrt(mse)) >= 45.0
    assert im.psnr(back, their_own) >= 20.0


def _imageio_jpeg(jvm, px, progressive):
    """Encode pixels with the JDK's libjpeg-based writer."""
    h, w = px.shape[:2]
    bimg = jvm.java.awt.image.BufferedImage(w, h, 1)
    for y in range(h):
        for x in range(w):
            r, g, b = (int(v) for v in px[y, x])
            bimg.setRGB(x, y, (r << 16) | (g << 8) | b)
    writer = jvm.javax.imageio.ImageIO \
        .getImageWritersByFormatName("jpeg").next()
    param = writer.getDefaultWriteParam()
    if progressive:
        param.setProgressiveMode(
            jvm.javax.imageio.ImageWriteParam.MODE_DEFAULT)
    baos = jvm.java.io.ByteArrayOutputStream()
    ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.write(None, jvm.javax.imageio.IIOImage(bimg, None, None),
                 param)
    ios.flush()
    return bytes(baos.toByteArray())


def test_progressive_decode_bit_exact_vs_sequential(spark):
    """Progressive (SOF2) decoding, pinned by the strongest available
    oracle: libjpeg encodes the same pixels sequentially and
    progressively with identical quantization, so a correct
    progressive decoder must recover the IDENTICAL pixel array the
    sequential path does — exact equality, not a PSNR bound. Two
    sizes exercise multi-MCU EOBRUN spans and 4:2:0 sampling."""
    jvm = spark._jvm
    for seed, (h, w) in ((9, (20, 24)), (31, (56, 40))):
        px = im.render_pixels(seed, w, h)
        seq = _imageio_jpeg(jvm, px, progressive=False)
        prog = _imageio_jpeg(jvm, px, progressive=True)
        assert b"\xFF\xC0" in seq and b"\xFF\xC2" in prog
        a, b = jpeg.decode(seq), jpeg.decode(prog)
        assert a.shape == b.shape == (h, w, 3)
        np.testing.assert_array_equal(a, b)
        # and the decoded image resembles the original at the stream's
        # own fidelity (default libjpeg quality, 4:2:0)
        assert im.psnr(a, px) >= 12.0


def test_progressive_error_paths_and_fuzz(spark):
    """Truncated/mutated progressive streams surface as clean errors
    (or decode to a valid array), never internal failures."""
    jvm = spark._jvm
    px = im.render_pixels(5, 24, 20)
    prog = _imageio_jpeg(jvm, px, progressive=True)
    with pytest.raises(ValueError):
        jpeg.decode(prog[:60])
    with pytest.raises(ValueError):
        jpeg.decode(prog[:len(prog) // 2])
    rng = np.random.default_rng(11)
    for _ in range(60):
        mut = bytearray(prog)
        for _ in range(rng.integers(1, 6)):
            mut[rng.integers(0, len(mut))] = rng.integers(0, 256)
        try:
            out = jpeg.decode(bytes(mut))
            assert out.dtype == np.uint8 and out.ndim == 3
        except (ValueError, NotImplementedError):
            pass
