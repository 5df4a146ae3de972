"""Image payload invariants (BASELINE input_hint): lossless codec
round-trip with PSNR >= 40 dB, caption byte-equality, phash determinism
across driver and executors, banded phash dedup losslessness."""

from __future__ import annotations

import numpy as np
import pytest


def _ham(a, b):
    return bin((int(a) ^ int(b)) & ((1 << 64) - 1)).count("1")


from kdtree_spark import images as im


def test_codec_roundtrip_and_psnr():
    px = im.render_pixels(42, 20, 17)
    for fmt in im.LOSSLESS_FMTS:
        back = im.decode_pixels(im.encode_pixels(px, fmt), fmt, 20, 17)
        assert np.array_equal(px, back)
        assert im.psnr(px, back) == float("inf")  # >= 40 dB trivially
    with pytest.raises(NotImplementedError):
        im.encode_pixels(px, "jpeg")
    with pytest.raises(NotImplementedError):
        im.decode_pixels(b"x", "png", 1, 1)


def test_render_deterministic():
    assert np.array_equal(im.render_pixels(7, 16, 16),
                          im.render_pixels(7, 16, 16))
    assert not np.array_equal(im.render_pixels(7, 16, 16),
                              im.render_pixels(8, 16, 16))


def test_phash_properties():
    px = im.render_pixels(3, 24, 24)
    assert im.phash64(px) == im.phash64(px.copy())
    # a small perturbation moves few bits; a different image moves many
    near = px.copy()
    near[0, 0] = 255 - near[0, 0]
    d_near = _ham(im.phash64(px), im.phash64(near))
    other = im.render_pixels(999, 24, 24)
    d_far = _ham(im.phash64(px), im.phash64(other))
    assert d_near <= 4
    assert d_far >= d_near


def test_synth_table_contract(spark, sf_dir):
    imgs = im.synth_images(spark, sf_dir)
    pdf = imgs.limit(50).toPandas()
    assert list(pdf.columns) == ["image_id", "bytes", "w", "h", "fmt",
                                 "caption", "phash", "cx", "cy"]
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .toPandas().set_index("doc_id"))
    for _, r in pdf.iterrows():
        doc_id = int(r.image_id.split("-")[1])
        # caption byte-for-byte equality with the source text
        assert r.caption == docs.loc[doc_id, "text"]
        # executor-side pixels reproduce on the driver: phash matches
        px = im.render_pixels(im.content_seed(r.caption), int(r.w), int(r.h))
        assert im.phash64(px) == int(r.phash)
        assert np.array_equal(
            im.decode_pixels(bytes(r.bytes), r.fmt, int(r.w), int(r.h)), px)
        assert 0 <= r.cx < 1_000_000 and 0 <= r.cy < 1_000_000


def test_decode_features_psnr_gate(spark, sf_dir):
    imgs = im.synth_images(spark, sf_dir).limit(60)
    feats = im.decode_features(imgs).toPandas()
    assert len(feats) == 60
    assert (feats.psnr_db >= 40.0).all()
    ph = imgs.select("image_id", "phash").toPandas().set_index("image_id")
    for _, r in feats.iterrows():
        assert int(r.phash_check) == int(ph.loc[r.image_id, "phash"])


def test_resize_shapes(spark, sf_dir):
    imgs = im.synth_images(spark, sf_dir).limit(10)
    th = im.resize_images(imgs, 8, 8).toPandas()
    for _, r in th.iterrows():
        assert len(bytes(r.bytes)) == 8 * 8 * 3


def test_phash_pairs_banding_lossless(spark, sf_dir):
    imgs = im.synth_images(spark, sf_dir).limit(80).cache()
    got = im.phash_pairs(imgs, 7).toPandas()
    ph = imgs.select("image_id", "phash").toPandas()
    fps = dict(zip(ph.image_id, ph.phash))
    brute = {(a, b) for a in fps for b in fps if a < b
             and _ham(fps[a], fps[b]) <= 7}
    assert set(zip(got.ia, got.ib)) == brute


def test_phash_fixture_no_drift(spark, sf_dir):
    """fixtures_data/image_phash.parquet (the DuckDB oracle's phash
    source, scripts/gen_phash_fixture.py) must equal freshly-computed
    phashes — drift between the fixture and images.py fails here."""
    import os
    import pandas as pd
    fx_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "fixtures_data",
        "image_phash.parquet")
    fx = pd.read_parquet(fx_path).set_index("caption_md5")["phash"]
    imgs = (im.synth_images(spark, sf_dir).limit(60)
            .selectExpr("md5(caption) AS m", "phash").toPandas())
    assert len(imgs) == 60
    for _, r in imgs.iterrows():
        assert int(fx.loc[r.m]) == int(r.phash)
