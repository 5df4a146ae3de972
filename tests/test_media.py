"""Audio/video payload tests (media.py): codec round-trips + stubs,
synth determinism, frame-sample and audio-feature exactness vs pure
python over the same derivations."""

import numpy as np
import pytest

from kdtree_spark import media as md
from kdtree_spark.images import content_seed, phash64


def test_codec_roundtrips_and_stubs():
    frames = md.render_frames(123, 5, 16, 16)
    for fmt in md.VIDEO_FMTS:
        back = md.decode_video(md.encode_video(frames, fmt), fmt, 5, 16, 16)
        np.testing.assert_array_equal(back, frames)
    pcm = md.render_pcm(123, 1000)
    for fmt in md.AUDIO_FMTS:
        np.testing.assert_array_equal(
            md.decode_audio(md.encode_audio(pcm, fmt), fmt), pcm)
    for fmt in md.STUB_FMTS:
        with pytest.raises(NotImplementedError):
            md.encode_video(frames, fmt)
        with pytest.raises(NotImplementedError):
            md.decode_audio(b"", fmt)


def test_synth_table_contract(spark, sf_dir):
    m = md.synth_media(spark, sf_dir).cache()
    pdf = m.toPandas()
    assert set(pdf.kind) == {"video", "audio"}
    vids = pdf[pdf.kind == "video"]
    auds = pdf[pdf.kind == "audio"]
    assert set(vids.fmt) <= set(md.VIDEO_FMTS)
    assert set(auds.fmt) <= set(md.AUDIO_FMTS)
    assert (vids.fps > 0).all() and (vids.sample_rate == 0).all()
    assert (auds.sample_rate > 0).all() and (auds.fps == 0).all()
    # duplicate captions -> byte-identical payloads (dedup consistency)
    dup = pdf.groupby(["caption", "kind", "fmt"]).bytes.nunique()
    assert (dup == 1).all()
    m.unpersist()


def test_frame_sample_matches_python(spark, sf_dir):
    m = md.synth_media(spark, sf_dir)
    got = md.frame_sample(m, every_ms=100).toPandas()
    src = m.filter("kind = 'video'").limit(5).toPandas()
    assert len(got) > 0
    for _, r in src.iterrows():
        n = md.n_frames(r.duration_ms, r.fps)
        frames = md.decode_video(bytes(r["bytes"]), r.fmt, n, r.w, r.h)
        mine = got[got.media_id == r.media_id].sort_values("ts_ms")
        exp_ts = list(range(0, int(r.duration_ms), 100))
        assert list(mine.ts_ms) == exp_ts
        for _, fr in mine.iterrows():
            idx = min(n - 1, (fr.ts_ms * int(r.fps)) // 1000)
            assert fr.frame_idx == idx
            assert fr.frame_phash == phash64(frames[idx])
        # frames regenerate deterministically from the caption seed
        regen = md.render_frames(content_seed(r.caption), n, r.w, r.h)
        np.testing.assert_array_equal(frames, regen)


def test_audio_features_match_python(spark, sf_dir):
    m = md.synth_media(spark, sf_dir)
    got = md.audio_features(m, win=256).toPandas()
    src = m.filter("kind = 'audio'").limit(5).toPandas()
    assert len(got) > 0
    for _, r in src.iterrows():
        pcm = md.decode_audio(bytes(r["bytes"]), r.fmt).astype(np.int64)
        nw = len(pcm) // 256
        mine = got[got.media_id == r.media_id].sort_values("win_idx")
        assert len(mine) == nw
        x = pcm[:nw * 256].reshape(nw, 256)
        np.testing.assert_array_equal(mine.energy.to_numpy(),
                                      (x * x).sum(axis=1))
        np.testing.assert_array_equal(
            mine.zcross.to_numpy(),
            (np.diff(np.signbit(x), axis=1) != 0).sum(axis=1))
