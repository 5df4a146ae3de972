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


def test_wav_codec_real_container(spark):
    """wav is a real RIFF/WAVE container (stdlib wave module): exact
    mono-int16 round-trip, standards-conformant header, multichannel
    downmix, width rejection — and it rides the same Spark
    audio_features path as pcm16/pcmz."""
    import io
    import wave

    pcm = md.render_pcm(77, 2000)
    enc = md.encode_audio(pcm, "wav")
    assert enc[:4] == b"RIFF" and enc[8:12] == b"WAVE"
    np.testing.assert_array_equal(md.decode_audio(enc, "wav"), pcm)
    # an independent reader (the wave module itself, fresh parse) agrees
    with wave.open(io.BytesIO(enc), "rb") as wv:
        assert (wv.getnchannels(), wv.getsampwidth(),
                wv.getframerate()) == (1, 2, md.WAV_RATE)
    # stereo downmix: first channel
    bio = io.BytesIO()
    with wave.open(bio, "wb") as wv:
        wv.setnchannels(2)
        wv.setsampwidth(2)
        wv.setframerate(md.WAV_RATE)
        inter = np.empty(40, np.int16)
        inter[0::2] = np.arange(20)          # L
        inter[1::2] = -np.arange(20)         # R
        wv.writeframes(inter.astype("<i2").tobytes())
    np.testing.assert_array_equal(
        md.decode_audio(bio.getvalue(), "wav"), np.arange(20))
    # 8-bit wav is rejected, not misread
    bio8 = io.BytesIO()
    with wave.open(bio8, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(1)
        wv.setframerate(md.WAV_RATE)
        wv.writeframes(b"\x00" * 16)
    with pytest.raises(NotImplementedError, match="sample width"):
        md.decode_audio(bio8.getvalue(), "wav")

    # Spark path: audio_features over wav rows == over pcm16 rows
    rows_wav, rows_pcm = [], []
    for i in range(6):
        p = md.render_pcm(500 + i, 1600)
        dur = 100
        base = (f"a-{i:03d}", "audio", dur, 16, 0, 0, f"cap {i}")
        rows_wav.append((base[0], base[1],
                         bytearray(md.encode_audio(p, "wav")), "wav",
                         dur, 16, 0, 0, base[6]))
        rows_pcm.append((base[0], base[1],
                         bytearray(md.encode_audio(p, "pcm16")), "pcm16",
                         dur, 16, 0, 0, base[6]))
    schema = ("media_id string, kind string, bytes binary, fmt string, "
              "duration_ms int, fps int, w int, h int, caption string")
    fw = md.audio_features(spark.createDataFrame(rows_wav, schema)) \
        .toPandas().sort_values(["media_id", "win_idx"]).reset_index(drop=True)
    fp = md.audio_features(spark.createDataFrame(rows_pcm, schema)) \
        .toPandas().sort_values(["media_id", "win_idx"]).reset_index(drop=True)
    assert len(fw) > 0 and fw.equals(fp)


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


def _fixture(name):
    import os
    import pandas as pd
    return pd.read_parquet(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "fixtures_data", name))


def test_media_fixtures_no_drift(spark, sf_dir):
    """fixtures_data/{media_frames,audio_windows}.parquet (the DuckDB
    oracle's sources, scripts/gen_media_fixture.py) must equal freshly
    computed Spark results — drift between fixtures and media.py fails
    here, mirroring test_phash_fixture_no_drift."""
    m = md.synth_media(spark, sf_dir).cache()
    key = m.selectExpr("media_id", "md5(caption) AS cm", "fps",
                       "sample_rate AS sr").toPandas().set_index("media_id")

    fx = _fixture("media_frames.parquet").set_index(
        ["caption_md5", "fps", "ts_ms"])
    got = md.frame_sample(m, every_ms=100).toPandas()
    assert len(got) > 0
    for _, r in got.iterrows():
        k = key.loc[r.media_id]
        row = fx.loc[(k.cm, int(k.fps), int(r.ts_ms))]
        assert int(row.frame_idx) == int(r.frame_idx)
        assert int(row.frame_phash) == int(r.frame_phash)

    ax = _fixture("audio_windows.parquet").set_index(
        ["caption_md5", "sr", "win_idx"])
    agot = md.audio_features(m, win=256).toPandas()
    assert len(agot) > 0
    for _, r in agot.iterrows():
        k = key.loc[r.media_id]
        row = ax.loc[(k.cm, int(k.sr), int(r.win_idx))]
        assert int(row.energy) == int(r.energy)
        assert int(row.zcross) == int(r.zcross)
    m.unpersist()


def test_decode_stats_fixture_no_drift(spark, sf_dir):
    """image_phash.parquet's mean_lum_c column must equal Spark's
    floor(mean_lum * 100) from decode_features."""
    from kdtree_spark import images as im
    from pyspark.sql import functions as F
    imgs = im.synth_images(spark, sf_dir).limit(40).cache()
    feats = im.decode_features(imgs)
    got = (imgs.join(feats, "image_id")
           .select(F.expr("md5(caption)").alias("cm"), "phash",
                   F.floor(F.col("mean_lum") * 100).cast("long")
                   .alias("mlc"), "phash_check")
           .toPandas())
    assert len(got) == 40
    fx = _fixture("image_phash.parquet").set_index("caption_md5")
    for _, r in got.iterrows():
        assert int(fx.loc[r.cm, "phash"]) == int(r.phash) == int(r.phash_check)
        assert int(fx.loc[r.cm, "mean_lum_c"]) == int(r.mlc)
    imgs.unpersist()


def test_wav_interop_with_jvm_audiosystem(spark):
    """Two-way WAV interop against the JDK's independent RIFF reader
    (javax.sound.sampled via Spark's JVM): exact PCM bytes both ways."""
    jvm = spark._jvm
    pcm = md.render_pcm(17, 500)

    # ours -> AudioSystem: format fields + exact sample bytes
    ais = jvm.javax.sound.sampled.AudioSystem.getAudioInputStream(
        jvm.java.io.ByteArrayInputStream(
            bytearray(md.encode_audio(pcm, "wav"))))
    fmt = ais.getFormat()
    assert fmt.getSampleRate() == float(md.WAV_RATE)
    assert fmt.getSampleSizeInBits() == 16 and fmt.getChannels() == 1
    assert not fmt.isBigEndian()
    got = np.frombuffer(bytes(ais.readAllBytes()), "<i2")
    np.testing.assert_array_equal(got, pcm)

    # AudioSystem writes a WAVE from raw PCM -> our decoder: exact
    jfmt = jvm.javax.sound.sampled.AudioFormat(
        float(md.WAV_RATE), 16, 1, True, False)
    raw = pcm.astype("<i2").tobytes()
    ais2 = jvm.javax.sound.sampled.AudioInputStream(
        jvm.java.io.ByteArrayInputStream(bytearray(raw)), jfmt, len(pcm))
    baos = jvm.java.io.ByteArrayOutputStream()
    wave_t = jvm.javax.sound.sampled.AudioFileFormat.Type.WAVE
    jvm.javax.sound.sampled.AudioSystem.write(ais2, wave_t, baos)
    theirs = bytes(baos.toByteArray())
    np.testing.assert_array_equal(md.decode_audio(theirs, "wav"), pcm)
