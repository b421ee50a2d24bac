"""Multimodal binary-column plumbing: audio/video decode + features.

The brief's multimodal requirement: opaque binary columns with typed
metadata; real Spark-side plumbing (schema, UDF signatures, Arrow batch
shape); decode stubbed for codecs whose libraries are absent."""

import numpy as np
import pytest

from geowave_spark.sources.multimodal import (
    audio_features,
    audio_table,
    decode_audio,
    decode_video,
    gen_audio_pdf,
    gen_video_pdf,
    video_frame_sample,
    video_table,
)


def test_pcm16_roundtrip_deterministic():
    pdf = gen_audio_pdf(np.array([1, 2, 1]))
    assert pdf.iloc[0]["bytes"] == pdf.iloc[2]["bytes"]  # deterministic in id
    x = decode_audio(pdf.iloc[0]["bytes"], "pcm16", pdf.iloc[0]["n_samples"])
    assert x.dtype == np.float32 and len(x) == pdf.iloc[0]["n_samples"]
    assert 0.2 < np.sqrt((x**2).mean()) < 0.6  # a sine at ~0.35 RMS


def test_stubbed_codecs_raise():
    with pytest.raises(NotImplementedError):
        decode_audio(b"xx", "mp3", 10)
    with pytest.raises(NotImplementedError):
        decode_video(b"xx", "h264", 4, 4, 2)


def test_audio_features_spark(spark):
    tbl = audio_table(spark, 60)
    feats = audio_features(tbl).orderBy("audio_id")
    rows = feats.collect()
    # every 4th row is the stubbed mp3 codec and is skipped
    assert len(rows) == 45
    for r in rows[:5]:
        assert 0.1 < r.duration_s < 1.0
        assert 0.2 < r.rms < 0.6
        assert 0.0 < r.zcr < 0.5
    # deterministic across runs
    again = audio_features(audio_table(spark, 60)).orderBy("audio_id").collect()
    assert rows == again


def test_video_frame_sample_spark(spark):
    tbl = video_table(spark, 30)
    sampled = video_frame_sample(tbl, every_n=2)
    pdf = sampled.toPandas()
    # rawrgb rows are 2/3 of ids; each contributes ceil(n_frames/2) frames
    src = gen_video_pdf(np.arange(30))
    want = sum(
        -(-int(r.n_frames) // 2) for r in src.itertuples() if r.codec == "rawrgb"
    )
    assert len(pdf) == want
    assert set(pdf.columns) == {"video_id", "frame_idx", "mean_r", "mean_g", "mean_b"}
    # brightness ramp: later frames brighter within a video
    one = pdf[pdf.video_id == "vid00000001"].sort_values("frame_idx")
    if len(one) >= 2:
        lum = one[["mean_r", "mean_g", "mean_b"]].mean(axis=1).to_numpy()
        assert lum[-1] > lum[0]


def test_strict_mode_surfaces_stub(spark):
    tbl = audio_table(spark, 8)
    with pytest.raises(Exception):
        audio_features(tbl, skip_undecodable=False).collect()


def test_wav_round_trip():
    """RIFF/WAVE container parse (real codec, not a stub): encode →
    decode round-trips PCM16 exactly."""
    import numpy as np

    from geowave_spark.sources.multimodal import decode_audio, encode_wav

    rng = np.random.default_rng(3)
    x = rng.uniform(-0.9, 0.9, 4000).astype(np.float32)
    raw = encode_wav(x, sample_rate=8000)
    got = decode_audio(raw, "wav", 4000)
    want = np.clip(x * 32767, -32768, 32767).astype("<i2").astype(np.float32) / 32768.0
    assert np.array_equal(got, want)


def test_wav_rejects_garbage_and_compressed():
    import numpy as np
    import pytest as _pytest

    from geowave_spark.sources.multimodal import decode_audio

    with _pytest.raises(ValueError):
        decode_audio(b"nope", "wav", 10)
    with _pytest.raises(NotImplementedError):
        decode_audio(b"", "mp3", 10)
