"""RIFF container codecs (WAV PCM16 + MJPEG-AVI) and the audio/video
media lanes that consume them.

The reference engine has no media stack; these back SURVEY.md §2.13's
multimodal requirement with real binary parses (no codec libraries in
this container, so the formats are implemented from the public specs).
"""

import struct

import numpy as np
import pytest

from geokitten_spark.functions.riff import (
    avi_frame_count,
    decode_avi_mjpeg,
    decode_wav,
    encode_avi_mjpeg,
    encode_wav,
)
from tests.conftest import SF_SMOKE


def test_wav_roundtrip_mono_odd_length():
    rng = np.random.default_rng(11)
    mono = rng.integers(-32768, 32767, size=1601).astype(np.int16)
    buf = encode_wav(mono, 16000)
    # canonical header: RIFF size is file length minus 8 incl. pad byte
    assert buf[:4] == b"RIFF" and buf[8:12] == b"WAVE"
    assert struct.unpack("<I", buf[4:8])[0] == len(buf) - 8
    assert len(buf) % 2 == 0  # word-aligned via pad byte
    samples, rate = decode_wav(buf)
    assert rate == 16000 and samples.shape == (1601, 1)
    assert np.array_equal(samples[:, 0], mono)


def test_wav_roundtrip_stereo_and_extra_chunks():
    rng = np.random.default_rng(12)
    stereo = rng.integers(-32768, 32767, size=(800, 2)).astype(np.int16)
    buf = encode_wav(stereo, 44100)
    # splice a LIST INFO chunk before fmt — third-party encoders do this;
    # the chunk walk must skip it
    spliced = buf[:12] + b"LIST" + struct.pack("<I", 4) + b"INFO" + buf[12:]
    spliced = b"RIFF" + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    samples, rate = decode_wav(spliced)
    assert rate == 44100
    assert np.array_equal(samples, stereo)


def test_wav_rejects_non_pcm16():
    buf = bytearray(encode_wav(np.zeros(4, dtype=np.int16), 8000))
    fmt_off = buf.index(b"fmt ") + 8
    struct.pack_into("<H", buf, fmt_off, 3)  # format tag 3 = IEEE float
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(buf))
    with pytest.raises(ValueError):
        decode_wav(b"RIFF\x04\x00\x00\x00AVI ")


def test_avi_structure_and_frame_parity():
    rng = np.random.default_rng(13)
    frames = [
        rng.integers(0, 255, size=(24, 40, 3)).astype(np.uint8) for _ in range(7)
    ]
    avi = encode_avi_mjpeg(frames, fps=10)
    assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
    assert struct.unpack("<I", avi[4:8])[0] == len(avi) - 8
    assert b"LIST" in avi and b"movi" in avi and b"idx1" in avi
    assert avi_frame_count(avi) == 7
    dec = decode_avi_mjpeg(avi)
    assert [n for n, _ in dec] == list(range(7))
    for (_, d), f in zip(dec, frames):
        assert d.shape == f.shape
        # JPEG is lossy; q90 noise stays within a modest mean error
        assert np.abs(d.astype(int) - f.astype(int)).mean() < 12


def test_avi_every_k_skips_decode():
    frames = [np.full((16, 16, 3), v, dtype=np.uint8) for v in (10, 80, 150, 220, 40)]
    avi = encode_avi_mjpeg(frames, fps=5)
    sampled = decode_avi_mjpeg(avi, every_k=2)
    assert [n for n, _ in sampled] == [0, 2, 4]
    capped = decode_avi_mjpeg(avi, every_k=2, max_frames=2)
    assert [n for n, _ in capped] == [0, 2]


def test_codec_determinism():
    rng = np.random.default_rng(14)
    mono = rng.integers(-1000, 1000, size=333).astype(np.int16)
    assert encode_wav(mono, 16000) == encode_wav(mono, 16000)
    frames = [rng.integers(0, 255, size=(16, 16, 3)).astype(np.uint8)]
    assert encode_avi_mjpeg(frames) == encode_avi_mjpeg(frames)


def test_fixture_audio_rows_are_real_wav(spark):
    from geokitten_spark.functions.multimodal import audio_features, synthetic_media

    media = synthetic_media(spark, SF_SMOKE, n_rows=30)
    rows = media.filter("kind = 'audio'").collect()
    assert rows, "fixture must contain audio rows"
    for r in rows:
        samples, rate = decode_wav(bytes(r.payload))
        assert rate == 16000
        assert 1600 <= samples.shape[0] < 3200  # 0.1-0.2 s per fixture spec

    feats = audio_features(media).collect()
    assert {r.media_id for r in feats} == {r.media_id for r in rows}
    for r in feats:
        assert 0.0 <= r.rms <= 1.0
        assert 0.0 <= r.zcr <= 1.0
        assert r.peak >= r.rms  # peak bounds rms for any waveform


def test_fixture_video_rows_are_real_avi(spark):
    from geokitten_spark.functions.multimodal import (
        _features_of,
        frame_sample_features,
        synthetic_media,
    )

    media = synthetic_media(spark, SF_SMOKE, n_rows=30)
    vids = media.filter("kind = 'video'").select("media_id", "payload", "meta").collect()
    assert vids, "fixture must contain video rows"
    # container frame count matches the meta the fixture promises
    for r in vids:
        assert avi_frame_count(bytes(r.payload)) == r.meta.n_frames

    # Spark frame features == driver-side decode of the same container
    frames = frame_sample_features(media, every_k=5).collect()
    got = {(r.media_id, r.frame_no): tuple(r.embedding) for r in frames}
    for r in vids:
        for f, img in decode_avi_mjpeg(bytes(r.payload), every_k=5):
            expect = tuple(np.float32(x) for x in _features_of(img))
            assert got[(r.media_id, f)] == expect
