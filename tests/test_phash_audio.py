"""Audio perceptual fingerprint tests (functions/phash.py afp lane)."""

import numpy as np
from pyspark.sql import functions as F

from geokitten_spark.functions.phash import (
    afp64,
    afp_neardup_pairs,
    audio_fingerprint,
    regain_audio,
)


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _clip(seed: int, n: int = 9000) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    tone = 6000 * np.sin(2 * np.pi * (220 + 40 * (seed % 7)) * t / 8000)
    noise = rng.normal(0, 800, n)
    return np.clip(tone + noise, -32768, 32767).astype(np.int16)


def test_afp_exact_gain_invariance():
    """A pure float gain multiplies every band energy by g^2, shifting
    log E by a CONSTANT — every adjacent-band difference cancels it
    exactly, so the fingerprint is bit-identical (no tolerance)."""
    x = _clip(3).astype(np.float64)
    assert afp64(x) == afp64(x * 0.37) == afp64(x * 5.0)


def test_afp_requantized_gain_close_distinct_far():
    """Integer 3/4 re-gain + dither (the fixture's 'captured again at
    another level') moves only a few bits; distinct clips stay far."""
    a = _clip(1)
    g = a.astype(np.int32) * 3 // 4
    g = (g + (np.arange(len(g)) % 5 - 2)).astype(np.int16)
    assert _ham(afp64(a), afp64(g)) <= 6
    for seed in (2, 5, 9):
        assert _ham(afp64(a), afp64(_clip(seed))) >= 14


def test_afp_degenerate_inputs():
    """Too-short or empty sample arrays fingerprint to 0, not crash."""
    assert afp64(np.zeros(0, dtype=np.int16)) == 0
    assert afp64(np.zeros(5, dtype=np.int16)) == 0


def test_audio_fingerprint_matches_driver_kernel(spark):
    """The distributed mapInPandas pass must equal the driver-side
    kernel bit-for-bit; non-audio rows carry NULL hashes."""
    from geokitten_spark.functions.multimodal import synthetic_media
    from geokitten_spark.functions.riff import decode_wav

    media = synthetic_media(spark, "/root/testdata/sf0.001", n_rows=30)
    got = {r.media_id: (r.kind, r.afp) for r in audio_fingerprint(media).collect()}
    for r in media.collect():
        kind, fp = got[r.media_id]
        if kind != "audio":
            assert fp is None
            continue
        samples, _sr = decode_wav(bytes(r.payload))
        assert fp == afp64(samples)


def test_regain_pairs_end_to_end(spark):
    """Originals vs re-gained copies: every original pairs with exactly
    its own copy (fixture-measured margins at every SF: copies <= 1
    bit, distinct clips >= 18), through the real WAV codec both ways."""
    from geokitten_spark.functions.multimodal import synthetic_media

    media = synthetic_media(spark, "/root/testdata/sf0.001", n_rows=60).filter(
        F.col("kind") == "audio"
    )
    n_audio = media.count()
    copies = regain_audio(media, id_offset=200000)
    got = afp_neardup_pairs(media, copies, max_hamming=6, bands=8).collect()
    assert len(got) == n_audio
    assert all(r.id_b == r.id_a + 200000 for r in got)
    assert all(r.hamming <= 6 for r in got)
