"""Offline verification of the arithmetic-coded JPEG entropy layer.

(Third-party interop against libjpeg-turbo lives in
tests/test_jpeg_interop.py — both directions, sequential + progressive.
This module keeps the self-contained checks that need no compiler:)

* bit-level QM coder roundtrips over adversarial context/bias mixes
  (exercising renormalization, conditional exchange, byte stuffing, and
  carry walk-back),
* full encode->decode roundtrips at several shapes/qualities,
* cross-entropy-coding pixel PARITY: the huffman and arithmetic
  encoders share one quantization pipeline, so their outputs must
  decode to byte-identical pixels — a lossless-entropy-layer proof that
  does not depend on either layer being trusted,
* the structural claims a third-party reader would check first (SOF9
  marker, DAC segment present, no DHT, smaller-than-huffman output on
  compressible images).
"""

import numpy as np
import pytest

from geokitten_spark.functions.jpeg import decode_jpeg, encode_jpeg
from geokitten_spark.functions.jpeg_arith import (
    ArithDecoder,
    ArithEncoder,
    encode_jpeg_arith,
    QE_TABLE,
)


def _unstuff(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data):
        out.append(data[i])
        if data[i] == 0xFF:
            assert i + 1 < len(data) and data[i + 1] == 0x00, "unstuffed 0xFF"
            i += 2
        else:
            i += 1
    return bytes(out)


def _coder_roundtrip(ctxs, bits, n_ctx=64):
    enc = ArithEncoder()
    st = bytearray(n_ctx)
    for c, b in zip(ctxs, bits):
        enc.encode(st, int(c), int(b))
    dec = ArithDecoder(_unstuff(enc.scan()))
    st2 = bytearray(n_ctx)
    return [dec.decode(st2, int(c)) for c in ctxs]


def test_qe_table_shape_and_fixed_state():
    assert len(QE_TABLE) == 114
    qe, nmps, nlps, switch = QE_TABLE[113]
    assert (nmps, nlps, switch) == (113, 113, 0)  # fixed bin never adapts
    for qe, nmps, nlps, _ in QE_TABLE:
        assert 1 <= qe <= 0x5B12
        assert 0 <= nmps <= 113 and 0 <= nlps <= 113


def test_coder_roundtrip_random_biased_streams():
    rng = np.random.default_rng(42)
    for _ in range(30):
        n = int(rng.integers(1, 3000))
        nctx = int(rng.integers(1, 50))
        bias = rng.random(nctx)
        ctxs = rng.integers(0, nctx, n)
        bits = (rng.random(n) < bias[ctxs]).astype(int)
        assert _coder_roundtrip(ctxs, bits, 64) == list(bits)


def test_coder_roundtrip_extreme_biases_force_carry_paths():
    # long all-MPS runs drive A into repeated renormalization and emit
    # 0xFF runs whose carries must walk back through the byte list
    for pattern in (
        [0] * 5000 + [1] + [0] * 5000,
        [1] * 5000 + [0] + [1] * 5000,
        ([0] * 200 + [1]) * 40,
        [0, 1] * 2500,
    ):
        ctxs = [0] * len(pattern)
        assert _coder_roundtrip(ctxs, pattern, 4) == pattern


def test_coder_stuffing_invariant():
    # every 0xFF in the entropy segment must be followed by 0x00
    rng = np.random.default_rng(3)
    bits = (rng.random(20000) < 0.95).astype(int)
    enc = ArithEncoder()
    st = bytearray(4)
    for b in bits:
        enc.encode(st, 0, int(b))
    data = enc.scan()
    i = 0
    while i < len(data):
        if data[i] == 0xFF:
            assert data[i + 1] == 0x00
            i += 2
        else:
            i += 1


@pytest.mark.parametrize(
    "shape,sub,q",
    [
        ((16, 16), "4:4:4", 90),
        ((33, 25), "4:4:4", 75),
        ((40, 56), "4:2:0", 85),
        ((8, 8), "4:2:0", 50),
        ((64, 48), "4:4:4", 95),
    ],
)
def test_pixel_parity_with_huffman_encoder(shape, sub, q):
    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, (4, 4, 3)).astype(np.float64)
    img = np.kron(base, np.ones((shape[0] // 4 + 1, shape[1] // 4 + 1, 1)))
    img = img[: shape[0], : shape[1], :]
    img = (img + rng.normal(0, 10, img.shape)).clip(0, 255).astype(np.uint8)
    hb = encode_jpeg(img, q, sub)
    ab = encode_jpeg_arith(img, q, sub)
    assert np.array_equal(decode_jpeg(hb), decode_jpeg(ab))


def test_arith_stream_structure_and_compression_win():
    rng = np.random.default_rng(11)
    grad = np.linspace(0, 255, 64 * 64).reshape(64, 64)
    img = np.stack([grad, grad.T, (grad + grad.T) / 2], axis=2)
    img = (img + rng.normal(0, 3, img.shape)).clip(0, 255).astype(np.uint8)
    ab = encode_jpeg_arith(img, 90)
    hb = encode_jpeg(img, 90)
    assert b"\xff\xc9" in ab  # SOF9
    assert b"\xff\xcc" in ab  # DAC
    assert b"\xff\xc4" not in ab  # no huffman tables
    assert len(ab) < len(hb)  # adaptive coder beats fixed tables here
    assert np.array_equal(decode_jpeg(ab), decode_jpeg(hb))


def test_non_default_conditioning_roundtrips():
    # non-default DAC bounds change both the encoder model and the
    # decoder's parsed conditioning — parity proves DAC is honored
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8).astype(np.uint8)
    for dc_l, dc_u, ac_kx in [(0, 2, 3), (1, 3, 1), (0, 0, 63)]:
        ab = encode_jpeg_arith(img, 80, dc_l=dc_l, dc_u=dc_u, ac_kx=ac_kx)
        hb = encode_jpeg(img, 80)
        assert np.array_equal(decode_jpeg(ab), decode_jpeg(hb))


def test_grayscale_and_flat_images():
    flat = np.full((16, 24), 128, dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg_arith(flat, 90)), decode_jpeg(encode_jpeg(flat, 90))
    )
    rng = np.random.default_rng(17)
    noisy = rng.integers(0, 256, (17, 19), dtype=np.uint8).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg_arith(noisy, 60)),
        decode_jpeg(encode_jpeg(noisy, 60)),
    )


def test_determinism():
    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8).astype(np.uint8)
    assert encode_jpeg_arith(img, 85) == encode_jpeg_arith(img, 85)


# --- lossless arithmetic (SOF11, Annex H model) -----------------------------


def _rgb(seed, h=31, w=27):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8).astype(np.uint8)


@pytest.mark.parametrize("pred", range(1, 8))
def test_lossless_arith_exact_roundtrip_all_predictors(pred):
    from geokitten_spark.functions.jpeg_arith import encode_jpeg_lossless_arith

    img = _rgb(100 + pred)
    b = encode_jpeg_lossless_arith(img, predictor=pred)
    assert b"\xff\xcb" in b  # SOF11
    assert b"\xff\xcc" in b  # DAC
    assert b"\xff\xc4" not in b  # no huffman tables anywhere
    assert np.array_equal(decode_jpeg(b), img)  # bit-exact, no loss


def test_lossless_arith_matches_huffman_lossless_lane():
    # both lossless entropy layers must reproduce the ORIGINAL image,
    # so they are trivially pixel-identical to each other — pinned
    # explicitly so a regression in either lane is caught as a parity
    # break, not just a roundtrip break
    from geokitten_spark.functions.jpeg import encode_jpeg_lossless
    from geokitten_spark.functions.jpeg_arith import encode_jpeg_lossless_arith

    img = _rgb(42)
    hb = encode_jpeg_lossless(img, predictor=4)
    ab = encode_jpeg_lossless_arith(img, predictor=4)
    assert np.array_equal(decode_jpeg(ab), decode_jpeg(hb))


def test_lossless_arith_gray_restart_and_point_transform():
    from geokitten_spark.functions.jpeg_arith import encode_jpeg_lossless_arith

    rng = np.random.default_rng(55)
    gray = rng.integers(0, 256, (23, 41), dtype=np.uint8).astype(np.uint8)
    b = encode_jpeg_lossless_arith(gray, predictor=4, restart_interval=57)
    assert np.array_equal(decode_jpeg(b), np.repeat(gray[:, :, None], 3, axis=2))

    img = _rgb(56)
    b = encode_jpeg_lossless_arith(img, predictor=5, point_transform=2)
    assert np.array_equal(decode_jpeg(b), (img >> 2) << 2)

    b = encode_jpeg_lossless_arith(img, predictor=6, restart_interval=13)
    assert np.array_equal(decode_jpeg(b), img)  # restart mid-row


@pytest.mark.parametrize("prec", [12, 16])
def test_lossless_arith_high_precision_reduces_exactly(prec):
    from geokitten_spark.functions.jpeg_arith import encode_jpeg_lossless_arith

    img = _rgb(60 + prec)
    b = encode_jpeg_lossless_arith(img, predictor=7, precision=prec)
    assert np.array_equal(decode_jpeg(b), img)


def test_lossless_arith_non_default_conditioning():
    # non-default L/U re-shape the Da/Db context classification on BOTH
    # sides; a decoder that ignored the DAC segment would desync
    from geokitten_spark.functions.jpeg_arith import encode_jpeg_lossless_arith

    img = _rgb(71)
    for dc_l, dc_u in [(1, 3), (0, 4), (2, 2)]:
        b = encode_jpeg_lossless_arith(img, predictor=1, dc_l=dc_l, dc_u=dc_u)
        assert np.array_equal(decode_jpeg(b), img)


def test_lossless_arith_context_adaptation_compresses_smooth_images():
    # a +1/+1 gradient makes every predictor-2 difference tiny, so the
    # zero/small contexts saturate and the QM coder collapses the image
    # to a few dozen bytes — evidence the 25-context model is actually
    # conditioning (a context-blind coder cannot reach this rate)
    from geokitten_spark.functions.jpeg_arith import encode_jpeg_lossless_arith

    yy, xx = np.mgrid[0:50, 0:60]
    smooth = ((yy + xx) % 256).astype(np.uint8)
    b = encode_jpeg_lossless_arith(smooth, predictor=7)
    assert np.array_equal(decode_jpeg(b), np.repeat(smooth[:, :, None], 3, axis=2))
    assert len(b) < smooth.size // 20


def test_lossless_arith_determinism():
    from geokitten_spark.functions.jpeg_arith import encode_jpeg_lossless_arith

    img = _rgb(83)
    assert encode_jpeg_lossless_arith(img, 3) == encode_jpeg_lossless_arith(img, 3)


# --- progressive arithmetic (SOF10, Annex G.2 model) ------------------------


def _lowfreq(seed, h=29, w=37):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (-(-h // 8), -(-w // 8), 3), dtype=np.uint8)
    return np.repeat(np.repeat(base, 8, axis=0), 8, axis=1)[:h, :w]


@pytest.mark.parametrize("sub", ["4:4:4", "4:2:0"])
@pytest.mark.parametrize("q", [50, 90])
def test_progressive_arith_pixel_parity_all_four_lanes(sub, q):
    """One image, four entropy/scan layouts over IDENTICAL quantized
    coefficients — (huffman|arithmetic) x (sequential|progressive) —
    must decode to the SAME pixels."""
    from geokitten_spark.functions.jpeg import encode_jpeg_progressive
    from geokitten_spark.functions.jpeg_arith import (
        encode_jpeg_arith_progressive,
    )

    img = _lowfreq(300 + q)
    ref = decode_jpeg(encode_jpeg(img, quality=q, subsampling=sub))
    for enc in (encode_jpeg_progressive, encode_jpeg_arith,
                encode_jpeg_arith_progressive):
        assert np.array_equal(
            decode_jpeg(enc(img, quality=q, subsampling=sub)), ref
        ), enc.__name__


def test_progressive_arith_stream_structure():
    from geokitten_spark.functions.jpeg_arith import (
        encode_jpeg_arith_progressive,
    )

    b = encode_jpeg_arith_progressive(_lowfreq(7), quality=80)
    assert b"\xff\xca" in b  # SOF10
    assert b"\xff\xcc" in b  # DAC
    assert b"\xff\xc4" not in b  # no huffman tables
    assert b.count(b"\xff\xda") == 10  # the 10-scan script


def test_progressive_arith_restart_intervals():
    from geokitten_spark.functions.jpeg_arith import (
        encode_jpeg_arith_progressive,
    )

    img = _lowfreq(44, h=41, w=53)
    ref = decode_jpeg(encode_jpeg(img, quality=75))
    b = encode_jpeg_arith_progressive(img, quality=75, restart_interval=3)
    assert b"\xff\xd0" in b  # RST0 actually emitted
    assert np.array_equal(decode_jpeg(b), ref)


def test_progressive_arith_non_default_conditioning():
    from geokitten_spark.functions.jpeg_arith import (
        encode_jpeg_arith_progressive,
    )

    img = _lowfreq(45)
    ref = decode_jpeg(encode_jpeg(img, quality=70))
    b = encode_jpeg_arith_progressive(img, quality=70, dc_l=1, dc_u=3, ac_kx=9)
    assert np.array_equal(decode_jpeg(b), ref)


def test_progressive_arith_determinism():
    from geokitten_spark.functions.jpeg_arith import (
        encode_jpeg_arith_progressive,
    )

    img = _lowfreq(46)
    assert encode_jpeg_arith_progressive(img) == encode_jpeg_arith_progressive(img)


# --- hierarchical arithmetic (SOF9 base + SOF13 differential) ---------------


def test_hierarchical_arith_pixel_parity_with_huffman_pyramid():
    """The arithmetic pyramid shares every quantize/EXP/reconstruct step
    with the huffman one — entropy coding is the ONLY difference, so the
    decoded pixels must be identical."""
    from geokitten_spark.functions.jpeg import encode_jpeg_hierarchical

    rng = np.random.default_rng(60)
    base = rng.integers(0, 256, (5, 6), dtype=np.uint8)
    gray = np.repeat(np.repeat(base, 8, axis=0), 8, axis=1)[:37, :45]
    hb = encode_jpeg_hierarchical(gray, quality=85, levels=2)
    ab = encode_jpeg_hierarchical(gray, quality=85, levels=2, arithmetic=True)
    assert b"\xff\xc9" in ab and b"\xff\xcd" in ab  # SOF9 base + SOF13 diff
    assert b"\xff\xcc" in ab and b"\xff\xc4" not in ab
    assert ab[2:4] == b"\xff\xde"  # DHP leads
    assert np.array_equal(decode_jpeg(ab), decode_jpeg(hb))


def test_hierarchical_arith_single_level_and_odd_dims():
    from geokitten_spark.functions.jpeg import encode_jpeg_hierarchical

    rng = np.random.default_rng(61)
    base = rng.integers(0, 256, (4, 4), dtype=np.uint8)
    gray = np.repeat(np.repeat(base, 8, axis=0), 8, axis=1)[:27, :31]
    hb = encode_jpeg_hierarchical(gray, quality=90, levels=1)
    ab = encode_jpeg_hierarchical(gray, quality=90, levels=1, arithmetic=True)
    assert np.array_equal(decode_jpeg(ab), decode_jpeg(hb))


def test_differential_frame_outside_hierarchical_still_raises():
    from geokitten_spark.functions.jpeg import encode_jpeg_hierarchical

    gray = np.full((16, 16), 128, dtype=np.uint8)
    b = bytearray(encode_jpeg_hierarchical(gray, arithmetic=True))
    # strip the DHP segment: the SOF13 frame now appears in a plain
    # (non-hierarchical) stream, which T.81 forbids and decode rejects
    assert b[2:4] == b"\xff\xde"
    (dhp_len,) = __import__("struct").unpack(">H", bytes(b[4:6]))
    del b[2 : 4 + dhp_len]
    with pytest.raises(NotImplementedError, match="differential frame"):
        decode_jpeg(bytes(b))


# --- differential progressive / lossless pyramid stages (SOF6/7/14/15) ------


@pytest.mark.parametrize("arith", [False, True])
@pytest.mark.parametrize("prog", [False, True])
def test_hierarchical_all_differential_processes_pixel_parity(arith, prog):
    """The four DCT-stage entropy layouts — (huffman|arithmetic) x
    (sequential|progressive) differential frames — share every
    quantize/EXP/reconstruct step, so all must decode to the SAME
    pixels as the huffman-sequential pyramid."""
    from geokitten_spark.functions.jpeg import encode_jpeg_hierarchical

    rng = np.random.default_rng(88)
    gray = rng.integers(0, 256, (37, 45), dtype=np.uint8)  # full noise
    ref = decode_jpeg(encode_jpeg_hierarchical(gray, quality=85, levels=2))
    b = encode_jpeg_hierarchical(gray, quality=85, levels=2,
                                 arithmetic=arith, progressive_diff=prog)
    if prog:
        assert (b"\xff\xce" if arith else b"\xff\xc6") in b
    assert np.array_equal(decode_jpeg(b), ref)


@pytest.mark.parametrize("arith", [False, True])
@pytest.mark.parametrize("prog", [False, True])
def test_hierarchical_final_lossless_reconstructs_exactly(arith, prog):
    """A pyramid ending in a zero-prediction lossless differential frame
    (SOF7 huffman / SOF15 arithmetic, mod-2^16 corrections per J.1.5)
    reconstructs the ORIGINAL samples bit-for-bit — the progressive-to-
    lossless mode Annex J exists for."""
    from geokitten_spark.functions.jpeg import encode_jpeg_hierarchical

    rng = np.random.default_rng(89)
    gray = rng.integers(0, 256, (29, 41), dtype=np.uint8)
    b = encode_jpeg_hierarchical(gray, quality=60, levels=2, arithmetic=arith,
                                 progressive_diff=prog, final_lossless=True)
    assert (b"\xff\xcf" if arith else b"\xff\xc7") in b
    assert np.array_equal(decode_jpeg(b), np.repeat(gray[:, :, None], 3, axis=2))


def test_hierarchical_lossless_base_frame_still_raises():
    from geokitten_spark.functions.jpeg import encode_jpeg_hierarchical

    gray = np.full((16, 16), 128, dtype=np.uint8)
    b = bytearray(encode_jpeg_hierarchical(gray))
    idx = bytes(b).find(b"\xff\xc0")  # base frame -> SOF3 (lossless base)
    assert idx > 0
    b[idx + 1] = 0xC3
    with pytest.raises(NotImplementedError, match="lossless"):
        decode_jpeg(bytes(b))
