"""Third-party interop for the arithmetic-coded JPEG lanes (ADVICE #5).

The container ships libjpeg-turbo (with C/D_ARITH_CODING_SUPPORTED) and
gcc, so the arithmetic entropy layer can finally be validated against an
independent codec instead of only self-roundtrips.  A tiny CLI shim
(tests/interop/jpeg_interop.c) is compiled at session start; every check
below is exact (byte equality), built on the fact that the entropy layer
is LOSSLESS over the quantized coefficients:

* ours -> libjpeg: our huffman and arithmetic encoders share one
  quantization pipeline, so libjpeg's decode of both streams must be
  byte-identical.  If our arithmetic bitstream deviated from T.81 in any
  way libjpeg notices, it errors or the pixels differ.
* libjpeg -> ours: libjpeg encodes the same pixels twice (arith_code
  on/off, otherwise identical settings); our decodes of both streams
  must be byte-identical.  The huffman lane is already golden-tested, so
  this pins our arithmetic DECODER to a third-party ENCODER.

Sequential (SOF9) and progressive (SOF10) lanes, 4:4:4 / 4:2:0, custom
DAC conditioning, and restart markers are covered.  Lossless (SOF11) and
hierarchical (SOF13-15) arithmetic frames stay self/huffman-parity
tested: libjpeg-turbo 2.x implements neither, and no container library
does — but they reuse the same QM coder core validated here.
"""

import shutil
import subprocess

import numpy as np
import pytest

from geokitten_spark.functions.jpeg import (
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
)
from geokitten_spark.functions.jpeg_arith import (
    encode_jpeg_arith,
    encode_jpeg_arith_progressive,
)

SRC = __file__.rsplit("/", 1)[0] + "/interop/jpeg_interop.c"


@pytest.fixture(scope="module")
def shim(tmp_path_factory):
    gcc = shutil.which("gcc") or shutil.which("cc")
    if gcc is None:
        pytest.skip("no C compiler in this environment")
    exe = tmp_path_factory.mktemp("jpeg_interop") / "jpeg_shim"
    r = subprocess.run(
        [gcc, "-O2", "-o", str(exe), SRC, "-ljpeg"],
        capture_output=True,
        text=True,
    )
    if r.returncode != 0:
        pytest.skip(f"libjpeg unavailable ({r.stderr.strip()[:200]})")
    return str(exe)


def _img(seed: int, h: int = 41, w: int = 57, gray: bool = False) -> np.ndarray:
    """Deterministic gradient + texture; odd dims exercise edge padding."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (yy * 3 + xx * 2) % 256
    tex = rng.integers(0, 48, size=(h, w))
    if gray:
        return ((base + tex) % 256).astype(np.uint8)
    chans = [(base + tex) % 256, (255 - base + tex) % 256, (base // 2 + tex * 2) % 256]
    return np.stack(chans, axis=2).astype(np.uint8)


def _write_ppm(path, img: np.ndarray) -> None:
    if img.ndim == 2:
        header = f"P5\n{img.shape[1]} {img.shape[0]}\n255\n"
    else:
        header = f"P6\n{img.shape[1]} {img.shape[0]}\n255\n"
    with open(path, "wb") as f:
        f.write(header.encode())
        f.write(img.tobytes())


def _read_ppm(path) -> np.ndarray:
    with open(path, "rb") as f:
        data = f.read()
    parts = data.split(b"\n", 3)
    magic, dims, maxval, payload = parts[0], parts[1], parts[2], parts[3]
    w, h = (int(t) for t in dims.split())
    assert maxval == b"255"
    arr = np.frombuffer(payload, dtype=np.uint8)
    return arr.reshape(h, w) if magic == b"P5" else arr.reshape(h, w, 3)


def _shim_decode(shim, tmp_path, payload: bytes, tag: str) -> bytes:
    jpg = tmp_path / f"{tag}.jpg"
    ppm = tmp_path / f"{tag}.ppm"
    jpg.write_bytes(payload)
    subprocess.run([shim, "decode", str(jpg), str(ppm)], check=True)
    return ppm.read_bytes()


def _shim_encode(
    shim, tmp_path, img: np.ndarray, tag: str,
    quality: int, arith: bool, progressive: bool = False,
    samp: int = 1, restart: int = 0,
) -> bytes:
    ppm = tmp_path / f"{tag}.ppm"
    jpg = tmp_path / f"{tag}.jpg"
    _write_ppm(ppm, img)
    subprocess.run(
        [shim, "encode", str(ppm), str(jpg), str(quality),
         str(int(arith)), str(int(progressive)), str(samp), str(restart)],
        check=True,
    )
    return jpg.read_bytes()


def _sof_marker(payload: bytes) -> int:
    i = 2
    while i + 4 <= len(payload):
        assert payload[i] == 0xFF
        marker = payload[i + 1]
        if marker in (0xC0, 0xC1, 0xC2, 0xC9, 0xCA):
            return marker
        seg_len = int.from_bytes(payload[i + 2:i + 4], "big")
        i += 2 + seg_len
    raise AssertionError("no SOF marker found")


# --------------------------------------------------------------------------
# Lane A: OUR encoders -> libjpeg decoder.  Huffman and arithmetic encoders
# share one quantization pipeline, so a third-party decode of both streams
# must be byte-identical.
# --------------------------------------------------------------------------

@pytest.mark.parametrize(
    "quality,subsampling,seed",
    [(90, "4:4:4", 1), (75, "4:2:0", 2), (50, "4:4:4", 3)],
)
def test_libjpeg_decodes_our_sequential_arith(shim, tmp_path, quality, subsampling, seed):
    img = _img(seed)
    huff = encode_jpeg(img, quality=quality, subsampling=subsampling)
    arith = encode_jpeg_arith(img, quality=quality, subsampling=subsampling)
    assert _sof_marker(arith) == 0xC9  # SOF9: sequential arithmetic
    out_h = _shim_decode(shim, tmp_path, huff, "a_huff")
    out_a = _shim_decode(shim, tmp_path, arith, "a_arith")
    assert out_a == out_h


def test_libjpeg_decodes_our_gray_arith(shim, tmp_path):
    img = _img(4, gray=True)
    huff = encode_jpeg(img, quality=85)
    arith = encode_jpeg_arith(img, quality=85)
    assert _shim_decode(shim, tmp_path, arith, "g_arith") == _shim_decode(
        shim, tmp_path, huff, "g_huff"
    )


def test_libjpeg_decodes_our_nondefault_conditioning(shim, tmp_path):
    # Non-default DAC bounds (L=1, U=2, Kx=9): libjpeg must honour the DAC
    # segment, proving our conditioning is carried in-band, not implied.
    img = _img(5)
    huff = encode_jpeg(img, quality=80)
    arith = encode_jpeg_arith(img, quality=80, dc_l=1, dc_u=2, ac_kx=9)
    assert _shim_decode(shim, tmp_path, arith, "c_arith") == _shim_decode(
        shim, tmp_path, huff, "c_huff"
    )


@pytest.mark.parametrize("restart", [0, 3])
def test_libjpeg_decodes_our_progressive_arith(shim, tmp_path, restart):
    # SOF10 with the 10-scan successive-approximation script; progressive
    # reorders the same coefficients, so the full decode still equals the
    # sequential huffman lane's.
    img = _img(6)
    huff = encode_jpeg(img, quality=90)
    arith = encode_jpeg_arith_progressive(img, quality=90, restart_interval=restart)
    assert _sof_marker(arith) == 0xCA  # SOF10: progressive arithmetic
    assert _shim_decode(shim, tmp_path, arith, f"p_arith_{restart}") == _shim_decode(
        shim, tmp_path, huff, "p_huff"
    )


def test_libjpeg_decodes_our_progressive_huffman(shim, tmp_path):
    # Control for the progressive lane: our SOF2 must match too, otherwise
    # the SOF10 test above could pass via compensating progressive bugs.
    img = _img(7)
    seq = encode_jpeg(img, quality=90)
    prog = encode_jpeg_progressive(img, quality=90)
    assert _shim_decode(shim, tmp_path, prog, "ph_prog") == _shim_decode(
        shim, tmp_path, seq, "ph_seq"
    )


# --------------------------------------------------------------------------
# Lane B: libjpeg encoder -> OUR decoder.  libjpeg encodes the same pixels
# with arith_code on/off; our decodes must be byte-identical (the huffman
# lane is independently golden-tested).
# --------------------------------------------------------------------------

@pytest.mark.parametrize(
    "quality,samp,seed", [(90, 1, 11), (80, 2, 12)],
)
def test_our_decoder_reads_libjpeg_sequential_arith(shim, tmp_path, quality, samp, seed):
    img = _img(seed)
    huff = _shim_encode(shim, tmp_path, img, "b_huff", quality, arith=False, samp=samp)
    arith = _shim_encode(shim, tmp_path, img, "b_arith", quality, arith=True, samp=samp)
    assert _sof_marker(arith) == 0xC9
    assert np.array_equal(decode_jpeg(arith), decode_jpeg(huff))


def test_our_decoder_reads_libjpeg_progressive_arith(shim, tmp_path):
    img = _img(13)
    huff = _shim_encode(shim, tmp_path, img, "bp_huff", 90, arith=False)
    arith = _shim_encode(shim, tmp_path, img, "bp_arith", 90, arith=True, progressive=True)
    assert _sof_marker(arith) == 0xCA
    assert np.array_equal(decode_jpeg(arith), decode_jpeg(huff))


def test_our_decoder_reads_libjpeg_arith_with_restarts(shim, tmp_path):
    # Restart markers reset the QM coder and DC predictions mid-scan but
    # leave the coefficients unchanged.
    img = _img(14)
    huff = _shim_encode(shim, tmp_path, img, "br_huff", 85, arith=False)
    arith = _shim_encode(
        shim, tmp_path, img, "br_arith", 85, arith=True, restart=2
    )
    assert np.array_equal(decode_jpeg(arith), decode_jpeg(huff))


def test_our_decoder_reads_libjpeg_gray_arith(shim, tmp_path):
    img = _img(15, gray=True)
    huff = _shim_encode(shim, tmp_path, img, "bg_huff", 90, arith=False)
    arith = _shim_encode(shim, tmp_path, img, "bg_arith", 90, arith=True)
    assert np.array_equal(decode_jpeg(arith), decode_jpeg(huff))


# --------------------------------------------------------------------------
# Absolute pixel tie: our decode of a libjpeg stream vs libjpeg's own
# decode of the same stream.  IDCT and YCbCr->RGB rounding legitimately
# differ by a couple of LSBs (T.81 only bounds decoder drift), so this one
# check is a tolerance, not equality — it guards against a decoder that is
# self-consistent across entropy lanes yet semantically wrong.
# --------------------------------------------------------------------------

def test_pixel_semantics_match_libjpeg(shim, tmp_path):
    img = _img(16)
    stream = _shim_encode(shim, tmp_path, img, "tie", 90, arith=True, samp=1)
    ours = decode_jpeg(stream).astype(np.int32)
    theirs = _read_ppm(_shim_decode_to_path(shim, tmp_path, stream, "tie_out")).astype(np.int32)
    assert ours.shape == theirs.shape
    diff = np.abs(ours - theirs)
    assert diff.max() <= 4, f"max pixel diff {diff.max()}"
    assert diff.mean() <= 1.0, f"mean pixel diff {diff.mean():.3f}"


def _shim_decode_to_path(shim, tmp_path, payload: bytes, tag: str):
    jpg = tmp_path / f"{tag}.jpg"
    ppm = tmp_path / f"{tag}.ppm"
    jpg.write_bytes(payload)
    subprocess.run([shim, "decode", str(jpg), str(ppm)], check=True)
    return ppm
