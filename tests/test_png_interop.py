"""Third-party interop for the PNG codec against libpng16.

PNG is lossless, so every check is exact byte equality:

* ours -> libpng: libpng must decode every encoder variant
  (encode_png / encode_png_adam7 / encode_png16 / encode_png_palette)
  back to the original pixels — it also independently verifies our CRCs
  and zlib streams.
* libpng -> ours: decode_png must read libpng-written files across the
  color-type/depth/interlace matrix (libpng's adaptive filtering
  exercises all five scanline filters) and apply the same conventions
  (palette resolved, gray replicated, alpha DROPPED not composited,
  16-bit reduced to the high byte, sub-byte gray bit-replicated).

The shim (tests/interop/png_interop.c) is compiled at session start and
skips cleanly where gcc or libpng headers are absent.
"""

import shutil
import subprocess

import numpy as np
import pytest

from geokitten_spark.functions.multimodal import (
    decode_png,
    encode_png,
    encode_png16,
    encode_png_adam7,
    encode_png_palette,
)

SRC = __file__.rsplit("/", 1)[0] + "/interop/png_interop.c"


@pytest.fixture(scope="module")
def shim(tmp_path_factory):
    gcc = shutil.which("gcc") or shutil.which("cc")
    if gcc is None:
        pytest.skip("no C compiler in this environment")
    exe = tmp_path_factory.mktemp("png_interop") / "png_shim"
    r = subprocess.run(
        [gcc, "-O2", "-o", str(exe), SRC, "-lpng"],
        capture_output=True,
        text=True,
    )
    if r.returncode != 0:
        pytest.skip(f"libpng unavailable ({r.stderr.strip()[:200]})")
    return str(exe)


def _img(seed: int, h: int = 37, w: int = 53, ch: int = 3) -> np.ndarray:
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((yy * 5 + xx * 3) % 256)[:, :, None]
    noise = rng.integers(0, 256, size=(h, w, ch))
    img = ((base + noise) % 256).astype(np.uint8)
    return img[:, :, 0] if ch == 1 else img


def _write_ppm(path, img: np.ndarray) -> None:
    magic = "P5" if img.ndim == 2 else "P6"
    with open(path, "wb") as f:
        f.write(f"{magic}\n{img.shape[1]} {img.shape[0]}\n255\n".encode())
        f.write(img.tobytes())


def _shim_decode(shim, tmp_path, payload: bytes, tag: str) -> np.ndarray:
    png = tmp_path / f"{tag}.png"
    ppm = tmp_path / f"{tag}.ppm"
    png.write_bytes(payload)
    subprocess.run([shim, "decode", str(png), str(ppm)], check=True)
    data = ppm.read_bytes()
    magic, dims, maxval, payload = data.split(b"\n", 3)
    assert magic == b"P6" and maxval == b"255"
    w, h = (int(t) for t in dims.split())
    return np.frombuffer(payload, dtype=np.uint8).reshape(h, w, 3)


def _shim_encode(shim, tmp_path, img: np.ndarray, tag: str,
                 color: int, depth: int = 8, interlace: int = 0) -> bytes:
    ppm = tmp_path / f"{tag}.ppm"
    png = tmp_path / f"{tag}.png"
    _write_ppm(ppm, img)
    subprocess.run(
        [shim, "encode", str(ppm), str(png), str(color), str(depth), str(interlace)],
        check=True,
    )
    return png.read_bytes()


def _rgb(img: np.ndarray) -> np.ndarray:
    """Expected decode_png output for an input image: HxWx3."""
    if img.ndim == 2:
        return np.repeat(img[:, :, None], 3, axis=2)
    return img[:, :, :3]


# --------------------------------------------------------------------------
# Lane A: OUR encoders -> libpng.  Exact pixel recovery, third-party CRC and
# zlib verification included for free.
# --------------------------------------------------------------------------

def test_libpng_reads_our_rgb_and_gray(shim, tmp_path):
    for tag, img in [("rgb", _img(1)), ("gray", _img(2, ch=1))]:
        out = _shim_decode(shim, tmp_path, encode_png(img), f"a_{tag}")
        assert np.array_equal(out, _rgb(img))


def test_libpng_reads_our_rgba_alpha_dropped(shim, tmp_path):
    rng = np.random.default_rng(3)
    rgba = rng.integers(0, 256, size=(23, 31, 4)).astype(np.uint8)
    out = _shim_decode(shim, tmp_path, encode_png(rgba), "a_rgba")
    assert np.array_equal(out, rgba[:, :, :3])


def test_libpng_reads_our_adam7(shim, tmp_path):
    img = _img(4, h=41, w=29)  # odd dims: ragged interlace passes
    out = _shim_decode(shim, tmp_path, encode_png_adam7(img), "a_adam7")
    assert np.array_equal(out, img)


def test_libpng_reads_our_16bit(shim, tmp_path):
    img = _img(5)
    out = _shim_decode(shim, tmp_path, encode_png16(img), "a_16")
    assert np.array_equal(out, img)  # v<<8|v, high-byte reduction both sides


@pytest.mark.parametrize("depth", [8, 4, 2, 1])
def test_libpng_reads_our_palette(shim, tmp_path, depth):
    rng = np.random.default_rng(depth)
    n_colors = 1 << depth
    palette = rng.integers(0, 256, size=(n_colors, 3)).astype(np.uint8)
    idx = rng.integers(0, n_colors, size=(19, 27)).astype(np.uint8)
    out = _shim_decode(
        shim, tmp_path, encode_png_palette(idx, palette, depth=depth), f"a_pal{depth}"
    )
    assert np.array_equal(out, palette[idx])


# --------------------------------------------------------------------------
# Lane B: libpng writer -> OUR decoder.  libpng's adaptive per-row filter
# choice exercises all five defilter paths; the matrix covers every
# color-type family the decoder claims.
# --------------------------------------------------------------------------

@pytest.mark.parametrize(
    "color,depth,interlace,gray",
    [
        (2, 8, 0, False),   # RGB8
        (2, 8, 1, False),   # RGB8 Adam7
        (2, 16, 0, False),  # RGB16
        (0, 8, 0, True),    # gray8
        (0, 16, 0, True),   # gray16
        (0, 8, 1, True),    # gray8 Adam7
        (3, 8, 0, False),   # palette
        (3, 8, 1, False),   # palette Adam7
        (6, 8, 0, False),   # RGBA, varying alpha
        (6, 16, 0, False),  # RGBA16
        (4, 8, 0, True),    # gray+alpha
        (4, 16, 0, True),   # gray+alpha 16
        (6, 8, 1, False),   # RGBA Adam7
    ],
)
def test_our_decoder_reads_libpng(shim, tmp_path, color, depth, interlace, gray):
    if color == 3:
        # palette needs <=256 unique colors: quantize channels to 6 levels
        img = (_img(20) // 43 * 43).astype(np.uint8)
    else:
        img = _img(21, ch=1) if gray else _img(22)
    tag = f"b_{color}_{depth}_{interlace}"
    stream = _shim_encode(shim, tmp_path, img, tag, color, depth, interlace)
    assert np.array_equal(decode_png(stream), _rgb(img))


@pytest.mark.parametrize("depth", [4, 2, 1])
def test_our_decoder_reads_libpng_subbyte_gray(shim, tmp_path, depth):
    # values at exact bit-replication points so shift+expand is lossless
    step = 255 // ((1 << depth) - 1)
    rng = np.random.default_rng(depth + 30)
    img = (rng.integers(0, 1 << depth, size=(17, 26)) * step).astype(np.uint8)
    stream = _shim_encode(shim, tmp_path, img, f"b_sub{depth}", 0, depth, 0)
    assert np.array_equal(decode_png(stream), _rgb(img))


def test_cross_decode_agreement_on_libpng_stream(shim, tmp_path):
    # Same third-party stream through both decoders -> identical output
    # (ties the two normalization conventions together end-to-end).
    img = _img(40)
    stream = _shim_encode(shim, tmp_path, img, "agree", 2, 8, 1)
    assert np.array_equal(decode_png(stream), _shim_decode(shim, tmp_path, stream, "agree_rd"))


def test_libpng_reads_raster_heat_tile(shim, tmp_path):
    """The raster tile sink's blobs (viz/raster.py) are served to map
    clients — a third-party decoder must read them exactly. libpng
    re-verifies the CRCs/zlib stream and the gray ramp pixels."""
    from geokitten_spark.viz.raster import render_heat_tile

    blob = render_heat_tile([0, 5, 130, 130], [2, 1, 1, 2], 16)
    out = _shim_decode(shim, tmp_path, blob, "raster_tile")
    ours = decode_png(blob)
    assert np.array_equal(out, np.repeat(ours, 3, axis=2) if ours.shape[2] == 1 else ours)
    flat = out[:, :, 0].reshape(-1)
    # pixel 130 sums its two entries to 3 = the tile max -> 255;
    # count 2 -> 55 + 400//3 = 188; count 1 -> 55 + 200//3 = 121
    assert flat[130] == 255 and flat[0] == 188 and flat[5] == 121
    assert (flat > 0).sum() == 3
