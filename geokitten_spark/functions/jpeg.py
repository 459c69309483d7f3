"""JPEG codec in pure numpy + stdlib (no Pillow, no native libs):
baseline sequential AND progressive (T.81 Annex G).

Round 2 closed the baseline-sequential decode gap; round 4 adds
progressive (SOF2) — the second most common real-web JPEG variant
(photo sites ship it heavily), previously a clean
``NotImplementedError``.

Scope (ITU-T T.81):

* **decode_jpeg** — marker walk (APPn/COM skipped, DQT 8/16-bit,
  SOF0/1/2, DHT, DRI, multi-SOS), huffman entropy decode with
  restart-marker handling, dequantize, batched 8x8 IDCT (one einsum per
  component), integer-ratio chroma upsampling (4:4:4, 4:2:2, 4:2:0),
  BT.601 YCbCr->RGB. Progressive streams decode through all four scan
  kinds of Annex G — DC first/refine (interleaved or not), AC
  first/refine with EOB-run coding, spectral selection + successive
  approximation — accumulating coefficients across scans before one
  shared IDCT. Huffman/quant tables are read FROM THE STREAM, so
  third-party JPEGs decode with their own tables. 12-bit sample
  precision decodes (level shift 2048, 255/4095 output reduction).
  Lossless (SOF3 huffman AND SOF11 arithmetic, Annex H) decodes:
  predictive sample reconstruction modulo 2^16 with predictors 1-7,
  point transform, restart reset, any precision 2-16 — no DCT, no
  color transform, pixel-EXACT roundtrip.
  Hierarchical (Annex J) decodes for single-component pyramids: DHP,
  EXP reference doubling (the (a+b+1)>>1 interleave filter),
  sequential or progressive base frames, and differential frames of
  EVERY process — sequential (SOF5/13), progressive (SOF6/14), and
  zero-prediction mod-2^16 lossless (SOF7/15, the progressive-to-
  lossless pyramid: the stream reconstructs the input EXACTLY).
  Progressive arithmetic (SOF10, Annex G.2) decodes via the same QM
  coder (``jpeg_arith.py``, as do SOF9/11/13/14/15). Every frame type
  of T.81 therefore decodes in its legal position; the only guards
  left are differential frames OUTSIDE a hierarchical stream and
  non-differential lossless BASE frames inside one (both illegal or
  pointless per the standard).
* **encode_jpeg** — baseline with the published Annex K tables (IJG
  quality scaling); 4:4:4 or 4:2:0; optional restart intervals.
* **encode_jpeg_progressive** — the standard 10-scan
  successive-approximation script, built to manufacture REAL
  progressive fixtures in a container with no external codec; it
  produces the same quantized coefficients as encode_jpeg, so
  progressive and baseline streams of one image must decode to
  IDENTICAL pixels (the roundtrip test's exact-equality oracle).

Determinism: all directions are pure functions of their inputs — no
dithering, no platform-dependent IDCT variant — so oracle runs
reproduce bit-exactly anywhere.

Scale note: this is the correctness-complete fallback kernel for the
``mapInPandas`` media path. Entropy coding is per-symbol Python (fine
for fixtures and small thumbnails); a production cluster would install
an Arrow-friendly codec and the dispatch in ``multimodal._decode``
stays the same.

Verification without external codecs (tests/test_jpeg.py): the DCT is
cross-checked against a direct O(N^4) transcription of the T.81
definition; the quantization path against the widely published worked
example (DC = -415.37 -> -26 with the Annex K luminance table);
encode->decode roundtrips bound PSNR; restart/no-restart bitstreams
decode identically; uniform images roundtrip exactly; progressive
streams decode pixel-identical to their baseline twins.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "encode_jpeg",
    "encode_jpeg_progressive",
    "encode_jpeg_lossless",
    "decode_jpeg",
    "QUANT_LUMA",
    "QUANT_CHROMA",
]

# ---------------------------------------------------------------------------
# constants: zigzag (generated, not transcribed), Annex K tables
# ---------------------------------------------------------------------------


def _zigzag_order() -> np.ndarray:
    """Natural index of the k-th zigzag element, derived from the
    diagonal-walk definition (generated to avoid transcription risk)."""
    order = []
    for d in range(15):
        rng = range(max(0, d - 7), min(d, 7) + 1)
        for i in (reversed(rng) if d % 2 else rng):
            order.append((d - i) * 8 + i)  # row-major natural index
    return np.array(order, dtype=np.int64)


ZIGZAG = _zigzag_order()  # zigzag k -> natural index

# ITU-T T.81 Annex K.1/K.2 example quantization tables (the de-facto
# standard "quality 50" tables every JPEG tool ships).
QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)
QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int64,
)

# Annex K.3.3.1/.2 "typical" huffman tables: (BITS[1..16], HUFFVAL).
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

STD_TABLES = {
    (0, 0): (_DC_LUMA_BITS, _DC_LUMA_VALS),     # (class DC, id 0)
    (0, 1): (_DC_CHROMA_BITS, _DC_CHROMA_VALS),
    (1, 0): (_AC_LUMA_BITS, _AC_LUMA_VALS),     # (class AC, id 0)
    (1, 1): (_AC_CHROMA_BITS, _AC_CHROMA_VALS),
}


# ---------------------------------------------------------------------------
# DCT: orthonormal separable 8x8 (exactly the T.81 A.3.3 transform)
# ---------------------------------------------------------------------------

def _dct_matrix() -> np.ndarray:
    """Orthonormal DCT-II basis C with C[u, x] = a(u) cos((2x+1)u pi/16);
    FDCT(B) = C B C^T reproduces T.81's F(u,v) including the 1/4 a(u)a(v)
    scaling (a(0)=1/sqrt(8), else sqrt(2/8))."""
    u = np.arange(8)[:, None]
    x = np.arange(8)[None, :]
    c = np.cos((2 * x + 1) * u * np.pi / 16) * np.sqrt(2.0 / 8.0)
    c[0] = np.sqrt(1.0 / 8.0)
    return c


_C = _dct_matrix()


def fdct_blocks(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) spatial (level-shifted) -> (n, 8, 8) DCT coefficients."""
    return np.einsum("ux,nxy,vy->nuv", _C, blocks, _C, optimize=True)


def idct_blocks(coefs: np.ndarray) -> np.ndarray:
    """(n, 8, 8) DCT coefficients -> (n, 8, 8) spatial samples."""
    return np.einsum("ux,nuv,vy->nxy", _C, coefs, _C, optimize=True)


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling of an Annex K table (quality 1..100)."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    tbl = (base * scale + 50) // 100
    return np.clip(tbl, 1, 255).astype(np.int64)


# ---------------------------------------------------------------------------
# huffman code construction (spec C.2: canonical codes from BITS/HUFFVAL)
# ---------------------------------------------------------------------------

def _build_encode_table(bits: list, values: list) -> dict:
    """symbol -> (code, length)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def _build_decode_table(bits: list, values: list) -> dict:
    """(length, code) -> symbol."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


# ---------------------------------------------------------------------------
# bit I/O
# ---------------------------------------------------------------------------

class _BitWriter:
    """MSB-first bit accumulator with JPEG 0xFF00 byte stuffing."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def pad_to_byte(self) -> None:
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


class _BitReader:
    """MSB-first reader over UNSTUFFED entropy bytes."""

    __slots__ = ("data", "byte", "bit")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.byte = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.byte >= len(self.data):
            # past the end: spec says pad with 1s (only reachable on the
            # final EOB of a segment)
            return 1
        b = (self.data[self.byte] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.byte += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _decode_symbol(reader: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG huffman code")


def _extend(v: int, size: int) -> int:
    """Spec F.12 EXTEND: map a ``size``-bit magnitude to a signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _category(v: int) -> int:
    """Bit length of |v| (spec: SSSS)."""
    return int(abs(v)).bit_length()


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def _rgb_to_ycbcr(img: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    r = img[:, :, 0].astype(np.float64)
    g = img[:, :, 1].astype(np.float64)
    b = img[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return y, cb, cr


def _pad_edge(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % mult
    pw = (-w) % mult
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _plane_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) with H, W multiples of 8 -> (n, 8, 8) in raster block order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def _encode_block(
    writer: _BitWriter,
    zz: np.ndarray,
    pred: int,
    dc_tbl: dict,
    ac_tbl: dict,
) -> int:
    """Entropy-encode one quantized block given in zigzag order; returns
    the new DC predictor."""
    dc = int(zz[0])
    diff = dc - pred
    s = _category(diff)
    code, length = dc_tbl[s]
    writer.write(code, length)
    if s:
        writer.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_tbl[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        s = _category(v)
        code, length = ac_tbl[(run << 4) | s]
        writer.write(code, length)
        writer.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        code, length = ac_tbl[0x00]  # EOB
        writer.write(code, length)
    return dc


def _dht_segment(tclass: int, tid: int, bits: list, values: list) -> bytes:
    payload = bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(values)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload


def _dqt_segment(tid: int, table: np.ndarray) -> bytes:
    zz = table.reshape(-1)[ZIGZAG]
    payload = bytes([tid]) + bytes(int(x) for x in zz)
    return b"\xff\xdb" + struct.pack(">H", 2 + len(payload)) + payload


def _prepare_components(img: np.ndarray, quality: int, subsampling: str):
    """Shared color-convert / subsample / pad / FDCT / quantize pipeline
    for the sequential and progressive encoders. Returns
    (h, w, sub, qy, qc, zzy, zzcb, zzcr, mcus_x, mcus_y, yb_w) where the
    zz arrays hold zigzag-ordered quantized blocks in raster order."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"expected HxWx3 or HxW uint8, got {img.shape}")
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError("subsampling must be '4:4:4' or '4:2:0'")
    h, w = img.shape[:2]
    sub = 2 if subsampling == "4:2:0" else 1

    qy = _scaled_quant(QUANT_LUMA, quality)
    qc = _scaled_quant(QUANT_CHROMA, quality)

    y, cb, cr = _rgb_to_ycbcr(img)
    if sub == 2:
        cb = _pad_edge(cb, 2)
        cr = _pad_edge(cr, 2)
        cb = (cb[0::2, 0::2] + cb[1::2, 0::2] + cb[0::2, 1::2] + cb[1::2, 1::2]) / 4.0
        cr = (cr[0::2, 0::2] + cr[1::2, 0::2] + cr[0::2, 1::2] + cr[1::2, 1::2]) / 4.0
    # pad every plane to full MCUs (luma MCU is 8*sub square)
    y = _pad_edge(y, 8 * sub)
    cb = _pad_edge(cb, 8)
    cr = _pad_edge(cr, 8)
    # chroma planes must span the same MCU grid as the luma plane
    if cb.shape != (y.shape[0] // sub, y.shape[1] // sub):
        ph = y.shape[0] // sub - cb.shape[0]
        pw = y.shape[1] // sub - cb.shape[1]
        cb = np.pad(cb, ((0, ph), (0, pw)), mode="edge")
        cr = np.pad(cr, ((0, ph), (0, pw)), mode="edge")

    # quantized zigzag blocks per component, raster block order
    def quantize(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
        blocks = _plane_blocks(plane - 128.0)
        coefs = fdct_blocks(blocks)
        qz = np.round(coefs / qt).astype(np.int64)
        return qz.reshape(-1, 64)[:, ZIGZAG]

    zzy = quantize(y, qy)
    zzcb = quantize(cb, qc)
    zzcr = quantize(cr, qc)
    mcus_x = y.shape[1] // (8 * sub)
    mcus_y = y.shape[0] // (8 * sub)
    yb_w = y.shape[1] // 8
    return h, w, sub, qy, qc, zzy, zzcb, zzcr, mcus_x, mcus_y, yb_w


def encode_jpeg(
    img: np.ndarray,
    quality: int = 90,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """HxWx3 RGB (or HxW gray) uint8 -> baseline JFIF JPEG bytes.

    ``subsampling``: '4:4:4' (no chroma subsampling) or '4:2:0' (2x2).
    ``restart_interval``: emit DRI + RSTn every N MCUs (0 = none).
    Deterministic: same inputs -> same bytes on any platform.
    """
    h, w, sub, qy, qc, zzy, zzcb, zzcr, mcus_x, mcus_y, yb_w = _prepare_components(
        img, quality, subsampling
    )

    dc_y = _build_encode_table(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_y = _build_encode_table(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_c = _build_encode_table(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_c = _build_encode_table(_AC_CHROMA_BITS, _AC_CHROMA_VALS)

    writer = _BitWriter()
    pred = [0, 0, 0]
    rst = 0
    out_scan = bytearray()
    n_mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                writer.pad_to_byte()
                out_scan += writer.buf
                out_scan += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                writer = _BitWriter()
                pred = [0, 0, 0]
            for vy in range(sub):
                for vx in range(sub):
                    bi = (my * sub + vy) * yb_w + (mx * sub + vx)
                    pred[0] = _encode_block(writer, zzy[bi], pred[0], dc_y, ac_y)
            cbi = my * mcus_x + mx
            pred[1] = _encode_block(writer, zzcb[cbi], pred[1], dc_c, ac_c)
            pred[2] = _encode_block(writer, zzcr[cbi], pred[2], dc_c, ac_c)
            n_mcu += 1
    writer.pad_to_byte()
    out_scan += writer.buf

    # --- headers ---
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(
        ">HHBB", 1, 1, 0, 0
    )
    sof_comps = bytes(
        [3, 1, (sub << 4) | sub, 0, 2, 0x11, 1, 3, 0x11, 1]
    )
    sof = b"\xff\xc0" + struct.pack(">HBHH", 8 + 3 * 3, 8, h, w) + sof_comps
    sos = b"\xff\xda" + struct.pack(">HB", 6 + 2 * 3, 3) + bytes(
        [1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]
    )
    dri = (
        b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
        if restart_interval
        else b""
    )
    return (
        b"\xff\xd8"
        + app0
        + _dqt_segment(0, qy)
        + _dqt_segment(1, qc)
        + sof
        + _dht_segment(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
        + _dht_segment(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)
        + _dht_segment(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS)
        + _dht_segment(1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS)
        + dri
        + sos
        + out_scan
        + b"\xff\xd9"
    )


# ---------------------------------------------------------------------------
# 12-bit extended-sequential encoder (SOF1) — fixture source for the
# 12-bit decode lane. Flat canonical huffman tables cover the full
# extended category ranges (DC 0-15 at length 5: Kraft 16/32; AC
# EOB/ZRL + run 0-15 x size 1-14 = 226 symbols at length 8: 226/256) —
# compression is secondary to coverage in a fixture encoder.
# ---------------------------------------------------------------------------

_DC12_BITS = [0, 0, 0, 0, 16] + [0] * 11
_DC12_VALS = list(range(16))
_AC12_VALS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 15)
]
_AC12_BITS = [0] * 16
_AC12_BITS[7] = len(_AC12_VALS)


def encode_jpeg12(img: np.ndarray, quality: int = 90) -> bytes:
    """HxWx3 RGB (or HxW gray) uint8 -> 12-bit extended-sequential JPEG
    (SOF1, 4:4:4). Samples are bit-replicated 8->12 (v*16 + v//16) so
    the decoder's 255/4095 reduction recovers the input up to quant
    error. Deterministic."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"expected HxWx3 or HxW uint8, got {img.shape}")
    h, w = img.shape[:2]
    f = img.astype(np.float64)
    f = f * 16.0 + np.floor(f / 16.0)  # 8->12 bit replication
    r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 2048.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 2048.0

    qy = _scaled_quant(QUANT_LUMA, quality)
    qc = _scaled_quant(QUANT_CHROMA, quality)

    def quant12(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
        blocks = _plane_blocks(_pad_edge(plane, 8) - 2048.0)
        coefs = fdct_blocks(blocks)
        qz = np.round(coefs / qt).astype(np.int64)
        # keep AC inside the size-14 category range the tables cover
        qz = np.clip(qz, -16383, 16383)
        return qz.reshape(-1, 64)[:, ZIGZAG]

    zzy = quant12(y, qy)
    zzcb = quant12(cb, qc)
    zzcr = quant12(cr, qc)

    dc12 = _build_encode_table(_DC12_BITS, _DC12_VALS)
    ac12 = _build_encode_table(_AC12_BITS, _AC12_VALS)
    writer = _BitWriter()
    pred = [0, 0, 0]
    for bi in range(zzy.shape[0]):
        pred[0] = _encode_block(writer, zzy[bi], pred[0], dc12, ac12)
        pred[1] = _encode_block(writer, zzcb[bi], pred[1], dc12, ac12)
        pred[2] = _encode_block(writer, zzcr[bi], pred[2], dc12, ac12)
    writer.pad_to_byte()

    sof_comps = bytes([3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1])
    sof1 = b"\xff\xc1" + struct.pack(">HBHH", 8 + 3 * 3, 12, h, w) + sof_comps
    sos = b"\xff\xda" + struct.pack(">HB", 6 + 2 * 3, 3) + bytes(
        [1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]
    )
    return (
        b"\xff\xd8"
        + _dqt_segment(0, qy)
        + _dqt_segment(1, qc)
        + sof1
        + _dht_segment(0, 0, _DC12_BITS, _DC12_VALS)
        + _dht_segment(1, 0, _AC12_BITS, _AC12_VALS)
        + sos
        + bytes(writer.buf)
        + b"\xff\xd9"
    )


# ---------------------------------------------------------------------------
# progressive encoder (T.81 Annex G: spectral selection + successive
# approximation) — exists chiefly to manufacture REAL progressive streams
# for the decoder's tests in a container with no external codec, so it
# favors one fixed huffman table over per-scan optimization
# ---------------------------------------------------------------------------

# Universal tables covering every symbol the progressive scans can emit:
# DC categories 0..13 (4-bit codes); AC (run<<4|size) for run 0..15 and
# size 1..13, EOBn for runs up to 2^13, and ZRL (all 8-bit codes). Valid
# canonical tables — just not size-optimal, which tests don't care about.
_PROG_DC_VALS = list(range(14))
_PROG_DC_BITS = [0, 0, 0, 14, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_PROG_AC_VALS = sorted(
    {(r << 4) | s for r in range(16) for s in range(1, 14)}
    | {r << 4 for r in range(14)}
    | {0xF0}
)
_PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(_PROG_AC_VALS), 0, 0, 0, 0, 0, 0, 0, 0]


class _ProgState:
    """Per-scan EOB-run + buffered-correction-bit state (jcphuff's
    EOBRUN/BE, re-derived from T.81 G.1.2)."""

    __slots__ = ("eobrun", "bits")

    def __init__(self) -> None:
        self.eobrun = 0
        self.bits: list[int] = []


def _emit_eobrun(writer: _BitWriter, ac_tbl: dict, st: _ProgState) -> None:
    """Flush a pending EOB run (EOBn symbol + run-length bits) followed
    by the correction bits buffered under it."""
    if st.eobrun > 0:
        r = st.eobrun.bit_length() - 1
        code, length = ac_tbl[r << 4]
        writer.write(code, length)
        if r:
            writer.write(st.eobrun - (1 << r), r)
        st.eobrun = 0
    for b in st.bits:
        writer.write(b, 1)
    st.bits = []


def _encode_block_ac_first(writer, zz, ac_tbl, ss, se, al, st: _ProgState):
    """AC first pass: band coefficients at point transform ``al``
    (magnitude shift, truncation toward zero), EOB-run coded."""
    run = 0
    for k in range(ss, se + 1):
        v = int(zz[k])
        t = abs(v) >> al
        if t == 0:
            run += 1
            continue
        _emit_eobrun(writer, ac_tbl, st)
        while run > 15:
            code, length = ac_tbl[0xF0]
            writer.write(code, length)
            run -= 16
        s = t.bit_length()
        code, length = ac_tbl[(run << 4) | s]
        writer.write(code, length)
        writer.write(t if v > 0 else (1 << s) - 1 - t, s)
        run = 0
    if run:
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            _emit_eobrun(writer, ac_tbl, st)


def _encode_block_ac_refine(writer, zz, ac_tbl, ss, se, al, st: _ProgState):
    """AC refinement pass: newly-significant coefficients (shifted
    magnitude == 1) as (run<<4)|1 symbols + sign bit; already-nonzero
    coefficients contribute one buffered correction bit each; trailing
    zero runs fold into the shared EOB run."""
    absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    eob = -1  # band index of the last newly-significant coefficient
    for idx, t in enumerate(absv):
        if t == 1:
            eob = idx
    run = 0
    br: list[int] = []
    for idx, t in enumerate(absv):
        if t == 0:
            run += 1
            continue
        while run > 15 and idx <= eob:
            _emit_eobrun(writer, ac_tbl, st)
            code, length = ac_tbl[0xF0]
            writer.write(code, length)
            run -= 16
            for b in br:
                writer.write(b, 1)
            br = []
        if t > 1:
            br.append(t & 1)
            continue
        _emit_eobrun(writer, ac_tbl, st)
        code, length = ac_tbl[(run << 4) | 1]
        writer.write(code, length)
        writer.write(1 if int(zz[ss + idx]) >= 0 else 0, 1)
        for b in br:
            writer.write(b, 1)
        br = []
        run = 0
    if run > 0 or br:
        st.eobrun += 1
        st.bits.extend(br)
        if st.eobrun == 0x7FFF:
            _emit_eobrun(writer, ac_tbl, st)


def encode_jpeg_progressive(
    img: np.ndarray, quality: int = 90, subsampling: str = "4:4:4"
) -> bytes:
    """HxWx3 RGB (or HxW gray) uint8 -> PROGRESSIVE (SOF2) JPEG bytes.

    Uses the standard 10-scan successive-approximation script (the
    libjpeg default shape): DC first at Al=1 for all components, luma AC
    bands 1-5 / 6-63 at Al=2, chroma AC at Al=1, then one AC luma
    refinement to Al=1, the DC refinement, and final Al=0 refinements
    for every component — so a decoder must exercise all four
    progressive block modes to reconstruct it. Quantized coefficients
    are identical to :func:`encode_jpeg`'s at the same (quality,
    subsampling), so both decode to the same pixels.
    """
    h, w, sub, qy, qc, zzy, zzcb, zzcr, mcus_x, mcus_y, yb_w = _prepare_components(
        img, quality, subsampling
    )
    dc_tbl = _build_encode_table(_PROG_DC_BITS, _PROG_DC_VALS)
    ac_tbl = _build_encode_table(_PROG_AC_BITS, _PROG_AC_VALS)

    zzs = [zzy, zzcb, zzcr]
    strides = [yb_w, mcus_x, mcus_x]
    samp = [(sub, sub), (1, 1), (1, 1)]
    # per-component USED block grid (non-interleaved scans never visit
    # the MCU padding blocks)
    grids = []
    for ch, cv in samp:
        comp_w = -(-w * ch // sub)
        comp_h = -(-h * cv // sub)
        grids.append((-(-comp_w // 8), -(-comp_h // 8)))

    def dc_scan(comp_ids, ah, al):
        writer = _BitWriter()
        pred = {c: 0 for c in comp_ids}
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for c in comp_ids:
                    ch, cv = samp[c]
                    for vy in range(cv):
                        for vx in range(ch):
                            bi = (my * cv + vy) * strides[c] + (mx * ch + vx)
                            dc = int(zzs[c][bi][0])
                            if ah == 0:
                                val = dc >> al  # arithmetic shift (T.81 DC PT)
                                diff = val - pred[c]
                                pred[c] = val
                                s = _category(diff)
                                code, length = dc_tbl[s]
                                writer.write(code, length)
                                if s:
                                    writer.write(
                                        diff if diff > 0 else diff + (1 << s) - 1, s
                                    )
                            else:
                                writer.write((dc >> al) & 1, 1)
        writer.pad_to_byte()
        return bytes(writer.buf)

    def ac_scan(c, ss, se, ah, al):
        writer = _BitWriter()
        st = _ProgState()
        bw, bh = grids[c]
        for by in range(bh):
            for bx in range(bw):
                zz = zzs[c][by * strides[c] + bx]
                if ah == 0:
                    _encode_block_ac_first(writer, zz, ac_tbl, ss, se, al, st)
                else:
                    _encode_block_ac_refine(writer, zz, ac_tbl, ss, se, al, st)
        _emit_eobrun(writer, ac_tbl, st)
        writer.pad_to_byte()
        return bytes(writer.buf)

    def sos(comps_tbls, ss, se, ah, al):
        ns = len(comps_tbls)
        body = bytes([ns])
        for cid, td, ta in comps_tbls:
            body += bytes([cid, (td << 4) | ta])
        body += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body

    # the scan script: (kind, args)
    all_dc = [(1, 0, 0), (2, 0, 0), (3, 0, 0)]
    scans = [
        (sos(all_dc, 0, 0, 0, 1), dc_scan([0, 1, 2], 0, 1)),
        (sos([(1, 0, 0)], 1, 5, 0, 2), ac_scan(0, 1, 5, 0, 2)),
        (sos([(3, 0, 0)], 1, 63, 0, 1), ac_scan(2, 1, 63, 0, 1)),
        (sos([(2, 0, 0)], 1, 63, 0, 1), ac_scan(1, 1, 63, 0, 1)),
        (sos([(1, 0, 0)], 6, 63, 0, 2), ac_scan(0, 6, 63, 0, 2)),
        (sos([(1, 0, 0)], 1, 63, 2, 1), ac_scan(0, 1, 63, 2, 1)),
        (sos(all_dc, 0, 0, 1, 0), dc_scan([0, 1, 2], 1, 0)),
        (sos([(3, 0, 0)], 1, 63, 1, 0), ac_scan(2, 1, 63, 1, 0)),
        (sos([(2, 0, 0)], 1, 63, 1, 0), ac_scan(1, 1, 63, 1, 0)),
        (sos([(1, 0, 0)], 1, 63, 1, 0), ac_scan(0, 1, 63, 1, 0)),
    ]

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(
        ">HHBB", 1, 1, 0, 0
    )
    sof_comps = bytes([3, 1, (sub << 4) | sub, 0, 2, 0x11, 1, 3, 0x11, 1])
    sof = b"\xff\xc2" + struct.pack(">HBHH", 8 + 3 * 3, 8, h, w) + sof_comps
    out = (
        b"\xff\xd8"
        + app0
        + _dqt_segment(0, qy)
        + _dqt_segment(1, qc)
        + sof
        + _dht_segment(0, 0, _PROG_DC_BITS, _PROG_DC_VALS)
        + _dht_segment(1, 0, _PROG_AC_BITS, _PROG_AC_VALS)
    )
    for header, scan_bytes in scans:
        out += header + scan_bytes
    return out + b"\xff\xd9"


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def _split_scan(payload: bytes, start: int) -> tuple[list, int]:
    """Unstuff the entropy-coded scan into restart-delimited segments;
    also returns the offset of the marker that terminated the scan."""
    segments = [bytearray()]
    i = start
    n = len(payload)
    while i < n:
        b = payload[i]
        if b != 0xFF:
            segments[-1].append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = payload[i + 1]
        if m == 0x00:
            segments[-1].append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            segments.append(bytearray())
            i += 2
        else:  # EOI or next marker: scan is over
            break
    return segments, i


def _decode_block_sequential(reader, row, dc_tbl, ac_tbl, pred):
    """Sequential (baseline) block decode into the natural-order store
    row; returns the updated DC predictor."""
    s = _decode_symbol(reader, dc_tbl)
    pred += _extend(reader.read_bits(s), s)
    row[0] = pred
    kk = 1
    while kk < 64:
        rs = _decode_symbol(reader, ac_tbl)
        run, size = rs >> 4, rs & 15
        if size == 0:
            if run == 15:  # ZRL
                kk += 16
                continue
            break  # EOB
        kk += run
        if kk > 63:
            raise ValueError("JPEG AC run past block end")
        row[ZIGZAG[kk]] = _extend(reader.read_bits(size), size)
        kk += 1
    return pred


def _decode_block_ac_first(reader, row, ac_tbl, ss, se, al, eobrun):
    """Progressive AC first pass (T.81 G.1.2.2): band coefficients at
    point transform ``al``, with EOB-run coding; returns the EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_symbol(reader, ac_tbl)
        run, size = rs >> 4, rs & 15
        if size == 0:
            if run < 15:  # EOBn: run of (2^run - 1 + bits) MORE blocks
                eobrun = (1 << run) - 1
                if run:
                    eobrun += reader.read_bits(run)
                break
            k += 16  # ZRL
            continue
        k += run
        if k > se:
            raise ValueError("JPEG AC run past band end")
        row[ZIGZAG[k]] = _extend(reader.read_bits(size), size) << al
        k += 1
    return eobrun


def _decode_block_ac_refine(reader, row, ac_tbl, ss, se, al, eobrun):
    """Progressive AC refinement pass (T.81 G.1.2.3): one more magnitude
    bit per already-nonzero coefficient, plus newly-significant ±2^al
    insertions; returns the EOB run."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _decode_symbol(reader, ac_tbl)
            run, size = rs >> 4, rs & 15
            val = 0
            if size == 0:
                if run < 15:  # EOBn: this block's tail + (eobrun-1) more
                    eobrun = 1 << run
                    if run:
                        eobrun += reader.read_bits(run)
                    break
                # ZRL: skip 16 zero-HISTORY positions (refining along the way)
            else:
                if size != 1:
                    raise ValueError("bad AC refinement symbol")
                val = p1 if reader.read_bit() else m1
            while k <= se:
                z = ZIGZAG[k]
                if row[z] != 0:
                    if reader.read_bit() and (row[z] & p1) == 0:
                        row[z] += p1 if row[z] >= 0 else m1
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if val:
                if k > se:
                    raise ValueError("JPEG refinement run past band end")
                row[ZIGZAG[k]] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            z = ZIGZAG[k]
            if row[z] != 0:
                if reader.read_bit() and (row[z] & p1) == 0:
                    row[z] += p1 if row[z] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_scan(
    payload,
    start,
    scan_comps,
    comps,
    stores,
    htables,
    restart_interval,
    geom,
    progressive,
    ss,
    se,
    ah,
    al,
    differential=False,
):
    """Decode one entropy-coded scan into the coefficient stores;
    returns the payload offset of the terminating marker.

    Handles every scan kind: sequential interleaved/single-component,
    progressive DC first/refine (interleaved or not), progressive AC
    first/refine (single-component by spec). Restart markers reset the
    DC predictors AND the EOB run. ``differential`` (hierarchical
    frames, T.81 F.1.1.5.1): the DC prediction is ALWAYS zero — DC
    values code directly, no running predictor."""
    ih, iw, hmax, vmax, mcus_x, mcus_y = geom
    cid_to_idx = {c[0]: idx for idx, c in enumerate(comps)}
    sel = []
    for cs, td, ta in scan_comps:
        k = cid_to_idx[cs]
        dc = htables.get((0, td)) if (ss == 0 or not progressive) else None
        ac = htables.get((1, ta)) if (se > 0 or not progressive) else None
        sel.append((k, dc, ac))

    segments, end = _split_scan(payload, start)
    seg_idx = 0
    reader = _BitReader(bytes(segments[0]))
    pred = {k: 0 for k, _, _ in sel}
    eobrun = 0

    # unit list: interleaved scans step MCUs (each holding ch*cv blocks
    # per component); single-component scans step that component's OWN
    # block grid (which can be narrower than the MCU-padded store)
    if len(sel) > 1:
        units = []
        for my in range(mcus_y):
            for mx in range(mcus_x):
                blocks = []
                for k, dc, ac in sel:
                    _, ch, cv, _ = comps[k]
                    for vy in range(cv):
                        for vx in range(ch):
                            bi = (my * cv + vy) * (mcus_x * ch) + (mx * ch + vx)
                            blocks.append((k, bi, dc, ac))
                units.append(blocks)
    else:
        k, dc, ac = sel[0]
        _, ch, cv, _ = comps[k]
        # comp sample dims: ceil(i*c/max); block grid is ceil(samples/8)
        comp_w = -(-iw * ch // hmax)
        comp_h = -(-ih * cv // vmax)
        bw, bh = -(-comp_w // 8), -(-comp_h // 8)
        units = [
            [(k, by * (mcus_x * ch) + bx, dc, ac)]
            for by in range(bh)
            for bx in range(bw)
        ]

    for u, blocks in enumerate(units):
        if restart_interval and u and u % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("JPEG truncated: missing restart segment")
            reader = _BitReader(bytes(segments[seg_idx]))
            pred = {k: 0 for k, _, _ in sel}
            eobrun = 0
        for k, bi, dc_tbl, ac_tbl in blocks:
            row = stores[k][bi]
            if not progressive:
                if differential:
                    _decode_block_sequential(reader, row, dc_tbl, ac_tbl, 0)
                else:
                    pred[k] = _decode_block_sequential(
                        reader, row, dc_tbl, ac_tbl, pred[k]
                    )
            elif ss == 0 and ah == 0:  # DC first
                s = _decode_symbol(reader, dc_tbl)
                diff = _extend(reader.read_bits(s), s)
                if differential:  # F.1.1.5.1: no DC prediction
                    row[0] = diff << al
                else:
                    pred[k] += diff
                    row[0] = pred[k] << al
            elif ss == 0:  # DC refine
                if reader.read_bit():
                    row[0] |= 1 << al
            elif ah == 0:  # AC first
                eobrun = _decode_block_ac_first(reader, row, ac_tbl, ss, se, al, eobrun)
            else:  # AC refine
                eobrun = _decode_block_ac_refine(reader, row, ac_tbl, ss, se, al, eobrun)
    return end


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline or progressive JPEG bytes -> HxWx3 uint8 RGB.

    Reads quantization + huffman tables from the stream (third-party
    JPEGs decode with their own tables). Sequential huffman (SOF0/1,
    8- and 12-bit sample precision), progressive huffman (SOF2,
    spectral selection + successive approximation, T.81 Annex G),
    sequential/progressive/lossless arithmetic (SOF9/10/11, QM coder
    per Annex D/F/G.2/H — see ``jpeg_arith.py``), lossless huffman
    (SOF3, Annex H predictive), and hierarchical (Annex J DHP/EXP
    pyramids with sequential/progressive/lossless differential frames,
    SOF5/6/7/13/14/15 — a lossless final stage reconstructs exactly)
    streams decode. Every T.81 frame type decodes in its legal
    position; differential frames outside a pyramid raise.
    12-bit output is reduced to 8-bit RGB (scale 255/4095), mirroring
    the 16-bit PNG lane.
    """
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple, dict] = {}
    conditioning: dict[tuple, object] = {}
    sof = None
    progressive = False
    arith = False
    lossless = False
    ll_pt = 0
    restart_interval = 0
    stores = None
    geom = None
    comps = None
    scans_decoded = 0
    i = 2
    n = len(payload)
    while i + 2 <= n:
        if payload[i] != 0xFF:
            raise ValueError(f"bad marker alignment at byte {i}")
        marker = payload[i + 1]
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7:  # stray RST between scans
            i += 2
            continue
        if i + 4 > n:
            break
        (seglen,) = struct.unpack(">H", payload[i + 2 : i + 4])
        data = payload[i + 4 : i + 2 + seglen]
        if marker == 0xDB:  # DQT (may hold several tables)
            j = 0
            while j < len(data):
                prec, tid = data[j] >> 4, data[j] & 15
                j += 1
                if prec == 0:
                    vals = np.frombuffer(data, np.uint8, 64, j).astype(np.int64)
                    j += 64
                else:
                    vals = np.frombuffer(data, ">u2", 64, j).astype(np.int64)
                    j += 128
                nat = np.empty(64, dtype=np.int64)
                nat[ZIGZAG] = vals
                qtables[tid] = nat.reshape(8, 8)
        elif marker == 0xC4:  # DHT (may hold several tables)
            j = 0
            while j < len(data):
                tclass, tid = data[j] >> 4, data[j] & 15
                bits = list(data[j + 1 : j + 17])
                nv = sum(bits)
                values = list(data[j + 17 : j + 17 + nv])
                htables[(tclass, tid)] = _build_decode_table(bits, values)
                j += 17 + nv
        elif marker == 0xCC:  # DAC: arithmetic conditioning
            j = 0
            while j + 1 < len(data):
                tc, tb = data[j] >> 4, data[j] & 15
                if tc == 0:
                    conditioning[("dc", tb)] = (data[j + 1] & 15, data[j + 1] >> 4)
                else:
                    conditioning[("ac", tb)] = data[j + 1]
                j += 2
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC9, 0xCA, 0xCB):
            progressive = marker in (0xC2, 0xCA)  # seq/prog/lossless
            arith = marker in (0xC9, 0xCA, 0xCB)
            lossless = marker in (0xC3, 0xCB)
            prec, ih, iw, nc = struct.unpack(">BHHB", data[:6])
            if lossless:
                if not 2 <= prec <= 16:
                    raise ValueError(f"lossless JPEG precision {prec}")
            elif prec not in (8, 12):
                raise NotImplementedError(
                    f"JPEG sample precision {prec} not supported (8/12 only)"
                )
            comps = []
            for c in range(nc):
                cid, hv, tq = data[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq))
            sof = (ih, iw, comps, prec)
            if lossless:
                if any(ch != 1 or cv != 1 for _, ch, cv, _ in comps):
                    raise NotImplementedError(
                        "lossless JPEG with subsampled components"
                    )
                # per-component SAMPLE planes — no blocks, no DCT
                stores = [np.zeros((ih, iw), dtype=np.int64) for _ in comps]
                geom = None
            else:
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                mcus_x = -(-iw // (8 * hmax))
                mcus_y = -(-ih // (8 * vmax))
                geom = (ih, iw, hmax, vmax, mcus_x, mcus_y)
                stores = [
                    np.zeros((mcus_y * cv * mcus_x * ch, 64), dtype=np.int64)
                    for cid, ch, cv, tq in comps
                ]
        elif marker == 0xDE:  # DHP: the whole stream is a hierarchical
            return _decode_hierarchical(payload)  # pyramid (Annex J)
        elif marker in (0xC5, 0xC6, 0xC7, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0} (differential frame outside a "
                "hierarchical stream) not supported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", data[:2])
        elif marker == 0xDA:  # SOS (one of possibly many)
            if stores is None:
                raise ValueError("JPEG SOS before SOF")
            ns = data[0]
            scan_comps = []
            for c in range(ns):
                cs, tbl = data[1 + 2 * c], data[2 + 2 * c]
                scan_comps.append((cs, tbl >> 4, tbl & 15))
            ss_, se_, a_ = data[1 + 2 * ns], data[2 + 2 * ns], data[3 + 2 * ns]
            ah_, al_ = a_ >> 4, a_ & 15
            if not progressive and not lossless:
                ss_, se_, ah_, al_ = 0, 63, 0, 0
            if lossless:
                # Ss = predictor selector, Al = point transform (Annex H)
                ll_pt = al_
                if arith:
                    from geokitten_spark.functions.jpeg_arith import (
                        decode_scan_lossless_arith,
                    )

                    i = decode_scan_lossless_arith(
                        payload,
                        i + 2 + seglen,
                        scan_comps,
                        comps,
                        stores,
                        conditioning,
                        restart_interval,
                        (sof[0], sof[1]),
                        ss_,
                        al_,
                        sof[3],
                        _split_scan,
                        _ll_predict,
                    )
                else:
                    i = _decode_scan_lossless(
                        payload,
                        i + 2 + seglen,
                        scan_comps,
                        comps,
                        stores,
                        htables,
                        restart_interval,
                        (sof[0], sof[1]),
                        ss_,
                        al_,
                        sof[3],
                    )
            elif arith and progressive:
                from geokitten_spark.functions.jpeg_arith import (
                    decode_scan_progressive_arith,
                )

                i = decode_scan_progressive_arith(
                    payload,
                    i + 2 + seglen,
                    scan_comps,
                    comps,
                    stores,
                    conditioning,
                    restart_interval,
                    geom,
                    ss_,
                    se_,
                    ah_,
                    al_,
                    _split_scan,
                )
            elif arith:
                from geokitten_spark.functions.jpeg_arith import decode_scan_arith

                i = decode_scan_arith(
                    payload,
                    i + 2 + seglen,
                    scan_comps,
                    comps,
                    stores,
                    conditioning,
                    restart_interval,
                    geom,
                    _split_scan,
                )
            else:
                i = _decode_scan(
                    payload,
                    i + 2 + seglen,
                    scan_comps,
                    comps,
                    stores,
                    htables,
                    restart_interval,
                    geom,
                    progressive,
                    ss_,
                    se_,
                    ah_,
                    al_,
                )
            scans_decoded += 1
            continue
        # APPn / COM / others: skip
        i += 2 + seglen
    if sof is None or scans_decoded == 0:
        raise ValueError("JPEG missing SOF/SOS")

    ih, iw, comps, prec = sof

    if lossless:
        # samples are already spatial: undo the point transform, reduce
        # high precision to 8-bit, and emit components AS STORED — the
        # lossless process has no color transform (components are RGB or
        # gray exactly as the encoder saw them)
        maxval = float((1 << prec) - 1)
        planes = [st.astype(np.float64) * float(1 << ll_pt) for st in stores]
        if len(planes) == 1:
            yp = planes[0] if prec == 8 else planes[0] * (255.0 / maxval)
            yp = np.clip(np.round(yp), 0, 255).astype(np.uint8)
            return np.repeat(yp[:, :, None], 3, axis=2)
        if len(planes) != 3:
            raise NotImplementedError(
                f"{len(planes)}-component lossless JPEG not supported"
            )
        rgb = np.stack(planes, axis=2)
        if prec != 8:
            rgb = rgb * (255.0 / maxval)
        return np.clip(np.round(rgb), 0, 255).astype(np.uint8)

    center = float(1 << (prec - 1))
    maxval = float((1 << prec) - 1)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-iw // (8 * hmax))
    mcus_y = -(-ih // (8 * vmax))

    # dequantize + batched IDCT + assemble planes
    planes = []
    for (cid, ch, cv, tq), store in zip(comps, stores):
        qt = qtables[tq].reshape(-1)
        spatial = idct_blocks((store * qt).reshape(-1, 8, 8).astype(np.float64))
        bw, bh = mcus_x * ch, mcus_y * cv
        plane = (
            spatial.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        ) + center
        # integer-ratio upsample to the full MCU grid
        ry, rx = vmax // cv, hmax // ch
        if ry * cv != vmax or rx * ch != hmax:
            raise NotImplementedError("non-integer chroma sampling ratio")
        if ry > 1:
            plane = np.repeat(plane, ry, axis=0)
        if rx > 1:
            plane = np.repeat(plane, rx, axis=1)
        planes.append(plane[:ih, :iw])

    if len(planes) == 1:
        yp = planes[0] if prec == 8 else planes[0] * (255.0 / maxval)
        yp = np.clip(np.round(yp), 0, 255).astype(np.uint8)
        return np.repeat(yp[:, :, None], 3, axis=2)
    if len(planes) != 3:
        raise NotImplementedError(f"{len(planes)}-component JPEG not supported")
    y, cb, cr = planes
    r = y + 1.402 * (cr - center)
    g = y - 0.344136 * (cb - center) - 0.714136 * (cr - center)
    b = y + 1.772 * (cb - center)
    rgb = np.stack([r, g, b], axis=2)
    if prec != 8:
        # 12-bit samples -> 8-bit output (same reduction as the 16-bit
        # PNG lane: scale to [0, 255], round)
        rgb = np.clip(rgb, 0.0, maxval) * (255.0 / maxval)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# lossless JPEG (SOF3 — T.81 Annex H: predictive, huffman-coded differences)
# ---------------------------------------------------------------------------

# one DC-class table covering every difference category 0..16: seventeen
# 5-bit canonical codes (17 < 31, so the all-ones code stays unused and
# the final-byte 1-padding can never alias a 17th symbol)
_LL_BITS = [0, 0, 0, 0, 17, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_LL_VALS = list(range(17))


def _ll_predict(plane: np.ndarray, x: int, y: int, predictor: int,
                default: int) -> int:
    """Annex H.1.2 sample prediction. Positional overrides (H.1.2.2):
    scan start -> 2^(P-Pt-1); rest of first line -> Ra; first column of
    later lines -> Rb; everywhere else the selected predictor 1-7.
    Predictor 0 (legal ONLY in differential lossless frames inside a
    hierarchical pyramid) is the constant zero prediction — positional
    overrides do not apply."""
    if predictor == 0:
        return 0
    if y == 0:
        return default if x == 0 else int(plane[0, x - 1])
    if x == 0:
        return int(plane[y - 1, 0])
    a = int(plane[y, x - 1])
    b = int(plane[y - 1, x])
    if predictor == 1:
        return a
    if predictor == 2:
        return b
    c = int(plane[y - 1, x - 1])
    if predictor == 3:
        return c
    if predictor == 4:
        return a + b - c
    if predictor == 5:
        return a + ((b - c) >> 1)
    if predictor == 6:
        return b + ((a - c) >> 1)
    if predictor == 7:
        return (a + b) >> 1
    raise ValueError(f"lossless predictor {predictor} out of range 1-7")


def _decode_scan_lossless(payload, start, scan_comps, comps, stores,
                          htables, restart_interval, size, predictor, pt,
                          prec):
    """Decode one lossless scan into the per-component sample planes;
    returns the offset of the marker that ended the scan.

    Differences reconstruct modulo 2^16 (H.1.2.1); SSSS=16 means
    Diff=32768 with no magnitude bits. A restart resets the entropy
    stream (byte-aligned segment) AND the prediction of the next MCU to
    the scan-start default for every component (H.2.2); later samples
    resume positional rules over the already-reconstructed plane."""
    ih, iw = size
    segments, end = _split_scan(payload, start)
    comp_index = {cid: k for k, (cid, ch, cv, tq) in enumerate(comps)}
    planes = [stores[comp_index[cs]] for cs, td, ta in scan_comps]
    tables = [htables[(0, td)] for cs, td, ta in scan_comps]
    default = 0 if predictor == 0 else 1 << (prec - pt - 1)
    reader = _BitReader(bytes(segments[0]))
    seg = 0
    n_mcu = 0
    reset = False
    for y in range(ih):
        for x in range(iw):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                seg += 1
                reader = _BitReader(bytes(segments[seg]))
                reset = True
            for plane, tbl in zip(planes, tables):
                s = _decode_symbol(reader, tbl)
                if s == 16:
                    diff = 32768
                else:
                    diff = _extend(reader.read_bits(s), s)
                px = default if reset else _ll_predict(plane, x, y,
                                                       predictor, default)
                plane[y, x] = (px + diff) & 0xFFFF
            reset = False
            n_mcu += 1
    return end


def encode_jpeg_lossless(
    img: np.ndarray,
    predictor: int = 1,
    precision: int = 8,
    point_transform: int = 0,
    restart_interval: int = 0,
) -> bytes:
    """HxWx3 RGB (or HxW gray) uint8 -> LOSSLESS (SOF3) JPEG bytes.

    Pixel-EXACT roundtrip at point_transform=0: lossless JPEG has no
    quantization and no color transform — RGB components are coded as-is,
    so ``decode_jpeg(encode_jpeg_lossless(img)) == img`` bit-for-bit
    (the property no lossy lane can offer the dedup fixtures).

    ``precision``: 8 codes samples as-is; 12/16 bit-replicate like the
    12-bit JPEG / 16-bit PNG fixture encoders (v*16+v//16, v*257) so the
    decoder's high-precision reduction restores the original exactly.
    ``point_transform`` (Annex H "near-lossless"): samples are coded
    right-shifted by Pt and the decoder scales back, so the roundtrip is
    ``(v >> Pt) << Pt``. ``restart_interval`` emits DRI/RSTn every N
    samples (MCUs) with scan-start prediction reset, mirroring the
    decoder exactly.
    """
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError(f"expected HxWx3 or HxW uint8, got {img.shape}")
    if not 1 <= predictor <= 7:
        raise ValueError("predictor must be 1-7 (0 is differential-only)")
    if precision not in (8, 12, 16):
        raise ValueError("precision must be 8, 12 or 16")
    if not 0 <= point_transform < precision:
        raise ValueError("point_transform must satisfy 0 <= Pt < precision")
    samples = img.astype(np.int64)
    if precision == 12:
        samples = samples * 16 + samples // 16
    elif precision == 16:
        samples = samples * 257
    samples >>= point_transform
    h, w = img.shape[:2]
    planes = [samples] if gray else [samples[:, :, k] for k in range(3)]
    ncomp = len(planes)
    tbl = _build_encode_table(_LL_BITS, _LL_VALS)
    default = 1 << (precision - point_transform - 1)

    writer = _BitWriter()
    out_scan = bytearray()
    rst = 0
    n_mcu = 0
    reset = False
    for y in range(h):
        for x in range(w):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                writer.pad_to_byte()
                out_scan += writer.buf
                out_scan += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                writer = _BitWriter()
                reset = True
            for plane in planes:
                xval = int(plane[y, x])
                px = default if reset else _ll_predict(plane, x, y,
                                                       predictor, default)
                d = (xval - px) & 0xFFFF
                if d >= 0x8000:
                    d -= 0x10000
                if d == -32768:
                    code, length = tbl[16]
                    writer.write(code, length)
                else:
                    s = _category(d)
                    code, length = tbl[s]
                    writer.write(code, length)
                    if s:
                        writer.write(d if d > 0 else d + (1 << s) - 1, s)
            reset = False
            n_mcu += 1
    writer.pad_to_byte()
    out_scan += writer.buf

    sof_comps = b"".join(
        bytes([cid + 1, 0x11, 0]) for cid in range(ncomp)
    )
    sof = b"\xff\xc3" + struct.pack(
        ">HBHH", 8 + 3 * ncomp, precision, h, w
    ) + bytes([ncomp]) + sof_comps
    sos = b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp) + bytes(
        [b for cid in range(ncomp) for b in (cid + 1, 0x00)]
    ) + bytes([predictor, 0, point_transform])
    dri = (
        b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
        if restart_interval
        else b""
    )
    return (
        b"\xff\xd8"
        + sof
        + _dht_segment(0, 0, _LL_BITS, _LL_VALS)
        + dri
        + sos
        + out_scan
        + b"\xff\xd9"
    )


# ---------------------------------------------------------------------------
# hierarchical JPEG (DHP/EXP + differential frames — T.81 Annex J)
# ---------------------------------------------------------------------------

def _exp_double(plane: np.ndarray, eh: int, ev: int) -> np.ndarray:
    """Annex J.1.1.3 reference expansion: doubled axes interleave the
    original samples with (a + b + 1) >> 1 midpoints (edge replicated)."""
    p = plane.astype(np.int64)
    if eh:
        right = np.concatenate([p[:, 1:], p[:, -1:]], axis=1)
        out = np.empty((p.shape[0], p.shape[1] * 2), np.int64)
        out[:, 0::2] = p
        out[:, 1::2] = (p + right + 1) >> 1
        p = out
    if ev:
        down = np.concatenate([p[1:, :], p[-1:, :]], axis=0)
        out = np.empty((p.shape[0] * 2, p.shape[1]), np.int64)
        out[0::2, :] = p
        out[1::2, :] = (p + down + 1) >> 1
        p = out
    return p


def _decode_hierarchical(payload: bytes) -> np.ndarray:
    """Hierarchical (Annex J) decode: DHP declares the full-resolution
    frame; a non-differential first frame establishes the reference at
    reduced resolution; each EXP doubles the reference (J.1.1.3 filter)
    and the following DIFFERENTIAL frame adds a coded correction —
    sequential (SOF5/SOF13), progressive (SOF6/SOF14, scans accumulate
    into the stage's coefficient store), or zero-prediction lossless
    (SOF7/SOF15, spatial corrections reconstructed modulo 2^16 per
    J.1.5 — the exact-reconstruction final stage). Scope:
    single-component (grayscale) pyramids — the variant our fixture
    encoder produces; multi-component frames raise."""
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple, dict] = {}
    conditioning: dict[tuple, object] = {}
    restart_interval = 0
    full = None          # (prec, H, W)
    ref = None           # int64 reference plane
    pending_exp = None
    frame = None          # open frame state
    frame_arith = False   # entropy coding of the open frame
    frame_prog = False    # progressive DCT frame
    frame_lossless = False  # spatial (lossless differential) frame
    i = 2
    n = len(payload)

    def finish_frame():
        nonlocal ref, frame
        if frame is None:
            return
        fh, fw, tq, differential, store, bw, lossless_f = frame
        if lossless_f:
            # spatial-domain frame: samples (base) or mod-2^16 coded
            # corrections with zero prediction (differential, J.1.5)
            if not differential:
                ref = np.clip(store, 0, 255).astype(np.int64)
            else:
                if ref is None:
                    raise ValueError("differential frame before any reference")
                if ref.shape != (fh, fw):
                    raise ValueError(
                        f"reference {ref.shape} does not match frame {(fh, fw)}"
                    )
                ref = np.clip((ref + store) & 0xFFFF, 0, 255)
            frame = None
            return
        qt = qtables[tq].reshape(-1)
        spatial = idct_blocks((store * qt).reshape(-1, 8, 8).astype(np.float64))
        bh = store.shape[0] // bw
        plane = (
            spatial.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )[:fh, :fw]
        if not differential:
            ref = np.clip(np.round(plane + 128.0), 0, 255).astype(np.int64)
        else:
            if ref is None:
                raise ValueError("differential frame before any reference")
            if ref.shape != (fh, fw):
                raise ValueError(
                    f"reference {ref.shape} does not match frame {(fh, fw)}"
                )
            ref = np.clip(ref + np.round(plane).astype(np.int64), 0, 255)
        frame = None

    while i + 2 <= n:
        if payload[i] != 0xFF:
            raise ValueError(f"bad marker alignment at byte {i}")
        marker = payload[i + 1]
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        (seglen,) = struct.unpack(">H", payload[i + 2 : i + 4])
        data = payload[i + 4 : i + 2 + seglen]
        if marker == 0xDB:
            j = 0
            while j < len(data):
                prec_t, tid = data[j] >> 4, data[j] & 15
                j += 1
                vals = np.frombuffer(data, np.uint8, 64, j).astype(np.int64)
                j += 64
                if prec_t:
                    raise NotImplementedError("16-bit DQT in hierarchical")
                nat = np.empty(64, dtype=np.int64)
                nat[ZIGZAG] = vals
                qtables[tid] = nat.reshape(8, 8)
        elif marker == 0xC4:
            j = 0
            while j < len(data):
                tclass, tid = data[j] >> 4, data[j] & 15
                bits = list(data[j + 1 : j + 17])
                nv = sum(bits)
                values = list(data[j + 17 : j + 17 + nv])
                htables[(tclass, tid)] = _build_decode_table(bits, values)
                j += 17 + nv
        elif marker == 0xCC:  # DAC: arithmetic conditioning
            j = 0
            while j < len(data):
                tc, tb = data[j] >> 4, data[j] & 15
                if tc == 0:
                    conditioning[("dc", tb)] = (data[j + 1] & 15, data[j + 1] >> 4)
                else:
                    conditioning[("ac", tb)] = data[j + 1]
                j += 2
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", data[:2])
        elif marker == 0xDE:  # DHP
            prec, fh, fw, nc = struct.unpack(">BHHB", data[:6])
            if nc != 1 or prec != 8:
                raise NotImplementedError(
                    "hierarchical JPEG beyond 8-bit single-component"
                )
            full = (prec, fh, fw)
        elif marker == 0xDF:  # EXP
            finish_frame()
            pending_exp = (data[0] >> 4, data[0] & 15)
        elif marker in (0xC0, 0xC1, 0xC2, 0xC5, 0xC6, 0xC9, 0xCA, 0xCD,
                        0xCE, 0xC7, 0xCF):  # frame in the pyramid
            finish_frame()
            differential = marker in (0xC5, 0xC6, 0xC7, 0xCD, 0xCE, 0xCF)
            frame_arith = marker in (0xC9, 0xCA, 0xCD, 0xCE, 0xCF)
            frame_prog = marker in (0xC2, 0xC6, 0xCA, 0xCE)
            frame_lossless = marker in (0xC7, 0xCF)
            if frame_lossless and not differential:
                raise NotImplementedError(
                    "lossless base frame in a hierarchical pyramid"
                )
            prec, fh, fw, nc = struct.unpack(">BHHB", data[:6])
            if nc != 1 or prec != 8:
                raise NotImplementedError(
                    "hierarchical JPEG beyond 8-bit single-component"
                )
            cid, hv, tq = data[6:9]
            if hv != 0x11:
                raise NotImplementedError("subsampled hierarchical frame")
            if differential and pending_exp is not None:
                eh, ev = pending_exp
                ref = _exp_double(ref, eh, ev)[:fh, :fw]
                pending_exp = None
            if frame_lossless:
                store = np.zeros((fh, fw), dtype=np.int64)
                bw, bh = fw, fh
            else:
                bw, bh = -(-fw // 8), -(-fh // 8)
                store = np.zeros((bh * bw, 64), dtype=np.int64)
            frame = (fh, fw, tq, differential, store, bw, frame_lossless)
            frame_comps = [(cid, 1, 1, tq)]
            frame_geom = (fh, fw, 1, 1, bw, bh)
        elif marker in (0xC3, 0xCB):
            raise NotImplementedError(
                f"hierarchical pyramid with SOF{marker - 0xC0} "
                "(non-differential lossless) frames"
            )
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("hierarchical SOS outside a frame")
            ns = data[0]
            scan_comps = []
            for c in range(ns):
                cs, tbl = data[1 + 2 * c], data[2 + 2 * c]
                scan_comps.append((cs, tbl >> 4, tbl & 15))
            ss_, se_ = data[1 + 2 * ns], data[2 + 2 * ns]
            ah_, al_ = data[3 + 2 * ns] >> 4, data[3 + 2 * ns] & 15
            scan_start = i + 2 + seglen
            if frame_lossless and frame_arith:
                from geokitten_spark.functions.jpeg_arith import (
                    decode_scan_lossless_arith,
                )

                i = decode_scan_lossless_arith(
                    payload, scan_start, scan_comps, frame_comps,
                    [frame[4]], conditioning, restart_interval,
                    (frame[0], frame[1]), ss_, al_, 8,
                    _split_scan, _ll_predict,
                )
            elif frame_lossless:
                i = _decode_scan_lossless(
                    payload, scan_start, scan_comps, frame_comps,
                    [frame[4]], htables, restart_interval,
                    (frame[0], frame[1]), ss_, al_, 8,
                )
            elif frame_arith and frame_prog:
                from geokitten_spark.functions.jpeg_arith import (
                    decode_scan_progressive_arith,
                )

                i = decode_scan_progressive_arith(
                    payload, scan_start, scan_comps, frame_comps,
                    [frame[4]], conditioning, restart_interval,
                    frame_geom, ss_, se_, ah_, al_, _split_scan,
                    differential=frame[3],
                )
            elif frame_arith:
                from geokitten_spark.functions.jpeg_arith import decode_scan_arith

                i = decode_scan_arith(
                    payload, scan_start, scan_comps, frame_comps,
                    [frame[4]], conditioning, restart_interval,
                    frame_geom, _split_scan, differential=frame[3],
                )
            else:
                i = _decode_scan(
                    payload, scan_start, scan_comps, frame_comps,
                    [frame[4]], htables, restart_interval, frame_geom,
                    frame_prog,
                    ss_ if frame_prog else 0,
                    se_ if frame_prog else 63,
                    ah_ if frame_prog else 0,
                    al_ if frame_prog else 0,
                    differential=frame[3],
                )
            continue
        i += 2 + seglen
    finish_frame()
    if full is None or ref is None:
        raise ValueError("hierarchical JPEG missing DHP or frames")
    if ref.shape != (full[1], full[2]):
        raise ValueError(
            f"pyramid ended at {ref.shape}, DHP declared {(full[1], full[2])}"
        )
    out = ref.astype(np.uint8)
    return np.repeat(out[:, :, None], 3, axis=2)


def _downsample2(plane: np.ndarray) -> np.ndarray:
    """2x2 box downsample with edge padding to even dims."""
    p = plane.astype(np.float64)
    if p.shape[0] % 2:
        p = np.concatenate([p, p[-1:, :]], axis=0)
    if p.shape[1] % 2:
        p = np.concatenate([p, p[:, -1:]], axis=1)
    return (p[0::2, 0::2] + p[1::2, 0::2] + p[0::2, 1::2] + p[1::2, 1::2]) / 4.0


def encode_jpeg_hierarchical(
    img: np.ndarray, quality: int = 85, levels: int = 2,
    arithmetic: bool = False, progressive_diff: bool = False,
    final_lossless: bool = False,
) -> bytes:
    """HxW grayscale uint8 -> HIERARCHICAL JPEG (Annex J): a DHP header,
    a non-differential SOF0 frame at 1/2^levels resolution, then per
    level an EXP expansion plus a DIFFERENTIAL SOF5 frame coding the
    correction against the expanded reference (PRED=0 DC coding, flat
    category-0..16 DC table; AC coefficients clipped to the standard
    table's +-1023 — legal, the encoder reconstructs from the SAME
    clipped values it writes, mirroring the decoder exactly).
    ``arithmetic=True`` swaps the entropy layer: SOF9 base + SOF13
    differential frames with QM-coded scans (default conditioning) and
    a DAC segment in place of the huffman tables — the pyramid math is
    byte-for-byte identical, so both variants decode to the same
    pixels.

    ``progressive_diff=True`` codes each DCT differential stage as a
    PROGRESSIVE differential frame (SOF6 huffman / SOF14 arithmetic)
    with a four-scan successive-approximation script (DC first Al=1,
    AC first Al=1, DC refine, AC refine) over the same quantized
    correction coefficients — again pixel-identical to the sequential
    variants. ``final_lossless=True`` appends one LOSSLESS differential
    frame (SOF7 huffman / SOF15 arithmetic, zero prediction, mod-2^16
    corrections per T.81 J.1.5) at full resolution, making
    ``decode_jpeg`` reconstruct the input EXACTLY — the progressive-to-
    lossless pyramid Annex J exists for."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 2:
        raise ValueError("hierarchical fixture encoder takes HxW grayscale")
    if levels < 1:
        raise ValueError("levels must be >= 1")
    h, w = img.shape
    pyramid = [img.astype(np.float64)]
    for _ in range(levels):
        pyramid.append(_downsample2(pyramid[-1]))

    q = _scaled_quant(QUANT_LUMA, quality)
    qflat = q.reshape(-1)
    dc_std = _build_encode_table(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_std = _build_encode_table(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_flat = _build_encode_table(_LL_BITS, _LL_VALS)

    def quantize_plane(plane: np.ndarray, level_shift: float):
        blocks = _plane_blocks(_pad_edge(plane - level_shift, 8))
        zz = np.round(fdct_blocks(blocks) / q).astype(np.int64).reshape(-1, 64)
        return zz[:, ZIGZAG]

    def reconstruct(zz: np.ndarray, fh: int, fw: int) -> np.ndarray:
        nat = np.zeros_like(zz)
        nat[:, ZIGZAG] = zz
        spatial = idct_blocks((nat * qflat).reshape(-1, 8, 8).astype(np.float64))
        bw = -(-fw // 8)
        bh = nat.shape[0] // bw
        return (
            spatial.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )[:fh, :fw]

    def sof(marker: int, fh: int, fw: int) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(
            ">HBHHB", 11, 8, fh, fw, 1
        ) + bytes([1, 0x11, 0])

    def sos(td: int, ss: int = 0, se: int = 63, ah: int = 0,
            al: int = 0, ta: int = 0) -> bytes:
        return b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes(
            [1, (td << 4) | ta]
        ) + bytes([ss, se, (ah << 4) | al])

    def arith_scan(zz: np.ndarray, differential: bool) -> bytes:
        from geokitten_spark.functions.jpeg_arith import (
            ArithEncoder,
            _encode_ac_from,
            encode_dc_arith,
            new_ac_stats,
            new_dc_stats,
            new_fixed_stats,
        )

        enc = ArithEncoder()
        dstats, astats, fixed = new_dc_stats(), new_ac_stats(), new_fixed_stats()
        pred = dcctx = 0
        for row in zz:
            v = int(row[0]) - pred
            if not differential:  # differential frames: PRED stays 0
                pred = int(row[0])
            dcctx = encode_dc_arith(enc, dstats, dcctx, v, 0, 1)
            _encode_ac_from(enc, astats, fixed, row, 5)
        return enc.scan()

    def prog_diff_scans(zz: np.ndarray) -> list:
        """Four-scan successive-approximation script for one PROGRESSIVE
        differential stage: every value codes with zero DC prediction."""
        scans = []
        if arithmetic:
            from geokitten_spark.functions.jpeg_arith import (
                ArithEncoder,
                _encode_ac_from,
                _encode_ac_refine_from,
                encode_dc_arith,
                new_ac_stats,
                new_dc_stats,
                new_fixed_stats,
            )

            enc, dstats = ArithEncoder(), new_dc_stats()
            dcctx = 0
            for row in zz:  # DC first, Al=1
                dcctx = encode_dc_arith(enc, dstats, dcctx, int(row[0]) >> 1,
                                        0, 1)
            scans.append((sos(0, 0, 0, 0, 1), enc.scan()))
            enc, astats, fixed = (
                ArithEncoder(), new_ac_stats(), new_fixed_stats()
            )
            for row in zz:  # AC first, band 1-63, Al=1
                _encode_ac_from(enc, astats, fixed, row, 5, 1, 63, 1)
            scans.append((sos(0, 1, 63, 0, 1), enc.scan()))
            enc, fixed = ArithEncoder(), new_fixed_stats()
            for row in zz:  # DC refine to Al=0
                enc.encode(fixed, 0, int(row[0]) & 1)
            scans.append((sos(0, 0, 0, 1, 0), enc.scan()))
            enc, astats, fixed = (
                ArithEncoder(), new_ac_stats(), new_fixed_stats()
            )
            for row in zz:  # AC refine to Al=0
                _encode_ac_refine_from(enc, astats, fixed, row, 1, 63, 1, 0)
            scans.append((sos(0, 1, 63, 1, 0), enc.scan()))
            return scans

        prog_ac = _build_encode_table(_PROG_AC_BITS, _PROG_AC_VALS)
        writer = _BitWriter()
        for row in zz:  # DC first, Al=1 (flat table 1, PRED=0)
            v = int(row[0]) >> 1
            s = _category(v)
            code, length = dc_flat[s]
            writer.write(code, length)
            if s:
                writer.write(v if v > 0 else v + (1 << s) - 1, s)
        writer.pad_to_byte()
        scans.append((sos(1, 0, 0, 0, 1), bytes(writer.buf)))
        writer, st = _BitWriter(), _ProgState()
        for row in zz:  # AC first, band 1-63, Al=1 (prog AC table 1)
            _encode_block_ac_first(writer, row, prog_ac, 1, 63, 1, st)
        _emit_eobrun(writer, prog_ac, st)
        writer.pad_to_byte()
        scans.append((sos(1, 1, 63, 0, 1, ta=1), bytes(writer.buf)))
        writer = _BitWriter()
        for row in zz:  # DC refine to Al=0
            writer.write(int(row[0]) & 1, 1)
        writer.pad_to_byte()
        scans.append((sos(1, 0, 0, 1, 0), bytes(writer.buf)))
        writer, st = _BitWriter(), _ProgState()
        for row in zz:  # AC refine to Al=0
            _encode_block_ac_refine(writer, row, prog_ac, 1, 63, 0, st)
        _emit_eobrun(writer, prog_ac, st)
        writer.pad_to_byte()
        scans.append((sos(1, 1, 63, 1, 0, ta=1), bytes(writer.buf)))
        return scans

    def lossless_diff_scan(diff_plane: np.ndarray) -> bytes:
        """One zero-prediction lossless differential scan (J.1.5):
        signed corrections, reconstructed modulo 2^16 by the decoder."""
        if arithmetic:
            from geokitten_spark.functions.jpeg_arith import (
                ArithEncoder,
                _LL_X1_A,
                _LL_X1_B,
                _classify_diff,
                encode_dc_arith,
                new_lossless_stats,
            )

            enc, stats = ArithEncoder(), new_lossless_stats()
            above = np.zeros(diff_plane.shape[1], dtype=np.int64)
            for yy in range(diff_plane.shape[0]):
                left = 0
                for xx in range(diff_plane.shape[1]):
                    d = int(diff_plane[yy, xx])
                    ca = _classify_diff(left, 0, 1)
                    cb = _classify_diff(int(above[xx]), 0, 1)
                    xbase = _LL_X1_B if cb >= 12 else _LL_X1_A
                    encode_dc_arith(enc, stats, ca + 5 * cb, d, 0, 1, xbase)
                    left = d
                    above[xx] = d
            return enc.scan()
        writer = _BitWriter()
        for d in diff_plane.reshape(-1):
            d = int(d)
            s = _category(d)
            code, length = dc_flat[s]
            writer.write(code, length)
            if s:
                writer.write(d if d > 0 else d + (1 << s) - 1, s)
        writer.pad_to_byte()
        return bytes(writer.buf)

    out = bytearray(b"\xff\xd8")
    out += bytes([0xFF, 0xDE]) + struct.pack(">HBHHB", 11, 8, h, w, 1) + bytes(
        [1, 0x11, 0]
    )
    out += _dqt_segment(0, q)
    if arithmetic:
        # DAC with the T.81 defaults, exercising hierarchical DAC parsing
        out += b"\xff\xcc" + struct.pack(">H", 6) + bytes([0x00, 0x10, 0x10, 5])
    else:
        out += _dht_segment(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
        out += _dht_segment(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)
        out += _dht_segment(0, 1, _LL_BITS, _LL_VALS)
        if progressive_diff:  # EOBn/ZRL symbols the std AC table lacks
            out += _dht_segment(1, 1, _PROG_AC_BITS, _PROG_AC_VALS)

    # non-differential base frame
    base = pyramid[-1]
    fh, fw = base.shape
    zz = quantize_plane(base, 128.0)
    if arithmetic:
        scan_bytes = arith_scan(zz, differential=False)
    else:
        writer = _BitWriter()
        pred = 0
        for row in zz:
            pred = _encode_block(writer, row, pred, dc_std, ac_std)
        writer.pad_to_byte()
        scan_bytes = bytes(writer.buf)
    out += sof(0xC9 if arithmetic else 0xC0, fh, fw) + sos(0) + scan_bytes
    ref = np.clip(np.round(reconstruct(zz, fh, fw) + 128.0), 0, 255).astype(
        np.int64
    )

    # differential refinement frames, deepest level outward
    for lvl in range(levels - 1, -1, -1):
        target = pyramid[lvl]
        fh, fw = target.shape
        ref = _exp_double(ref, 1, 1)[:fh, :fw]
        diff = target - ref.astype(np.float64)
        zz = quantize_plane(diff, 0.0)
        zz[:, 1:] = np.clip(zz[:, 1:], -1023, 1023)  # std AC table range
        out += bytes([0xFF, 0xDF]) + struct.pack(">H", 3) + bytes([0x11])
        if progressive_diff:
            out += sof(0xCE if arithmetic else 0xC6, fh, fw)
            for header, scan_bytes in prog_diff_scans(zz):
                out += header + scan_bytes
        elif arithmetic:
            out += sof(0xCD, fh, fw) + sos(0) + arith_scan(zz, differential=True)
        else:
            writer = _BitWriter()
            for row in zz:
                _encode_block(writer, row, 0, dc_flat, ac_std)  # PRED = 0
            writer.pad_to_byte()
            out += sof(0xC5, fh, fw) + sos(1) + bytes(writer.buf)
        ref = np.clip(
            ref + np.round(reconstruct(zz, fh, fw)).astype(np.int64), 0, 255
        )

    if final_lossless:
        # same-size lossless differential frame: EXACT reconstruction
        diff_plane = img.astype(np.int64) - ref
        out += sof(0xCF if arithmetic else 0xC7, h, w)
        out += sos(0 if arithmetic else 1, ss=0, se=0)  # Ss=0: no prediction
        out += lossless_diff_scan(diff_plane)

    out += b"\xff\xd9"
    return bytes(out)
