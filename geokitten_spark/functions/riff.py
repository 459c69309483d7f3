"""RIFF container codecs: WAV (PCM16) audio and MJPEG-in-AVI video.

Pure stdlib ``struct`` + numpy — no audio/video libraries exist in this
container, so the media pipeline's audio and video payloads are REAL
container formats produced and parsed here:

* **WAV** — canonical RIFF/WAVE with a PCM ``fmt `` chunk (format tag 1,
  16-bit) and a ``data`` chunk. The decoder is a spec-compliant chunk
  walk (word-aligned, tolerant of extra chunks such as ``LIST``/``fact``
  that real-world encoders emit), so third-party PCM WAVs parse too.
* **AVI (MJPEG)** — RIFF/``AVI `` with the standard header tree
  (``LIST hdrl`` → ``avih`` + ``LIST strl`` → ``strh``/``strf``), a
  ``LIST movi`` whose ``00dc`` chunks each hold one baseline JPEG frame
  (encoded/decoded by :mod:`geokitten_spark.functions.jpeg`, itself pure
  numpy), and a legacy ``idx1`` index. The decoder locates ``movi`` by
  chunk walk and accepts both ``00dc`` and ``00db`` frame chunks, so
  MJPEG AVIs from other muxers parse as long as their frames are
  baseline JPEG.

Both codecs are deterministic: identical inputs yield identical bytes on
any platform, which the VALUES-oracle correctness harness relies on.

Reference parity note: the reference engine has no media stack; this
module backs the "multimodal columns" requirement of the LLM-pipeline
operator set (SURVEY.md §2.13) with real binary parses instead of
stand-in byte blobs.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "encode_wav",
    "decode_wav",
    "encode_avi_mjpeg",
    "decode_avi_mjpeg",
    "avi_frame_count",
]


# ---------------------------------------------------------------------------
# WAV (RIFF/WAVE, PCM 16-bit)
# ---------------------------------------------------------------------------

def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 samples — shape (n,) mono or (n, ch) — → RIFF/WAVE bytes.

    Emits the canonical 44-byte header: ``RIFF`` size ``WAVE``,
    ``fmt `` (16-byte PCM block), ``data``. A trailing pad byte keeps the
    data chunk word-aligned when n*ch is odd (per the RIFF spec)."""
    samples = np.asarray(samples, dtype="<i2")
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.ndim != 2:
        raise ValueError(f"expected (n,) or (n, channels) int16, got {samples.shape}")
    n, ch = samples.shape
    data = samples.tobytes()  # interleaved little-endian
    block_align = ch * 2
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * block_align, block_align, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    if len(data) % 2:
        body += b"\x00"  # word alignment pad (not counted in the chunk size)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _riff_chunks(payload: bytes, start: int, end: int):
    """Yield (fourcc, data_offset, size) for each chunk in [start, end),
    honoring word alignment."""
    pos = start
    while pos + 8 <= end:
        fourcc = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE bytes → (int16 array shape (n, channels), sample_rate).

    Spec-compliant chunk walk: skips unknown chunks, requires a PCM
    (format tag 1, 16-bit) ``fmt `` chunk before ``data``."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    (riff_size,) = struct.unpack("<I", payload[4:8])
    end = min(len(payload), 8 + riff_size)
    fmt = None
    for fourcc, off, size in _riff_chunks(payload, 12, end):
        if fourcc == b"fmt ":
            if size < 16:
                raise ValueError("WAVE fmt chunk too short")
            fmt = struct.unpack("<HHIIHH", payload[off : off + 16])
        elif fourcc == b"data":
            if fmt is None:
                raise ValueError("WAVE data chunk before fmt")
            tag, ch, rate, _byterate, _align, bits = fmt
            if tag != 1 or bits != 16:
                raise NotImplementedError(
                    f"only PCM16 WAV supported (format tag={tag}, bits={bits})"
                )
            n = size // (2 * ch)
            samples = np.frombuffer(
                payload, dtype="<i2", count=n * ch, offset=off
            ).reshape(n, ch)
            return samples, rate
    raise ValueError("WAVE missing data chunk")


# ---------------------------------------------------------------------------
# AVI (MJPEG)
# ---------------------------------------------------------------------------

def _chunk(fourcc: bytes, data: bytes) -> bytes:
    return fourcc + struct.pack("<I", len(data)) + data + (b"\x00" if len(data) & 1 else b"")


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def encode_avi_mjpeg(
    frames: list[np.ndarray], fps: int = 10, quality: int = 90
) -> bytes:
    """List of HxWx3 uint8 frames → MJPEG AVI bytes.

    Standard structure: ``RIFF 'AVI '`` → ``LIST hdrl`` (``avih`` main
    header + ``LIST strl`` with a ``vids/MJPG`` ``strh`` and a
    BITMAPINFOHEADER ``strf``) → ``LIST movi`` (one ``00dc`` chunk per
    baseline-JPEG frame) → ``idx1`` legacy index. All frames must share
    one (height, width)."""
    from .jpeg import encode_jpeg

    if not frames:
        raise ValueError("AVI needs at least one frame")
    h, w = frames[0].shape[:2]
    blobs = []
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("all AVI frames must share one size")
        blobs.append(encode_jpeg(f, quality=quality))
    max_bytes = max(len(b) for b in blobs)

    usec_per_frame = 1_000_000 // max(1, fps)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        usec_per_frame,        # dwMicroSecPerFrame
        max_bytes * fps,       # dwMaxBytesPerSec
        0,                     # dwPaddingGranularity
        0x10,                  # dwFlags: AVIF_HASINDEX
        len(blobs),            # dwTotalFrames
        0,                     # dwInitialFrames
        1,                     # dwStreams
        max_bytes,             # dwSuggestedBufferSize
        w, h, 0, 0, 0, 0,      # width, height, reserved[4]
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"MJPG",
        0, 0, 0, 0,            # dwFlags, wPriority, wLanguage, dwInitialFrames
        1, fps,                # dwScale, dwRate (fps = rate/scale)
        0, len(blobs),         # dwStart, dwLength (frames)
        max_bytes,             # dwSuggestedBufferSize
        0xFFFFFFFF, 0,         # dwQuality (default), dwSampleSize
        0, 0, int(w), int(h),  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_body = b""
    idx_entries = []
    for b in blobs:
        # offset in idx1 is relative to the start of the 'movi' fourcc
        idx_entries.append((4 + len(movi_body), len(b)))
        movi_body += _chunk(b"00dc", b)
    movi = _list(b"movi", movi_body)
    idx1 = b"".join(
        b"00dc" + struct.pack("<III", 0x10, off, size)  # AVIIF_KEYFRAME
        for off, size in idx_entries
    )
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx1)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _movi_chunks(payload: bytes):
    """Yield (fourcc, data_offset, size) for every frame chunk inside the
    first ``LIST movi`` of an AVI payload."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    (riff_size,) = struct.unpack("<I", payload[4:8])
    end = min(len(payload), 8 + riff_size)
    for fourcc, off, size in _riff_chunks(payload, 12, end):
        if fourcc == b"LIST" and payload[off : off + 4] == b"movi":
            yield from _riff_chunks(payload, off + 4, off + size)
            return
    raise ValueError("AVI missing LIST movi")


def avi_frame_count(payload: bytes) -> int:
    """Number of video frame chunks in the AVI's movi list (no decode)."""
    return sum(
        1 for fourcc, _, _ in _movi_chunks(payload) if fourcc[2:4] in (b"dc", b"db")
    )


def decode_avi_mjpeg(
    payload: bytes, every_k: int = 1, max_frames: int | None = None
) -> list[tuple[int, np.ndarray]]:
    """MJPEG AVI bytes → [(frame_no, HxWx3 uint8), ...].

    ``every_k`` samples every k-th frame WITHOUT decoding the skipped
    ones — the chunk walk is O(frames) on offsets, JPEG entropy decode
    only runs for sampled frames (the point of frame sampling at scale)."""
    out = []
    frame_no = 0
    for fourcc, off, size in _movi_chunks(payload):
        if fourcc[2:4] not in (b"dc", b"db"):
            continue  # audio ('wb') or other interleaved chunks
        if frame_no % every_k == 0:
            from .jpeg import decode_jpeg

            out.append((frame_no, decode_jpeg(payload[off : off + size])))
            if max_frames is not None and len(out) >= max_frames:
                break
        frame_no += 1
    return out
