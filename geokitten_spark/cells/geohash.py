"""Geohash encode/decode (pure numpy, vectorized) — an INTEROPERABLE
public cell-id system alongside S2 (`cells/s2.py`).

Unlike H3 (whose 122-entry base-cell tables cannot be verified offline —
see SURVEY §8 ADR-001), geohash is fully derivable from its public spec:
interleave longitude/latitude bisection bits starting with longitude,
emit 5 bits per character in the base-32 alphabet
``0123456789bcdefghjkmnpqrstuvwxyz``. The implementation is checked
against well-known published vectors (``(57.64911, 10.40744) →
u4pruydqqvj``) plus roundtrip/prefix/neighbor property tests, so the ids
this module produces match every other geohash library bit-for-bit.

Scale shape: encode is a handful of vectorized integer ops per Arrow
batch; the string ids group/join like any other key column, and the
prefix property makes precision rollups a pure ``substr`` — no re-encode.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "geohash_encode",
    "geohash_decode",
    "geohash_bounds",
    "geohash_neighbors",
]

_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"
_CHAR_TO_VAL = {c: i for i, c in enumerate(_BASE32)}


def _quantize(lons: np.ndarray, lats: np.ndarray, precision: int):
    total = 5 * precision
    lon_bits = (total + 1) // 2  # longitude takes the first (even) bits
    lat_bits = total // 2
    lon = np.asarray(lons, dtype=np.float64)
    lat = np.asarray(lats, dtype=np.float64)
    lon_q = np.floor((lon + 180.0) / 360.0 * (1 << lon_bits)).astype(np.int64)
    lat_q = np.floor((lat + 90.0) / 180.0 * (1 << lat_bits)).astype(np.int64)
    np.clip(lon_q, 0, (1 << lon_bits) - 1, out=lon_q)
    np.clip(lat_q, 0, (1 << lat_bits) - 1, out=lat_q)
    return lon_q, lat_q, lon_bits, lat_bits, total


def geohash_encode(lons, lats, precision: int = 12) -> np.ndarray:
    """(lon, lat) arrays → array of geohash strings (1 ≤ precision ≤ 12)."""
    if not 1 <= precision <= 12:
        raise ValueError("precision must be in [1, 12]")
    lon_q, lat_q, lon_bits, lat_bits, total = _quantize(lons, lats, precision)
    z = np.zeros(lon_q.shape, dtype=np.int64)
    for i in range(lon_bits):  # bit 0 (MSB of z) is the longitude MSB
        z |= ((lon_q >> (lon_bits - 1 - i)) & 1) << (total - 1 - 2 * i)
    for i in range(lat_bits):
        z |= ((lat_q >> (lat_bits - 1 - i)) & 1) << (total - 2 - 2 * i)
    chars = np.empty((len(z), precision), dtype="U1")
    for k in range(precision):
        idx = (z >> (total - 5 - 5 * k)) & 31
        chars[:, k] = np.array(list(_BASE32))[idx]
    return np.array(["".join(row) for row in chars])


def _unpack(h: str):
    total = 5 * len(h)
    lon_bits = (total + 1) // 2
    lat_bits = total // 2
    z = 0
    for c in h:
        z = (z << 5) | _CHAR_TO_VAL[c]
    lon_q = lat_q = 0
    for i in range(lon_bits):
        lon_q = (lon_q << 1) | ((z >> (total - 1 - 2 * i)) & 1)
    for i in range(lat_bits):
        lat_q = (lat_q << 1) | ((z >> (total - 2 - 2 * i)) & 1)
    return lon_q, lat_q, lon_bits, lat_bits


def geohash_bounds(h: str) -> tuple[float, float, float, float]:
    """(lon_min, lat_min, lon_max, lat_max) of the cell."""
    lon_q, lat_q, lon_bits, lat_bits = _unpack(h)
    lon_w = 360.0 / (1 << lon_bits)
    lat_w = 180.0 / (1 << lat_bits)
    lon0 = -180.0 + lon_q * lon_w
    lat0 = -90.0 + lat_q * lat_w
    return (lon0, lat0, lon0 + lon_w, lat0 + lat_w)


def geohash_decode(h: str) -> tuple[float, float]:
    """Cell center (lon, lat)."""
    x0, y0, x1, y1 = geohash_bounds(h)
    return ((x0 + x1) / 2.0, (y0 + y1) / 2.0)


def geohash_neighbors(h: str) -> list[str]:
    """The up-to-8 neighboring cells at the same precision (decode →
    shift by one cell width → re-encode; E/W wrap at the antimeridian,
    N/S clamp at the poles)."""
    lon_q, lat_q, lon_bits, lat_bits = _unpack(h)
    lon_w = 360.0 / (1 << lon_bits)
    lat_w = 180.0 / (1 << lat_bits)
    cx, cy = geohash_decode(h)
    out = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            lon = cx + dx * lon_w
            lat = cy + dy * lat_w
            if lat <= -90.0 or lat >= 90.0:
                continue  # no cell beyond the poles
            if lon < -180.0:
                lon += 360.0
            elif lon >= 180.0:
                lon -= 360.0
            out.append(str(geohash_encode([lon], [lat], len(h))[0]))
    # dedup while preserving order (poles collapse duplicates)
    seen: set = set()
    return [n for n in out if not (n in seen or seen.add(n))]
