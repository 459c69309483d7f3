"""Axial-coordinate hexagonal tiling with kRing — the hex analogue of H3.

An honest, from-scratch hexagonal index over the equirectangular plane
(pointy-top hexes in lon/lat space, axial (q, r) coordinates with cube
rounding). It provides the hex-grid semantics the north_star uses H3 for —
``latLngToCell`` at res 0-15 and ``kRing`` neighbor expansion — as a single
BIGINT id compatible with range/hash partitioning and sort-merge joins.

Note: this is NOT the H3 icosahedral index and its ids are NOT
H3-interoperable — per ADR-001 (SURVEY §8), S2 (`cells/s2.py`) is the
canonical id system and this module provides hex tiling/display
semantics. Resolutions scale by aperture 2: hex circumradius at res r is
``8.0 / 2^r`` degrees.
"""

from __future__ import annotations

import numpy as np

__all__ = ["hex_cell", "hex_decode", "hex_kring", "hex_center", "hex_resolution_size", "hex_parent", "hex_children"]

_BASE_SIZE = 8.0  # circumradius in degrees at res 0
_Q_SHIFT = 28
_RES_SHIFT = 56
_OFFSET = 1 << 27  # bias so q/r are non-negative in the packed id
_SQRT3 = np.sqrt(3.0)


def hex_resolution_size(res: int) -> float:
    return _BASE_SIZE / (1 << res)


def hex_cell(lon, lat, res: int):
    """Vectorized lon/lat → hex cell id (axial coords, cube rounding)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    size = hex_resolution_size(res)
    # pointy-top axial: q = (sqrt(3)/3 x − 1/3 y)/size ; r = (2/3 y)/size
    qf = (_SQRT3 / 3.0 * lon - lat / 3.0) / size
    rf = (2.0 / 3.0 * lat) / size
    q, r = _cube_round(qf, rf)
    return (
        (np.int64(res) << _RES_SHIFT)
        | ((q + _OFFSET) << _Q_SHIFT)
        | (r + _OFFSET)
    )


def _cube_round(qf, rf):
    sf = -qf - rf
    q = np.round(qf)
    r = np.round(rf)
    s = np.round(sf)
    dq = np.abs(q - qf)
    dr = np.abs(r - rf)
    ds = np.abs(s - sf)
    fix_q = (dq > dr) & (dq > ds)
    fix_r = (~fix_q) & (dr > ds)
    q = np.where(fix_q, -r - s, q)
    r = np.where(fix_r, -q - s, r)
    return q.astype(np.int64), r.astype(np.int64)


def hex_decode(cell_id):
    cid = np.asarray(cell_id, dtype=np.int64)
    res = cid >> _RES_SHIFT
    q = ((cid >> _Q_SHIFT) & ((np.int64(1) << 28) - 1)) - _OFFSET
    r = (cid & ((np.int64(1) << _Q_SHIFT) - 1)) - _OFFSET
    return res, q, r


def hex_center(cell_id):
    """cell id → (lon, lat) of the hex center."""
    res, q, r = hex_decode(cell_id)
    size = _BASE_SIZE / (np.int64(1) << res).astype(np.float64)
    lon = size * _SQRT3 * (q + r / 2.0)
    lat = size * 1.5 * r
    return lon, lat


def hex_kring(cell_id, k: int = 1):
    """All hexes within hex-distance k → shape (n, 1+3k(k+1)) array
    (the standard hex-ring count: 1 + 3k(k+1))."""
    cid = np.asarray(cell_id, dtype=np.int64)
    res, q, r = hex_decode(cid)
    deltas = [
        (dq, dr)
        for dq in range(-k, k + 1)
        for dr in range(max(-k, -dq - k), min(k, -dq + k) + 1)
    ]
    out = np.empty((len(cid), len(deltas)), dtype=np.int64)
    for col, (dq, dr) in enumerate(deltas):
        out[:, col] = (
            (res << _RES_SHIFT)
            | ((q + dq + _OFFSET) << _Q_SHIFT)
            | (r + dr + _OFFSET)
        )
    return out


def hex_parent(cell_id, parent_res: int):
    """Hierarchy: the parent hex CONTAINING each cell's center at
    ``parent_res`` (H3-style approximate containment — hexagons do not
    nest exactly, so like H3's aperture-7 hierarchy, a child belongs to
    exactly one parent and parents cover children's centers, not their
    full footprints)."""
    lon, lat = hex_center(cell_id)
    return hex_cell(lon, lat, parent_res)


def hex_children(cell_id, child_res: int):
    """Candidate children: child-res cells within the kRing that covers the
    parent footprint, filtered to those whose parent is this cell. Exact
    inverse of ``hex_parent`` (used for rollups/covering)."""
    cid = np.asarray(cell_id, dtype=np.int64)
    res, _q, _r = hex_decode(cid)
    out = []
    for c in cid.ravel():
        r0 = int(np.asarray(hex_decode(np.array([c]))[0])[0])
        lon, lat = hex_center(np.array([c]))
        base = hex_cell(lon, lat, child_res)
        k = 2 ** (child_res - r0) + 1
        cand = hex_kring(base, k=k)[0]
        par = hex_parent(cand, r0)
        out.append(np.unique(cand[par == c]))
    return out
