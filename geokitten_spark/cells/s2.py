"""Pure-numpy S2 cell index (lat/lng → cell id, parent/children, neighbors).

Implemented from the published S2 geometry spec (quadratic ST projection,
face/IJ quadtree, Hilbert-curve position, 64-bit cell id layout: 3 face bits,
2·level position bits, one trailing marker bit). No native library, no
external data — SURVEY.md §7 step 4. Vectorized over numpy int64/float64
arrays so it runs inside Arrow-batched pandas UDFs.

Cell id layout (standard S2): ``id = face·2^61 + pos·2 + 1`` for leaf cells
(level 30); a level-l cell id has its lowest set bit at position 2·(30−l).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "MAX_LEVEL",
    "lat_lng_to_cell",
    "cell_to_lat_lng",
    "cell_level",
    "parent",
    "children",
    "edge_neighbors",
    "all_neighbors",
    "cell_range",
    "polygon_cover_cells",
]

MAX_LEVEL = 30
POS_BITS = 2 * MAX_LEVEL + 1  # 61
MAX_SIZE = 1 << MAX_LEVEL

_LOOKUP_BITS = 4
_SWAP_MASK = 1
_INVERT_MASK = 2

# Hilbert sub-cell traversal tables (S2 spec)
_POS_TO_IJ = ((0, 1, 3, 2), (0, 2, 3, 1), (3, 2, 0, 1), (3, 1, 0, 2))
_POS_TO_ORIENTATION = (_SWAP_MASK, 0, 0, _INVERT_MASK + _SWAP_MASK)

_LOOKUP_POS = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.int64)
_LOOKUP_IJ = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.int64)


def _init_lookup_cell(level, i, j, orig_orientation, pos, orientation):
    if level == _LOOKUP_BITS:
        ij = (i << _LOOKUP_BITS) + j
        _LOOKUP_POS[(ij << 2) + orig_orientation] = (pos << 2) + orientation
        _LOOKUP_IJ[(pos << 2) + orig_orientation] = (ij << 2) + orientation
        return
    level += 1
    i <<= 1
    j <<= 1
    pos <<= 2
    r = _POS_TO_IJ[orientation]
    for index in range(4):
        _init_lookup_cell(
            level,
            i + (r[index] >> 1),
            j + (r[index] & 1),
            orig_orientation,
            pos + index,
            orientation ^ _POS_TO_ORIENTATION[index],
        )


for _orientation in range(4):
    _init_lookup_cell(0, 0, 0, _orientation, 0, _orientation)


# ---------------------------------------------------------------------------
# sphere ↔ face/uv/st/ij
# ---------------------------------------------------------------------------

def _lat_lng_to_xyz(lat_deg, lng_deg):
    phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
    theta = np.radians(np.asarray(lng_deg, dtype=np.float64))
    cosphi = np.cos(phi)
    return np.cos(theta) * cosphi, np.sin(theta) * cosphi, np.sin(phi)


def _xyz_to_face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    face = face + np.where(
        np.choose(face, [x, y, z]) < 0, 3, 0
    )
    u = np.empty_like(np.asarray(x, dtype=np.float64))
    v = np.empty_like(u)
    for f, (ufun, vfun) in enumerate(
        [
            (lambda x, y, z: y / x, lambda x, y, z: z / x),       # face 0 (+x)
            (lambda x, y, z: -x / y, lambda x, y, z: z / y),      # face 1 (+y)
            (lambda x, y, z: -x / z, lambda x, y, z: -y / z),     # face 2 (+z)
            (lambda x, y, z: z / x, lambda x, y, z: y / x),       # face 3 (−x)
            (lambda x, y, z: z / y, lambda x, y, z: -x / y),      # face 4 (−y)
            (lambda x, y, z: -y / z, lambda x, y, z: -x / z),     # face 5 (−z)
        ]
    ):
        m = face == f
        if np.any(m):
            xm, ym, zm = np.asarray(x)[m], np.asarray(y)[m], np.asarray(z)[m]
            u[m] = ufun(xm, ym, zm)
            v[m] = vfun(xm, ym, zm)
    return face.astype(np.int64), u, v


def _face_uv_to_xyz(face, u, v):
    face = np.asarray(face)
    u = np.asarray(u, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    # canonical S2 FaceUVtoXYZ table:
    # f0 (1,u,v) f1 (−u,1,v) f2 (−u,−v,1) f3 (−1,−v,−u) f4 (v,−1,−u) f5 (v,u,−1)
    one = np.ones_like(u)
    xs = [one, -u, -u, -one, v, v]
    ys = [u, one, -v, -v, -one, u]
    zs = [v, v, one, -u, -u, -one]
    x = np.choose(face, xs)
    y = np.choose(face, ys)
    z = np.choose(face, zs)
    return x, y, z


def _uv_to_st(u):
    """Quadratic projection (S2_QUADRATIC_PROJECTION)."""
    u = np.asarray(u, dtype=np.float64)
    with np.errstate(invalid="ignore"):
        return np.where(
            u >= 0.0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u)
        )


def _st_to_uv(s):
    s = np.asarray(s, dtype=np.float64)
    return np.where(
        s >= 0.5, (1.0 / 3.0) * (4.0 * s * s - 1.0), (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s))
    )


def _st_to_ij(s):
    return np.clip(
        np.floor(MAX_SIZE * np.asarray(s, dtype=np.float64)).astype(np.int64),
        0,
        MAX_SIZE - 1,
    )


# ---------------------------------------------------------------------------
# face/ij ↔ cell id (Hilbert curve, vectorized lookup-table walk)
# ---------------------------------------------------------------------------

def _from_face_ij(face, i, j):
    """(face, i, j) leaf coords → leaf cell ids. All int64 numpy arrays."""
    face = np.asarray(face, dtype=np.int64)
    i = np.asarray(i, dtype=np.int64)
    j = np.asarray(j, dtype=np.int64)
    n = face << (POS_BITS - 1)
    bits = face & _SWAP_MASK
    mask = (1 << _LOOKUP_BITS) - 1
    for k in range(7, -1, -1):
        bits = bits + (((i >> (k * _LOOKUP_BITS)) & mask) << (_LOOKUP_BITS + 2))
        bits = bits + (((j >> (k * _LOOKUP_BITS)) & mask) << 2)
        bits = _LOOKUP_POS[bits]
        n = n | ((bits >> 2) << (k * 2 * _LOOKUP_BITS))
        bits = bits & (_SWAP_MASK | _INVERT_MASK)
    return n * 2 + 1


def _to_face_ij(cell_id):
    """Leaf-aligned decode: cell ids → (face, i, j) of the leaf at the cell's
    Hilbert position (range start ~ i,j of lowest leaf)."""
    # ids for faces 4-5 are negative as int64; decode via the uint64 view
    cid = np.asarray(cell_id, dtype=np.int64).view(np.uint64)
    face = (cid >> np.uint64(POS_BITS)).astype(np.int64)
    bits = face & _SWAP_MASK
    i = np.zeros(len(cid), dtype=np.int64)
    j = np.zeros(len(cid), dtype=np.int64)
    for k in range(7, -1, -1):
        nbits = (MAX_LEVEL - 7 * _LOOKUP_BITS) if k == 7 else _LOOKUP_BITS
        chunk = (
            (cid >> np.uint64(k * 2 * _LOOKUP_BITS + 1))
            & np.uint64((1 << (2 * nbits)) - 1)
        ).astype(np.int64)
        bits = bits + (chunk << 2)
        bits = _LOOKUP_IJ[bits]
        i = i + ((bits >> (_LOOKUP_BITS + 2)) << (k * _LOOKUP_BITS))
        j = j + (((bits >> 2) & ((1 << _LOOKUP_BITS) - 1)) << (k * _LOOKUP_BITS))
        bits = bits & (_SWAP_MASK | _INVERT_MASK)
    return face, i, j


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def _lsb_for_level(level):
    return np.int64(1) << (2 * (MAX_LEVEL - np.asarray(level, dtype=np.int64)))


def lat_lng_to_cell(lat, lng, level: int):
    """Vectorized lat/lng (degrees) → S2 cell id at ``level``."""
    x, y, z = _lat_lng_to_xyz(lat, lng)
    face, u, v = _xyz_to_face_uv(x, y, z)
    i = _st_to_ij(_uv_to_st(u))
    j = _st_to_ij(_uv_to_st(v))
    leaf = _from_face_ij(face, i, j)
    if level >= MAX_LEVEL:
        return leaf
    lsb = _lsb_for_level(level)
    return (leaf & -lsb) | lsb


def cell_level(cell_id):
    """Level of each cell id (position of lowest set bit)."""
    cid = np.asarray(cell_id, dtype=np.int64)
    lsb = cid & -cid
    # level = 30 - (bit_position / 2)
    bitpos = np.zeros_like(cid)
    v = lsb.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        big = v >= (np.int64(1) << shift)
        bitpos = bitpos + np.where(big, shift, 0)
        v = np.where(big, v >> shift, v)
    return MAX_LEVEL - bitpos // 2


def parent(cell_id, level: int):
    lsb = _lsb_for_level(level)
    cid = np.asarray(cell_id, dtype=np.int64)
    return (cid & -lsb) | lsb


def children(cell_id):
    """Four children of each cell (returns shape (n, 4))."""
    cid = np.asarray(cell_id, dtype=np.int64)
    lsb = cid & -cid
    nlsb = lsb >> 2
    offs = np.arange(4, dtype=np.int64) * 2 + 1
    return (cid - lsb)[:, None] + nlsb[:, None] * offs[None, :]


def cell_to_lat_lng(cell_id):
    """Cell ids → (lat, lng) degrees of the cell center."""
    cid = np.asarray(cell_id, dtype=np.int64)
    face, i, j = _to_face_ij(cid)
    lsb = cid & -cid
    # center leaf coordinate: the decoded (i, j) is the position-curve leaf;
    # snap to the cell's ij block and take the center
    # lsb = 2^(2·(30−level)) ⇒ cell IJ size = sqrt(lsb) = 2^(30−level)
    size_int = np.round(np.sqrt(lsb.astype(np.float64))).astype(np.int64)
    size_int = np.maximum(size_int, 1)
    i0 = i & ~(size_int - 1)
    j0 = j & ~(size_int - 1)
    s = (i0.astype(np.float64) + size_int * 0.5) / MAX_SIZE
    t = (j0.astype(np.float64) + size_int * 0.5) / MAX_SIZE
    u = _st_to_uv(s)
    v = _st_to_uv(t)
    x, y, z = _face_uv_to_xyz(face, u, v)
    lat = np.degrees(np.arctan2(z, np.sqrt(x * x + y * y)))
    lng = np.degrees(np.arctan2(y, x))
    return lat, lng


def cell_range(cell_id):
    """(range_min, range_max) leaf-id range covered by each cell — the
    integer interval used for range-partition pruning (SURVEY §4)."""
    cid = np.asarray(cell_id, dtype=np.int64)
    lsb = cid & -cid
    return cid - lsb + 1, cid + lsb - 1


def _from_face_ij_wrap_scalar(face: int, i: int, j: int) -> int:
    """Leaf id for possibly-out-of-face (i, j), wrapping across the cube edge
    (linear uv scale is exact enough immediately across the boundary)."""
    i = max(-1, min(MAX_SIZE, i))
    j = max(-1, min(MAX_SIZE, j))
    scale = 1.0 / MAX_SIZE
    lim = np.nextafter(1.0, 2.0)
    u = max(-lim, min(lim, scale * (2 * (i - MAX_SIZE // 2) + 1)))
    v = max(-lim, min(lim, scale * (2 * (j - MAX_SIZE // 2) + 1)))
    x, y, z = _face_uv_to_xyz(np.array([face]), np.array([u]), np.array([v]))
    f2, u2, v2 = _xyz_to_face_uv(x, y, z)
    i2 = _st_to_ij(0.5 * (u2 + 1.0))
    j2 = _st_to_ij(0.5 * (v2 + 1.0))
    return int(_from_face_ij(f2, i2, j2)[0])


def edge_neighbors(cell_id):
    """Four edge neighbors per cell at the same level → shape (n, 4).

    Same-face neighbors are vectorized; cube-edge crossings (rare: only the
    outermost cells of each face) fall back to the scalar wrap path.
    """
    cid = np.asarray(cell_id, dtype=np.int64)
    level = cell_level(cid)
    face, i, j = _to_face_ij(cid)
    size = (np.int64(1) << (MAX_LEVEL - level)).astype(np.int64)
    i0 = i & ~(size - 1)
    j0 = j & ~(size - 1)
    out = np.empty((len(cid), 4), dtype=np.int64)
    offsets = [(0, -1), (1, 0), (0, 1), (-1, 0)]  # down, right, up, left
    for k, (di, dj) in enumerate(offsets):
        ni = i0 + di * size
        nj = j0 + dj * size
        inside = (ni >= 0) & (ni < MAX_SIZE) & (nj >= 0) & (nj < MAX_SIZE)
        leaf = np.where(
            inside, _from_face_ij(face, np.clip(ni, 0, MAX_SIZE - 1), np.clip(nj, 0, MAX_SIZE - 1)), 0
        )
        for idx in np.nonzero(~inside)[0]:
            leaf[idx] = _from_face_ij_wrap_scalar(int(face[idx]), int(ni[idx]), int(nj[idx]))
        lsb = _lsb_for_level(level)
        out[:, k] = (leaf & -lsb) | lsb
    return out


def all_neighbors(cell_id, k: int = 1):
    """k-ring neighborhood (cells within Chebyshev distance k in IJ space,
    same level), including the cell itself. Returns a list of per-cell
    unique id arrays (ragged)."""
    cid = np.asarray(cell_id, dtype=np.int64)
    level = cell_level(cid)
    face, i, j = _to_face_ij(cid)
    size = (np.int64(1) << (MAX_LEVEL - level)).astype(np.int64)
    i0 = i & ~(size - 1)
    j0 = j & ~(size - 1)
    results = []
    for n in range(len(cid)):
        ids = set()
        lsb = int(_lsb_for_level(int(level[n])))
        for di in range(-k, k + 1):
            for dj in range(-k, k + 1):
                ni = int(i0[n]) + di * int(size[n])
                nj = int(j0[n]) + dj * int(size[n])
                if 0 <= ni < MAX_SIZE and 0 <= nj < MAX_SIZE:
                    leaf = int(_from_face_ij(np.array([face[n]]), np.array([ni]), np.array([nj]))[0])
                else:
                    leaf = _from_face_ij_wrap_scalar(int(face[n]), ni, nj)
                ids.add((leaf & -lsb) | lsb)
        results.append(np.fromiter(sorted(ids), dtype=np.int64))
    return results


def polygon_cover_cells(rings, level: int, max_cells: int = 4096):
    """Approximate interior+boundary cell cover of a polygon part at
    ``level``: rasterize the bbox lat/lng grid at the cell-center spacing of
    that level, keep centers inside (even-odd) plus boundary-sampled cells.
    Used to turn boundary polygons into a cell-equi-join prefilter (J2/J3)."""
    from ..geom.kernels import points_in_rings

    ext = np.asarray(rings[0], dtype=np.float64)[:, :2]
    xmin, ymin = ext.min(axis=0)
    xmax, ymax = ext.max(axis=0)
    # cell angular size ~ 90° / 2^level on a face; sample at half that
    step = 90.0 / (1 << level) / 2.0
    xs = np.arange(xmin, xmax + step, step)
    ys = np.arange(ymin, ymax + step, step)
    if len(xs) * len(ys) > max_cells * 16:
        stride = int(np.ceil(np.sqrt(len(xs) * len(ys) / (max_cells * 16))))
        xs = xs[::stride]
        ys = ys[::stride]
    gx, gy = np.meshgrid(xs, ys)
    gx = gx.ravel()
    gy = gy.ravel()
    inside = points_in_rings(gx, gy, rings)
    pts_x = gx[inside]
    pts_y = gy[inside]
    # boundary samples so thin polygons are never missed
    bx, by = [], []
    for ring in rings:
        r = np.asarray(ring, dtype=np.float64)[:, :2]
        seg = np.diff(r, axis=0)
        seglen = np.hypot(seg[:, 0], seg[:, 1])
        nsamp = np.maximum(1, np.ceil(seglen / step).astype(int))
        for sidx in range(len(seg)):
            t = np.linspace(0.0, 1.0, nsamp[sidx] + 1)
            bx.append(r[sidx, 0] + t * seg[sidx, 0])
            by.append(r[sidx, 1] + t * seg[sidx, 1])
    px = np.concatenate([pts_x] + bx)
    py = np.concatenate([pts_y] + by)
    if len(px) == 0:
        return np.empty(0, dtype=np.int64)
    cells = lat_lng_to_cell(py, px, level)
    return np.unique(cells)
