"""Pure-numpy H3 cell index (lat/lng → H3 cell id, parent, kRing, centers).

Implemented from the published H3 grid specification (Uber H3, Apache-2.0):
icosahedron gnomonic projection per face, aperture-7 hex grid with
alternating Class II/III resolutions, 122 base cells (110 hexagons + 12
pentagons at the icosahedron vertices), 64-bit index layout
(mode 1, 4 resolution bits, 7 base-cell bits, 15 × 3-bit digits).

Only the irreducible *conventions* are transcribed from the spec:

- ``FACE_CENTER_GEO`` — the 20 icosahedron face centers (lat/lng radians).
  Validated at derivation time: the 20 points must form a regular
  icosahedron (antipodal pairs, uniform adjacent-face angles).
- ``FACE_I_AXIS_AZ`` — azimuth (radians east of north) from each face
  center to its Class-II i-axis. Validated: each azimuth must coincide
  with the azimuth to one of the face's three (derived) vertices.
- ``BASE_CELL_DATA`` — home face + ijk for each of the 122 base cells,
  pentagon flags and cw-offset faces. Validated: the 12 pentagons must sit
  exactly on the 12 derived icosahedron vertices; every in-range
  (face, ijk) position must land on exactly one base-cell center.

Everything else (face-neighbor affine transforms, the face/ijk →
base-cell inverse table, per-entry ccw rotation counts) is *derived*
numerically by ``scripts/derive_h3_tables.py`` and frozen into
``h3_derived.py``; the derivation is self-checking (exact integer solves
for the edge transforms, consistency voting over shared-edge sample
points for rotations) and the test-suite re-verifies published test
vectors plus structural invariants (cell counts 122 / 842 / 5882 at
res 0/1/2, roundtrip idempotence, parent containment).

Reference parity: this replaces the ADR-001 stance (S2-only) with true
H3-interoperable ids as named by the project north rule; see
reference usage of cell tiling in gdf_standardization.py (tiling
semantics only — the reference has no H3 code).

All public entry points are vectorized over numpy arrays so they run
inside Arrow-batched pandas UDFs without per-row Python.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = [
    "MAX_RES",
    "latlng_to_cell",
    "cell_to_latlng",
    "cell_to_parent",
    "cell_to_center_child",
    "get_resolution",
    "get_base_cell",
    "is_pentagon",
    "is_valid_cell",
    "grid_disk",
    "grid_disk_arrays",
    "grid_distance",
    "grid_ring",
    "grid_path_cells",
    "cell_neighbors",
    "cell_to_string",
    "string_to_cell",
]

MAX_RES = 15
NUM_FACES = 20
NUM_BASE_CELLS = 122

M_SQRT7 = math.sqrt(7.0)
M_SIN60 = math.sqrt(3.0) / 2.0
# gnomonic distance between adjacent res-0 cell centers = 1/phi^2
RES0_U_GNOMONIC = (3.0 - math.sqrt(5.0)) / 2.0
# rotation between successive (Class III) resolutions
M_AP7_ROT_RADS = math.asin(math.sqrt(3.0 / 28.0))

# --- 64-bit index layout (H3 spec) ---------------------------------------
H3_MODE_CELL = 1
_MODE_SHIFT = 59
_RES_SHIFT = 52
_BC_SHIFT = 45
_DIGIT_BITS = 3
_ALL_DIGITS = (1 << 45) - 1  # fifteen 3-bit digits set to 7

# digits
CENTER_DIGIT = 0
K_AXES_DIGIT = 1
J_AXES_DIGIT = 2
JK_AXES_DIGIT = 3
I_AXES_DIGIT = 4
IK_AXES_DIGIT = 5
IJ_AXES_DIGIT = 6
INVALID_DIGIT = 7

# digit -> unit ijk vector (index = i*4 + j*2 + k)
UNIT_VECS = np.array(
    [
        [0, 0, 0],  # center
        [0, 0, 1],  # k
        [0, 1, 0],  # j
        [0, 1, 1],  # jk
        [1, 0, 0],  # i
        [1, 0, 1],  # ik
        [1, 1, 0],  # ij
    ],
    dtype=np.int64,
)

# 60 degree rotations of a single digit (ccw cycle i -> ij -> j -> jk -> k -> ik)
_ROT60_CCW_DIGIT = np.array([0, 5, 3, 1, 6, 4, 2, 7], dtype=np.int64)
_ROT60_CW_DIGIT = np.array([0, 3, 6, 2, 5, 1, 4, 7], dtype=np.int64)

# ---------------------------------------------------------------------------
# Transcribed tables (published H3 spec constants; see module docstring for
# the independent validation each one passes before use).
# ---------------------------------------------------------------------------

# (lat, lng) radians of the 20 icosahedron face centers.
FACE_CENTER_GEO = np.array(
    [
        [0.803582649718989942, 1.248397419617396099],
        [1.307747883455638156, 2.536945009877921159],
        [1.054751253523952054, -1.347517358900396623],
        [0.600191595538186799, -0.450603909469755746],
        [0.491715428198773866, 0.401988202911306943],
        [0.172745327415618701, 1.678146885280433686],
        [0.605929321571350690, 2.953923329812411617],
        [0.427370518328979641, -1.888876200336285401],
        [-0.079066118549212831, -0.733429513380867741],
        [-0.230961644455383637, 0.506495587332349035],
        [0.079066118549212831, 2.408163140208925497],
        [0.230961644455383637, -2.635097066257444203],
        [-0.172745327415618701, -1.463445768309359553],
        [-0.605929321571350690, -0.187669323777381622],
        [-0.427370518328979641, 1.252716453253569838],
        [-0.600191595538186799, 2.690988744120037492],
        [-0.491715428198773866, -2.739604450678486295],
        [-0.803582649718989942, -1.893195233972397139],
        [-1.307747883455638156, -0.604647643711872080],
        [-1.054751253523952054, 1.794075294689396615],
    ],
    dtype=np.float64,
)

# Azimuth (radians east of north) from each face center to its Class II
# i-axis. Only column 0 of the spec's faceAxesAzRadsCII is needed (the j/k
# axes are at -120 / -240 degrees). Each value is validated against — and
# then replaced by — the exactly-derived azimuth to the matching
# icosahedron vertex in scripts/derive_h3_tables.py.
FACE_I_AXIS_AZ = np.array(
    [
        5.619958268523939882,
        5.760339081714187279,
        0.780213654393430055,
        0.430469363979999913,
        6.130269123335111400,
        2.692877706530642877,
        2.982963003477243874,
        3.532912002790141181,
        3.494305004259568154,
        3.003214169499538391,
        5.930472956509811562,
        0.138378484090254847,
        0.448714947059150361,
        0.158629650112549365,
        5.891865957979238535,
        2.711123289609793325,
        3.294508837434268316,
        3.804819692245439833,
        3.664438879055192436,
        2.361378999196363184,
    ],
    dtype=np.float64,
)

# Per base cell: (home_face, i, j, k, is_pentagon, cw_off_a, cw_off_b).
# cw_off_* are the two faces (or -1) from which a pentagon's leading-K
# digit sequence takes a clockwise instead of ccw offset rotation.
BASE_CELL_DATA = np.array(
    [
        (1, 1, 0, 0, 0, -1, -1),    # 0
        (2, 1, 1, 0, 0, -1, -1),    # 1
        (1, 0, 0, 0, 0, -1, -1),    # 2
        (2, 1, 0, 0, 0, -1, -1),    # 3
        (0, 2, 0, 0, 1, -1, -1),    # 4 (pentagon, polar)
        (1, 1, 1, 0, 0, -1, -1),    # 5
        (1, 0, 0, 1, 0, -1, -1),    # 6
        (2, 0, 0, 0, 0, -1, -1),    # 7
        (0, 1, 0, 0, 0, -1, -1),    # 8
        (2, 0, 1, 0, 0, -1, -1),    # 9
        (1, 0, 1, 0, 0, -1, -1),    # 10
        (1, 0, 1, 1, 0, -1, -1),    # 11
        (3, 1, 0, 0, 0, -1, -1),    # 12
        (3, 1, 1, 0, 0, -1, -1),    # 13
        (11, 2, 0, 0, 1, 2, 6),     # 14 (pentagon)
        (4, 1, 0, 0, 0, -1, -1),    # 15
        (0, 0, 0, 0, 0, -1, -1),    # 16
        (6, 0, 1, 0, 0, -1, -1),    # 17
        (0, 0, 0, 1, 0, -1, -1),    # 18
        (2, 0, 1, 1, 0, -1, -1),    # 19
        (7, 0, 0, 1, 0, -1, -1),    # 20
        (2, 0, 0, 1, 0, -1, -1),    # 21
        (0, 1, 1, 0, 0, -1, -1),    # 22
        (6, 0, 0, 1, 0, -1, -1),    # 23
        (10, 2, 0, 0, 1, 1, 5),     # 24 (pentagon)
        (6, 0, 0, 0, 0, -1, -1),    # 25
        (3, 0, 0, 0, 0, -1, -1),    # 26
        (11, 1, 0, 0, 0, -1, -1),   # 27
        (4, 1, 1, 0, 0, -1, -1),    # 28
        (3, 0, 1, 0, 0, -1, -1),    # 29
        (0, 0, 1, 1, 0, -1, -1),    # 30
        (4, 0, 0, 0, 0, -1, -1),    # 31
        (5, 0, 1, 0, 0, -1, -1),    # 32
        (0, 0, 1, 0, 0, -1, -1),    # 33
        (7, 0, 1, 0, 0, -1, -1),    # 34
        (11, 1, 1, 0, 0, -1, -1),   # 35
        (7, 0, 0, 0, 0, -1, -1),    # 36
        (10, 1, 0, 0, 0, -1, -1),   # 37
        (12, 2, 0, 0, 1, 3, 7),     # 38 (pentagon)
        (6, 1, 0, 1, 0, -1, -1),    # 39
        (7, 1, 0, 1, 0, -1, -1),    # 40
        (4, 0, 0, 1, 0, -1, -1),    # 41
        (3, 0, 0, 1, 0, -1, -1),    # 42
        (3, 0, 1, 1, 0, -1, -1),    # 43
        (4, 0, 1, 0, 0, -1, -1),    # 44
        (6, 1, 0, 0, 0, -1, -1),    # 45
        (11, 0, 0, 0, 0, -1, -1),   # 46
        (8, 0, 0, 1, 0, -1, -1),    # 47
        (5, 0, 0, 1, 0, -1, -1),    # 48
        (14, 2, 0, 0, 1, 0, 9),     # 49 (pentagon)
        (5, 0, 0, 0, 0, -1, -1),    # 50
        (12, 1, 0, 0, 0, -1, -1),   # 51
        (10, 1, 1, 0, 0, -1, -1),   # 52
        (4, 0, 1, 1, 0, -1, -1),    # 53
        (12, 1, 1, 0, 0, -1, -1),   # 54
        (7, 1, 0, 0, 0, -1, -1),    # 55
        (11, 0, 1, 0, 0, -1, -1),   # 56
        (10, 0, 0, 0, 0, -1, -1),   # 57
        (13, 2, 0, 0, 1, 4, 8),     # 58 (pentagon)
        (10, 0, 0, 1, 0, -1, -1),   # 59
        (11, 0, 0, 1, 0, -1, -1),   # 60
        (9, 0, 1, 0, 0, -1, -1),    # 61
        (8, 0, 1, 0, 0, -1, -1),    # 62
        (6, 2, 0, 0, 1, 11, 15),    # 63 (pentagon)
        (8, 0, 0, 0, 0, -1, -1),    # 64
        (9, 0, 0, 1, 0, -1, -1),    # 65
        (14, 1, 0, 0, 0, -1, -1),   # 66
        (5, 1, 0, 1, 0, -1, -1),    # 67
        (16, 0, 1, 1, 0, -1, -1),   # 68
        (8, 1, 0, 1, 0, -1, -1),    # 69
        (5, 1, 0, 0, 0, -1, -1),    # 70
        (12, 0, 0, 0, 0, -1, -1),   # 71
        (7, 2, 0, 0, 1, 12, 16),    # 72 (pentagon)
        (12, 0, 1, 0, 0, -1, -1),   # 73
        (10, 0, 1, 0, 0, -1, -1),   # 74
        (9, 0, 0, 0, 0, -1, -1),    # 75
        (13, 1, 0, 0, 0, -1, -1),   # 76
        (16, 0, 0, 1, 0, -1, -1),   # 77
        (15, 0, 1, 1, 0, -1, -1),   # 78
        (15, 0, 1, 0, 0, -1, -1),   # 79
        (16, 0, 1, 0, 0, -1, -1),   # 80
        (14, 1, 1, 0, 0, -1, -1),   # 81
        (13, 1, 1, 0, 0, -1, -1),   # 82
        (5, 2, 0, 0, 1, 10, 19),    # 83 (pentagon)
        (8, 1, 0, 0, 0, -1, -1),    # 84
        (14, 0, 0, 0, 0, -1, -1),   # 85
        (9, 1, 0, 1, 0, -1, -1),    # 86
        (14, 0, 0, 1, 0, -1, -1),   # 87
        (17, 0, 0, 1, 0, -1, -1),   # 88
        (12, 0, 0, 1, 0, -1, -1),   # 89
        (16, 0, 0, 0, 0, -1, -1),   # 90
        (17, 0, 1, 1, 0, -1, -1),   # 91
        (15, 0, 0, 1, 0, -1, -1),   # 92
        (16, 1, 0, 1, 0, -1, -1),   # 93
        (9, 1, 0, 0, 0, -1, -1),    # 94
        (15, 0, 0, 0, 0, -1, -1),   # 95
        (13, 0, 0, 0, 0, -1, -1),   # 96
        (8, 2, 0, 0, 1, 13, 17),    # 97 (pentagon)
        (13, 0, 1, 0, 0, -1, -1),   # 98
        (17, 1, 0, 1, 0, -1, -1),   # 99
        (19, 0, 1, 0, 0, -1, -1),   # 100
        (14, 0, 1, 0, 0, -1, -1),   # 101
        (19, 0, 1, 1, 0, -1, -1),   # 102
        (17, 0, 1, 0, 0, -1, -1),   # 103
        (13, 0, 0, 1, 0, -1, -1),   # 104
        (17, 0, 0, 0, 0, -1, -1),   # 105
        (16, 1, 0, 0, 0, -1, -1),   # 106
        (9, 2, 0, 0, 1, 14, 18),    # 107 (pentagon)
        (15, 1, 0, 1, 0, -1, -1),   # 108
        (15, 1, 0, 0, 0, -1, -1),   # 109
        (18, 0, 1, 1, 0, -1, -1),   # 110
        (18, 0, 0, 1, 0, -1, -1),   # 111
        (19, 0, 0, 1, 0, -1, -1),   # 112
        (17, 1, 0, 0, 0, -1, -1),   # 113
        (19, 0, 0, 0, 0, -1, -1),   # 114
        (18, 0, 1, 0, 0, -1, -1),   # 115
        (18, 1, 0, 1, 0, -1, -1),   # 116
        (19, 2, 0, 0, 1, -1, -1),   # 117 (pentagon, polar)
        (19, 1, 0, 0, 0, -1, -1),   # 118
        (18, 0, 0, 0, 0, -1, -1),   # 119
        (19, 1, 0, 1, 0, -1, -1),   # 120
        (18, 1, 0, 0, 0, -1, -1),   # 121
    ],
    dtype=np.int64,
)

IS_PENTAGON_BC = BASE_CELL_DATA[:, 4].astype(bool)
PENTAGON_BASE_CELLS = np.nonzero(IS_PENTAGON_BC)[0]


# ---------------------------------------------------------------------------
# Spherical helpers (vectorized)
# ---------------------------------------------------------------------------

def _geo_to_xyz(lat, lng):
    lat = np.asarray(lat, dtype=np.float64)
    lng = np.asarray(lng, dtype=np.float64)
    cl = np.cos(lat)
    out = np.empty(lat.shape + (3,), dtype=np.float64)
    out[..., 0] = cl * np.cos(lng)
    out[..., 1] = cl * np.sin(lng)
    out[..., 2] = np.sin(lat)
    return out


FACE_CENTER_XYZ = _geo_to_xyz(FACE_CENTER_GEO[:, 0], FACE_CENTER_GEO[:, 1])


def _azimuth(lat1, lng1, lat2, lng2):
    """Azimuth (radians east of north) from point 1 to point 2."""
    dl = lng2 - lng1
    return np.arctan2(
        np.cos(lat2) * np.sin(dl),
        np.cos(lat1) * np.sin(lat2) - np.sin(lat1) * np.cos(lat2) * np.cos(dl),
    )


def _az_distance_point(lat1, lng1, az, dist):
    """Point at (azimuth, angular distance) from (lat1, lng1). Vectorized."""
    sinlat = np.sin(lat1) * np.cos(dist) + np.cos(lat1) * np.sin(dist) * np.cos(az)
    sinlat = np.clip(sinlat, -1.0, 1.0)
    lat2 = np.arcsin(sinlat)
    y = np.sin(az) * np.sin(dist) * np.cos(lat1)
    x = np.cos(dist) - np.sin(lat1) * sinlat
    lng2 = lng1 + np.arctan2(y, x)
    lng2 = np.mod(lng2 + np.pi, 2.0 * np.pi) - np.pi
    return lat2, lng2


def _pos_angle(a):
    return np.mod(a, 2.0 * np.pi)


# ---------------------------------------------------------------------------
# ijk arithmetic (vectorized over int64 arrays of shape (..., 3))
# ---------------------------------------------------------------------------

def ijk_normalize(ijk):
    m = np.minimum(np.minimum(ijk[..., 0], ijk[..., 1]), ijk[..., 2])
    return ijk - m[..., None]


def up_ap7(ijk):
    """Parent ijk one aperture-7 (ccw) step coarser."""
    i = ijk[..., 0] - ijk[..., 2]
    j = ijk[..., 1] - ijk[..., 2]
    out = np.zeros_like(ijk)
    np.rint((3 * i - j) / 7.0, casting="unsafe", out=out[..., 0])
    np.rint((i + 2 * j) / 7.0, casting="unsafe", out=out[..., 1])
    return ijk_normalize(out)


def up_ap7r(ijk):
    """Parent ijk one aperture-7 (cw) step coarser."""
    i = ijk[..., 0] - ijk[..., 2]
    j = ijk[..., 1] - ijk[..., 2]
    out = np.zeros_like(ijk)
    np.rint((2 * i + j) / 7.0, casting="unsafe", out=out[..., 0])
    np.rint((3 * j - i) / 7.0, casting="unsafe", out=out[..., 1])
    return ijk_normalize(out)


_DOWN_AP7 = np.array([[3, 0, 1], [1, 3, 0], [0, 1, 3]], dtype=np.int64)
_DOWN_AP7R = np.array([[3, 1, 0], [0, 3, 1], [1, 0, 3]], dtype=np.int64)


def down_ap7(ijk):
    return ijk_normalize(ijk @ _DOWN_AP7)


def down_ap7r(ijk):
    return ijk_normalize(ijk @ _DOWN_AP7R)


_ROT60_CCW_MAT = np.array([[1, 1, 0], [0, 1, 1], [1, 0, 1]], dtype=np.int64)
_ROT60_CW_MAT = np.array([[1, 0, 1], [1, 1, 0], [0, 1, 1]], dtype=np.int64)


def ijk_rotate60_ccw(ijk):
    return ijk_normalize(ijk @ _ROT60_CCW_MAT)


def ijk_rotate60_cw(ijk):
    return ijk_normalize(ijk @ _ROT60_CW_MAT)


def unit_ijk_to_digit(ijk):
    n = ijk_normalize(ijk)
    d = n[..., 0] * 4 + n[..., 1] * 2 + n[..., 2]
    bad = (n > 1).any(axis=-1)
    return np.where(bad, INVALID_DIGIT, d)


# ---------------------------------------------------------------------------
# Face projection (vectorized)
# ---------------------------------------------------------------------------

def closest_face(lat, lng):
    """Index of the icosahedron face whose center is nearest each point.

    Running argmax over the 20 faces (in-place vector updates) — the
    one-shot (N, 20) dot matrix thrashes the allocator at multi-million
    row batches (measured 3-4x slower at 2M rows)."""
    xyz = _geo_to_xyz(lat, lng)
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    c = FACE_CENTER_XYZ
    best = x * c[0, 0] + y * c[0, 1] + z * c[0, 2]
    face = np.zeros(np.shape(best), dtype=np.int64)
    for f in range(1, NUM_FACES):
        d = x * c[f, 0] + y * c[f, 1] + z * c[f, 2]
        m = d > best
        if m.any():
            best[m] = d[m]
            face[m] = f
    return face


def geo_to_hex2d(lat, lng, res, face=None):
    """Project points into a face's hex2d plane at resolution ``res``.

    Returns (face, x, y). ``face`` may be forced (for edge sampling in the
    derivation script); by default the closest face is used.
    """
    lat = np.asarray(lat, dtype=np.float64)
    lng = np.asarray(lng, dtype=np.float64)
    if face is None:
        face = closest_face(lat, lng)
    else:
        face = np.broadcast_to(np.asarray(face, dtype=np.int64), lat.shape).copy()
    fc_lat = FACE_CENTER_GEO[face, 0]
    fc_lng = FACE_CENTER_GEO[face, 1]
    xyz = _geo_to_xyz(lat, lng)
    cosr = np.clip(np.einsum("...k,...k->...", xyz, FACE_CENTER_XYZ[face]), -1.0, 1.0)
    r = np.arccos(cosr)
    az = _azimuth(fc_lat, fc_lng, lat, lng)
    theta = _pos_angle(FACE_I_AXIS_AZ[face] - _pos_angle(az))
    if res % 2 == 1:  # Class III
        theta = _pos_angle(theta - M_AP7_ROT_RADS)
    r = np.tan(r)
    r /= RES0_U_GNOMONIC
    r *= M_SQRT7 ** res
    x = r * np.cos(theta)
    y = r * np.sin(theta)
    near = np.abs(np.arccos(cosr)) < 1e-16
    x = np.where(near, 0.0, x)
    y = np.where(near, 0.0, y)
    return face, x, y


def hex2d_to_ijk(x, y):
    """Round hex2d coordinates to the containing cell's ijk (H3 rounding)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    a1 = np.abs(x)
    a2 = np.abs(y)
    x2 = a2 / M_SIN60
    x1 = a1 + x2 / 2.0
    m1 = np.floor(x1).astype(np.int64)
    m2 = np.floor(x2).astype(np.int64)
    r1 = x1 - m1
    r2 = x2 - m2

    i = np.zeros_like(m1)
    j = np.zeros_like(m2)

    # branch structure of the published rounding algorithm
    c_a = r1 < 0.5
    c_b = r1 < 1.0 / 3.0
    c_c = r1 < 2.0 / 3.0

    # r1 < 1/3
    t = c_a & c_b
    i = np.where(t, m1, i)
    j = np.where(t, np.where(r2 < (1.0 + r1) / 2.0, m2, m2 + 1), j)
    # 1/3 <= r1 < 1/2
    t = c_a & ~c_b
    j_t = np.where(r2 < (1.0 - r1), m2, m2 + 1)
    i_t = np.where(((1.0 - r1) <= r2) & (r2 < 2.0 * r1), m1 + 1, m1)
    i = np.where(t, i_t, i)
    j = np.where(t, j_t, j)
    # 1/2 <= r1 < 2/3
    t = ~c_a & c_c
    j_t = np.where(r2 < (1.0 - r1), m2, m2 + 1)
    i_t = np.where((2.0 * r1 - 1.0 < r2) & (r2 < 1.0 - r1), m1, m1 + 1)
    i = np.where(t, i_t, i)
    j = np.where(t, j_t, j)
    # r1 >= 2/3
    t = ~c_a & ~c_c
    i = np.where(t, m1 + 1, i)
    j = np.where(t, np.where(r2 < r1 / 2.0, m2, m2 + 1), j)

    # fold across axes for negative x/y
    neg_x = x < 0.0
    j_even = (j % 2) == 0
    axisi = np.where(j_even, j // 2, (j + 1) // 2)
    diff = i - axisi
    i = np.where(neg_x, np.where(j_even, i - 2 * diff, i - (2 * diff + 1)), i)

    neg_y = y < 0.0
    i = np.where(neg_y, i - (2 * j + 1) // 2, i)
    j = np.where(neg_y, -j, j)

    ijk = np.stack([i, j, np.zeros_like(i)], axis=-1)
    return ijk_normalize(ijk)


def ijk_to_hex2d(ijk):
    i = ijk[..., 0] - ijk[..., 2]
    j = ijk[..., 1] - ijk[..., 2]
    x = i - 0.5 * j
    y = j * M_SIN60
    return x, y


def hex2d_to_geo(x, y, face, res):
    """Inverse projection from a face's hex2d plane to lat/lng."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    face = np.asarray(face, dtype=np.int64)
    r = np.hypot(x, y)
    theta = np.arctan2(y, x)
    r = r / (M_SQRT7 ** res)
    r = r * RES0_U_GNOMONIC
    r = np.arctan(r)
    if res % 2 == 1:  # Class III
        theta = _pos_angle(theta + M_AP7_ROT_RADS)
    az = _pos_angle(FACE_I_AXIS_AZ[face] - theta)
    fc_lat = FACE_CENTER_GEO[face, 0]
    fc_lng = FACE_CENTER_GEO[face, 1]
    lat, lng = _az_distance_point(fc_lat, fc_lng, az, r)
    near = r < 1e-16
    lat = np.where(near, fc_lat, lat)
    lng = np.where(near, fc_lng, lng)
    return lat, lng


# ---------------------------------------------------------------------------
# Derived tables — loaded from h3_derived.py (generated by
# scripts/derive_h3_tables.py) or computed on first use.
# ---------------------------------------------------------------------------

_DERIVED = None


def _get_derived():
    global _DERIVED
    if _DERIVED is None:
        try:
            from . import h3_derived
            _DERIVED = {
                "fijk_bc": np.asarray(h3_derived.FACE_IJK_BASE_CELLS, dtype=np.int64),
                "fijk_rot": np.asarray(h3_derived.FACE_IJK_CCW_ROT60, dtype=np.int64),
                "face_neighbors": np.asarray(h3_derived.FACE_NEIGHBORS, dtype=np.int64),
                "face_axes": np.asarray(h3_derived.FACE_I_AXIS_AZ_EXACT, dtype=np.float64),
            }
            # use the exactly-derived axes everywhere
            FACE_I_AXIS_AZ[:] = _DERIVED["face_axes"]
        except ImportError as exc:  # pragma: no cover
            raise RuntimeError(
                "h3_derived tables missing — run scripts/derive_h3_tables.py"
            ) from exc
    return _DERIVED


# ---------------------------------------------------------------------------
# Index bit helpers (vectorized on uint64)
# ---------------------------------------------------------------------------

def _u64(x):
    return np.asarray(x, dtype=np.uint64)


def get_resolution(h):
    return ((_u64(h) >> np.uint64(_RES_SHIFT)) & np.uint64(0xF)).astype(np.int64)


def get_base_cell(h):
    return ((_u64(h) >> np.uint64(_BC_SHIFT)) & np.uint64(0x7F)).astype(np.int64)


def _get_digit(h, r):
    """Digit at resolution r (1-based)."""
    shift = np.uint64((MAX_RES - np.asarray(r)) * _DIGIT_BITS)
    return ((_u64(h) >> shift) & np.uint64(7)).astype(np.int64)


def _set_digit(h, r, digit):
    shift = np.uint64((MAX_RES - np.asarray(r)) * _DIGIT_BITS)
    mask = np.uint64(7) << shift
    return (_u64(h) & ~mask) | (_u64(digit).astype(np.uint64) << shift)


def is_pentagon(h):
    h = _u64(h)
    bc = get_base_cell(h)
    pent = IS_PENTAGON_BC[np.clip(bc, 0, NUM_BASE_CELLS - 1)]
    return pent & (_leading_nonzero_digit(h) == 0)


def _leading_nonzero_digit(h, res_max: int = MAX_RES):
    """First nonzero digit of the index (0 if all digits are 0/center).

    ``res_max`` bounds the scan when every input has the same (known)
    resolution — the hot encode path passes it explicitly."""
    h = _u64(h)
    res = get_resolution(h)
    out = np.zeros(h.shape, dtype=np.int64)
    found = np.zeros(h.shape, dtype=bool)
    for r in range(1, res_max + 1):
        active = (r <= res) & ~found
        if not active.any():
            break
        d = _get_digit(h, r)
        hit = active & (d != 0)
        out = np.where(hit, d, out)
        found = found | hit
    return out


def _rotate60(h, ccw, pent=False, res_max: int = MAX_RES):
    """Rotate all digits of the index(es) by 60 degrees.

    ``pent`` applies the pentagon variant (skip the deleted K axis at the
    leading nonzero digit). ``res_max`` bounds the digit loop for
    uniform-resolution batches (hot encode path).
    """
    h = _u64(h).copy()
    res = get_resolution(h)
    table = _ROT60_CCW_DIGIT if ccw else _ROT60_CW_DIGIT
    if not pent:
        for r in range(1, res_max + 1):
            active = r <= res
            if not np.any(active):
                continue
            d = _get_digit(h, r)
            nd = table[d]
            h = np.where(active, _set_digit(h, r, nd), h)
        return h
    # pentagon variant
    found = np.zeros(h.shape, dtype=bool)
    for r in range(1, res_max + 1):
        active = r <= res
        if not np.any(active):
            continue
        d = _get_digit(h, r)
        nd = table[d]
        h = np.where(active, _set_digit(h, r, nd), h)
        newly = active & ~found & (nd != 0)
        if np.any(newly):
            # if the leading digit became K, rotate the whole index once more
            lead_k = newly & (_leading_nonzero_digit(h, res_max) == K_AXES_DIGIT)
            if np.any(lead_k):
                h = np.where(lead_k, _rotate60(h, ccw, pent=False, res_max=res_max), h)
        found = found | newly
    return h


def is_valid_cell(h):
    h = _u64(h)
    mode = (h >> np.uint64(_MODE_SHIFT)) & np.uint64(0xF)
    high = h >> np.uint64(63)
    res = get_resolution(h)
    bc = get_base_cell(h)
    ok = (mode == np.uint64(H3_MODE_CELL)) & (high == np.uint64(0))
    ok &= (bc >= 0) & (bc < NUM_BASE_CELLS) & (res >= 0) & (res <= MAX_RES)
    # digits beyond res must be 7; digits within res must be 0..6
    for r in range(1, MAX_RES + 1):
        d = _get_digit(h, r)
        ok &= np.where(r <= res, d != 7, d == 7)
    # pentagons may not lead with a K digit
    bc_c = np.clip(bc, 0, NUM_BASE_CELLS - 1)
    pent = IS_PENTAGON_BC[bc_c]
    ok &= ~(pent & (_leading_nonzero_digit(h) == K_AXES_DIGIT))
    return ok


def cell_to_string(h):
    h = np.atleast_1d(_u64(h))
    return np.array([format(int(v), "x") for v in h], dtype=object)


def string_to_cell(s):
    if isinstance(s, str):
        return np.uint64(int(s, 16))
    return np.array([np.uint64(int(v, 16)) for v in s], dtype=np.uint64)


# ---------------------------------------------------------------------------
# latlng -> cell (vectorized)
# ---------------------------------------------------------------------------

# block size keeping all per-row intermediates cache-resident: the
# (N, 3) ijk work arrays access components with a 24-byte stride, which
# collapses effective bandwidth once they spill to DRAM (measured 7-20x
# slowdown on multi-million-row single calls vs 64k blocks on this host)
_ENCODE_BLOCK = 65_536


def latlng_to_cell(lat, lng, res, degrees=True):
    """H3 cell index containing each (lat, lng) at resolution ``res``.

    Vectorized over numpy arrays; angles in degrees by default. Large
    inputs are processed in cache-sized blocks (identical results).
    """
    lat = np.atleast_1d(np.asarray(lat, dtype=np.float64))
    lng = np.atleast_1d(np.asarray(lng, dtype=np.float64))
    if lat.size > _ENCODE_BLOCK:
        out = np.empty(lat.shape, dtype=np.uint64)
        for s in range(0, lat.size, _ENCODE_BLOCK):
            e = s + _ENCODE_BLOCK
            out[s:e] = latlng_to_cell(lat[s:e], lng[s:e], res, degrees=degrees)
        return out
    der = _get_derived()
    if degrees:
        lat = np.radians(lat)
        lng = np.radians(lng)

    face, x, y = geo_to_hex2d(lat, lng, res)
    ijk = hex2d_to_ijk(x, y)

    h = np.full(lat.shape, np.uint64(0), dtype=np.uint64)
    h |= np.uint64(H3_MODE_CELL) << np.uint64(_MODE_SHIFT)
    h |= np.uint64(res) << np.uint64(_RES_SHIFT)
    h |= np.uint64(_ALL_DIGITS)

    # walk from res up to res 0, recording digits
    cur = ijk
    for r in range(res - 1, -1, -1):
        last = cur
        if (r + 1) % 2 == 1:  # finer res is Class III -> ccw aperture
            cur = up_ap7(last)
            center = down_ap7(cur)
        else:
            cur = up_ap7r(last)
            center = down_ap7r(cur)
        diff = ijk_normalize(last - center)
        digit = unit_ijk_to_digit(diff)
        h = _set_digit(h, r + 1, digit)

    # cur is now the res-0 ijk on the chosen face
    i0, j0, k0 = cur[..., 0], cur[..., 1], cur[..., 2]
    oob = (i0 < 0) | (i0 > 2) | (j0 < 0) | (j0 > 2) | (k0 < 0) | (k0 > 2)
    if np.any(oob):  # pragma: no cover - should not happen for closest-face
        raise ValueError("res-0 ijk out of the face lookup range")
    flat = (face * 27 + i0 * 9 + j0 * 3 + k0).astype(np.int64)
    bc = der["fijk_bc"].reshape(-1)[flat]
    rot = der["fijk_rot"].reshape(-1)[flat]
    if np.any(bc < 0):  # pragma: no cover
        raise ValueError("face/ijk position maps to no base cell")
    h |= _u64(bc) << np.uint64(_BC_SHIFT)

    # rotations are applied to SUBSETS (most cells need none): slicing
    # beats whole-array np.where rewrites by the selectivity factor
    pent = IS_PENTAGON_BC[bc]
    if np.any(pent):
        lead = _leading_nonzero_digit(h, res)
        fixk = pent & (lead == K_AXES_DIGIT)
        if np.any(fixk):
            cw_a = BASE_CELL_DATA[bc, 5]
            cw_b = BASE_CELL_DATA[bc, 6]
            is_cw = np.nonzero(fixk & ((face == cw_a) | (face == cw_b)))[0]
            is_ccw = np.nonzero(fixk & ~((face == cw_a) | (face == cw_b)))[0]
            if is_cw.size:
                h[is_cw] = _rotate60(h[is_cw], ccw=False, res_max=res)
            if is_ccw.size:
                h[is_ccw] = _rotate60(h[is_ccw], ccw=True, res_max=res)
    max_rot = int(rot.max()) if rot.size else 0
    for n in range(1, max_rot + 1):
        sel = rot >= n
        if not np.any(sel):
            continue
        sel_p = np.nonzero(sel & pent)[0]
        sel_h = np.nonzero(sel & ~pent)[0]
        if sel_h.size:
            h[sel_h] = _rotate60(h[sel_h], ccw=True, res_max=res)
        if sel_p.size:
            h[sel_p] = _rotate60(h[sel_p], ccw=True, pent=True, res_max=res)
    return h


# ---------------------------------------------------------------------------
# cell -> latlng (vectorized) with exact overage adjustment
# ---------------------------------------------------------------------------

def _max_dim_class2(res):
    return 2 * 7 ** (res // 2)


def _unit_scale_class2(res):
    return 7 ** (res // 2)


def _adjust_overage_class2(face, ijk, res, pent_leading4, substrate=False):
    """Translate positions that overflow their face to the neighbor face.

    Vectorized port of the published overage adjustment (Class II only).
    ``substrate`` scales the face bounds and translation x3 (the boundary
    -vertex grid); on the substrate, sum == maxDim is a face EDGE (shared
    point, no translation), only sum > maxDim overflows.
    Returns (face, ijk, overage_mask).
    """
    der = _get_derived()
    fn = der["face_neighbors"]  # (20, 3, 5): [face][edge] -> f', ti, tj, tk, ccw
    face = face.copy()
    ijk = ijk.copy()
    max_dim = _max_dim_class2(res) * (3 if substrate else 1)
    s = ijk.sum(axis=-1)
    over = s > max_dim
    if not np.any(over):
        return face, ijk, over

    k_pos = ijk[..., 2] > 0
    j_pos = ijk[..., 1] > 0
    # edge index: 0 = JK, 1 = KI, 2 = IJ (order fixed by derivation script)
    edge = np.where(k_pos & j_pos, 0, np.where(k_pos, 1, 2))

    # pentagon leading-4: rotate the missing-sequence region into place
    # (the KI transform selected above still applies to the rotated coords)
    adj = over & pent_leading4 & (edge == 1)
    if np.any(adj):
        origin = np.zeros_like(ijk)
        origin[..., 0] = max_dim
        tmp = ijk_rotate60_cw(ijk - origin)
        ijk = np.where(adj[..., None], ijk_normalize(tmp + origin), ijk)

    sel = fn[face, edge]  # (..., 5)
    new_face = sel[..., 0]
    trans = sel[..., 1:4]
    ccw = sel[..., 4]

    rot_ijk = ijk
    max_ccw = int(ccw[over].max()) if np.any(over) else 0
    for n in range(1, max_ccw + 1):
        m = over & (ccw >= n)
        rot_ijk = np.where(m[..., None], ijk_rotate60_ccw(rot_ijk), rot_ijk)
    unit = _unit_scale_class2(res) * (3 if substrate else 1)
    moved = ijk_normalize(rot_ijk + trans * unit)
    ijk = np.where(over[..., None], moved, ijk)
    face = np.where(over, new_face, face)
    return face, ijk, over


def cell_to_faceijk(h):
    """(face, ijk, res) of each cell's center, overage-adjusted."""
    _get_derived()
    h = np.atleast_1d(_u64(h))
    res = get_resolution(h)
    if res.size and res.max() != res.min():
        raise ValueError("cell_to_faceijk requires uniform resolution input")
    r = int(res[0]) if res.size else 0
    bc = get_base_cell(h)

    # pentagon leading-5 correction (subset-applied)
    pent = IS_PENTAGON_BC[bc]
    lead = _leading_nonzero_digit(h, r)
    fix5 = np.nonzero(pent & (lead == 5))[0]
    if fix5.size:
        h = h.copy()
        h[fix5] = _rotate60(h[fix5], ccw=False, res_max=r)

    face = BASE_CELL_DATA[bc, 0].copy()
    ijk = BASE_CELL_DATA[bc, 1:4].copy()

    for rr in range(1, r + 1):
        if rr % 2 == 1:  # Class III
            ijk = down_ap7(ijk)
        else:
            ijk = down_ap7r(ijk)
        d = _get_digit(h, rr)
        ijk = ijk_normalize(ijk + UNIT_VECS[d])

    # adjust for overage: work in the Class II grid (Class III resolutions
    # drop into the next finer Class II substrate first)
    work_res = r
    work_ijk = ijk
    if r % 2 == 1:
        work_ijk = down_ap7r(ijk)
        work_res = r + 1
    pent_lead4 = pent & (_leading_nonzero_digit(h, r) == 4)
    f2, ijk2, over = _adjust_overage_class2(face, work_ijk, work_res, pent_lead4)
    if np.any(over & pent):
        # secondary overages are possible for pentagon base cells
        no_lead4 = np.zeros_like(pent_lead4)
        for _ in range(4):
            f3, ijk3, over2 = _adjust_overage_class2(f2, ijk2, work_res, no_lead4)
            apply = over2 & pent
            if not np.any(apply):
                break
            f2 = np.where(apply, f3, f2)
            ijk2 = np.where(apply[..., None], ijk3, ijk2)
    adj_ijk = up_ap7r(ijk2) if work_res != r else ijk2
    face = np.where(over, f2, face)
    ijk = np.where(over[..., None], adj_ijk, ijk)
    return face, ijk, r


def cell_to_latlng(h, degrees=True):
    """Center (lat, lng) of each cell. Vectorized; degrees by default.
    Large inputs are processed in cache-sized blocks (identical results)."""
    h = np.atleast_1d(_u64(h))
    if h.size > _ENCODE_BLOCK:
        la = np.empty(h.shape, dtype=np.float64)
        lo = np.empty(h.shape, dtype=np.float64)
        for s in range(0, h.size, _ENCODE_BLOCK):
            e = s + _ENCODE_BLOCK
            la[s:e], lo[s:e] = cell_to_latlng(h[s:e], degrees=degrees)
        return la, lo
    face, ijk, r = cell_to_faceijk(h)
    x, y = ijk_to_hex2d(ijk)
    lat, lng = hex2d_to_geo(x, y, face, r)
    if degrees:
        return np.degrees(lat), np.degrees(lng)
    return lat, lng


# ---------------------------------------------------------------------------
# hierarchy + kRing
# ---------------------------------------------------------------------------

def cell_to_parent(h, parent_res):
    h = np.atleast_1d(_u64(h))
    res = get_resolution(h)
    if np.any(np.asarray(parent_res) > res):
        raise ValueError("parent_res must be <= cell resolution")
    out = (h & ~(np.uint64(0xF) << np.uint64(_RES_SHIFT))) | (
        np.uint64(parent_res) << np.uint64(_RES_SHIFT)
    )
    for r in range(1, MAX_RES + 1):
        mask = r > np.asarray(parent_res)
        if not np.any(mask):
            continue
        fill = np.where(mask & (r <= MAX_RES), INVALID_DIGIT, _get_digit(out, r))
        out = _set_digit(out, r, fill)
    return out


def cell_to_center_child(h, child_res):
    h = np.atleast_1d(_u64(h))
    res = get_resolution(h)
    if np.any(np.asarray(child_res) < res):
        raise ValueError("child_res must be >= cell resolution")
    out = (h & ~(np.uint64(0xF) << np.uint64(_RES_SHIFT))) | (
        np.uint64(child_res) << np.uint64(_RES_SHIFT)
    )
    for r in range(1, MAX_RES + 1):
        mask = (r > res) & (r <= np.asarray(child_res))
        if not np.any(mask):
            continue
        fill = np.where(mask, CENTER_DIGIT, _get_digit(out, r))
        out = _set_digit(out, r, fill)
    return out


def _disk_offsets(k):
    """All ijk offsets within hex distance k (normalized, deduped).

    In the i/j basis used here (axes 120 degrees apart, k folded out by
    normalization) the grid distance is (|di| + |dj| + |di - dj|) / 2.
    """
    out = []
    for di in range(-k, k + 1):
        for dj in range(-k, k + 1):
            if (abs(di) + abs(dj) + abs(di - dj)) // 2 > k:
                continue
            out.append(np.array([di, dj, 0], dtype=np.int64))
    return ijk_normalize(np.stack(out))


def grid_disk(h, k):
    """Cells within grid distance ``k`` of cell ``h`` (single cell input).

    Exact everywhere: cells whose disk cannot reach pentagon distortion
    (no icosahedron vertex within ``k + margin`` cell spacings) take the
    vectorized face-ijk offset + re-index fast path; cells inside the
    warp zone take an exact BFS over the derived neighbor graph (the
    published implementation's gridDisk -> safe-fallback structure,
    with table-free adjacency derived from shared boundary vertices).
    """
    sets = grid_disk_arrays(np.atleast_1d(_u64(h)), k)
    return sets[0]


def _grid_disk_arrays_unsafe(cells, k):
    """Geometric disk (gridDiskUnsafe + dedupe semantics): offset the
    center's face ijk by every position within hex distance k and
    re-index each offset position's geo center. Exact away from pentagon
    distortion; callers must route warp-zone cells to the BFS path."""
    cells = np.atleast_1d(_u64(cells))
    if cells.size == 0:
        return []
    face, ijk, r = cell_to_faceijk(cells)
    offs = _disk_offsets(k)  # (M, 3)
    n, m = cells.size, offs.shape[0]
    big_ijk = ijk[:, None, :] + offs[None, :, :]
    big_ijk = ijk_normalize(big_ijk.reshape(n * m, 3))
    big_face = np.repeat(face, m)
    x, y = ijk_to_hex2d(big_ijk)
    lat, lng = hex2d_to_geo(x, y, big_face, r)
    out = latlng_to_cell(np.degrees(lat), np.degrees(lng), r)
    out = out.reshape(n, m)
    return [np.unique(row) for row in out]


_ICOSA_VERTEX_XYZ = None


def _icosa_vertex_xyz():
    """Unit xyz of the 12 icosahedron vertices = the 12 res-0 pentagon
    centers (pentagons sit exactly on the icosahedron vertices)."""
    global _ICOSA_VERTEX_XYZ
    if _ICOSA_VERTEX_XYZ is None:
        pents = (
            (np.uint64(1) << np.uint64(59))
            | (PENTAGON_BASE_CELLS.astype(np.uint64) << np.uint64(45))
            | np.uint64((1 << 45) - 1)
        )
        la, lo = cell_to_latlng(pents, degrees=False)
        _ICOSA_VERTEX_XYZ = _geo_to_xyz(la, lo)  # (12, 3)
    return _ICOSA_VERTEX_XYZ


def _pentagon_warp_zone(cells, k):
    """Boolean mask: True where a cell's k-disk could reach pentagon
    distortion — i.e. an icosahedron vertex lies within (k + 4) cell
    spacings of the center (margin absorbs class III / gnomonic scale
    variation). Vectorized: 12 dot products per cell."""
    cells = np.atleast_1d(_u64(cells))
    res = get_resolution(cells)
    la, lo = cell_to_latlng(cells, degrees=False)
    xyz = _geo_to_xyz(la, lo)  # (n, 3)
    cos_near = np.max(xyz @ _icosa_vertex_xyz().T, axis=1)
    ang = np.arccos(np.clip(cos_near, -1.0, 1.0))
    spacing = _CELL_SPACING_RAD_BY_RES[np.atleast_1d(res)]
    return ang <= (k + 4) * spacing


_NEIGHBOR_CACHE: dict = {}
_NEIGHBOR_CACHE_MAX = 1 << 16


_BOUNDARY_CACHE: dict = {}


def _boundary_xyz(h):
    # memoized: adjacent neighbor derivations share ~2/3 of their ~19
    # boundary candidates, and cell_to_boundary dominates the derived-
    # adjacency cost (88% of a cold low-res grid_disk profile)
    key = int(h)
    hit = _BOUNDARY_CACHE.get(key)
    if hit is None:
        b = cell_to_boundary(np.uint64(key))
        hit = _geo_to_xyz(np.radians(b[:, 0]), np.radians(b[:, 1]))
        if len(_BOUNDARY_CACHE) >= _NEIGHBOR_CACHE_MAX:
            _BOUNDARY_CACHE.clear()
        _BOUNDARY_CACHE[key] = hit
    return hit


def cell_neighbors(h):
    """Edge-adjacent cells of ``h`` (6 for hexagons, 5 for pentagons),
    exact including across pentagon distortion.

    Derived, not transcribed: candidates come from the geometric 2-disk,
    and true adjacency is decided by shared boundary vertices — two
    cells are edge neighbors iff their boundaries share the edge's two
    corner vertices (cross-face vertex agreement is pinned to <1e-9 by
    the sphere-tiling test). Raises if the derived degree is not the
    spec's 5/6 — a loud failure beats a silently wrong disk.
    """
    h = int(np.atleast_1d(_u64(h))[0])
    hit = _NEIGHBOR_CACHE.get(h)
    if hit is not None:
        return hit
    cand = _grid_disk_arrays_unsafe(np.uint64(h), 2)[0]
    bh = _boundary_xyz(h)
    neigh = []
    for c in cand:
        c = int(c)
        if c == h:
            continue
        bc = _boundary_xyz(c)
        # pairwise chordal distances; count matched corner vertices
        d2 = np.sum((bh[:, None, :] - bc[None, :, :]) ** 2, axis=2)
        if int(np.sum(d2.min(axis=1) < 1e-18)) >= 2:
            neigh.append(c)
    expected = 5 if bool(np.atleast_1d(is_pentagon(np.uint64(h)))[0]) else 6
    if len(neigh) != expected:
        raise AssertionError(
            f"derived neighbor degree {len(neigh)} != {expected} for "
            f"{h:x}; adjacency derivation invariant violated"
        )
    arr = np.array(sorted(neigh), dtype=np.uint64)
    if len(_NEIGHBOR_CACHE) >= _NEIGHBOR_CACHE_MAX:
        _NEIGHBOR_CACHE.clear()
    _NEIGHBOR_CACHE[h] = arr
    return arr


def grid_disk_distances_safe(h, k):
    """Exact (cell -> grid distance) map within distance ``k`` of ``h``
    via BFS on the derived neighbor graph. Pentagon-proof; used as the
    warp-zone fallback and as the oracle for the fast path in tests."""
    h0 = int(np.atleast_1d(_u64(h))[0])
    dist = {h0: 0}
    frontier = [h0]
    for d in range(1, k + 1):
        nxt = []
        for c in frontier:
            for nb in cell_neighbors(c):
                nb = int(nb)
                if nb not in dist:
                    dist[nb] = d
                    nxt.append(nb)
        frontier = nxt
    return dist


def grid_distance(a, b, max_k: int = 256):
    """Exact grid distance between two same-res cells, pentagon-proof:
    BFS on the derived neighbor graph from ``a`` until ``b`` appears.
    Cost O(|disk(d)|) — intended for driver-side / small-d use (the
    vectorized tiling paths never need pairwise distances). Raises if
    the distance exceeds ``max_k`` (antipodal queries are out of scope,
    matching the published implementation's failure mode there)."""
    a0 = int(np.atleast_1d(_u64(a))[0])
    b0 = int(np.atleast_1d(_u64(b))[0])
    ra = int(np.atleast_1d(get_resolution(np.uint64(a0)))[0])
    rb = int(np.atleast_1d(get_resolution(np.uint64(b0)))[0])
    if ra != rb:
        raise ValueError("grid_distance requires equal resolutions")
    if a0 == b0:
        return 0
    dist = {a0: 0}
    frontier = [a0]
    for d in range(1, max_k + 1):
        nxt = []
        for c in frontier:
            for nb in cell_neighbors(c):
                nb = int(nb)
                if nb == b0:
                    return d
                if nb not in dist:
                    dist[nb] = d
                    nxt.append(nb)
        frontier = nxt
        if not frontier:
            break
    raise ValueError(f"grid_distance exceeds max_k={max_k}")


def grid_ring(h, k):
    """Cells at grid distance EXACTLY ``k`` (hollow ring), exact
    including pentagon distortion; sorted uint64 array."""
    if k == 0:
        return np.atleast_1d(_u64(h)).copy()
    dist = grid_disk_distances_safe(h, k)
    return np.array(sorted(c for c, d in dist.items() if d == k), dtype=np.uint64)


def grid_path_cells(a, b, max_k: int = 256):
    """A minimal grid path from ``a`` to ``b`` inclusive (length =
    grid_distance + 1), deterministic (smallest-id descent), exact
    across pentagon distortion: BFS distances from ``b``, then walk
    from ``a`` always stepping to a neighbor one closer to ``b``."""
    a0 = int(np.atleast_1d(_u64(a))[0])
    b0 = int(np.atleast_1d(_u64(b))[0])
    d = grid_distance(a0, b0, max_k=max_k)
    dist_from_b = grid_disk_distances_safe(b0, d)
    path = [a0]
    cur = a0
    for step in range(d, 0, -1):
        nxt = min(
            int(nb) for nb in cell_neighbors(cur)
            if dist_from_b.get(int(nb), step) == step - 1
        )
        path.append(nxt)
        cur = nxt
    return np.array(path, dtype=np.uint64)


def grid_disk_arrays(cells, k):
    """grid_disk for an array of cells -> list of uint64 arrays.

    Splits per cell: vectorized geometric path away from icosahedron
    vertices (the overwhelming majority at working resolutions), exact
    BFS inside the pentagon warp zone."""
    cells = np.atleast_1d(_u64(cells))
    if cells.size == 0:
        return []
    warp = _pentagon_warp_zone(cells, k)
    out: list = [None] * cells.size
    safe_idx = np.nonzero(~warp)[0]
    if safe_idx.size:
        fast = _grid_disk_arrays_unsafe(cells[safe_idx], k)
        for i, d in zip(safe_idx, fast):
            out[i] = d
    for i in np.nonzero(warp)[0]:
        dist = grid_disk_distances_safe(cells[i], k)
        out[i] = np.array(sorted(dist), dtype=np.uint64)
    return out


# ---------------------------------------------------------------------------
# polygon -> cells (polyfill) and cell -> boundary
# ---------------------------------------------------------------------------

def _cell_spacing_rad(res):
    """Approximate center-to-center spacing at ``res`` (radians)."""
    return math.atan(RES0_U_GNOMONIC / (M_SQRT7 ** res))


_CELL_SPACING_RAD_BY_RES = np.array(
    [_cell_spacing_rad(r) for r in range(MAX_RES + 1)], dtype=np.float64
)


def _ring_contains(lats, lngs, ring):
    """Ray-casting PIP for points vs one lat/lng ring (degrees, no
    antimeridian wrap — documented limitation, matches the fixture
    polygons)."""
    ring = np.asarray(ring, dtype=np.float64)
    ry, rx = ring[:, 0], ring[:, 1]
    inside = np.zeros(lats.shape, dtype=bool)
    n = len(ring)
    j = n - 1
    for i in range(n):
        yi, xi = ry[i], rx[i]
        yj, xj = ry[j], rx[j]
        cond = ((yi > lats) != (yj > lats)) & (
            lngs < (xj - xi) * (lats - yi) / (yj - yi + 1e-300) + xi
        )
        inside ^= cond
        j = i
    return inside


def polygon_to_cells(outer_ring, res, holes=()):
    """Cells at ``res`` whose CENTER lies inside the polygon (published
    polygonToCells containment semantics). ``outer_ring``: [(lat, lng)
    degrees, ...] closed or open; ``holes``: iterable of rings.

    Candidates come from sampling the bbox at sub-cell spacing (0.35x the
    center spacing, so every overlapping cell receives a sample), then
    exact center-in-polygon filtering. No antimeridian wrap.
    """
    ring = np.asarray(outer_ring, dtype=np.float64)
    lat_min, lat_max = ring[:, 0].min(), ring[:, 0].max()
    lng_min, lng_max = ring[:, 1].min(), ring[:, 1].max()
    step = math.degrees(_cell_spacing_rad(res)) * 0.35
    pad = step * 4
    la = np.arange(lat_min - pad, lat_max + pad, step)
    cos = max(0.05, math.cos(math.radians((lat_min + lat_max) / 2)))
    lo = np.arange(lng_min - pad, lng_max + pad, step / cos)
    glat, glng = np.meshgrid(la, lo, indexing="ij")
    cand = np.unique(latlng_to_cell(glat.ravel(), glng.ravel(), res))
    cla, clo = cell_to_latlng(cand)
    keep = _ring_contains(cla, clo, ring)
    for h in holes:
        keep &= ~_ring_contains(cla, clo, h)
    return cand[keep]


# Substrate vertex offsets (published spec): class II / class III hexagon
# vertices around the x3 (x3.sqrt7 for class III) substrate center.
_VERTS_CII = np.array(
    [[2, 1, 0], [1, 2, 0], [0, 2, 1], [0, 1, 2], [1, 0, 2], [2, 0, 1]],
    dtype=np.int64,
)
_VERTS_CIII = np.array(
    [[5, 4, 0], [1, 5, 0], [0, 5, 4], [0, 1, 5], [4, 0, 5], [5, 0, 1]],
    dtype=np.int64,
)

_DOWN_AP3 = np.array([[2, 0, 1], [1, 2, 0], [0, 1, 2]], dtype=np.int64)
_DOWN_AP3R = np.array([[2, 1, 0], [0, 2, 1], [1, 0, 2]], dtype=np.int64)


def _down_ap3(ijk):
    return ijk_normalize(ijk @ _DOWN_AP3)


def _down_ap3r(ijk):
    return ijk_normalize(ijk @ _DOWN_AP3R)


def cell_to_boundary(h):
    """Boundary vertices of ONE cell as (lat, lng) degree arrays (6 for
    hexagons, 5 for pentagons), CCW, starting from the spec's vertex 0.

    Vertices are computed on the x3 substrate grid (x3.sqrt7 for Class
    III) with per-vertex overage adjustment, then inverse-projected —
    the same construction the published implementation uses, validated
    by the tiling/shared-vertex invariants in tests/test_h3.py.
    """
    h = np.atleast_1d(_u64(h))[:1]
    res = int(get_resolution(h)[0])
    pent = bool(is_pentagon(h)[0])
    face, ijk, _ = cell_to_faceijk(h)
    face = np.broadcast_to(face, (1,)).copy()
    center = ijk.reshape(1, 3)

    # center into the substrate grid: x3 (one aperture-3 down in each
    # chirality), plus a class III adjustment one finer
    c = _down_ap3(_down_ap3r(center))
    verts = _VERTS_CII
    adj_res = res
    if res % 2 == 1:  # Class III
        c = down_ap7r(c)
        adj_res = res + 1
        verts = _VERTS_CIII

    order = range(6)
    if pent:
        # pentagons skip the deleted-k vertex (index 3 in home orientation
        # is recovered by dedupe below — the degenerate vertex collapses)
        order = range(6)

    out = []
    for v in order:
        fijk = ijk_normalize(c + verts[v][None, :])
        f2, ijk2, _ = _adjust_overage_class2(
            face.copy(), fijk, adj_res, np.zeros(1, dtype=bool), substrate=True
        )
        # secondary overage (pentagon vertices can cross two faces)
        for _i in range(3):
            f3, ijk3, over2 = _adjust_overage_class2(
                f2, ijk2, adj_res, np.zeros(1, dtype=bool), substrate=True
            )
            if not over2.any():
                break
            f2, ijk2 = f3, ijk3
        x, y = ijk_to_hex2d(ijk2)
        # substrate scale: one aperture-9 (3x3) finer than adj_res
        r = np.hypot(x, y) / 3.0
        theta = np.arctan2(y, x)
        rr = r / (M_SQRT7 ** adj_res)
        rr = rr * RES0_U_GNOMONIC
        rr = np.arctan(rr)
        if adj_res % 2 == 1:
            theta = _pos_angle(theta + M_AP7_ROT_RADS)
        az = _pos_angle(FACE_I_AXIS_AZ[f2] - theta)
        la, lo = _az_distance_point(
            FACE_CENTER_GEO[f2, 0], FACE_CENTER_GEO[f2, 1], az, rr
        )
        out.append((float(np.degrees(la[0])), float(np.degrees(lo[0]))))
    # collapse duplicate consecutive vertices (pentagon degenerate vertex)
    dedup = []
    for p in out:
        if not dedup or (
            abs(p[0] - dedup[-1][0]) > 1e-9 or abs(p[1] - dedup[-1][1]) > 1e-9
        ):
            dedup.append(p)
    if len(dedup) > 1 and (
        abs(dedup[0][0] - dedup[-1][0]) <= 1e-9
        and abs(dedup[0][1] - dedup[-1][1]) <= 1e-9
    ):
        dedup.pop()
    return np.array(dedup, dtype=np.float64)


def cell_to_children(h, child_res=None):
    """All children of ONE cell at ``child_res`` (default res+1):
    7^(child_res-res) cells for hexagons, with the deleted-K subtrees
    skipped under pentagons (so pentagon cells have 6 direct children)."""
    h = np.atleast_1d(_u64(h))[:1]
    res = int(get_resolution(h)[0])
    if child_res is None:
        child_res = res + 1
    if child_res < res:
        raise ValueError("child_res must be >= cell resolution")
    if child_res == res:
        return h.copy()
    out = [h[0]]
    for r in range(res + 1, child_res + 1):
        nxt = []
        for parent in out:
            pent = bool(is_pentagon(np.atleast_1d(parent))[0])
            base = (
                np.uint64(parent)
                & ~(np.uint64(0xF) << np.uint64(_RES_SHIFT))
            ) | (np.uint64(r) << np.uint64(_RES_SHIFT))
            for d in range(7):
                if pent and d == K_AXES_DIGIT:
                    continue  # deleted subsequence under a pentagon
                nxt.append(np.uint64(_set_digit(np.atleast_1d(base), r, d)[0]))
        out = nxt
    return np.array(out, dtype=np.uint64)


def compact_cells(cells):
    """Replace every COMPLETE sibling set by its parent, recursively (the
    published compactCells semantics): the minimal cell set covering the
    same area. Input must be a uniform-resolution set; output mixes
    resolutions (H3 ids carry their res, so one int64 column suffices).
    A pentagon parent is complete with its 6 children (no K subtree)."""
    cells = np.unique(np.atleast_1d(_u64(cells)))
    if cells.size == 0:
        return cells
    res = get_resolution(cells)
    if res.max() != res.min():
        raise ValueError("compact_cells requires uniform input resolution")
    out = []
    cur = cells
    for r in range(int(res[0]), 0, -1):
        parents = cell_to_parent(cur, r - 1)
        up, counts = np.unique(parents, return_counts=True)
        need = np.where(is_pentagon(up), 6, 7)
        complete = counts == need
        done_parents = set(up[complete].tolist())
        keep = np.array(
            [int(p) not in done_parents for p in parents.tolist()], dtype=bool
        )
        out.append(cur[keep])
        cur = up[complete]
        if cur.size == 0:
            break
    if cur.size:
        out.append(cur)
    return np.unique(np.concatenate(out))


def uncompact_cells(cells, res):
    """Inverse of compact_cells: expand every cell to its ``res``
    descendants (identity for cells already at ``res``)."""
    cells = np.atleast_1d(_u64(cells))
    out = []
    for c in cells:
        out.append(cell_to_children(c, res))
    return np.unique(np.concatenate(out)) if out else cells
