"""Derive + validate the H3 lookup tables that are not hand-transcribed.

Generates geokitten_spark/cells/h3_derived.py containing:

- FACE_I_AXIS_AZ_EXACT : the 20 i-axis azimuths, recomputed exactly as the
  azimuth from each face center to the icosahedron vertex the transcribed
  azimuth points at (repairing any transcription noise).
- FACE_NEIGHBORS[20][3] : (neighbor_face, ti, tj, tk, ccw_rot60) for the
  JK / KI / IJ edges — solved exactly in integer ijk space from the two
  shared-vertex correspondences.
- FACE_IJK_BASE_CELLS[20][3][3][3] : base cell at each res-0 position
  (nearest-center matching with margin checks; -1 where ambiguous/unused).
- FACE_IJK_CCW_ROT60[20][3][3][3] : ccw 60-degree rotation count per entry,
  learned by BFS consistency voting over points sampled on shared face
  edges (anchored at each base cell's home entry = 0 rotations).

Every stage validates the transcribed tables it consumes:

1. the 20 face centers must form a regular icosahedron (10 antipodal
   pairs, uniform adjacent-face angle);
2. the 60 face-corner points (i-axis azimuth + two 120-degree rotations at
   the derived vertex distance) must coalesce into exactly 12 vertices,
   5 corners each;
3. the 12 pentagon base cells must sit exactly on those 12 vertices and
   the 122 base-cell centers must be pairwise distinct;
4. every rotation entry must win its consistency vote unanimously, and the
   BFS must close every face cycle (angular-defect errors around
   pentagons would break closure);
5. dense random sampling must produce exactly 122 / 842 / 5882 distinct
   cells at res 0 / 1 / 2, never hit an unassigned table entry, and
   roundtrip latlng -> cell -> center -> cell must be idempotent.

Run: python scripts/derive_h3_tables.py [--out PATH]
"""

from __future__ import annotations

import argparse
import math
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from geokitten_spark.cells import h3core as hc  # noqa: E402


def fail(msg):
    raise SystemExit(f"H3 DERIVATION FAILED: {msg}")


# ---------------------------------------------------------------------------
# 1. validate the icosahedron
# ---------------------------------------------------------------------------

def validate_icosahedron():
    xyz = hc.FACE_CENTER_XYZ
    dots = xyz @ xyz.T
    # antipodal pairs
    anti = np.isclose(dots, -1.0, atol=1e-9)
    if not (anti.sum(axis=1) == 1).all():
        fail("face centers are not 10 antipodal pairs")
    # adjacent faces of a regular icosahedron: cos(angle) is one constant
    # for edge-adjacent and another for vertex-adjacent
    offdiag = dots[~np.eye(20, dtype=bool)]
    vals = np.unique(np.round(offdiag, 9))
    # dodecahedron-vertex geometry: +-sqrt(5)/3, +-1/3, -1
    expect = np.array([-1.0, -math.sqrt(5) / 3, -1 / 3, 1 / 3, math.sqrt(5) / 3])
    if len(vals) != 5 or not np.allclose(vals, expect, atol=1e-9):
        fail(f"expected inter-center cosines {expect}, got {vals}")
    adj_cos = vals[-1]  # largest cosine = closest = edge-adjacent
    adjacency = np.isclose(dots, adj_cos, atol=1e-9)
    if not (adjacency.sum(axis=1) == 3).all():
        fail("each face must have exactly 3 edge-adjacent faces")
    return adjacency


# ---------------------------------------------------------------------------
# 2. derive vertices and exact axes
# ---------------------------------------------------------------------------

def derive_vertices_and_axes():
    # vertex distance from face center: pentagons live at {2,0,0}
    theta_v = math.atan(2.0 * hc.RES0_U_GNOMONIC)
    corners = np.zeros((20, 3, 2))
    for f in range(20):
        lat0, lng0 = hc.FACE_CENTER_GEO[f]
        for a in range(3):
            az = hc.FACE_I_AXIS_AZ[f] - a * 2.0 * math.pi / 3.0
            lat, lng = hc._az_distance_point(
                np.float64(lat0), np.float64(lng0), np.float64(az), np.float64(theta_v)
            )
            corners[f, a] = (lat, lng)
    pts = hc._geo_to_xyz(corners[..., 0], corners[..., 1]).reshape(-1, 3)

    # cluster the 60 corner points into vertices
    verts = []
    assign = np.full(60, -1)
    for idx in range(60):
        placed = False
        for vi, v in enumerate(verts):
            if pts[idx] @ v > math.cos(1e-7):
                assign[idx] = vi
                placed = True
                break
        if not placed:
            verts.append(pts[idx])
            assign[idx] = len(verts) - 1
    nv = len(verts)
    counts = np.bincount(assign, minlength=nv)

    bad_faces = set()
    if nv != 12 or not (counts == 5).all():
        # identify faces whose corners failed to cluster (axis transcription
        # noise) and repair them from the well-clustered majority
        good = [vi for vi in range(nv) if counts[vi] >= 4]
        for f in range(20):
            for a in range(3):
                if assign[f * 3 + a] not in good:
                    bad_faces.add(f)
        if not bad_faces:
            fail(f"corner clustering produced {nv} vertices, counts {counts}")
        # rebuild vertex set from good faces only
        verts = []
        for f in range(20):
            if f in bad_faces:
                continue
            for a in range(3):
                p = pts[f * 3 + a]
                if not any(p @ v > math.cos(1e-7) for v in verts):
                    verts.append(p)
        if len(verts) != 12:
            fail(
                f"vertex repair failed: {len(verts)} vertices from good faces "
                f"(bad faces: {sorted(bad_faces)})"
            )
    verts = np.array([v / np.linalg.norm(v) for v in verts])

    # exact i-axis azimuth: azimuth to the vertex the transcribed value is
    # closest to; faces flagged bad fall back to the candidate closest in
    # angle, and are re-verified by the global consistency stages
    axes = np.zeros(20)
    for f in range(20):
        lat0, lng0 = hc.FACE_CENTER_GEO[f]
        c = hc.FACE_CENTER_XYZ[f]
        d = verts @ c
        near3 = np.argsort(-d)[:3]
        best = None
        for vi in near3:
            vlat = math.asin(max(-1.0, min(1.0, verts[vi, 2])))
            vlng = math.atan2(verts[vi, 1], verts[vi, 0])
            az = float(hc._azimuth(lat0, lng0, vlat, vlng)) % (2 * math.pi)
            dif = abs((az - hc.FACE_I_AXIS_AZ[f] + math.pi) % (2 * math.pi) - math.pi)
            if best is None or dif < best[0]:
                best = (dif, az, vi)
        if best[0] > 0.05 and f not in bad_faces:
            fail(f"face {f}: transcribed i-axis az {hc.FACE_I_AXIS_AZ[f]:.6f} "
                 f"matches no vertex azimuth (best diff {best[0]:.4f})")
        axes[f] = best[1]
    repaired = [f for f in range(20)
                if abs(axes[f] - hc.FACE_I_AXIS_AZ[f]) > 1e-6]
    return verts, axes, repaired


# ---------------------------------------------------------------------------
# 3. base-cell centers + inverse table
# ---------------------------------------------------------------------------

def face_ijk_to_geo(face, ijk, res):
    x, y = hc.ijk_to_hex2d(np.asarray(ijk, dtype=np.int64))
    return hc.hex2d_to_geo(x, y, face, res)


def derive_base_cell_tables(verts):
    bc_lat = np.zeros(122)
    bc_lng = np.zeros(122)
    for b in range(122):
        f, i, j, k = hc.BASE_CELL_DATA[b, 0:4]
        lat, lng = face_ijk_to_geo(int(f), np.array([i, j, k]), 0)
        bc_lat[b], bc_lng[b] = lat, lng
    bc_xyz = hc._geo_to_xyz(bc_lat, bc_lng)

    # pentagons must sit exactly on the 12 vertices
    pent_xyz = bc_xyz[hc.PENTAGON_BASE_CELLS]
    d = pent_xyz @ verts.T
    if not np.isclose(d.max(axis=1), 1.0, atol=1e-9).all():
        bad = hc.PENTAGON_BASE_CELLS[~np.isclose(d.max(axis=1), 1.0, atol=1e-9)]
        fail(f"pentagon base cells not on icosahedron vertices: {bad}")
    if len(np.unique(np.argmax(d, axis=1))) != 12:
        fail("two pentagons claim the same vertex")

    # pairwise distinct centers
    g = bc_xyz @ bc_xyz.T
    np.fill_diagonal(g, -1.0)
    if g.max() > math.cos(0.05):
        a, b = np.unravel_index(np.argmax(g), g.shape)
        fail(f"base cells {a} and {b} have (near-)identical centers")

    # inverse table by nearest-center matching
    fijk_bc = np.full((20, 3, 3, 3), -1, dtype=np.int64)
    margins = np.zeros((20, 3, 3, 3))
    for f in range(20):
        for i in range(3):
            for j in range(3):
                for k in range(3):
                    lat, lng = face_ijk_to_geo(f, np.array([i, j, k]), 0)
                    p = hc._geo_to_xyz(np.float64(lat), np.float64(lng))
                    dots = bc_xyz @ p
                    order = np.argsort(-dots)
                    ang0 = math.acos(max(-1.0, min(1.0, dots[order[0]])))
                    ang1 = math.acos(max(-1.0, min(1.0, dots[order[1]])))
                    margins[f, i, j, k] = ang1 - ang0
                    # assign when clearly nearest; distortion away from the
                    # face is bounded well below half the ~0.36 rad spacing
                    if ang0 < 0.13 and ang1 > 2.2 * max(ang0, 1e-12):
                        fijk_bc[f, i, j, k] = order[0]

    # every base cell's home entry must be assigned and agree
    for b in range(122):
        f, i, j, k = (int(v) for v in hc.BASE_CELL_DATA[b, 0:4])
        if fijk_bc[f, i, j, k] != b:
            fail(
                f"home entry mismatch: face {f} ijk ({i},{j},{k}) maps to "
                f"{fijk_bc[f, i, j, k]}, expected base cell {b}"
            )
    return bc_xyz, fijk_bc, margins


# ---------------------------------------------------------------------------
# 4. face neighbor transforms (exact integer solve)
# ---------------------------------------------------------------------------

CORNERS_IJK = {
    "i": np.array([2, 0, 0], dtype=np.int64),
    "j": np.array([0, 2, 0], dtype=np.int64),
    "k": np.array([0, 0, 2], dtype=np.int64),
}
EDGE_CORNERS = {0: ("j", "k"), 1: ("k", "i"), 2: ("i", "j")}  # JK, KI, IJ


def rot_n_ccw(ijk, n):
    out = ijk.copy()
    for _ in range(n % 6):
        out = hc.ijk_rotate60_ccw(out)
    return out


def derive_face_neighbors(verts):
    # corner vertex index for each face/axis
    corner_vid = np.zeros((20, 3), dtype=np.int64)
    for f in range(20):
        for a, name in enumerate(("i", "j", "k")):
            lat, lng = face_ijk_to_geo(f, CORNERS_IJK[name], 0)
            p = hc._geo_to_xyz(np.float64(lat), np.float64(lng))
            vi = int(np.argmax(verts @ p))
            if verts[vi] @ p < math.cos(1e-7):
                fail(f"face {f} corner {name} is not on a vertex")
            corner_vid[f, a] = vi

    fn = np.zeros((20, 3, 5), dtype=np.int64)
    for f in range(20):
        for edge in range(3):
            ca, cb = EDGE_CORNERS[edge]
            ia = "ijk".index(ca)
            ib = "ijk".index(cb)
            va, vb = corner_vid[f, ia], corner_vid[f, ib]
            # neighbor = the other face having both va and vb as corners
            nbr = [
                g for g in range(20)
                if g != f and va in corner_vid[g] and vb in corner_vid[g]
            ]
            if len(nbr) != 1:
                fail(f"face {f} edge {edge}: expected 1 neighbor, got {nbr}")
            g = nbr[0]
            # corner coords in both frames
            pa_f, pb_f = CORNERS_IJK[ca], CORNERS_IJK[cb]
            pa_g = CORNERS_IJK["ijk"[int(np.where(corner_vid[g] == va)[0][0])]]
            pb_g = CORNERS_IJK["ijk"[int(np.where(corner_vid[g] == vb)[0][0])]]
            # solve Rot^r(p_f) + t == p_g for both corners
            sols = []
            for r in range(6):
                t1 = pa_g - rot_n_ccw(pa_f, r)
                t2 = pb_g - rot_n_ccw(pb_f, r)
                if (t1 == t2).all():
                    sols.append((r, t1))
            if len(sols) != 1:
                fail(f"face {f} edge {edge}: transform not unique: {sols}")
            r, t = sols[0]
            fn[f, edge] = (g, t[0], t[1], t[2], r)
    return fn


# ---------------------------------------------------------------------------
# 5. rotation table by shared-edge consistency BFS
# ---------------------------------------------------------------------------

SAMPLE_RES = 4  # Class II, deep enough for varied digits


def edge_samples(verts, corner_vid, f, g, n=4000, rng=None):
    """Points spread along the shared edge arc of faces f and g."""
    shared = [v for v in corner_vid[f] if v in corner_vid[g]]
    if len(shared) != 2:
        fail(f"faces {f},{g} share {len(shared)} corners")
    a, b = verts[shared[0]], verts[shared[1]]
    # slerp, excluding the vertex endpoints (pentagon centers)
    ts = (np.arange(1, n + 1) / (n + 1.0))
    if rng is not None:
        ts = ts + rng.uniform(-0.4, 0.4, size=n) / (n + 1.0)
    omega = math.acos(max(-1.0, min(1.0, float(a @ b))))
    pts = (
        np.sin((1 - ts)[:, None] * omega) * a[None, :]
        + np.sin(ts[:, None] * omega) * b[None, :]
    ) / math.sin(omega)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    lat = np.arcsin(np.clip(pts[:, 2], -1, 1))
    lng = np.arctan2(pts[:, 1], pts[:, 0])
    return lat, lng


def digits_on_face(lat, lng, face, res):
    """Force-projected (res0_ijk, digit array, interior_margin) per sample."""
    f = np.full(lat.shape, face, dtype=np.int64)
    _, x, y = hc.geo_to_hex2d(lat, lng, res, face=f)
    ijk = hc.hex2d_to_ijk(x, y)
    # interior margin: distance in hex units from the rounded center
    cx, cy = hc.ijk_to_hex2d(ijk)
    resid = np.hypot(x - cx, y - cy)
    digits = np.zeros((lat.size, res), dtype=np.int64)
    cur = ijk
    for r in range(res - 1, -1, -1):
        last = cur
        if (r + 1) % 2 == 1:
            cur = hc.up_ap7(last)
            center = hc.down_ap7(cur)
        else:
            cur = hc.up_ap7r(last)
            center = hc.down_ap7r(cur)
        diff = hc.ijk_normalize(last - center)
        digits[:, r] = hc.unit_ijk_to_digit(diff)
    return cur, digits, resid


def build_index(bc, digits, res, face, rot):
    """Assemble canonical indices from per-face digits + rotation count."""
    n = digits.shape[0]
    h = np.full(n, np.uint64(0), dtype=np.uint64)
    h |= np.uint64(hc.H3_MODE_CELL) << np.uint64(hc._MODE_SHIFT)
    h |= np.uint64(res) << np.uint64(hc._RES_SHIFT)
    h |= np.uint64(hc._ALL_DIGITS)
    for r in range(1, res + 1):
        h = hc._set_digit(h, r, digits[:, r - 1])
    h |= hc._u64(np.full(n, bc)) << np.uint64(hc._BC_SHIFT)
    pent = bool(hc.IS_PENTAGON_BC[bc])
    if pent:
        lead = hc._leading_nonzero_digit(h)
        fixk = lead == hc.K_AXES_DIGIT
        if fixk.any():
            cw_a, cw_b = hc.BASE_CELL_DATA[bc, 5], hc.BASE_CELL_DATA[bc, 6]
            is_cw = fixk & ((face == cw_a) | (face == cw_b))
            h = np.where(is_cw, hc._rotate60(h, ccw=False), h)
            h = np.where(fixk & ~is_cw, hc._rotate60(h, ccw=True), h)
    for _ in range(rot):
        h = hc._rotate60(h, ccw=True, pent=pent)
    return h


def derive_rotations(verts, fijk_bc, fn):
    corner_vid = np.zeros((20, 3), dtype=np.int64)
    for f in range(20):
        for a, name in enumerate(("i", "j", "k")):
            lat, lng = face_ijk_to_geo(f, CORNERS_IJK[name], 0)
            p = hc._geo_to_xyz(np.float64(lat), np.float64(lng))
            corner_vid[f, a] = int(np.argmax(verts @ p))

    rot = np.full((20, 3, 3, 3), -1, dtype=np.int64)
    # home entries anchor the system
    for b in range(122):
        f, i, j, k = (int(v) for v in hc.BASE_CELL_DATA[b, 0:4])
        rot[f, i, j, k] = 0

    rng = np.random.default_rng(20260817)
    # precompute per (face-pair) sample digit walks
    adj_pairs = sorted({(f, int(fn[f, e, 0])) for f in range(20) for e in range(3)})
    pair_data = {}
    for f, g in adj_pairs:
        lat, lng = edge_samples(verts, corner_vid, f, g, n=4000, rng=rng)
        pf, df, rf = digits_on_face(lat, lng, f, SAMPLE_RES)
        pg, dg, rg = digits_on_face(lat, lng, g, SAMPLE_RES)
        interior = (rf < 0.35) & (rg < 0.35)
        lead_ok = (df != 0).any(axis=1) & (dg != 0).any(axis=1)
        keep = interior & lead_ok
        inb = (
            (pf >= 0).all(axis=1) & (pf <= 2).all(axis=1)
            & (pg >= 0).all(axis=1) & (pg <= 2).all(axis=1)
        )
        keep &= inb
        pair_data[(f, g)] = (pf[keep], df[keep], pg[keep], dg[keep])

    changed = True
    rounds = 0
    while changed:
        changed = False
        rounds += 1
        if rounds > 40:
            fail("rotation BFS did not converge")
        for (f, g), (pf, df, pg, dg) in pair_data.items():
            if pf.shape[0] == 0:
                continue
            # group samples by (position_f, position_g)
            key_f = pf[:, 0] * 9 + pf[:, 1] * 3 + pf[:, 2]
            key_g = pg[:, 0] * 9 + pg[:, 1] * 3 + pg[:, 2]
            for kf in np.unique(key_f):
                i1, j1, k1 = kf // 9, (kf // 3) % 3, kf % 3
                b = fijk_bc[f, i1, j1, k1]
                if b < 0:
                    continue
                rot_f = rot[f, i1, j1, k1]
                sel = key_f == kf
                for kg in np.unique(key_g[sel]):
                    i2, j2, k2 = kg // 9, (kg // 3) % 3, kg % 3
                    b2 = fijk_bc[g, i2, j2, k2]
                    if b2 != b:
                        continue  # boundary-straddling samples of other cells
                    rot_g = rot[g, i2, j2, k2]
                    if rot_f < 0 and rot_g < 0:
                        continue
                    ss = sel & (key_g == kg)
                    if ss.sum() < 4:
                        continue
                    if rot_f >= 0 and rot_g >= 0:
                        # verify closure
                        hf = build_index(b, df[ss], SAMPLE_RES, f, rot_f)
                        hg = build_index(b, dg[ss], SAMPLE_RES, g, rot_g)
                        agree = (hf == hg).mean()
                        if agree < 0.98:
                            fail(
                                f"cycle closure failed: bc {b} on faces {f}/{g} "
                                f"positions {(i1,j1,k1)}/{(i2,j2,k2)} agree "
                                f"{agree:.2%}"
                            )
                        continue
                    known_face, known_rot, kn_d = (
                        (f, rot_f, df) if rot_f >= 0 else (g, rot_g, dg)
                    )
                    unk_face, unk_d = (g, dg) if rot_f >= 0 else (f, df)
                    href = build_index(b, kn_d[ss], SAMPLE_RES, known_face, known_rot)
                    winners = []
                    # pentagon rotation has period 5 (5 pent-rotations == 6
                    # digit rotations == identity), so candidates 0..4 only
                    n_cand = 5 if hc.IS_PENTAGON_BC[b] else 6
                    for cand in range(n_cand):
                        hc_ = build_index(b, unk_d[ss], SAMPLE_RES, unk_face, cand)
                        frac = (hc_ == href).mean()
                        if frac > 0.98:
                            winners.append(cand)
                    if len(winners) != 1:
                        fail(
                            f"rotation for bc {b} face {unk_face} not unique: "
                            f"{winners} (bc {b}, faces {f}/{g})"
                        )
                    if rot_f >= 0:
                        rot[g, i2, j2, k2] = winners[0]
                    else:
                        rot[f, i1, j1, k1] = winners[0]
                    changed = True

    assigned = (rot >= 0) | (fijk_bc < 0)
    n_unassigned = int((~assigned).sum())
    return rot, n_unassigned


# ---------------------------------------------------------------------------
# 6. write + global validation
# ---------------------------------------------------------------------------

def emit(path, axes, fn, fijk_bc, rot):
    def fmt(arr):
        return np.array2string(
            np.asarray(arr), separator=", ", threshold=10_000_000,
            floatmode="unique",
        ).replace("\n", "\n    ")

    body = f'''"""Derived H3 lookup tables — generated by scripts/derive_h3_tables.py.

Do not edit by hand; re-run the derivation script (it validates the
transcribed spec tables and fails loudly on any inconsistency).
"""

import numpy as np

FACE_I_AXIS_AZ_EXACT = np.array(
    {fmt(axes)},
    dtype=np.float64,
)

# [face][edge] -> (neighbor_face, ti, tj, tk, ccw_rot60); edges JK, KI, IJ
FACE_NEIGHBORS = np.array(
    {fmt(fn)},
    dtype=np.int64,
).reshape(20, 3, 5)

FACE_IJK_BASE_CELLS = np.array(
    {fmt(fijk_bc.reshape(-1))},
    dtype=np.int64,
).reshape(20, 3, 3, 3)

FACE_IJK_CCW_ROT60 = np.array(
    {fmt(np.where(rot < 0, 0, rot).reshape(-1))},
    dtype=np.int64,
).reshape(20, 3, 3, 3)

FACE_IJK_ROT_ASSIGNED = np.array(
    {fmt((rot >= 0).astype(np.int64).reshape(-1))},
    dtype=np.int64,
).reshape(20, 3, 3, 3)
'''
    Path(path).write_text(body)


def global_validation():
    # force re-load of derived tables
    import importlib
    from geokitten_spark.cells import h3_derived
    importlib.reload(h3_derived)
    hc._DERIVED = None

    rng = np.random.default_rng(7)
    n = 600_000
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))
    lng = rng.uniform(-180, 180, n)

    c0 = hc.latlng_to_cell(lat, lng, 0)
    u0 = np.unique(c0)
    if u0.size != 122:
        fail(f"res-0 distinct cells = {u0.size}, expected 122")
    c1 = hc.latlng_to_cell(lat, lng, 1)
    u1 = np.unique(c1)
    if u1.size != 842:
        fail(f"res-1 distinct cells = {u1.size}, expected 842")
    c2 = hc.latlng_to_cell(lat, lng, 2)
    u2 = np.unique(c2)
    if u2.size != 5882:
        fail(f"res-2 distinct cells = {u2.size}, expected 5882")

    # child-per-parent structure: 110 hexes x 7 + 12 pentagons x 6 = 842
    p = hc.cell_to_parent(u1, 0)
    counts = np.unique(p, return_counts=True)[1]
    if sorted(np.unique(counts, return_counts=True)[1].tolist()) != [12, 110]:
        fail("res-1 children per res-0 parent must be 7x110 + 6x12")

    # roundtrip: center of every discovered cell re-indexes to itself
    for res, cells in ((0, u0), (1, u1), (2, u2)):
        la, lo = hc.cell_to_latlng(cells)
        back = hc.latlng_to_cell(la, lo, res)
        bad = back != cells
        if bad.any():
            fail(
                f"res-{res} roundtrip failed for {int(bad.sum())}/{cells.size} "
                f"cells, e.g. {[format(int(x), 'x') for x in cells[bad][:5]]}"
            )
    # deeper resolutions on a subsample
    for res in (5, 9, 12, 15):
        cc = hc.latlng_to_cell(lat[:30_000], lng[:30_000], res)
        la, lo = hc.cell_to_latlng(cc)
        back = hc.latlng_to_cell(la, lo, res)
        bad = back != cc
        if bad.any():
            fail(f"res-{res} roundtrip failed for {int(bad.sum())}/30000 points")

    # every table entry exercised by the sample must have an assigned rotation
    from geokitten_spark.cells.h3_derived import (
        FACE_IJK_ROT_ASSIGNED, FACE_IJK_BASE_CELLS,
    )
    f9 = hc.closest_face(np.radians(lat), np.radians(lng))
    _, x, y = hc.geo_to_hex2d(np.radians(lat), np.radians(lng), 0)
    ijk0 = hc.hex2d_to_ijk(x, y)
    flat = f9 * 27 + ijk0[:, 0] * 9 + ijk0[:, 1] * 3 + ijk0[:, 2]
    used = np.unique(flat)
    asn = FACE_IJK_ROT_ASSIGNED.reshape(-1)[used]
    bc = FACE_IJK_BASE_CELLS.reshape(-1)[used]
    if (bc < 0).any():
        fail(f"{int((bc < 0).sum())} exercised positions have no base cell")
    if (asn == 0).any():
        fail(f"{int((asn == 0).sum())} exercised positions have no rotation")
    print(f"validation OK: 122/842/5882 cells, roundtrips green, "
          f"{used.size} table entries exercised")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--out",
        default=str(
            Path(__file__).resolve().parents[1]
            / "geokitten_spark" / "cells" / "h3_derived.py"
        ),
    )
    args = ap.parse_args()

    validate_icosahedron()
    print("icosahedron OK")
    verts, axes, repaired = derive_vertices_and_axes()
    if repaired:
        print(f"axes repaired from vertex geometry for faces: {repaired}")
    hc.FACE_I_AXIS_AZ[:] = axes
    print("vertices + axes OK")
    bc_xyz, fijk_bc, margins = derive_base_cell_tables(verts)
    n_assigned = int((fijk_bc >= 0).sum())
    print(f"base-cell inverse table OK ({n_assigned}/540 positions assigned)")
    fn = derive_face_neighbors(verts)
    print("face neighbor transforms OK")
    rot, n_un = derive_rotations(verts, fijk_bc, fn)
    print(f"rotation BFS OK ({n_un} assigned-bc entries without rotation)")
    emit(args.out, axes, fn, fijk_bc, rot)
    print(f"wrote {args.out}")
    global_validation()


if __name__ == "__main__":
    main()
