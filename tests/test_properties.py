"""Hypothesis property tests for the pure-numpy kernels (no Spark session —
fast, generative coverage beyond the reference's literal fixtures)."""

import math

import numpy as np
from hypothesis import given, settings, strategies as st

from geokitten_spark.geom import (
    parse_wkt,
    to_wkt,
    standardize_geometry,
    remove_holes,
    geometry_area,
    interior_point,
    point_in_polygon,
)
from geokitten_spark.geom.model import polygon
from geokitten_spark.geom.mercator import (
    lonlat_to_webmercator,
    webmercator_to_lonlat,
    lonlat_to_worldmercator,
    worldmercator_to_lonlat,
)
from geokitten_spark.cells.grid import grid_cell, grid_decode, grid_kring
from geokitten_spark.cells import s2


# star-convex polygon: always simple/valid
@st.composite
def star_polygons(draw):
    n = draw(st.integers(min_value=3, max_value=12))
    cx = draw(st.floats(-170, 170))
    cy = draw(st.floats(-80, 80))
    radii = [draw(st.floats(0.01, 5.0)) for _ in range(n)]
    pts = [
        (cx + r * math.cos(2 * math.pi * i / n), cy + r * math.sin(2 * math.pi * i / n))
        for i, r in enumerate(radii)
    ]
    pts.append(pts[0])
    return polygon(np.array(pts))


@settings(max_examples=60, deadline=None)
@given(star_polygons())
def test_wkt_roundtrip_random(g):
    assert to_wkt(parse_wkt(to_wkt(g))) == to_wkt(g)


@settings(max_examples=60, deadline=None)
@given(star_polygons())
def test_standardize_idempotent(g):
    s1 = standardize_geometry(g)
    s2_ = standardize_geometry(s1)
    assert to_wkt(s1) == to_wkt(s2_)


@settings(max_examples=40, deadline=None)
@given(star_polygons(), st.floats(0.1, 0.4))
def test_hole_removal_preserves_net_area(g, scale):
    """Cutting a hole into the exterior keeps net area: area(after) ==
    area(ext) - area(hole) (the cut path has zero width)."""
    ext = g.parts[0][0]
    cx, cy = ext[:-1, 0].mean(), ext[:-1, 1].mean()
    # hole in the SAME stored orientation as the exterior — the reference's
    # cut traverses the hole in reverse (gdf_standardization.py:295-304),
    # which subtracts its area exactly for same-orientation input rings
    # (matching the 10x10/3-7 fixture layout)
    hole = np.array(
        [(cx + scale * (x - cx), cy + scale * (y - cy)) for x, y in ext]
    )
    with_hole = parse_wkt(to_wkt(g))
    with_hole.parts[0].append(hole)
    a_ext = geometry_area(g)
    a_hole = abs(
        0.5
        * np.sum(
            hole[:-1, 0] * hole[1:, 1] - hole[1:, 0] * hole[:-1, 1]
        )
    )
    cut = remove_holes(with_hole)
    assert len(cut.parts[0]) == 1  # hole is gone
    assert abs(geometry_area(cut) - (a_ext - a_hole)) < 1e-6 * max(a_ext, 1.0)


@settings(max_examples=100, deadline=None)
@given(st.floats(-179.9, 179.9), st.floats(-85.0, 85.0))
def test_mercator_roundtrips(lon, lat):
    x, y = lonlat_to_webmercator(lon, lat)
    lon2, lat2 = webmercator_to_lonlat(x, y)
    assert abs(lon2 - lon) < 1e-9 and abs(lat2 - lat) < 1e-9
    x, y = lonlat_to_worldmercator(lon, lat)
    lon3, lat3 = worldmercator_to_lonlat(x, y)
    assert abs(lon3 - lon) < 1e-9 and abs(lat3 - lat) < 1e-7


@settings(max_examples=60, deadline=None)
@given(star_polygons())
def test_interior_point_is_inside(g):
    p = interior_point(g)
    x, y = float(p.coords[0][0]), float(p.coords[0][1])
    assert point_in_polygon(x, y, g)


@settings(max_examples=100, deadline=None)
@given(st.floats(-179.999, 179.999), st.floats(-89.999, 89.999),
       st.integers(1, 12))
def test_grid_roundtrip_and_kring(lon, lat, res):
    c = int(grid_cell(np.array([lon]), np.array([lat]), res)[0])
    r, ix, iy = grid_decode(np.array([c]))
    assert int(r[0]) == res
    n = 1 << res
    assert 0 <= int(ix[0]) < n and 0 <= int(iy[0]) < n
    ring = grid_kring(np.array([c]), k=1)[0]
    assert c in set(int(v) for v in ring)


@settings(max_examples=60, deadline=None)
@given(st.floats(-179.0, 179.0), st.floats(-85.0, 85.0), st.integers(1, 20))
def test_s2_parent_child_consistency(lon, lat, level):
    c = int(np.asarray(s2.lat_lng_to_cell(np.array([lat]), np.array([lon]), level))[0])
    assert int(np.asarray(s2.cell_level(np.array([c])))[0]) == level
    if level > 1:
        p = int(np.asarray(s2.parent(np.array([c]), level - 1))[0])
        lo, hi = s2.cell_range(np.array([p]))
        assert int(lo[0]) <= c <= int(hi[0])


@st.composite
def overlapping_pairs(draw):
    """Two star-convex polygons with overlapping bboxes."""
    a = draw(star_polygons())
    ext = a.parts[0][0]
    cx, cy = ext[:-1, 0].mean(), ext[:-1, 1].mean()
    dx = draw(st.floats(-1.0, 1.0))
    dy = draw(st.floats(-1.0, 1.0))
    scale = draw(st.floats(0.4, 1.2))
    b_pts = np.column_stack([cx + dx + scale * (ext[:, 0] - cx),
                             cy + dy + scale * (ext[:, 1] - cy)])
    return a, polygon(b_pts)


@settings(max_examples=40, deadline=None)
@given(overlapping_pairs(), st.integers(0, 10**6))
def test_difference_pointwise_semantics(pair, seed):
    """p ∈ (t − s) ⟺ p ∈ t ∧ p ∉ s, for sample points away from any
    boundary (ray-casting is undefined ON boundaries)."""
    from geokitten_spark.geom import difference

    t, s = pair
    d = difference(t, s)
    xmin, ymin, xmax, ymax = t.bbox()
    rng = np.random.default_rng(seed)
    pts = rng.uniform([xmin - 0.5, ymin - 0.5], [xmax + 0.5, ymax + 0.5], (120, 2))

    def dist_to_boundary(g, x, y):
        best = np.inf
        for rings in g.parts:
            for ring in rings:
                r = np.asarray(ring)[:, :2]
                ax, ay = r[:-1, 0], r[:-1, 1]
                bx, by = r[1:, 0], r[1:, 1]
                px, py = x - ax, y - ay
                ex, ey = bx - ax, by - ay
                tt = np.clip((px * ex + py * ey) / (ex * ex + ey * ey + 1e-300), 0, 1)
                dd = np.hypot(px - tt * ex, py - tt * ey)
                best = min(best, dd.min()) if len(dd) else best
        return best

    eps = 1e-3
    checked = 0
    for x, y in pts:
        if (dist_to_boundary(t, x, y) < eps or dist_to_boundary(s, x, y) < eps
                or (not d.is_empty and dist_to_boundary(d, x, y) < eps)):
            continue
        want = point_in_polygon(x, y, t) and not point_in_polygon(x, y, s)
        got = (not d.is_empty) and point_in_polygon(x, y, d)
        assert got == want, (x, y, want, got)
        checked += 1
    assert checked > 30  # enough informative samples


# ---------------------------------------------------------------------------
# PII redaction: the Java∩RE2 regex-subset claim, engine-for-engine
# ---------------------------------------------------------------------------

_pii_piece = st.one_of(
    st.text(
        alphabet=st.characters(codec="ascii", exclude_characters="'\\"),
        max_size=20,
    ),
    st.just("user.name+tag@sub.example.org"),
    st.just("10.0.123.17"),
    st.just("192.168.1.255 and 8.8.8.8"),
    st.just("+1 415-555-0134"),
    st.just("415.555.0134"),
    st.just("almost@an@email"),
    st.just("999.999.999.999"),   # still matches the (naive) IPv4 shape
    st.just("1.2.3"),             # NOT an IPv4 match
    st.just("12-34-5678"),        # NOT a phone match (3-3-4 required)
)


@given(st.lists(_pii_piece, min_size=1, max_size=8))
@settings(max_examples=60, deadline=None)
def test_pii_redaction_python_duckdb_agree(pieces):
    """The redaction chain produces byte-identical output in Python `re`
    and DuckDB RE2 (the Spark/Java side is covered by the pii_redact
    oracle) — evidence the patterns stay inside the common regex subset."""
    import re as _re

    import duckdb

    from geokitten_spark.functions.text import _PII_PATTERNS, redact_pii_sql

    text = " ".join(pieces)
    py = text
    for pat, repl in _PII_PATTERNS:
        py = _re.sub(pat, repl, py)
    sql = "SELECT " + redact_pii_sql("?") + " AS r"
    duck = duckdb.execute(sql, [text]).fetchone()[0]
    assert duck == py


# ---------------------------------------------------------------------------
# Convex hull (monotone chain)
# ---------------------------------------------------------------------------

@given(
    st.lists(
        st.tuples(
            st.floats(-100, 100, allow_nan=False).map(lambda v: round(v, 3)),
            st.floats(-100, 100, allow_nan=False).map(lambda v: round(v, 3)),
        ),
        min_size=3,
        max_size=60,
    )
)
@settings(max_examples=80, deadline=None)
def test_convex_hull_properties(pts):
    from geokitten_spark.geom.model import Geometry, GeomKind, to_wkt
    from geokitten_spark.geom.simplify import convex_hull

    arr = np.array(pts, dtype=np.float64)
    g = Geometry(GeomKind.LINESTRING, coords=arr)
    h = convex_hull(g)
    if h.kind != GeomKind.POLYGON:
        return  # degenerate (collinear/duplicate) inputs
    ring = h.parts[0][0]
    # hull vertices are input points
    inset = {tuple(p) for p in arr}
    assert all(tuple(p) in inset for p in ring[:-1])
    # every input point is inside or on the hull (CCW ring: cross >= 0)
    for px, py in arr:
        for i in range(len(ring) - 1):
            ax, ay = ring[i]
            bx, by = ring[i + 1]
            cross = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
            assert cross >= -1e-9 * max(1.0, abs(cross))
    # idempotent
    assert to_wkt(convex_hull(h)) == to_wkt(h)


# ---------------------------------------------------------------------------
# polygon_difference beyond the reference's simple overlaps (VERDICT r2
# item 9): shoelace-invariant checks + shared-edge / vertex-touching
# degeneracies
# ---------------------------------------------------------------------------

@settings(max_examples=60, deadline=None)
@given(overlapping_pairs())
def test_difference_area_symmetric_identity(pair):
    """area(t) − area(t∖s) and area(s) − area(s∖t) both equal area(t∩s),
    so they must agree; and 0 ≤ area(t∖s) ≤ area(t) (shoelace over the
    output rings, holes signed)."""
    from geokitten_spark.geom import difference, geometry_area

    t, s = pair
    at, as_ = geometry_area(t), geometry_area(s)
    dts = difference(t, s)
    dst = difference(s, t)
    adts = 0.0 if dts.is_empty else geometry_area(dts)
    adst = 0.0 if dst.is_empty else geometry_area(dst)
    tol = 1e-6 * max(at, as_, 1.0)
    assert -tol <= adts <= at + tol
    assert -tol <= adst <= as_ + tol
    inter_via_t = at - adts
    inter_via_s = as_ - adst
    assert abs(inter_via_t - inter_via_s) < 1e-5 * max(at, as_, 1.0), (
        f"t∩s disagrees: {inter_via_t} (via t) vs {inter_via_s} (via s); "
        f"areas t={at} s={as_} t\\s={adts} s\\t={adst}"
    )


def _sq(x0, y0, x1, y1):
    return polygon(np.array(
        [(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)], dtype=float
    ))


def test_difference_shared_edge_disjoint_interiors():
    """Subtractor shares a full edge but no interior: target unchanged
    (up to area)."""
    from geokitten_spark.geom import difference, geometry_area

    t = _sq(0, 0, 1, 1)
    s = _sq(1, 0, 2, 1)  # abuts along x=1
    d = difference(t, s)
    assert abs(geometry_area(d) - 1.0) < 1e-9


def test_difference_half_overlap_with_collinear_edges():
    """Subtractor is the right half, sharing three boundary segments with
    the target — the classic Greiner–Hormann degenerate case."""
    from geokitten_spark.geom import difference, geometry_area

    t = _sq(0, 0, 1, 1)
    s = _sq(0.5, 0, 1, 1)
    d = difference(t, s)
    assert abs(geometry_area(d) - 0.5) < 1e-9


def test_difference_vertex_touching():
    """Subtractor touches only at one corner: area preserved."""
    from geokitten_spark.geom import difference, geometry_area

    t = _sq(0, 0, 1, 1)
    s = _sq(1, 1, 2, 2)
    d = difference(t, s)
    assert abs(geometry_area(d) - 1.0) < 1e-9


def test_difference_identical_and_containing():
    from geokitten_spark.geom import difference, geometry_area

    t = _sq(0, 0, 1, 1)
    assert difference(t, _sq(0, 0, 1, 1)).is_empty
    assert difference(t, _sq(-1, -1, 2, 2)).is_empty
    # subtractor strictly inside -> hole; net area = 1 - 0.25
    d = difference(t, _sq(0.25, 0.25, 0.75, 0.75))
    assert abs(geometry_area(d) - 0.75) < 1e-9


# --- round-4 session-4 kernels -------------------------------------------


@given(
    st.lists(st.integers(-30000, 30000), min_size=200, max_size=2000),
    st.floats(0.01, 50.0, allow_nan=False, allow_infinity=False),
)
@settings(max_examples=60, deadline=None)
def test_afp64_exact_gain_invariance_property(samples, gain):
    """Any positive float gain leaves the audio fingerprint bit-identical
    (log-energy differences cancel the constant log g^2 exactly)."""
    from geokitten_spark.functions.phash import afp64

    x = np.asarray(samples, dtype=np.float64)
    assert afp64(x) == afp64(x * gain)


@given(st.text(alphabet="abcdef", min_size=1, max_size=24),
       st.integers(0, 2**32))
@settings(max_examples=100, deadline=None)
def test_viterbi_always_reconstructs(word, seed):
    """Whatever vocabulary the trainer lands on, a segmentation always
    exists and re-joins to the input word exactly."""
    import random

    from geokitten_spark.operators.unigram import unigram_train, viterbi_segment

    rng = random.Random(seed)
    dict_words = ["".join(rng.choice("abcdef") for _ in range(rng.randrange(1, 9)))
                  for _ in range(rng.randrange(1, 12))]
    logp = unigram_train([(w, rng.randrange(1, 50)) for w in dict_words],
                         vocab_size=20, seed_size=100, em_iters=1)
    assert "".join(viterbi_segment(word, logp, 6)) == word


@given(st.integers(1, 500), st.integers(1, 64), st.integers(1, 64))
@settings(max_examples=150, deadline=None)
def test_chunk_count_formula_covers_everything(n, window, stride):
    """1 + ceil((n-window)/stride) chunks cover [0, n) with no gap: the
    last chunk's start + window >= n and starts advance by stride."""
    if stride > window:
        return
    nc = 1 if n <= window else -((-(n - window)) // stride) + 1
    starts = [k * stride for k in range(nc)]
    assert starts[-1] + window >= n          # full coverage
    assert all(s < n for s in starts)        # no empty chunk
    if nc > 1:
        assert starts[-2] + window < n       # minimal count


@given(
    st.dictionaries(st.text(alphabet="abcxyz", min_size=1, max_size=4),
                    st.integers(0, 1000), min_size=1, max_size=12),
    st.integers(0, 100000),
)
@settings(max_examples=150, deadline=None)
def test_largest_remainder_is_exact_and_proportional(weights, total):
    from geokitten_spark.operators.sampling import largest_remainder_quotas

    if sum(weights.values()) <= 0:
        return
    q = largest_remainder_quotas(weights, total)
    W = sum(weights.values())
    assert sum(q.values()) == total
    for s, w in weights.items():
        assert abs(q[s] - total * w / W) < 1.0


@given(st.text(min_size=0, max_size=200))
@settings(max_examples=150, deadline=None)
def test_mojibake_repair_is_conservative_and_idempotent(s):
    """Repairing arbitrary text never crashes; repairing a repaired
    text is a no-op (fixpoint); pure-ASCII text is always untouched."""
    from geokitten_spark.functions.mojibake import repair_mojibake

    fixed, rounds = repair_mojibake(s)
    assert repair_mojibake(fixed) == (fixed, 0)
    if s.isascii():
        assert (fixed, rounds) == (s, 0)
