"""Douglas–Peucker polyline/polygon simplification (pure numpy).

The decimation step every tile-rendering path needs at scale: boundary
polygons are simplified BEFORE they broadcast (smaller broadcast, faster
ray-casts) and tile outlines are simplified before the vector-tile /
choropleth sink. The reference renders full-resolution geometries
(html_generator.py folium GeoJson) because its inputs are O(10^2) rows;
at 10^5+ boundary polygons decimation is load-bearing.

Deterministic: pure float64 arithmetic, iterative stack (no recursion
limit), stable tie-break (first farthest point wins via argmax).
"""

from __future__ import annotations

import numpy as np

from .model import Geometry, GeomKind

__all__ = ["simplify_ring", "simplify_geometry", "convex_hull"]


def _dp_keep_mask(pts: np.ndarray, tol: float) -> np.ndarray:
    """Boolean keep-mask over an open polyline (endpoints always kept)."""
    n = len(pts)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        seg = pts[j] - pts[i]
        mid = pts[i + 1 : j]
        L = np.hypot(seg[0], seg[1])
        if L == 0.0:  # degenerate segment: plain point distance
            d = np.hypot(mid[:, 0] - pts[i, 0], mid[:, 1] - pts[i, 1])
        else:
            # perpendicular distance to the (i, j) chord
            d = np.abs(
                seg[0] * (pts[i, 1] - mid[:, 1]) - seg[1] * (pts[i, 0] - mid[:, 0])
            ) / L
        k = int(np.argmax(d))
        if d[k] > tol:
            keep[i + 1 + k] = True
            stack.append((i, i + 1 + k))
            stack.append((i + 1 + k, j))
    return keep


def simplify_ring(ring: np.ndarray, tol: float) -> np.ndarray:
    """Simplify a CLOSED ring (first == last row). Returns a closed ring
    with ≥ 4 points, or an empty (0, 2) array if the ring collapses.

    The closing vertex is pinned as both endpoints, so the ring stays
    closed and the result is rotation-stable for a fixed input."""
    ring = np.asarray(ring, dtype=np.float64)[:, :2]
    if len(ring) <= 4:
        return ring
    keep = _dp_keep_mask(ring, float(tol))
    out = ring[keep]
    if len(out) < 4:  # collapsed below a triangle: drop the ring
        return np.empty((0, 2), dtype=np.float64)
    return out


def simplify_geometry(g: Geometry, tol: float) -> Geometry:
    """Simplify every ring / linestring of ``g``; collapsed holes drop,
    a collapsed exterior drops its whole polygon part."""
    if g.kind in (GeomKind.LINESTRING, GeomKind.LINEARRING):
        pts = np.asarray(g.coords, dtype=np.float64)[:, :2]
        if len(pts) <= 2:
            return Geometry(g.kind, coords=pts)
        return Geometry(g.kind, coords=pts[_dp_keep_mask(pts, float(tol))])
    if g.kind == GeomKind.GEOMETRYCOLLECTION:
        return Geometry(
            g.kind, members=[simplify_geometry(m, tol) for m in g.members]
        )
    if g.kind not in (GeomKind.POLYGON, GeomKind.MULTIPOLYGON):
        return g
    parts = []
    for rings in g.parts:
        ext = simplify_ring(rings[0], tol)
        if len(ext) == 0:
            continue  # exterior collapsed: the part vanishes
        new_rings = [ext]
        for hole in rings[1:]:
            h = simplify_ring(hole, tol)
            if len(h):
                new_rings.append(h)
        parts.append(new_rings)
    if not parts:
        return Geometry(g.kind, [])
    kind = GeomKind.POLYGON if len(parts) == 1 else GeomKind.MULTIPOLYGON
    if g.kind == GeomKind.MULTIPOLYGON:
        kind = GeomKind.MULTIPOLYGON
    return Geometry(kind, parts)


# ---------------------------------------------------------------------------
# Convex hull (Andrew monotone chain) — cover generation / compactness
# ---------------------------------------------------------------------------

def _all_points(g: Geometry) -> np.ndarray:
    pts = []
    if g.coords is not None and len(g.coords):
        pts.append(np.asarray(g.coords, dtype=np.float64)[:, :2])
    for rings in g.parts:
        for r in rings:
            if len(r):
                pts.append(np.asarray(r, dtype=np.float64)[:, :2])
    for m in g.members:
        p = _all_points(m)
        if len(p):
            pts.append(p)
    return np.vstack(pts) if pts else np.empty((0, 2), dtype=np.float64)


def convex_hull(g: Geometry) -> Geometry:
    """Convex hull of every vertex of ``g`` (Andrew's monotone chain,
    O(n log n), pure numpy sort + scan). Returns a POLYGON with a CLOSED
    CCW ring; degenerate inputs (< 3 distinct points) return the input's
    point/segment as POINT / LINESTRING."""
    pts = np.unique(_all_points(g), axis=0)  # lexicographic sort + dedup
    if len(pts) == 0:
        return Geometry(GeomKind.POLYGON, [])
    if len(pts) == 1:
        return Geometry(GeomKind.POINT, coords=pts[:1])
    if len(pts) == 2:
        return Geometry(GeomKind.LINESTRING, coords=pts)

    def half(points):
        chain: list = []
        for p in points:
            while len(chain) >= 2:
                o, a = chain[-2], chain[-1]
                if (a[0] - o[0]) * (p[1] - o[1]) - (a[1] - o[1]) * (p[0] - o[0]) <= 0:
                    chain.pop()  # clockwise or collinear: drop
                else:
                    break
            chain.append(p)
        return chain

    lower = half(pts)
    upper = half(pts[::-1])
    ring = np.array(lower[:-1] + upper[:-1] + [lower[0]], dtype=np.float64)
    if len(ring) < 4:  # all collinear
        return Geometry(GeomKind.LINESTRING, coords=pts[[0, -1]])
    return Geometry(GeomKind.POLYGON, [[ring]])
