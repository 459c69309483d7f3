"""J2 — broadcast point-in-polygon spatial join (SURVEY.md §2.4).

Strategy (scale rationale):
* The boundary set (admin polygons) is small relative to the docs table
  (thousands vs 10^12 rows) → classic broadcast asymmetry. We build a packed
  numpy STR-tree over polygon bboxes ONCE on the driver and ship it with
  ``sc.broadcast`` — one copy per executor, not per task.
* The docs side is never shuffled: the join is a ``mapInPandas`` over
  whatever partitioning the scan produced; each Arrow batch does a
  vectorized candidate lookup (tree) + exact even-odd ray-casting refine.
* Skew-free by construction: work per partition is proportional to rows,
  not to key frequency (no hot-cell shuffle key exists in this operator).

Equivalently expressible as cell-prefilter + refine (``cell_pip_join``)
which IS shuffle-based — kept for the case where the boundary set is too
big to broadcast (SURVEY §4 "custom Catalyst rule? none — explicit API").
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ..geom import parse_wkt, points_in_rings
from ..geom.rtree import STRtree

__all__ = [
    "BoundaryIndex",
    "PolygonCover",
    "H3PolygonCover",
    "pip_join",
    "cover_refine_pip_join",
]


class BoundaryIndex:
    """Driver-built, broadcast-able polygon index: packed bbox R-tree +
    parsed ring arrays, pure numpy (pickles compactly)."""

    def __init__(self, ids: list, wkts: list):
        self.ids = list(ids)
        self.geoms = [parse_wkt(w) for w in wkts]
        # one entry per polygon PART so candidate refine touches only the part
        part_boxes = []
        self.part_owner = []
        self.part_rings = []
        for gi, g in enumerate(self.geoms):
            for rings in g.parts:
                ext = np.asarray(rings[0], dtype=np.float64)[:, :2]
                part_boxes.append(
                    (ext[:, 0].min(), ext[:, 1].min(), ext[:, 0].max(), ext[:, 1].max())
                )
                self.part_owner.append(gi)
                self.part_rings.append([np.asarray(r, dtype=np.float64)[:, :2] for r in rings])
        self.part_owner = np.asarray(self.part_owner, dtype=np.int64)
        self.tree = STRtree(np.asarray(part_boxes, dtype=np.float64))

    def locate(self, lons: np.ndarray, lats: np.ndarray):
        """(point_idx, polygon_idx) matches; a point inside k overlapping
        polygons yields k pairs (join semantics, not first-wins)."""
        pi, part_i = self.tree.query_points(lons, lats)
        if len(pi) == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        out_p, out_g = [], []
        # refine grouped by part: vectorize PIP over that part's candidates
        order = np.argsort(part_i, kind="stable")
        pi, part_i = pi[order], part_i[order]
        bounds = np.flatnonzero(np.diff(part_i)) + 1
        for chunk_p, chunk_part in zip(
            np.split(pi, bounds), np.split(part_i, bounds)
        ):
            part = int(chunk_part[0])
            inside = points_in_rings(lons[chunk_p], lats[chunk_p], self.part_rings[part])
            hits = chunk_p[inside]
            if len(hits):
                out_p.append(hits)
                out_g.append(np.full(len(hits), self.part_owner[part], dtype=np.int64))
        if not out_p:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        out_p = np.concatenate(out_p)
        out_g = np.concatenate(out_g)
        # a MULTIPOLYGON hit in 2 parts would duplicate: dedupe (point, geom)
        key = out_p * (len(self.geoms) + 1) + out_g
        _, uniq = np.unique(key, return_index=True)
        return out_p[uniq], out_g[uniq]


def pip_join(
    docs: DataFrame,
    boundaries_pdf: pd.DataFrame,
    *,
    id_col: str,
    wkt_col: str,
    lon_col: str = "lon",
    lat_col: str = "lat",
    how: str = "inner",
    s2_cells: dict | None = None,
) -> DataFrame:
    """Join docs (lon/lat) to boundary polygons via broadcast R-tree + exact
    ray-casting PIP. Returns docs columns + the boundary id column.

    ``how``: 'inner' drops unmatched docs; 'left' keeps them with null id.
    ``s2_cells``: optional ``{out_col: s2_level}`` — S2 cell ids computed in
    the SAME Python pass (one Arrow exchange instead of two; at 10^12 rows
    every extra executor↔Python round trip is a full-table serialization).
    """
    spark = docs.sparkSession
    index = BoundaryIndex(boundaries_pdf[id_col].tolist(), boundaries_pdf[wkt_col].tolist())
    bc = spark.sparkContext.broadcast(index)
    id_type = StringType() if boundaries_pdf[id_col].dtype == object else LongType()
    extra_fields = [StructField(c, LongType(), True) for c in (s2_cells or {})]
    out_schema = StructType(
        docs.schema.fields + [StructField(id_col, id_type, True)] + extra_fields
    )

    left = how == "left"
    s2_spec = dict(s2_cells or {})

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx: BoundaryIndex = bc.value
        ids = np.asarray(idx.ids, dtype=object)
        if s2_spec:
            from ..cells.s2 import lat_lng_to_cell

        for pdf in batches:
            lons = pdf[lon_col].to_numpy(np.float64)
            lats = pdf[lat_col].to_numpy(np.float64)
            pi, gi = idx.locate(lons, lats)
            matched = pdf.iloc[pi].copy()
            matched[id_col] = ids[gi]
            if left:
                unmatched_mask = np.ones(len(pdf), dtype=bool)
                unmatched_mask[pi] = False
                rest = pdf.loc[unmatched_mask].copy()
                rest[id_col] = None
                matched = pd.concat([matched, rest], ignore_index=True)
            for out_col, level in s2_spec.items():
                matched[out_col] = np.asarray(
                    lat_lng_to_cell(
                        matched[lat_col].to_numpy(np.float64),
                        matched[lon_col].to_numpy(np.float64),
                        level,
                    )
                ).astype("int64")
            yield matched

    return docs.mapInPandas(run, schema=out_schema)


# ---------------------------------------------------------------------------
# J2b — cover-refine PIP join (the 10^12-row fast path)
# ---------------------------------------------------------------------------

def _cover_cells(geoms: list, ids: list, res: int):
    """Driver-side cell cover: classify every grid cell in each polygon's
    bbox as fully-INSIDE (every point of the cell is inside the part) or
    BOUNDARY (some polygon edge's bbox overlaps the cell — conservative).

    Returns two (cell_id, position) column sets as numpy arrays:
    ``inside``  — docs in these cells match with NO exact test;
    ``border`` — docs in these cells need the exact ray-cast refine.
    Conservativeness only moves cells from the fast path to the refine
    path, never the reverse, so results are exact.
    """
    from ..cells.grid import grid_cell, RES_SHIFT, X_SHIFT
    from ..geom import points_in_rings

    n = np.int64(1) << res
    cell_w = 360.0 / float(n)
    cell_h = 180.0 / float(n)

    in_cells, in_pos = [], []
    bd_cells, bd_pos = [], []

    for pos, g in enumerate(geoms):
        seen_inside: set = set()
        seen_border: set = set()
        for rings in g.parts:
            ext = np.asarray(rings[0], dtype=np.float64)[:, :2]
            xmin, ymin = ext.min(axis=0)
            xmax, ymax = ext.max(axis=0)
            ix0 = max(0, int(np.floor((xmin + 180.0) / 360.0 * n)))
            ix1 = min(int(n) - 1, int(np.floor((xmax + 180.0) / 360.0 * n)))
            iy0 = max(0, int(np.floor((ymin + 90.0) / 180.0 * n)))
            iy1 = min(int(n) - 1, int(np.floor((ymax + 90.0) / 180.0 * n)))
            if ix1 < ix0 or iy1 < iy0:
                continue
            nx = ix1 - ix0 + 1
            ny = iy1 - iy0 + 1
            # all edges of all rings, SUBDIVIDED to sub-cell length so each
            # sub-edge bbox marks only cells the edge actually crosses (a
            # whole diagonal edge's bbox would mark O(len²) spurious cells)
            exs, eys, exe, eye = [], [], [], []
            step = 0.5 * min(cell_w, cell_h)
            for ring in rings:
                r = np.asarray(ring, dtype=np.float64)[:, :2]
                ax, ay = r[:-1, 0], r[:-1, 1]
                bx, by = r[1:, 0], r[1:, 1]
                seg_len = np.maximum(np.abs(bx - ax), np.abs(by - ay))
                n_sub = np.maximum(1, np.ceil(seg_len / step).astype(np.int64))
                idx = np.repeat(np.arange(len(ax)), n_sub)
                # fraction along each edge for every sub-segment start/end
                starts = np.concatenate([np.arange(k) for k in n_sub]) / n_sub[idx]
                ends = np.concatenate([np.arange(1, k + 1) for k in n_sub]) / n_sub[idx]
                sx0 = ax[idx] + (bx[idx] - ax[idx]) * starts
                sx1 = ax[idx] + (bx[idx] - ax[idx]) * ends
                sy0 = ay[idx] + (by[idx] - ay[idx]) * starts
                sy1 = ay[idx] + (by[idx] - ay[idx]) * ends
                exs.append(np.minimum(sx0, sx1))
                exe.append(np.maximum(sx0, sx1))
                eys.append(np.minimum(sy0, sy1))
                eye.append(np.maximum(sy0, sy1))
            e_x0 = np.concatenate(exs); e_x1 = np.concatenate(exe)
            e_y0 = np.concatenate(eys); e_y1 = np.concatenate(eye)
            # map each edge bbox to the cell range it touches
            touched = np.zeros((nx, ny), dtype=bool)
            c_x0 = np.clip(np.floor((e_x0 + 180.0) / 360.0 * n).astype(np.int64), ix0, ix1) - ix0
            c_x1 = np.clip(np.floor((e_x1 + 180.0) / 360.0 * n).astype(np.int64), ix0, ix1) - ix0
            c_y0 = np.clip(np.floor((e_y0 + 90.0) / 180.0 * n).astype(np.int64), iy0, iy1) - iy0
            c_y1 = np.clip(np.floor((e_y1 + 90.0) / 180.0 * n).astype(np.int64), iy0, iy1) - iy0
            for a0, a1, b0, b1 in zip(c_x0, c_x1, c_y0, c_y1):
                touched[a0 : a1 + 1, b0 : b1 + 1] = True
            # untouched cells are uniformly inside or outside: test centers
            ux, uy = np.nonzero(~touched)
            if len(ux):
                cx = -180.0 + (ux + ix0 + 0.5) * cell_w
                cy = -90.0 + (uy + iy0 + 0.5) * cell_h
                inside = points_in_rings(cx, cy, [np.asarray(r, dtype=np.float64)[:, :2] for r in rings])
                for k in np.nonzero(inside)[0]:
                    seen_inside.add((int(ux[k] + ix0), int(uy[k] + iy0)))
            tx, ty = np.nonzero(touched)
            for a, b in zip(tx, ty):
                seen_border.add((int(a + ix0), int(b + iy0)))
        # a cell inside one part but on the border of another (overlapping
        # parts) must refine — border wins
        seen_inside -= seen_border
        for ixv, iyv in seen_inside:
            in_cells.append((np.int64(res) << RES_SHIFT) | (np.int64(ixv) << X_SHIFT) | np.int64(iyv))
            in_pos.append(pos)
        for ixv, iyv in seen_border:
            bd_cells.append((np.int64(res) << RES_SHIFT) | (np.int64(ixv) << X_SHIFT) | np.int64(iyv))
            bd_pos.append(pos)

    return (
        np.asarray(in_cells, dtype=np.int64),
        np.asarray(in_pos, dtype=np.int64),
        np.asarray(bd_cells, dtype=np.int64),
        np.asarray(bd_pos, dtype=np.int64),
    )


def cover_refine_pip_join(
    docs: DataFrame,
    boundaries_pdf: pd.DataFrame,
    *,
    id_col: str,
    wkt_col: str,
    lon_col: str = "lon",
    lat_col: str = "lat",
    res: int = 10,
    cover: "PolygonCover | None" = None,
    how: str = "inner",
    doc_key_cols: list[str] | None = None,
) -> DataFrame:
    """Exact PIP join via cell-cover prefilter + boundary-cell refine.

    Scale design (SURVEY §4, north_rule): the driver classifies every grid
    cell covering each polygon as fully-inside or boundary. Docs in
    fully-inside cells match through a pure-JVM broadcast hash join — no
    Python, no shuffle of the docs side. Only docs in boundary cells (the
    polygon-perimeter fraction, ~O(perimeter·cell/area) of rows) cross the
    Arrow exchange for the exact ray-cast refine — the same kernel
    ``pip_join`` uses, so results are identical. At 10^12 rows this turns
    the Python exchange from O(N) to O(N·ε).

    Pass a prebuilt ``PolygonCover`` to amortize the driver-side cover
    construction + broadcast across many joins (one boundary set serves the
    whole pipeline).

    Semantics match ``pip_join(how=...)``: one output row per
    (doc, polygon) containment pair; ``how='left'`` additionally keeps
    each unmatched doc once, with a null ``id_col``. Because matches come
    from TWO paths (JVM fast join + Arrow refine), 'left' needs a doc
    identity — pass ``doc_key_cols`` (a unique doc key, e.g.
    ``['doc_id']``); the unmatched set is a key anti-join against the
    matched set (one extra shuffle on the doc key — the inherent price of
    left semantics on a fan-out join).
    """
    if cover is None:
        cover = PolygonCover(
            docs.sparkSession, boundaries_pdf, id_col=id_col, wkt_col=wkt_col, res=res
        )
    matched = cover.join(docs, lon_col=lon_col, lat_col=lat_col)
    if how == "inner":
        return matched
    if how != "left":
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if not doc_key_cols:
        raise ValueError("how='left' requires doc_key_cols (a unique doc key)")
    unmatched = docs.join(
        matched.select(*doc_key_cols).distinct(), on=doc_key_cols, how="left_anti"
    ).withColumn(id_col, F.lit(None).cast(cover.id_type))
    return matched.unionByName(unmatched)


def _promote_cover(in_cells: np.ndarray, in_pos: np.ndarray, res: int, min_res: int):
    """Quadtree promotion (S2-RegionCoverer-style): wherever all 4 children
    of a parent cell are fully inside for the same polygon, replace them by
    the parent — repeatedly, down to ``min_res``. Shrinks the broadcast
    table ~5-10x (fits in L3, builds in ~0.1s) with identical semantics."""
    from ..cells.grid import RES_SHIFT, X_SHIFT

    out_cells, out_pos = [], []
    ix = (in_cells >> X_SHIFT) & ((np.int64(1) << X_SHIFT) - 1)
    iy = in_cells & ((np.int64(1) << X_SHIFT) - 1)
    pos = in_pos
    for r in range(res, min_res, -1):
        pix_all, piy_all = ix >> 1, iy >> 1
        # group by (pos, parent-ix, parent-iy) without bit-packing (packing
        # pos into the high bits overflows int64 for pos >= 32)
        order = np.lexsort((piy_all, pix_all, pos))
        p_s, x_s, y_s = pos[order], pix_all[order], piy_all[order]
        new_grp = np.empty(len(order), dtype=bool)
        new_grp[0] = True
        new_grp[1:] = (
            (p_s[1:] != p_s[:-1]) | (x_s[1:] != x_s[:-1]) | (y_s[1:] != y_s[:-1])
        )
        grp_id = np.cumsum(new_grp) - 1
        counts = np.bincount(grp_id)
        full = counts == 4
        promoted_mask = np.zeros(len(order), dtype=bool)
        promoted_mask[order] = full[grp_id]
        keep = ~promoted_mask
        out_cells.append(
            (np.int64(r) << RES_SHIFT) | (ix[keep] << X_SHIFT) | iy[keep]
        )
        out_pos.append(pos[keep])
        # next level: one cell per full parent
        starts = np.flatnonzero(new_grp)[full]
        ix, iy, pos = x_s[starts], y_s[starts], p_s[starts]
        if len(ix) == 0:
            break
    if len(ix):
        out_cells.append((np.int64(min_res) << RES_SHIFT) | (ix << X_SHIFT) | iy)
        out_pos.append(pos)
    return np.concatenate(out_cells), np.concatenate(out_pos)


class PolygonCover:
    """Reusable cell-cover index over a boundary set: driver-side cover
    classification (multi-resolution quadtree), the two broadcast-able
    cover tables, and the refine kernel broadcast — built once, used by
    every ``join``."""

    def __init__(self, spark, boundaries_pdf: pd.DataFrame, *, id_col: str,
                 wkt_col: str, res: int = 10, min_res: int = 6):
        self.id_col = id_col
        self.res = res
        self.min_res = min_res
        ids = boundaries_pdf[id_col].tolist()
        geoms = [parse_wkt(w) for w in boundaries_pdf[wkt_col].tolist()]
        in_cells, in_pos, bd_cells, bd_pos = _cover_cells(geoms, ids, res)
        if len(in_cells) and min_res < res:
            in_cells, in_pos = _promote_cover(in_cells, in_pos, res, min_res)
        self.n_inside_cells = len(in_cells)
        self.n_border_cells = len(bd_cells)

        self.id_type = (
            StringType() if boundaries_pdf[id_col].dtype == object else LongType()
        )
        cover_schema = StructType(
            [StructField("__cell", LongType()), StructField(id_col, self.id_type)]
        )
        self.inside_df = spark.createDataFrame(
            pd.DataFrame({"__cell": in_cells, id_col: [ids[p] for p in in_pos]}),
            schema=cover_schema,
        )
        self.border_df = spark.createDataFrame(
            pd.DataFrame({"__cell": bd_cells, "__pos": bd_pos}),
            schema=StructType(
                [StructField("__cell", LongType()), StructField("__pos", LongType())]
            ),
        )
        parts_by_pos = [
            [[np.asarray(r, dtype=np.float64)[:, :2] for r in rings] for rings in g.parts]
            for g in geoms
        ]
        self._bc = spark.sparkContext.broadcast((parts_by_pos, ids))

    def join(self, docs: DataFrame, *, lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
        from ..functions.cells_udfs import grid_cell_col

        id_col = self.id_col
        tagged = docs.withColumn(
            "__cell", grid_cell_col(F.col(lon_col), F.col(lat_col), self.res)
        )

        # fast path: pure-JVM broadcast hash join against the multi-res
        # cover — each doc probes with its ancestor cell at every cover
        # level (explode is codegen; a doc matches a region at <=1 level
        # because the quadtree cover is disjoint per region)
        ancestors = F.array(
            *[
                grid_cell_col(F.col(lon_col), F.col(lat_col), r)
                for r in range(self.min_res, self.res + 1)
            ]
        )
        probe = docs.withColumn("__cell", F.explode(ancestors))
        fast = probe.join(F.broadcast(self.inside_df), on="__cell").drop("__cell")

        # refine path: only boundary-cell docs reach the Arrow exchange
        cand = tagged.join(F.broadcast(self.border_df), on="__cell").drop("__cell")
        bc = self._bc
        refine_schema = StructType(
            [f for f in docs.schema.fields] + [StructField(id_col, self.id_type, True)]
        )

        def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            parts_all, ids_local = bc.value
            ids_arr = np.asarray(ids_local, dtype=object)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                lons = pdf[lon_col].to_numpy(np.float64)
                lats = pdf[lat_col].to_numpy(np.float64)
                pos = pdf["__pos"].to_numpy(np.int64)
                keep = np.zeros(len(pdf), dtype=bool)
                order = np.argsort(pos, kind="stable")
                bounds = np.flatnonzero(np.diff(pos[order])) + 1
                for chunk in np.split(order, bounds):
                    p = int(pos[chunk[0]])
                    inside = np.zeros(len(chunk), dtype=bool)
                    for rings in parts_all[p]:
                        inside |= points_in_rings(lons[chunk], lats[chunk], rings)
                    keep[chunk[inside]] = True
                out = pdf.loc[keep].copy()
                out[id_col] = ids_arr[out["__pos"].to_numpy(np.int64)]
                yield out.drop(columns=["__pos"])

        refined = cand.mapInPandas(refine, schema=refine_schema)
        return fast.unionByName(refined)


def partitioned_pip_join(
    docs: DataFrame,
    boundaries: DataFrame,
    *,
    id_col: str,
    wkt_col: str,
    lon_col: str = "lon",
    lat_col: str = "lat",
    res: int = 10,
    how: str = "inner",
    doc_key_cols: list[str] | None = None,
) -> DataFrame:
    """Exact PIP join with NO driver-side index and NO broadcast of the
    boundary set — the scale path for boundary tables too large to
    broadcast (millions of polygons), where ``pip_join`` /
    ``cover_refine_pip_join`` cannot be used.

    Scale design: the cell cover of every polygon is computed IN THE
    EXECUTORS (``mapInPandas`` over the boundaries DataFrame, same
    ``_cover_cells`` kernel as the broadcast path, one polygon at a time).
    Fully-inside cover cells become a distributed ``(cell, id)`` table;
    boundary cells carry the polygon WKT with them, so after the single
    equi-join shuffle on the cell id the exact ray-cast refine runs
    co-located — the polygon travels to its border cells, never the whole
    boundary set to every executor. Geometry duplication is
    O(perimeter-cells), the same spatial-partitioning trade Sedona/
    GeoSpark make. The docs side shuffles once, keyed on the SAME packed
    grid cell id the tiling aggregates use, so the exchange is reusable
    downstream; a hot cell is an AQE-skew/salting problem, not an
    operator redesign.

    Results are identical to ``pip_join`` (same cover kernel, same
    ray-cast refine): a (doc, polygon) pair matches through exactly one
    of the two paths because a polygon's inside/border cell sets are
    disjoint and a doc has one res-``res`` cell.

    ``how='left'`` keeps unmatched docs once with a null ``id_col``
    (requires ``doc_key_cols``, as in ``cover_refine_pip_join``).
    """
    from ..functions.cells_udfs import grid_cell_col

    id_field = boundaries.schema[id_col]
    cover_schema = StructType(
        [
            StructField("__cell", LongType()),
            StructField(id_col, id_field.dataType),
            StructField("__wkt", StringType(), True),
        ]
    )

    def build_cover(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # ONE _cover_cells pass + ONE output frame per Arrow batch (the
        # former per-row loop built a pandas frame per polygon — frame
        # construction overhead, not cover math, dominated with many
        # polygons per task)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            geoms = [parse_wkt(w) for w in pdf[wkt_col]]
            in_cells, in_pos, bd_cells, bd_pos = _cover_cells(
                geoms, list(range(len(geoms))), res
            )
            if len(in_cells) + len(bd_cells) == 0:
                continue
            ids = pdf[id_col].to_numpy()
            wkts = pdf[wkt_col].to_numpy(dtype=object)
            yield pd.DataFrame(
                {
                    "__cell": np.concatenate([in_cells, bd_cells]),
                    id_col: np.concatenate([ids[in_pos], ids[bd_pos]]),
                    "__wkt": np.concatenate(
                        [
                            np.full(len(in_cells), None, dtype=object),
                            wkts[bd_pos],
                        ]
                    ),
                }
            )

    cover = boundaries.mapInPandas(build_cover, schema=cover_schema)

    tagged = docs.withColumn(
        "__cell", grid_cell_col(F.col(lon_col), F.col(lat_col), res)
    )
    # ONE join against the whole cover, then route rows by the border flag
    # (__wkt null = fully-inside cell → direct match). The two branches
    # share an identical scan+join subtree, so when the planner picks a
    # shuffle join at scale, ReuseExchange dedupes the docs exchange — one
    # shuffle of the docs table total.
    joined = tagged.join(cover, on="__cell").drop("__cell")
    fast = joined.filter(F.col("__wkt").isNull()).drop("__wkt")
    cand = joined.filter(F.col("__wkt").isNotNull())
    refine_schema = StructType(
        docs.schema.fields + [StructField(id_col, id_field.dataType, True)]
    )

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ring_cache: dict = {}
        cache_verts = 0
        # bound the cache by TOTAL vertex count, not entry count: a few
        # coastline-grade polygons can weigh more than thousands of small
        # ones (ADVICE r2) — 2M vertices ~= 32 MB of ring arrays per task
        max_cache_verts = 2_000_000
        for pdf in batches:
            if len(pdf) == 0:
                continue
            lons = pdf[lon_col].to_numpy(np.float64)
            lats = pdf[lat_col].to_numpy(np.float64)
            keep = np.zeros(len(pdf), dtype=bool)
            # group candidate rows by polygon; parse each polygon once
            # (cache survives across batches of the same task)
            for wkt, grp in pdf.groupby("__wkt", sort=False).groups.items():
                rings_parts = ring_cache.get(wkt)
                if rings_parts is None:
                    g = parse_wkt(wkt)
                    rings_parts = [
                        [np.asarray(r, dtype=np.float64)[:, :2] for r in rings]
                        for rings in g.parts
                    ]
                    n_verts = sum(
                        len(r) for rings in rings_parts for r in rings
                    )
                    if cache_verts + n_verts <= max_cache_verts:
                        ring_cache[wkt] = rings_parts
                        cache_verts += n_verts
                idx = np.asarray(grp)
                inside_m = np.zeros(len(idx), dtype=bool)
                for rings in rings_parts:
                    inside_m |= points_in_rings(lons[idx], lats[idx], rings)
                keep[idx[inside_m]] = True
            out = pdf.loc[keep, [c for c in pdf.columns if c != "__wkt"]].copy()
            yield out

    refined = cand.mapInPandas(refine, schema=refine_schema)
    matched = fast.unionByName(refined)
    if how == "inner":
        return matched
    if how != "left":
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if not doc_key_cols:
        raise ValueError("how='left' requires doc_key_cols (a unique doc key)")
    unmatched = docs.join(
        matched.select(*doc_key_cols).distinct(), on=doc_key_cols, how="left_anti"
    ).withColumn(id_col, F.lit(None).cast(id_field.dataType))
    return matched.unionByName(unmatched)


# ---------------------------------------------------------------------------
# cover-refine PIP on true H3 cells (north-star flagship shape on H3 ids)
# ---------------------------------------------------------------------------

class H3PolygonCover:
    """Cover-refine PIP join on canonical H3 cells.

    Driver-side classification per polygon at resolution ``res``:

    * ``border``  — cells the boundary passes through (every ring sampled
      at 0.25x the cell spacing) DILATED by one kRing. Dilation makes the
      set conservative: a corner-clipped cell whose boundary arc is
      shorter than the sampling step is always within one ring of a
      sampled cell, so no sliver is ever misclassified.
    * ``inside``  — polygon_to_cells (center containment) minus the
      dilated border. A cell whose center is inside and which is a full
      ring away from every boundary-crossed cell is provably contained,
      so its docs match with NO exact test.

    ``join`` runs ONE vectorized H3 encode over the docs (Arrow), a
    pure-JVM broadcast equi-join on the bigint cell id for the interior
    fast path, and the exact ray-cast refine only for dilated-border
    docs — identical results to ``pip_join``, Python exchange O(N·ε).
    """

    def __init__(self, spark, boundaries_pdf: pd.DataFrame, *, id_col: str,
                 wkt_col: str, res: int = 3, min_res: int = 0):
        from ..cells import h3core

        self.id_col = id_col
        self.res = res
        self.min_res = min_res
        ids = boundaries_pdf[id_col].tolist()
        geoms = [parse_wkt(w) for w in boundaries_pdf[wkt_col].tolist()]

        step = math.degrees(h3core._cell_spacing_rad(res)) * 0.25
        in_cells, in_pos, bd_cells, bd_pos = [], [], [], []
        for pos, g in enumerate(geoms):
            sampled: set = set()
            inside_raw: set = set()
            for rings in g.parts:
                for ring in rings:
                    r = np.asarray(ring, dtype=np.float64)[:, :2]  # lon, lat
                    ax, ay = r[:-1, 0], r[:-1, 1]
                    bx, by = r[1:, 0], r[1:, 1]
                    seg = np.maximum(np.abs(bx - ax), np.abs(by - ay))
                    nsub = np.maximum(1, np.ceil(seg / step).astype(np.int64))
                    idx = np.repeat(np.arange(len(ax)), nsub)
                    fr = (
                        np.concatenate([np.arange(k) for k in nsub])
                        / nsub[idx]
                    )
                    sx = ax[idx] + (bx[idx] - ax[idx]) * fr
                    sy = ay[idx] + (by[idx] - ay[idx]) * fr
                    cells = h3core.latlng_to_cell(sy, sx, res)
                    sampled.update(int(c) for c in np.unique(cells))
                ext = np.asarray(rings[0], dtype=np.float64)[:, :2]
                holes = [
                    np.asarray(h, dtype=np.float64)[:, [1, 0]]
                    for h in rings[1:]
                ]
                part_cells = h3core.polygon_to_cells(
                    ext[:, [1, 0]], res, holes=holes
                )
                inside_raw.update(int(c) for c in part_cells)
            bd_arr = np.array(sorted(sampled), dtype=np.uint64)
            dilated: set = set()
            if bd_arr.size:
                for d in h3core.grid_disk_arrays(bd_arr, 1):
                    dilated.update(int(x) for x in d)
            inside = np.array(sorted(inside_raw - dilated), dtype=np.uint64)
            # compactCells shrinks the interior broadcast ~3-7x (complete
            # sibling sets fold into parents down to min_res); H3 ids carry
            # their res, so the mixed-res cover stays ONE bigint column and
            # docs probe it with pure-JVM digit-truncation ancestors
            if inside.size and min_res < res:
                comp = h3core.compact_cells(inside)
                keep = h3core.get_resolution(comp) >= min_res
                shallow = comp[~keep]
                if shallow.size:  # re-expand anything coarser than min_res
                    comp = np.concatenate(
                        [comp[keep], h3core.uncompact_cells(shallow, min_res)]
                    )
                inside = np.unique(comp)
            for c in inside.tolist():
                in_cells.append(int(c))
                in_pos.append(pos)
            for c in sorted(dilated):
                bd_cells.append(c)
                bd_pos.append(pos)

        self.n_inside_cells = len(in_cells)
        self.n_border_cells = len(bd_cells)
        self.id_type = (
            StringType() if boundaries_pdf[id_col].dtype == object else LongType()
        )
        self.inside_df = spark.createDataFrame(
            pd.DataFrame(
                {"__cell": np.asarray(in_cells, dtype=np.int64),
                 id_col: [ids[p] for p in in_pos]}
            ),
            schema=StructType(
                [StructField("__cell", LongType()), StructField(id_col, self.id_type)]
            ),
        )
        self.border_df = spark.createDataFrame(
            pd.DataFrame(
                {"__cell": np.asarray(bd_cells, dtype=np.int64),
                 "__pos": np.asarray(bd_pos, dtype=np.int64)}
            ),
            schema=StructType(
                [StructField("__cell", LongType()), StructField("__pos", LongType())]
            ),
        )
        parts_by_pos = [
            [[np.asarray(r, dtype=np.float64)[:, :2] for r in rings] for rings in g.parts]
            for g in geoms
        ]
        self._bc = spark.sparkContext.broadcast((parts_by_pos, ids))

    def join(self, docs: DataFrame, *, lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
        from ..functions.cells_udfs import h3_cell, h3_parent_col

        id_col = self.id_col
        tagged = docs.withColumn(
            "__cell", h3_cell(self.res)(F.col(lon_col), F.col(lat_col))
        )
        # interior fast path probes the COMPACTED cover: ONE Arrow encode,
        # then ancestors at every cover level as pure-JVM digit truncation
        # (a doc matches a region at <= 1 level — compact sets are
        # disjoint per region)
        ancestors = F.array(
            F.col("__cell"),
            *[
                h3_parent_col(F.col("__cell"), self.res, r)
                for r in range(self.res - 1, self.min_res - 1, -1)
            ],
        )
        probe = tagged.withColumn("__anc", F.explode(ancestors)).drop("__cell")
        fast = (
            probe.join(
                F.broadcast(self.inside_df.withColumnRenamed("__cell", "__anc")),
                on="__anc",
            ).drop("__anc")
        )
        cand = tagged.join(F.broadcast(self.border_df), on="__cell").drop("__cell")

        bc = self._bc
        refine_schema = StructType(
            [f for f in docs.schema.fields] + [StructField(id_col, self.id_type, True)]
        )

        def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            parts_all, ids_local = bc.value
            ids_arr = np.asarray(ids_local, dtype=object)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                lons = pdf[lon_col].to_numpy(np.float64)
                lats = pdf[lat_col].to_numpy(np.float64)
                pos = pdf["__pos"].to_numpy(np.int64)
                keep = np.zeros(len(pdf), dtype=bool)
                order = np.argsort(pos, kind="stable")
                bounds = np.flatnonzero(np.diff(pos[order])) + 1
                for chunk in np.split(order, bounds):
                    p = int(pos[chunk[0]])
                    inside = np.zeros(len(chunk), dtype=bool)
                    for rings in parts_all[p]:
                        inside |= points_in_rings(lons[chunk], lats[chunk], rings)
                    keep[chunk[inside]] = True
                out = pdf.loc[keep].copy()
                out[id_col] = ids_arr[out["__pos"].to_numpy(np.int64)]
                yield out.drop(columns=["__pos"])

        refined = cand.mapInPandas(refine, schema=refine_schema)
        return fast.unionByName(refined)
