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

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ..geom import parse_wkt, points_in_rings
from ..geom.rtree import STRtree

__all__ = ["BoundaryIndex", "pip_join"]


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
