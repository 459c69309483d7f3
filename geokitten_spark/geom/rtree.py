"""Packed STR R-tree over bounding boxes, pure numpy.

Built once on the driver over the (small) boundary set, pickled into a Spark
broadcast, queried per Arrow batch inside pandas UDFs (SURVEY.md §4 "polygon
broadcast"). Query returns candidate indices; exact ray-casting PIP refines.
Replaces the reference's absent spatial index (GeoKitten scans row-at-a-time,
/root/reference/geokitten/gdf_standardization.py:963-966).
"""

from __future__ import annotations

import numpy as np

__all__ = ["STRtree"]


class STRtree:
    """Sort-Tile-Recursive packed R-tree.

    Leaves hold item bboxes; internal levels are built bottom-up with
    node_capacity fanout. Query is a level-by-level vectorized bbox filter.
    """

    def __init__(self, bboxes: np.ndarray, node_capacity: int = 16):
        """bboxes: (n, 4) array of (xmin, ymin, xmax, ymax)."""
        self.bboxes = np.asarray(bboxes, dtype=np.float64).reshape(-1, 4)
        self.cap = int(node_capacity)
        n = len(self.bboxes)
        if n == 0:
            self.order = np.empty(0, dtype=np.int64)
            self.levels = []
            return
        # STR packing: sort by center-x into vertical slabs, each slab by center-y
        cx = (self.bboxes[:, 0] + self.bboxes[:, 2]) / 2.0
        cy = (self.bboxes[:, 1] + self.bboxes[:, 3]) / 2.0
        nslabs = max(1, int(np.ceil(np.sqrt(np.ceil(n / self.cap)))))
        slab_size = int(np.ceil(n / nslabs)) * self.cap
        slab_size = max(self.cap, int(np.ceil(n / nslabs)))
        by_x = np.argsort(cx, kind="stable")
        order = []
        for s in range(0, n, slab_size):
            slab = by_x[s : s + slab_size]
            order.append(slab[np.argsort(cy[slab], kind="stable")])
        self.order = np.concatenate(order)
        # leaf-level boxes in packed order
        packed = self.bboxes[self.order]
        self.levels = []  # levels[0] = leaf groups, up to root
        cur = packed
        while len(cur) > 1:
            ngroups = int(np.ceil(len(cur) / self.cap))
            pad = ngroups * self.cap - len(cur)
            if pad:
                filler = np.full((pad, 4), np.nan)
                cur_p = np.vstack([cur, filler])
            else:
                cur_p = cur
            grp = cur_p.reshape(ngroups, self.cap, 4)
            with np.errstate(invalid="ignore"):
                parent = np.column_stack([
                    np.nanmin(grp[:, :, 0], axis=1),
                    np.nanmin(grp[:, :, 1], axis=1),
                    np.nanmax(grp[:, :, 2], axis=1),
                    np.nanmax(grp[:, :, 3], axis=1),
                ])
            self.levels.append(cur)
            cur = parent
        self.levels.append(cur)

    # -- queries -----------------------------------------------------------
    def query_point(self, x: float, y: float) -> np.ndarray:
        return self.query_box(x, y, x, y)

    def query_box(self, xmin, ymin, xmax, ymax) -> np.ndarray:
        """Indices (into the original bboxes) whose bbox intersects the box."""
        if not self.levels:
            return np.empty(0, dtype=np.int64)
        # start from root, descend ranges
        cand = np.array([0], dtype=np.int64)
        for lvl in range(len(self.levels) - 1, 0, -1):
            boxes = self.levels[lvl][cand]
            hit = ~(
                (boxes[:, 2] < xmin)
                | (boxes[:, 0] > xmax)
                | (boxes[:, 3] < ymin)
                | (boxes[:, 1] > ymax)
            )
            parents = cand[hit]
            children = (
                parents[:, None] * self.cap + np.arange(self.cap)[None, :]
            ).ravel()
            children = children[children < len(self.levels[lvl - 1])]
            cand = children
        boxes = self.levels[0][cand]
        hit = ~(
            (boxes[:, 2] < xmin)
            | (boxes[:, 0] > xmax)
            | (boxes[:, 3] < ymin)
            | (boxes[:, 1] > ymax)
        )
        return self.order[cand[hit]]

    def query_points(self, xs: np.ndarray, ys: np.ndarray):
        """Batch point query → (point_idx, item_idx) candidate pair arrays.

        Vectorized level descent per point batch: O(batch × tree levels)
        numpy ops; used inside pandas UDF batches (SURVEY §2.4 J2).
        """
        xs = np.asarray(xs, dtype=np.float64)
        ys = np.asarray(ys, dtype=np.float64)
        npts = len(xs)
        if not self.levels or npts == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        pt = np.arange(npts, dtype=np.int64)
        cand_pt = pt
        cand_node = np.zeros(npts, dtype=np.int64)
        for lvl in range(len(self.levels) - 1, 0, -1):
            boxes = self.levels[lvl][cand_node]
            x = xs[cand_pt]
            y = ys[cand_pt]
            hit = (
                (boxes[:, 0] <= x)
                & (x <= boxes[:, 2])
                & (boxes[:, 1] <= y)
                & (y <= boxes[:, 3])
            )
            cand_pt = cand_pt[hit]
            cand_node = cand_node[hit]
            cand_pt = np.repeat(cand_pt, self.cap)
            cand_node = (
                cand_node[:, None] * self.cap + np.arange(self.cap)[None, :]
            ).ravel()
            keep = cand_node < len(self.levels[lvl - 1])
            cand_pt = cand_pt[keep]
            cand_node = cand_node[keep]
        boxes = self.levels[0][cand_node]
        x = xs[cand_pt]
        y = ys[cand_pt]
        hit = (
            (boxes[:, 0] <= x)
            & (x <= boxes[:, 2])
            & (boxes[:, 1] <= y)
            & (y <= boxes[:, 3])
        )
        return cand_pt[hit], self.order[cand_node[hit]]
