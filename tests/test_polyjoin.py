"""Polygon×polygon overlap join (operators/polyjoin.py) + the
Greiner–Hormann intersection kernel (geom/clip.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geokitten_spark.fixtures import admin_polygons, admin_polygons_pdf
from geokitten_spark.geom import geometry_area, parse_wkt
from geokitten_spark.geom.clip import (
    intersection_area,
    polygon_difference,
    ring_intersection_area,
)
from geokitten_spark.operators.polyjoin import (
    bbox_cell_cover,
    polygon_overlap_join,
)


# ---------------------------------------------------------------------------
# intersection kernel
# ---------------------------------------------------------------------------

A = parse_wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
B = parse_wkt("POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))")


def test_intersection_square_overlap_cases():
    assert intersection_area(A, B) == 4.0
    assert intersection_area(B, A) == 4.0  # symmetric
    assert intersection_area(A, A) == 16.0  # idempotent on self
    dis = parse_wkt("POLYGON ((10 10, 11 10, 11 11, 10 11, 10 10))")
    assert intersection_area(A, dis) == 0.0
    inner = parse_wkt("POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))")
    assert intersection_area(A, inner) == 1.0  # containment, no crossings


def test_intersection_hole_inclusion_exclusion():
    ah = parse_wkt(
        "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 3 1, 3 3, 1 3, 1 1))"
    )
    # ext∩B = 4 minus hole∩B = 1
    assert intersection_area(ah, B) == 3.0


def test_intersection_plus_difference_equals_subject_area():
    # ties the two Greiner–Hormann modes together: |A∩B| + |A−B| = |A|
    for wkt_b in (
        "POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))",
        "POLYGON ((3 1, 7 1, 7 3, 3 3, 3 1))",
        "POLYGON ((-1 -1, 1 -1, 1 1, -1 1, -1 -1))",
    ):
        b = parse_wkt(wkt_b)
        total = intersection_area(A, b) + geometry_area(polygon_difference(A, b))
        assert total == pytest.approx(16.0, abs=1e-9)


def test_intersection_multipolygon_parts_sum():
    m = parse_wkt(
        "MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0)),"
        " ((10 10, 12 10, 12 12, 10 12, 10 10)))"
    )
    n = parse_wkt("POLYGON ((11 11, 13 11, 13 13, 11 13, 11 11))")
    assert intersection_area(m, n) == 1.0


def test_ring_intersection_area_bound():
    rng = np.random.default_rng(3)
    for _ in range(20):
        c1 = rng.uniform(-2, 2, 2)
        c2 = rng.uniform(-2, 2, 2)
        sq = np.array([[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]], float)
        r1 = sq + c1
        r2 = sq + c2
        a = ring_intersection_area(r1, r2)
        assert 0.0 <= a <= 4.0 + 1e-12


# ---------------------------------------------------------------------------
# distributed join
# ---------------------------------------------------------------------------

def _brute_pairs():
    pdf = admin_polygons_pdf()
    geoms = [parse_wkt(w) for w in pdf["geometry_wkt"]]
    ids = list(pdf["region_id"])
    out = {}
    for i in range(len(geoms)):
        for j in range(i + 1, len(geoms)):
            area = intersection_area(geoms[i], geoms[j])
            if area > 0.0:
                out[(ids[i], ids[j])] = area
    return out


def test_cover_candidates_superset_of_true_pairs(spark):
    admin = admin_polygons(spark)
    cov = bbox_cell_cover(admin, "region_id", "geometry_wkt", 5).alias("L")
    cands = {
        (r.id_a, r.id_b)
        for r in cov.join(
            bbox_cell_cover(admin, "region_id", "geometry_wkt", 5).alias("R"),
            "cell_id",
        )
        .select(F.col("L._pid").alias("id_a"), F.col("R._pid").alias("id_b"))
        .distinct()
        .collect()
    }
    for pair in _brute_pairs():
        assert pair in cands  # no silent cover misses


@pytest.mark.parametrize("res", [4, 6])
def test_join_equals_bruteforce_at_any_cover_res(spark, res):
    admin = admin_polygons(spark)
    got = {
        (r.id_a, r.id_b): r.inter_area
        for r in polygon_overlap_join(
            admin, admin, id_left="region_id", id_right="region_id", res=res
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .collect()
    }
    want = _brute_pairs()
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=0.0)  # same kernel → exact
