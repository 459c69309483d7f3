"""viz/raster.py — PNG raster heat tiles (the vector→raster half of the
north_rule's raster↔vector loop)."""

import hashlib

import numpy as np
import pandas as pd
import pytest

from geokitten_spark.functions.multimodal import decode_png
from geokitten_spark.viz.raster import (
    pixel_id_udf,
    point_pixel,
    raster_heat_tiles,
    render_heat_tile,
)


def test_point_pixel_hand_math():
    # z=0, one 64px tile worldwide
    gx, gy = point_pixel([-180.0, 0.0, 179.999], [0.0, 0.0, 0.0], 0, 64)
    assert gx.tolist() == [0, 32, 63]
    assert gy.tolist() == [32, 32, 32]  # equator is mid-tile
    # lon=180 exactly lands on the right edge and clamps into range
    gx, _ = point_pixel([180.0], [0.0], 0, 64)
    assert gx.tolist() == [63]
    # poles clamp to the web-mercator band, stay in [0, n)
    _, gy = point_pixel([0.0, 0.0], [90.0, -90.0], 3, 64)
    n = 64 << 3
    assert 0 <= gy[0] < n and 0 <= gy[1] < n
    assert gy[0] == 0 and gy[1] == n - 1


def test_point_pixel_zoom_shift_consistency():
    """A finest-zoom pixel right-shifted by dz must equal the pixel
    computed directly at the coarser zoom (the pyramid's invariant)."""
    rng = np.random.RandomState(7)
    lons = rng.uniform(-179, 179, 500)
    lats = rng.uniform(-84, 84, 500)
    gx3, gy3 = point_pixel(lons, lats, 3, 64)
    gx1, gy1 = point_pixel(lons, lats, 1, 64)
    assert np.array_equal(gx3 >> 2, gx1)
    assert np.array_equal(gy3 >> 2, gy1)


def test_render_heat_tile_gray_ramp():
    # pixel 0 has the max count -> 255; pixel 5 half -> 55 + 100 = 155
    blob = render_heat_tile([0, 5], [2, 1], 8)
    img = decode_png(blob)
    assert img.shape[:2] == (8, 8)
    img = img[..., 0]
    assert img[0, 0] == 255
    assert img[0, 5] == 155
    assert img[1:].sum() == 0 and img[0, 1:5].sum() == 0


def test_render_heat_tile_sums_duplicates():
    # duplicate pixel entries accumulate before normalization
    a = render_heat_tile([3, 3, 9], [1, 1, 2], 4)
    b = render_heat_tile([3, 9], [2, 2], 4)
    assert a == b
    # empty tile is all-zero
    img = decode_png(render_heat_tile([], [], 4))
    assert img.shape[:2] == (4, 4) and img.sum() == 0


def test_pixel_pack_guard():
    with pytest.raises(ValueError):
        pixel_id_udf(26, 64)
    with pytest.raises(ValueError):
        raster_heat_tiles(None, zooms=(3,), tile_px=48)


def _synth_points(spark, n=400, parts=1):
    rng = np.random.RandomState(11)
    pdf = pd.DataFrame(
        {
            "lon": rng.uniform(-170, 170, n),
            "lat": rng.uniform(-80, 80, n),
        }
    )
    return spark.createDataFrame(pdf).repartition(parts)


def test_raster_tiles_partitioning_invariance(spark):
    """Tile bytes are a pure function of the point multiset — the same
    input at 1 and 7 partitions renders identical (z,x,y)->md5 maps."""
    def run(parts):
        out = raster_heat_tiles(_synth_points(spark, parts=parts), zooms=(3, 2))
        return {
            (r["z"], r["x"], r["y"]): (r["n_points"], hashlib.md5(r["png"]).hexdigest())
            for r in out.collect()
        }

    assert run(1) == run(7)


def test_raster_tiles_pyramid_consistency(spark):
    """Every z=2 parent's n_points equals the sum over its four z=3
    children, and the total point count is conserved per level."""
    out = raster_heat_tiles(_synth_points(spark), zooms=(3, 2)).collect()
    by_level: dict = {2: {}, 3: {}}
    for r in out:
        by_level[r["z"]][(r["x"], r["y"])] = r["n_points"]
    assert sum(by_level[2].values()) == sum(by_level[3].values()) == 400
    for (px, py), n in by_level[2].items():
        kids = sum(
            by_level[3].get((px * 2 + dx, py * 2 + dy), 0)
            for dx in (0, 1)
            for dy in (0, 1)
        )
        assert kids == n
    # blobs decode as tile_px x tile_px grayscale with the tile max at 255
    img = decode_png(out[0]["png"])
    assert img.shape[:2] == (64, 64) and img.max() == 255


def test_raster_tiles_matches_driver_replica(spark):
    """Distributed render == the oracle-side numpy replica, byte for
    byte (the same check the strict harness does, on synthetic points)."""
    pts = _synth_points(spark, n=300, parts=5)
    got = {
        (r["z"], r["x"], r["y"]): hashlib.md5(r["png"]).hexdigest()
        for r in raster_heat_tiles(pts, zooms=(2,), tile_px=32).collect()
    }
    pdf = pts.toPandas()
    gx, gy = point_pixel(pdf["lon"], pdf["lat"], 2, 32)
    uniq, counts = np.unique((gx << 32) | gy, return_counts=True)
    ugx, ugy = uniq >> 32, uniq & 0xFFFFFFFF
    groups: dict = {}
    for k in range(len(uniq)):
        key = (2, int(ugx[k]) >> 5, int(ugy[k]) >> 5)
        pix = (int(ugy[k]) & 31) * 32 + (int(ugx[k]) & 31)
        groups.setdefault(key, []).append((pix, int(counts[k])))
    want = {
        key: hashlib.md5(
            render_heat_tile([p for p, _ in rws], [c for _, c in rws], 32)
        ).hexdigest()
        for key, rws in groups.items()
    }
    assert got == want


def test_raster_tiles_weighted_equals_replicated(spark):
    """A weight-w point renders byte-identically to w coincident
    unweighted points (the weighted aggregate is the same measure)."""
    import pyspark.sql.functions as F

    pts = _synth_points(spark, n=120, parts=3)
    weighted = pts.withColumn("w", (F.abs(F.hash("lon")) % 4 + 1).cast("long"))
    replicated = weighted.select(
        "lon", "lat", F.explode(F.sequence(F.lit(1), F.col("w"))).alias("_i")
    )

    def tiles(df, **kw):
        out = raster_heat_tiles(df, zooms=(2,), tile_px=32, **kw)
        return {
            (r["z"], r["x"], r["y"]): (r["n_points"], hashlib.md5(r["png"]).hexdigest())
            for r in out.collect()
        }

    assert tiles(weighted, weight_col="w") == tiles(replicated)
