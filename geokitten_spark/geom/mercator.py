"""Closed-form CRS transforms (pure numpy), replacing pyproj.

The reference reprojects with pyproj via GeoPandas ``to_crs``
(``/root/reference/geokitten/gdf_standardization.py:474-485`` normalizes to
EPSG:4326; ``:998-1023`` temporarily reprojects to EPSG:3395 World Mercator
for surface area). Only three CRSs appear anywhere in the reference or its
fixtures: EPSG:4326 (WGS84 lat/lng), EPSG:3857 (Web/Spherical Mercator — the
124-row standardization fixture's CRS) and EPSG:3395 (World Mercator,
ellipsoidal). All three have closed forms, implemented here vectorized.
"""

from __future__ import annotations

import numpy as np

WGS84_A = 6378137.0  # semi-major axis (both 3857 and 3395 use this)
WGS84_F = 1.0 / 298.257223563
WGS84_E2 = WGS84_F * (2.0 - WGS84_F)  # first eccentricity squared
WGS84_E = np.sqrt(WGS84_E2)

EPSG_WGS84 = "EPSG:4326"
EPSG_WEB_MERCATOR = "EPSG:3857"
EPSG_WORLD_MERCATOR = "EPSG:3395"


def lonlat_to_webmercator(lon: np.ndarray, lat: np.ndarray):
    """EPSG:4326 → EPSG:3857 (spherical Mercator)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = WGS84_A * np.radians(lon)
    y = WGS84_A * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))
    return x, y


def webmercator_to_lonlat(x: np.ndarray, y: np.ndarray):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.degrees(x / WGS84_A)
    lat = np.degrees(2.0 * np.arctan(np.exp(y / WGS84_A)) - np.pi / 2.0)
    return lon, lat


def lonlat_to_worldmercator(lon: np.ndarray, lat: np.ndarray):
    """EPSG:4326 → EPSG:3395 (ellipsoidal Mercator, WGS84 ellipsoid).

    x = a·λ;  y = a·ln( tan(π/4 + φ/2) · ((1−e·sinφ)/(1+e·sinφ))^{e/2} )
    """
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    phi = np.radians(lat)
    x = WGS84_A * np.radians(lon)
    esin = WGS84_E * np.sin(phi)
    y = WGS84_A * np.log(
        np.tan(np.pi / 4.0 + phi / 2.0) * ((1.0 - esin) / (1.0 + esin)) ** (WGS84_E / 2.0)
    )
    return x, y


def worldmercator_to_lonlat(x: np.ndarray, y: np.ndarray, iters: int = 15):
    """Inverse of EPSG:3395 via fixed-point iteration on the conformal latitude."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.degrees(x / WGS84_A)
    t = np.exp(-y / WGS84_A)
    phi = np.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(iters):
        esin = WGS84_E * np.sin(phi)
        phi = np.pi / 2.0 - 2.0 * np.arctan(
            t * ((1.0 - esin) / (1.0 + esin)) ** (WGS84_E / 2.0)
        )
    return lon, np.degrees(phi)


_FORWARD = {
    (EPSG_WGS84, EPSG_WEB_MERCATOR): lonlat_to_webmercator,
    (EPSG_WGS84, EPSG_WORLD_MERCATOR): lonlat_to_worldmercator,
    (EPSG_WEB_MERCATOR, EPSG_WGS84): webmercator_to_lonlat,
    (EPSG_WORLD_MERCATOR, EPSG_WGS84): worldmercator_to_lonlat,
}


def normalize_crs(crs) -> str:
    if crs is None:
        return EPSG_WGS84
    s = str(crs).upper().replace(" ", "")
    if s in ("EPSG:4326", "WGS84", "4326"):
        return EPSG_WGS84
    if s in ("EPSG:3857", "3857", "EPSG:900913"):
        return EPSG_WEB_MERCATOR
    if s in ("EPSG:3395", "3395"):
        return EPSG_WORLD_MERCATOR
    raise ValueError(f"unsupported CRS: {crs!r}")


def transform_xy(x, y, src_crs, dst_crs):
    """Vectorized transform between any pair of the supported CRSs."""
    src, dst = normalize_crs(src_crs), normalize_crs(dst_crs)
    if src == dst:
        return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    if (src, dst) in _FORWARD:
        return _FORWARD[(src, dst)](x, y)
    # go via WGS84
    lon, lat = _FORWARD[(src, EPSG_WGS84)](x, y)
    return _FORWARD[(EPSG_WGS84, dst)](lon, lat)
