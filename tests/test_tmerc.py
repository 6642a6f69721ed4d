"""Krüger-series transverse Mercator: roundtrip, independent-formula
cross-check, and UTM parameter mapping.

The independent check re-computes the forward projection with the
completely different Snyder (1987, USGS PP 1395 §8, eq. 8-9..8-17)
series — a 4th-order expansion in e'² with explicit meridional arc —
sharing nothing with the Krüger n-series but the ellipsoid constants.
Agreement within millimeters over the UTM zone validates both
transcriptions; the engine's warp tolerance is 0.125 px = 60 m, so
mm-level slack is 4-5 orders of magnitude of margin.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from mapchete_xarray_spark.functions import tmerc


def snyder_forward(lon_deg: float, lat_deg: float, lon0: float,
                   k0: float = 0.9996, fe: float = 500000.0, fn: float = 0.0):
    a = 6378137.0
    f = 1 / 298.257223563
    e2 = f * (2 - f)
    ep2 = e2 / (1 - e2)
    lat = math.radians(lat_deg)
    dlon = math.radians(lon_deg - lon0)
    N = a / math.sqrt(1 - e2 * math.sin(lat) ** 2)
    T = math.tan(lat) ** 2
    C = ep2 * math.cos(lat) ** 2
    A = dlon * math.cos(lat)
    M = a * (
        (1 - e2 / 4 - 3 * e2**2 / 64 - 5 * e2**3 / 256) * lat
        - (3 * e2 / 8 + 3 * e2**2 / 32 + 45 * e2**3 / 1024) * math.sin(2 * lat)
        + (15 * e2**2 / 256 + 45 * e2**3 / 1024) * math.sin(4 * lat)
        - (35 * e2**3 / 3072) * math.sin(6 * lat)
    )
    x = k0 * N * (
        A + (1 - T + C) * A**3 / 6
        + (5 - 18 * T + T**2 + 72 * C - 58 * ep2) * A**5 / 120
    )
    y = k0 * (
        M + N * math.tan(lat) * (
            A**2 / 2 + (5 - T + 9 * C + 4 * C**2) * A**4 / 24
            + (61 - 58 * T + T**2 + 600 * C - 330 * ep2) * A**6 / 720
        )
    )
    return fe + x, fn + y


class TestUtmParams:
    def test_north(self):
        assert tmerc.utm_params(32633) == (15.0, 0.9996, 500000.0, 0.0)

    def test_south(self):
        assert tmerc.utm_params(32723) == (-45.0, 0.9996, 500000.0, 10000000.0)

    def test_non_utm_refused(self):
        with pytest.raises(NotImplementedError):
            tmerc.utm_params(3857)


class TestForwardInverse:
    def test_roundtrip_grid(self):
        t = tmerc.Tmerc(32633)
        lon = np.linspace(11.0, 19.0, 41)
        lat = np.linspace(40.0, 60.0, 41)
        LON, LAT = np.meshgrid(lon, lat)
        E, N = t.to_projected(LON, LAT)
        lon2, lat2 = t.to_lonlat(E, N)
        # nanometer-scale roundtrip (degrees: 1e-12 ≈ 0.1 µm)
        assert np.abs(lon2 - LON).max() < 1e-11
        assert np.abs(lat2 - LAT).max() < 1e-11

    def test_against_snyder(self):
        t = tmerc.Tmerc(32633)
        for lon in (11.3, 13.0, 15.0, 16.9, 18.0):
            for lat in (45.1, 47.76, 48.75, 55.0):
                E, N = t.to_projected(np.array([lon]), np.array([lat]))
                Es, Ns = snyder_forward(lon, lat, 15.0)
                assert abs(E[0] - Es) < 5e-3, (lon, lat)
                assert abs(N[0] - Ns) < 5e-3, (lon, lat)

    def test_known_point(self):
        # central meridian, equator: easting == false easting exactly
        t = tmerc.Tmerc(32633)
        E, N = t.to_projected(np.array([15.0]), np.array([0.0]))
        assert abs(E[0] - 500000.0) < 1e-6
        assert abs(N[0]) < 1e-6

    def test_south_hemisphere_false_northing(self):
        t = tmerc.Tmerc(32733)
        E, N = t.to_projected(np.array([15.0]), np.array([-1.0]))
        assert N[0] < 10000000.0 and N[0] > 9800000.0
