"""WGS84 transverse Mercator (UTM) — Krüger n-series, pure numpy.

Forward/inverse exact-Gauss-Krüger via the 6th-order series in the
third flattening n (Krüger 1912; coefficients as republished in
Karney 2011, "Transverse Mercator with an accuracy of a few
nanometers", §3 — a public algorithm, the same family PROJ's
``tmerc`` default uses).  Truncation error inside a UTM zone is
< 1 nm, so nearest-neighbor warps over ≥ 10 m pixels are insensitive
to the remaining ulps.

Vectorized over numpy arrays (the engine warp path); the serial
oracle twin in ``queries._s2_stack_oracle`` re-codes the same
published formulas per-pixel with ``math`` so a transcription bug
here cannot pass both sides.

Reference dataflow anchor: ``create_s2_samples.py:96-124`` writes the
fixtures in EPSG:32633 (UTM 33N) and ``generate_s2_stack.py:11-17``
reads them warped onto geodetic tiles — this module is the sandbox's
rasterio/PROJ replacement for that warp.
"""

from __future__ import annotations

import numpy as np

__all__ = ["utm_params", "forward", "inverse", "Tmerc"]

_A = 6378137.0  # WGS84 semi-major
_F = 1.0 / 298.257223563
_N = _F / (2.0 - _F)  # third flattening

# rectifying radius A' = a/(1+n) (1 + n^2/4 + n^4/64 + n^6/256)
_RECT = _A / (1.0 + _N) * (1.0 + _N**2 / 4 + _N**4 / 64 + _N**6 / 256)

# forward series alpha_j (Karney 2011 eq. 35)
_ALPHA = (
    _N / 2 - 2 * _N**2 / 3 + 5 * _N**3 / 16 + 41 * _N**4 / 180
    - 127 * _N**5 / 288 + 7891 * _N**6 / 37800,
    13 * _N**2 / 48 - 3 * _N**3 / 5 + 557 * _N**4 / 1440
    + 281 * _N**5 / 630 - 1983433 * _N**6 / 1935360,
    61 * _N**3 / 240 - 103 * _N**4 / 140 + 15061 * _N**5 / 26880
    + 167603 * _N**6 / 181440,
    49561 * _N**4 / 161280 - 179 * _N**5 / 168 + 6601661 * _N**6 / 7257600,
    34729 * _N**5 / 80640 - 3418889 * _N**6 / 1995840,
    212378941 * _N**6 / 319334400,
)

# inverse series beta_j (Karney 2011 eq. 36)
_BETA = (
    _N / 2 - 2 * _N**2 / 3 + 37 * _N**3 / 96 - _N**4 / 360
    - 81 * _N**5 / 512 + 96199 * _N**6 / 604800,
    _N**2 / 48 + _N**3 / 15 - 437 * _N**4 / 1440 + 46 * _N**5 / 105
    - 1118711 * _N**6 / 3870720,
    17 * _N**3 / 480 - 37 * _N**4 / 840 - 209 * _N**5 / 4480
    + 5569 * _N**6 / 90720,
    4397 * _N**4 / 161280 - 11 * _N**5 / 504 - 830251 * _N**6 / 7257600,
    4583 * _N**5 / 161280 - 108847 * _N**6 / 3991680,
    20648693 * _N**6 / 638668800,
)

# conformal → geodetic latitude series (sin 2jχ coefficients)
_CHI = (
    2 * _N - 2 * _N**2 / 3 - 2 * _N**3 + 116 * _N**4 / 45
    + 26 * _N**5 / 45 - 2854 * _N**6 / 675,
    7 * _N**2 / 3 - 8 * _N**3 / 5 - 227 * _N**4 / 45
    + 2704 * _N**5 / 315 + 2323 * _N**6 / 945,
    56 * _N**3 / 15 - 136 * _N**4 / 35 - 1262 * _N**5 / 105
    + 73814 * _N**6 / 2835,
    4279 * _N**4 / 630 - 332 * _N**5 / 35 - 399572 * _N**6 / 14175,
    4174 * _N**5 / 315 - 144838 * _N**6 / 6237,
    601676 * _N**6 / 22275,
)

_E = np.sqrt(_F * (2.0 - _F))  # first eccentricity
_2SQN = 2.0 * np.sqrt(_N) / (1.0 + _N)


def utm_params(epsg: int) -> tuple[float, float, float, float]:
    """EPSG 326xx/327xx → (lon0_deg, k0, false_easting, false_northing)."""
    if 32601 <= epsg <= 32660:
        zone, fn = epsg - 32600, 0.0
    elif 32701 <= epsg <= 32760:
        zone, fn = epsg - 32700, 10000000.0
    else:
        raise NotImplementedError(f"EPSG {epsg} is not a UTM WGS84 code")
    return (float(zone * 6 - 183), 0.9996, 500000.0, fn)


def forward(lon_deg, lat_deg, lon0_deg: float, k0: float = 0.9996,
            fe: float = 500000.0, fn: float = 0.0):
    """(lon, lat) degrees → (easting, northing) meters. Vectorized."""
    lam = np.radians(np.asarray(lon_deg, dtype=np.float64) - lon0_deg)
    phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
    sphi = np.sin(phi)
    # conformal latitude via tau' (Karney eq. 7-9, sinh/atanh form)
    t = np.sinh(np.arctanh(sphi) - _2SQN * np.arctanh(_2SQN * sphi))
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arctanh(np.sin(lam) / np.sqrt(1.0 + t * t))
    xi, eta = xi_p.copy(), eta_p.copy()
    for j, a in enumerate(_ALPHA, start=1):
        xi = xi + a * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
        eta = eta + a * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)
    return fe + k0 * _RECT * eta, fn + k0 * _RECT * xi


def inverse(easting, northing, lon0_deg: float, k0: float = 0.9996,
            fe: float = 500000.0, fn: float = 0.0):
    """(easting, northing) meters → (lon, lat) degrees. Vectorized."""
    xi = (np.asarray(northing, dtype=np.float64) - fn) / (k0 * _RECT)
    eta = (np.asarray(easting, dtype=np.float64) - fe) / (k0 * _RECT)
    xi_p, eta_p = xi.copy(), eta.copy()
    for j, b in enumerate(_BETA, start=1):
        xi_p = xi_p - b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        eta_p = eta_p - b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))
    phi = chi.copy()
    for j, c in enumerate(_CHI, start=1):
        phi = phi + c * np.sin(2 * j * chi)
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    return lon0_deg + np.degrees(lam), np.degrees(phi)


class Tmerc:
    """A bound UTM transform (one EPSG) with forward/inverse methods."""

    def __init__(self, epsg: int):
        self.epsg = int(epsg)
        self.lon0, self.k0, self.fe, self.fn = utm_params(self.epsg)

    def to_projected(self, lon, lat):
        return forward(lon, lat, self.lon0, self.k0, self.fe, self.fn)

    def to_lonlat(self, x, y):
        return inverse(x, y, self.lon0, self.k0, self.fe, self.fn)
