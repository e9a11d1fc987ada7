"""Model geometry: sigma levels and the Gaussian latitude grid.

Reference: source/geometry.f90. The latitude convention is j=0 southernmost
(geometry.f90:65-76). Two deliberate quirks of the reference are reproduced
because the whole spectral machinery depends on them:

* ``sia_half`` holds the *asymptotic seed* cos(pi*(j - 1/4)/(il + 1/2)) for
  the Gauss-Legendre nodes, NOT the Newton-iterated nodes (geometry.f90:68).
  The Legendre polynomials are evaluated at these approximate nodes while the
  quadrature *weights* are computed at the iterated nodes (legendre.f90:158-191).
* The literal single-precision-ish value of pi (3.141592654) is used in the
  seed (constants.PI_F).

All tables are built host-side in float64 with numpy, then cast to the
configured dtype as a `Geometry` pytree of device constants.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from .config import ModelConfig
from .constants import AKAP, OMEGA, PI_F

# Half-level sigma tables for the supported level counts (geometry.f90:42-48).
_HSG_TABLES = {
    5: [0.000, 0.150, 0.350, 0.650, 0.900, 1.000],
    7: [0.020, 0.140, 0.260, 0.420, 0.600, 0.770, 0.900, 1.000],
    8: [0.000, 0.050, 0.140, 0.260, 0.420, 0.600, 0.770, 0.900, 1.000],
}


class Geometry(NamedTuple):
    """Static geometry arrays (device constants)."""

    # vertical (geometry.f90:16-20)
    hsg: jnp.ndarray     # [kx+1] half-level sigma
    dhs: jnp.ndarray     # [kx] layer thickness
    fsg: jnp.ndarray     # [kx] full-level sigma
    dhsr: jnp.ndarray    # [kx] 1/(2*dhs)
    fsgr: jnp.ndarray    # [kx] akap/(2*fsg)
    # horizontal (geometry.f90:23-31)
    radang: jnp.ndarray  # [il] latitude (radians), south -> north
    coriol: jnp.ndarray  # [il] Coriolis parameter 2*Omega*sin(lat)
    sia: jnp.ndarray     # [il] sin(lat)
    coa: jnp.ndarray     # [il] cos(lat)
    sia_half: jnp.ndarray  # [iy] |sin(lat)| northern half (approx nodes)
    coa_half: jnp.ndarray  # [iy]
    cosg: jnp.ndarray    # [il] cos(lat)
    cosgr: jnp.ndarray   # [il] 1/cos(lat)
    cosgr2: jnp.ndarray  # [il] 1/cos^2(lat)


def build_geometry_np(cfg: ModelConfig) -> dict:
    """Float64 numpy geometry tables (used by setup code and tests)."""
    kx, il, iy = cfg.kx, cfg.il, cfg.iy

    hsg = np.asarray(_HSG_TABLES[kx], dtype=np.float64)
    dhs = hsg[1:] - hsg[:-1]
    fsg = 0.5 * (hsg[1:] + hsg[:-1])
    dhsr = 0.5 / dhs
    fsgr = AKAP / (2.0 * fsg)

    # Approximate Gauss node seed, pole -> equator (geometry.f90:66-76).
    j = np.arange(1, iy + 1, dtype=np.float64)
    sia_half = np.cos(PI_F * (j - 0.25) / (il + 0.5))
    coa_half = np.sqrt(1.0 - sia_half**2)

    sia = np.concatenate([-sia_half, sia_half[::-1]])
    coa = np.concatenate([coa_half, coa_half[::-1]])
    radang = np.concatenate([-np.arcsin(sia_half), np.arcsin(sia_half)[::-1]])
    cosg = coa.copy()
    cosgr = 1.0 / coa
    cosgr2 = 1.0 / coa**2
    coriol = 2.0 * OMEGA * sia

    return dict(
        hsg=hsg, dhs=dhs, fsg=fsg, dhsr=dhsr, fsgr=fsgr,
        radang=radang, coriol=coriol, sia=sia, coa=coa,
        sia_half=sia_half, coa_half=coa_half,
        cosg=cosg, cosgr=cosgr, cosgr2=cosgr2,
    )


def build_geometry(cfg: ModelConfig) -> Geometry:
    t = cfg.rdtype
    np_geom = build_geometry_np(cfg)
    return Geometry(**{k: jnp.asarray(v, dtype=t) for k, v in np_geom.items()})
