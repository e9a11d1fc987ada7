"""Hydrostatic geopotential integration in spectral space.

Reference: source/geopotential.f90. A bottom-up accumulation over the 8
levels (statically unrolled under jit) plus the reference's lapse-rate
correction applied to the zonal-mean (m=0) coefficients only
(geopotential.f90:52-56).
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from ..config import ModelConfig
from ..constants import RGAS


class GeopotentialConsts(NamedTuple):
    xgeop1: jnp.ndarray  # [kx]
    xgeop2: jnp.ndarray  # [kx] (index k holds the reference's xgeop2(k+1))
    corf: jnp.ndarray    # [kx] lapse-rate correction factors (0 at k=0, kx-1)


def build_geopotential(cfg: ModelConfig, geom_np: dict) -> GeopotentialConsts:
    hsg, fsg = geom_np["hsg"], geom_np["fsg"]
    kx = cfg.kx
    xgeop1 = RGAS * np.log(hsg[1:] / fsg)
    xgeop2 = np.zeros(kx)
    # reference xgeop2(k+1) = rgas*log(fsg(k+1)/hsg(k+1)) for k < kx
    # (geopotential.f90:27); store at index k+1 so xgeop2[k] pairs with t[k].
    xgeop2[1:] = RGAS * np.log(fsg[1:] / hsg[1:-1])
    corf = np.zeros(kx)
    # geopotential.f90:54 (0-based levels 1..kx-2)
    for k in range(1, kx - 1):
        corf[k] = xgeop1[k] * 0.5 * np.log(hsg[k + 1] / fsg[k]) \
            / np.log(fsg[k + 1] / fsg[k - 1])
    t = cfg.rdtype
    return GeopotentialConsts(
        xgeop1=jnp.asarray(xgeop1, t),
        xgeop2=jnp.asarray(xgeop2, t),
        corf=jnp.asarray(corf, t),
    )


def get_geopotential(gc: GeopotentialConsts, t: jnp.ndarray,
                     phis: jnp.ndarray) -> jnp.ndarray:
    """Spectral T [kx, mx, nx, 2] + spectral phis [mx, nx, 2] -> phi
    [kx, mx, nx, 2] (geopotential.f90:33-57)."""
    kx = t.shape[0]
    phi = [None] * kx
    phi[kx - 1] = phis + gc.xgeop1[kx - 1] * t[kx - 1]
    for k in range(kx - 2, -1, -1):
        phi[k] = phi[k + 1] + gc.xgeop2[k + 1] * t[k + 1] + gc.xgeop1[k] * t[k]
    phi = jnp.stack(phi, axis=0)
    # Lapse-rate correction on the zonal-mean (m=0) coefficients only
    # (geopotential.f90:53-56): phi[k, 0, :, :] += corf[k]*(t[k+1]-t[k-1]).
    corr = gc.corf[1: kx - 1, None, None] * (t[2:kx, 0] - t[0: kx - 2, 0])
    phi = phi.at[1: kx - 1, 0].add(corr)
    return phi
