"""Vertical diffusion and shallow convection.

Reference: source/vertical_diffusion.f90. Three processes: shallow
convection between the lowest two layers, slow moisture diffusion in
stable conditions, and fast dry-static-energy redistribution under
super-adiabatic lapse rates (the inner downward-compensation loop becomes
a masked suffix broadcast).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ...constants import ALHC, CP
from . import rowops

TRSHC = 6.0    # shallow-convection relaxation time (h)
TRVDI = 24.0   # moisture-diffusion relaxation time (h)
TRVDS = 6.0    # super-adiabatic relaxation time (h)
REDSHC = 0.5   # shallow-convection reduction in deep-convection areas
RHGRAD = 0.5   # max d(RH)/d(sigma)
SEGRAD = 0.1   # min d(DSE)/d(phi)


def vertical_diffusion(fsg: jnp.ndarray, dhs: jnp.ndarray, sigh: jnp.ndarray,
                       se, rh, qa, qsat, phi, icnv
                       ) -> Tuple[jnp.ndarray, ...]:
    """-> (utenvd, vtenvd, ttenvd, qtenvd), all [kx, il, ix]
    (vertical_diffusion.f90:30-143). sigh is the 0..kx half-level array."""
    kx = se.shape[0]
    nl1 = kx - 1  # 1-based next-to-lowest level

    cshc = dhs[kx - 1] / 3600.0
    cvdi = (sigh[nl1] - sigh[1]) / ((nl1 - 1) * 3600.0)
    fshcq = cshc / TRSHC
    fshcse = cshc / (TRSHC * CP)
    fvdiq = cvdi / TRVDI
    fvdise = cvdi / (TRVDS * CP)

    rsig = 1.0 / dhs                      # [kx]
    # rsig1(k) = 1/(1 - sigh(k)), k = 1..kx-1 (vertical_diffusion.f90:69);
    # sigh(k) 1-based equals hsg[k] 0-based -> index k-1 holds 1/(1-hsg[k]).
    rsig1 = 1.0 / (1.0 - sigh[1:kx])      # [kx-1]

    ttenvd = jnp.zeros_like(se)
    qtenvd = jnp.zeros_like(se)

    # --- 2. shallow convection (lowest two layers) ---
    drh0 = RHGRAD * (fsg[kx - 1] - fsg[nl1 - 1])
    fvdiq2 = fvdiq * sigh[nl1]
    dmse = se[kx - 1] - se[nl1 - 1] + ALHC * (qa[kx - 1] - qsat[nl1 - 1])
    drh = rh[kx - 1] - rh[nl1 - 1]
    fcnv = jnp.where(icnv > 0, REDSHC, 1.0)

    unstable = dmse >= 0.0
    fluxse = jnp.where(unstable, fcnv * fshcse * dmse, 0.0)
    ttenvd = rowops.row_add(ttenvd, nl1 - 1, fluxse * rsig[nl1 - 1])
    ttenvd = rowops.row_add(ttenvd, kx - 1, -fluxse * rsig[kx - 1])

    fluxq_sc = jnp.where(unstable & (drh >= 0.0),
                         fcnv * fshcq * qsat[kx - 1] * drh, 0.0)
    fluxq_st = jnp.where((~unstable) & (drh > drh0),
                         fvdiq2 * qsat[nl1 - 1] * drh, 0.0)
    fluxq = fluxq_sc + fluxq_st
    qtenvd = rowops.row_add(qtenvd, nl1 - 1, fluxq * rsig[nl1 - 1])
    qtenvd = rowops.row_add(qtenvd, kx - 1, -fluxq * rsig[kx - 1])

    # --- 3. moisture diffusion above the PBL (1-based k = 3..kx-2 where
    # sigh(k) > 0.5) ---
    for k in range(3, kx - 1):  # 1-based
        if float(sigh[k]) <= 0.5:
            continue
        k0 = k - 1
        drh0_k = RHGRAD * (fsg[k0 + 1] - fsg[k0])
        fvdiq2_k = fvdiq * sigh[k]
        drh_k = rh[k0 + 1] - rh[k0]
        fq = jnp.where(drh_k >= drh0_k, fvdiq2_k * qsat[k0] * drh_k, 0.0)
        qtenvd = rowops.row_add(qtenvd, k0, fq * rsig[k0])
        qtenvd = rowops.row_add(qtenvd, k0 + 1, -fq * rsig[k0 + 1])

    # --- 4. super-adiabatic lapse-rate damping (1-based k = 1..kx-1):
    # energy taken from all layers below k (suffix compensation) ---
    for k in range(1, kx):  # 1-based
        k0 = k - 1
        se0 = se[k0 + 1] + SEGRAD * (phi[k0] - phi[k0 + 1])
        fse = jnp.where(se[k0] < se0, fvdise * (se0 - se[k0]), 0.0)
        ttenvd = rowops.row_add(ttenvd, k0, fse * rsig[k0])
        ttenvd = rowops.tail_add(ttenvd, k0 + 1, -(fse * rsig1[k0])[None])

    utenvd = jnp.zeros_like(se)
    vtenvd = jnp.zeros_like(se)
    return utenvd, vtenvd, ttenvd, qtenvd
