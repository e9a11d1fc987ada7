"""Shortwave radiation, cloud diagnosis, and solar forcing.

Reference: source/shortwave_radiation.f90. The sequential downward/upward
band sweeps stay as short static level loops (kx=8), vectorized over the
grid; `get_shortwave_rad_fluxes` also initializes the 4-band longwave
transmissivities and the stratospheric correction, exactly as the reference
does (shortwave_radiation.f90:190-233) — the returned RadiationState is
carried across SW-skip steps.

Level-index conventions are 1-based where they mirror the reference
(icltop, iptop), with kx+1 = "no cloud".
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np
import jax.numpy as jnp

from . import rowops

SOLC = 342.0
RHCL1, RHCL2 = 0.30, 1.00
QACL = 0.20
WPCL = 0.2
PMAXCL = 10.0
CLSMAX = 0.60
CLSMINL = 0.15
GSE_S0, GSE_S1 = 0.25, 0.40
ALBCL, ALBCLS = 0.43, 0.50
EPSSW = 0.020

ABSDRY = 0.033
ABSAER = 0.033
ABSWV1 = 0.022
ABSWV2 = 15.000
ABSCL1 = 0.015
ABSCL2 = 0.15

ABLWIN = 0.3
ABLCO2 = 6.0
ABLWV1 = 0.7
ABLWV2 = 50.0
ABLCL1 = 12.0
ABLCL2 = 0.6

EPSLW = 0.05   # mod_radcon.f90:26
EMISFC = 0.98  # mod_radcon.f90:27


class RadiationState(NamedTuple):
    """Radiation fields persisting between steps (mod_radcon.f90:47 work
    arrays + the de-facto persistent SW heating on skip steps)."""
    tau2: jnp.ndarray    # [4, kx, il, ix] layer transmissivities (LW after SW step)
    stratc: jnp.ndarray  # [2, il, ix] stratospheric correction
    tt_rsw: jnp.ndarray  # [kx, il, ix] SW heating (scaled), reused on skip steps
    ssrd: jnp.ndarray    # [il, ix] downward SW at surface (persisted, auxiliaries)
    ssr: jnp.ndarray     # [il, ix] net downward SW at surface
    tsr: jnp.ndarray     # [il, ix] net downward SW at TOA


def init_radiation_state(cfg) -> RadiationState:
    t = cfg.rdtype
    kx, il, ix = cfg.kx, cfg.il, cfg.ix
    return RadiationState(
        tau2=jnp.ones((4, kx, il, ix), t),
        stratc=jnp.zeros((2, il, ix), t),
        tt_rsw=jnp.zeros((kx, il, ix), t),
        ssrd=jnp.zeros((il, ix), t),
        ssr=jnp.zeros((il, ix), t),
        tsr=jnp.zeros((il, ix), t),
    )


def solar(sia: np.ndarray, coa: np.ndarray, tyear: float, csol: float
          ) -> np.ndarray:
    """Daily-average TOA insolation per latitude (Hartmann 1994;
    shortwave_radiation.f90:287-329). Host-side (daily cadence)."""
    pigr = 2.0 * np.arcsin(1.0)
    alpha = 2.0 * pigr * tyear
    ca1, sa1 = np.cos(alpha), np.sin(alpha)
    ca2, sa2 = ca1 * ca1 - sa1 * sa1, 2.0 * sa1 * ca1
    ca3, sa3 = ca1 * ca2 - sa1 * sa2, sa1 * ca2 + sa2 * ca1
    decl = (0.006918 - 0.399912 * ca1 + 0.070257 * sa1 - 0.006758 * ca2
            + 0.000907 * sa2 - 0.002697 * ca3 + 0.001480 * sa3)
    fdis = (1.000110 + 0.034221 * ca1 + 0.001280 * sa1 + 0.000719 * ca2
            + 0.000077 * sa2)
    cdecl, sdecl = np.cos(decl), np.sin(decl)
    tdecl = sdecl / cdecl
    csolp = csol / pigr
    ch0 = np.clip(-tdecl * sia / coa, -1.0, 1.0)
    h0 = np.arccos(ch0)
    return csolp * fdis * (h0 * sia * sdecl + np.sin(h0) * coa * cdecl)


def zonal_average_fields(sia: np.ndarray, coa: np.ndarray, tyear: float
                         ) -> dict:
    """Daily zonally-averaged solar forcing fields
    (shortwave_radiation.f90:238-284). Host-side numpy; returns [il] arrays
    to be broadcast over longitude."""
    alpha = 4.0 * np.arcsin(1.0) * (tyear + 10.0 / 365.0)
    coz1 = np.maximum(0.0, np.cos(alpha))
    coz2 = 1.8
    azen, nzen = 1.0, 2
    rzen = -np.cos(alpha) * 23.45 * np.arcsin(1.0) / 90.0
    fs0 = 6.0

    topsr = solar(sia, coa, tyear, 4.0 * SOLC)
    flat2 = 1.5 * sia**2 - 0.5
    fsol = topsr
    ozupp = 0.5 * EPSSW * np.ones_like(sia)
    ozone = 0.4 * EPSSW * (1.0 + coz1 * sia + coz2 * flat2)
    zenit = 1.0 + azen * (1.0 - (coa * np.cos(rzen) + sia * np.sin(rzen)))**nzen
    ozupp = fsol * ozupp * zenit
    ozone = fsol * ozone * zenit
    stratz = np.maximum(fs0 - fsol, 0.0)
    return dict(fsol=fsol, ozupp=ozupp, ozone=ozone, zenit=zenit,
                stratz=stratz)


def clouds(qa, rh, precnv, precls, iptop, gse, fmask_l
           ) -> Tuple[jnp.ndarray, ...]:
    """-> (icltop [il,ix] 1-based, cloudc, clstr, qcloud)
    (shortwave_radiation.f90:332-410)."""
    kx = qa.shape[0]
    nl1 = kx - 1  # 1-based
    rrcl = 1.0 / (RHCL2 - RHCL1)

    cloudc = jnp.where(rh[nl1 - 1] > RHCL1, rh[nl1 - 1] - RHCL1, 0.0)
    icltop = jnp.where(rh[nl1 - 1] > RHCL1, float(nl1), float(kx + 1))

    for k in range(3, kx - 1):  # 1-based k = 3..kx-2
        k0 = k - 1
        drh = rh[k0] - RHCL1
        take = (drh > cloudc) & (qa[k0] > QACL)
        cloudc = jnp.where(take, drh, cloudc)
        icltop = jnp.where(take, float(k), icltop)

    pr1 = jnp.minimum(PMAXCL, 86.4 * (precnv + precls))
    cloudc = jnp.minimum(
        1.0, WPCL * jnp.sqrt(pr1) + jnp.minimum(1.0, cloudc * rrcl)**2)
    icltop = jnp.minimum(iptop.astype(cloudc.dtype), icltop)

    qcloud = qa[nl1 - 1]

    clfact = 1.2
    rgse = 1.0 / (GSE_S1 - GSE_S0)
    fstab = jnp.clip(rgse * (gse - GSE_S0), 0.0, 1.0)
    clstr = fstab * jnp.maximum(CLSMAX - clfact * cloudc, 0.0)
    clstrl = jnp.maximum(clstr, CLSMINL) * rh[kx - 1]
    clstr = clstr + fmask_l * (clstrl - clstr)
    return icltop.astype(jnp.int32), cloudc, clstr, qcloud


def shortwave_rad_fluxes(fsg: np.ndarray, dhs: np.ndarray,
                         fsol, ozupp, ozone, zenit, stratz, albsfc,
                         psa, qa, icltop, cloudc, clstr, qcloud,
                         ablco2=ABLCO2) -> Tuple[jnp.ndarray, ...]:
    """-> (ssrd, ssr, tsr, dfabs, tau2, stratc)
    (shortwave_radiation.f90:74-234). fsol..stratz are [il,ix] (or [il,1])
    daily forcing fields; tau2 is returned holding the LONGWAVE
    transmissivities for the following LW computations."""
    kx = qa.shape[0]
    nl1 = kx - 1
    fband2 = 0.05
    fband1 = 1.0 - fband2
    k1b = np.arange(1, kx + 1)[:, None, None]  # 1-based levels (np: Pallas-safe constant)

    # --- SW transmissivity (bands 1-2) and cloud reflection (band 3) ---
    psaz = psa * zenit
    acloud = cloudc * jnp.minimum(ABSCL1 * qcloud, ABSCL2)

    abs1 = ABSDRY + ABSAER * fsg**2  # [kx]
    in_cloud = k1b >= icltop[None]
    tau_1 = jnp.exp(-psaz[None] * dhs[:, None, None]
                    * (abs1[:, None, None] + ABSWV1 * qa
                       + jnp.where(in_cloud, acloud[None], 0.0)))
    # k=1: dry only; k=kx: no cloud term
    tau_1 = rowops.row_set(tau_1, 0, jnp.exp(-psaz * dhs[0] * ABSDRY))
    tau_1 = rowops.row_set(tau_1, kx - 1,
        jnp.exp(-psaz * dhs[kx - 1] * (abs1[kx - 1] + ABSWV1 * qa[kx - 1])))
    tau_2 = jnp.exp(-psaz[None] * dhs[:, None, None] * ABSWV2 * qa)

    # cloud reflection entries (tau2 band 3)
    refl = jnp.where(k1b == icltop[None], ALBCL * cloudc[None], 0.0)
    refl = rowops.row_add(refl, kx - 1, ALBCLS * clstr)
    # (if icltop == kx the reference overwrites with the stratiform term;
    # match by recomputing that entry)
    refl = rowops.row_set(refl, kx - 1, jnp.where(
        icltop == kx, ALBCL * cloudc * 0.0 + ALBCLS * clstr,
        refl[kx - 1]))

    # --- downward pass ---
    dfabs = [None] * kx
    tsr = fsol
    flux1 = fsol * fband1
    flux2 = fsol * fband2

    d = flux1
    flux1 = tau_1[0] * (flux1 - ozupp * psa)
    dfabs[0] = d - flux1
    d = flux1
    flux1 = tau_1[1] * (flux1 - ozone * psa)
    dfabs[1] = d - flux1

    refl_flux = [jnp.zeros_like(psa), jnp.zeros_like(psa)]
    for k in range(3, kx + 1):  # 1-based
        k0 = k - 1
        rk = flux1 * refl[k0]
        refl_flux.append(rk)
        flux1 = flux1 - rk
        d = flux1
        flux1 = tau_1[k0] * flux1
        dfabs[k0] = d - flux1

    for k in range(2, kx + 1):
        k0 = k - 1
        dfabs[k0] = dfabs[k0] + flux2
        flux2 = tau_2[k0] * flux2
        dfabs[k0] = dfabs[k0] - flux2

    # --- surface and upward pass ---
    ssrd = flux1 + flux2
    flux1 = flux1 * albsfc
    ssr = ssrd - flux1

    for k in range(kx, 0, -1):
        k0 = k - 1
        dfabs[k0] = dfabs[k0] + flux1
        flux1 = tau_1[k0] * flux1
        dfabs[k0] = dfabs[k0] - flux1
        flux1 = flux1 + refl_flux[k0]

    tsr = tsr - flux1
    dfabs = jnp.stack(dfabs, axis=0)

    # --- LW transmissivity initialization (shortwave_radiation.f90:190-228)
    dp = psa[None] * dhs[:, None, None]
    lw1 = jnp.exp(-dp * ABLWIN)
    lw2 = jnp.exp(-dp * ablco2)
    lw3 = jnp.exp(-dp * ABLWV1 * qa)
    lw4 = jnp.exp(-dp * ABLWV2 * qa)
    # stratosphere (k=1): no water vapour bands
    lw3 = rowops.row_set(lw3, 0, 1.0)
    lw4 = rowops.row_set(lw4, 0, 1.0)
    # cloudy free troposphere (1-based k = 3..kx-1)
    aclw = cloudc * ABLCL2
    above = k1b < icltop[None]
    acl1 = jnp.where(above, aclw[None], ABLCL1 * cloudc[None])
    mid = (k1b >= 3) & (k1b <= nl1)
    lw1 = jnp.where(mid, jnp.exp(-dp * (ABLWIN + acl1)), lw1)
    lw3 = jnp.where(mid, jnp.exp(-dp * jnp.maximum(ABLWV1 * qa, aclw[None])), lw3)
    lw4 = jnp.where(mid, jnp.exp(-dp * jnp.maximum(ABLWV2 * qa, aclw[None])), lw4)
    tau2 = jnp.stack([lw1, lw2, lw3, lw4], axis=0)

    eps1 = EPSLW / (dhs[0] + dhs[1])
    stratc = jnp.stack([stratz * psa, eps1 * psa], axis=0)

    return ssrd, ssr, tsr, dfabs, tau2, stratc
