"""Surface fluxes of momentum, energy and moisture + land skin temperature.

Reference: source/surface_fluxes.f90. The land/sea/blend triple arrays
become a SurfaceFluxes struct with explicit land/sea/weighted fields; the
reference's `save` variables (t1, q1, denvvs — surface_fluxes.f90:76-78)
that carry land-pass values into the anomaly-coupling sea-only second call
become an explicit SavedSurface struct.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np
import jax.numpy as jnp

from ...constants import ALHC, CP, GRAV, P0, RGAS, SBC
from .shortwave import EMISFC
from .humidity import get_qsat

FWIND0 = 0.95
FTEMP0 = 1.0
FHUM0 = 0.0
CDL = 2.4e-3
CDS = 1.0e-3
CHL = 1.2e-3
CHS = 0.9e-3
VGUST = 5.0
CTDAY = 1.0e-2
DTHETA = 3.0
FSTAB = 0.67
HDRAG = 2000.0
CLAMBDA = 7.0
CLAMBSN = 7.0


class SurfaceFluxes(NamedTuple):
    """Flux outputs; index semantics follow auxiliaries.f90:15-33:
    _l = land, _s = sea, _w = land/sea weighted blend."""
    ustr: jnp.ndarray   # [3, il, ix]
    vstr: jnp.ndarray   # [3, il, ix]
    shf: jnp.ndarray    # [3, il, ix]
    evap: jnp.ndarray   # [3, il, ix]
    slru: jnp.ndarray   # [3, il, ix]
    hfluxn: jnp.ndarray  # [2, il, ix] net downward heat flux (land, sea)
    tsfc: jnp.ndarray
    tskin: jnp.ndarray
    u0: jnp.ndarray
    v0: jnp.ndarray
    t0: jnp.ndarray


class SavedSurface(NamedTuple):
    """The reference's `save` locals for the sea-only second pass."""
    t1_sea: jnp.ndarray
    q1_sea: jnp.ndarray
    denvvs_sea: jnp.ndarray


def orographic_drag_factor(phi0: np.ndarray) -> np.ndarray:
    """forog (surface_fluxes.f90:300-309), host-side setup."""
    rhdrag = 1.0 / (GRAV * HDRAG)
    return 1.0 + rhdrag * (1.0 - np.exp(-np.maximum(phi0, 0.0) * rhdrag))


def surface_fluxes(wvi2_kx: float, sigl_kx: float, forog, coa,
                   stl_am, soilw_am, alb_l, alb_s, snowc,
                   psa, ua, va, ta, qa, rh, phi, phi0, fmask_l, tsea,
                   ssrd, slrd) -> Tuple[SurfaceFluxes, SavedSurface]:
    """Full land+sea pass (lfluxland=.true.; surface_fluxes.f90:42-296).

    ua..phi are [kx, il, ix]; all others [il, ix] (coa is [il], broadcast).
    """
    kx = ta.shape[0]
    nl1 = kx - 1
    esbc = EMISFC * SBC
    coa2 = coa[:, None]

    # --- 1. near-surface extrapolation ---
    u0 = FWIND0 * ua[kx - 1]
    v0 = FWIND0 * va[kx - 1]

    dt1 = wvi2_kx * (ta[kx - 1] - ta[nl1 - 1])
    t1_l = ta[kx - 1] + dt1
    t1_s = t1_l - phi0 * dt1 / (RGAS * 288.0 * sigl_kx)
    t2_s = ta[kx - 1] + phi[kx - 1] / CP
    t2_l = t2_s - phi0 / CP

    lapse_neg = ta[kx - 1] > ta[nl1 - 1]
    gtemp0 = 1.0 - FTEMP0
    t1_l = jnp.where(lapse_neg, FTEMP0 * t1_l + gtemp0 * t2_l, ta[kx - 1])
    t1_s = jnp.where(lapse_neg, FTEMP0 * t1_s + gtemp0 * t2_s, ta[kx - 1])
    t0 = t1_s + fmask_l * (t1_l - t1_s)

    denvvs0 = (P0 * psa / (RGAS * t0)) * jnp.sqrt(u0**2 + v0**2 + VGUST**2)

    # --- 2. land fluxes with prescribed skin temperature ---
    tskin = stl_am + CTDAY * jnp.sqrt(coa2) * ssrd * (1.0 - alb_l) * psa

    rdth = FSTAB / DTHETA
    astab = 0.5  # lscasym
    dthl = jnp.where(tskin > t2_l,
                     jnp.minimum(DTHETA, tskin - t2_l),
                     jnp.maximum(-DTHETA, astab * (tskin - t2_l)))
    denvvs1 = denvvs0 * (1.0 + dthl * rdth)

    cdldv = CDL * denvvs0 * forog
    ustr_l = -cdldv * ua[kx - 1]
    vstr_l = -cdldv * va[kx - 1]

    chlcp = CHL * CP
    shf_l = chlcp * denvvs1 * (tskin - t1_l)

    q1_l = qa[kx - 1]  # fhum0 = 0 path (surface_fluxes.f90:181-187)
    qsat_skin = get_qsat(tskin, psa, 1.0)
    evap_l = CHL * denvvs1 * jnp.maximum(0.0, soilw_am * qsat_skin - q1_l)

    # --- 3. land energy balance: implicit skin-temperature update ---
    tsk3 = tskin**3
    dslr = 4.0 * esbc * tsk3
    slru_l = esbc * tsk3 * tskin
    hfluxn_l = ssrd * (1.0 - alb_l) + slrd - (slru_l + shf_l + ALHC * evap_l)

    clamb = CLAMBDA + snowc * (CLAMBSN - CLAMBDA)
    hfluxn_l = hfluxn_l - clamb * (tskin - stl_am)
    qsat_skin1 = get_qsat(tskin + 1.0, psa, 1.0)
    dqsat = jnp.where(evap_l > 0.0, soilw_am * (qsat_skin1 - qsat_skin), 0.0)
    dtskin = hfluxn_l / (clamb + dslr + CHL * denvvs1 * (CP + ALHC * dqsat))
    tskin = tskin + dtskin
    shf_l = shf_l + chlcp * denvvs1 * dtskin
    evap_l = evap_l + CHL * denvvs1 * dqsat * dtskin
    slru_l = slru_l + dslr * dtskin
    hfluxn_l = clamb * (tskin - stl_am)

    # --- 4. sea fluxes ---
    dths = jnp.where(tsea > t2_s,
                     jnp.minimum(DTHETA, tsea - t2_s),
                     jnp.maximum(-DTHETA, astab * (tsea - t2_s)))
    denvvs2 = denvvs0 * (1.0 + dths * rdth)
    q1_s = qa[kx - 1]

    cdsdv = CDS * denvvs2
    ustr_s = -cdsdv * ua[kx - 1]
    vstr_s = -cdsdv * va[kx - 1]

    saved = SavedSurface(t1_sea=t1_s, q1_sea=q1_s, denvvs_sea=denvvs2)
    shf_s, evap_s, slru_s, hfluxn_s = sea_fluxes(saved, psa, alb_s, tsea,
                                                 ssrd, slrd)

    # --- 5. land/sea blend (surface_fluxes.f90:285-295) ---
    def blend(a_s, a_l):
        return a_s + fmask_l * (a_l - a_s)

    fl = SurfaceFluxes(
        ustr=jnp.stack([ustr_l, ustr_s, blend(ustr_s, ustr_l)], axis=0),
        vstr=jnp.stack([vstr_l, vstr_s, blend(vstr_s, vstr_l)], axis=0),
        shf=jnp.stack([shf_l, shf_s, blend(shf_s, shf_l)], axis=0),
        evap=jnp.stack([evap_l, evap_s, blend(evap_s, evap_l)], axis=0),
        slru=jnp.stack([slru_l, slru_s, blend(slru_s, slru_l)], axis=0),
        hfluxn=jnp.stack([hfluxn_l, hfluxn_s], axis=0),
        tsfc=blend(tsea, stl_am),
        tskin=blend(tsea, tskin),
        u0=u0, v0=v0, t0=t0,
    )
    return fl, saved


def sea_fluxes(saved: SavedSurface, psa, alb_s, tsea, ssrd, slrd
               ) -> Tuple[jnp.ndarray, ...]:
    """Sea-only flux computation (surface_fluxes.f90:268-278), reusing the
    saved land-pass extrapolations; also the second anomaly-coupling call.

    NOTE the reference's sea heat-flux sign convention: shf and evap are
    ADDED in hfluxn (surface_fluxes.f90:278), unlike the land branch.
    """
    esbc = EMISFC * SBC
    shf_s = CHS * CP * saved.denvvs_sea * (tsea - saved.t1_sea)
    qsat_sea = get_qsat(tsea, psa, 1.0)
    evap_s = CHS * saved.denvvs_sea * (qsat_sea - saved.q1_sea)
    slru_s = esbc * tsea**4
    hfluxn_s = (ssrd * (1.0 - alb_s) + slrd - slru_s + shf_s
                + ALHC * evap_s)
    return shf_s, evap_s, slru_s, hfluxn_s
