"""Coupled surface layer: slab land, slab ocean + sea-ice, climatological
forcing, and the daily forcing update.

Reference: source/land_model.f90, source/sea_model.f90, source/coupler.f90,
source/forcing.f90. Host-side init reads the monthly climatologies; the
daily update (climatology interpolation + solar + albedo + orographic
corrections) and the per-step slab integrations are pure device functions.

Note on the reference's call pattern (SURVEY section 3.4): the slab models
are stepped EVERY time step with per-delt relaxation coefficients
(rhcap* use delt, sea_model.f90:245-246), despite "one day" comments.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from ..config import ModelConfig
from ..constants import ALHC, GAMMA, GRAV, RGAS, SBC, REFRH1
from ..ops import spectral as sp
from ..utils.io import load_boundary_file, find_boundary_file
from ..utils.calendar import forint_weights, forin5_weights
from .boundaries import Boundaries, fillsf, forchk
from .physics import DailyForcing, SurfaceState, Fluxes, PhysicsParams
from .physics.shortwave import zonal_average_fields, EMISFC
from .physics.humidity import get_qsat

SD2SC = 60.0        # snow depth for full snow cover (land_model.f90:43)
ALBSEA = 0.07       # mod_radcon.f90:22-24
ALBICE = 0.60
ALBSN = 0.60
SSTFR = 273.2 - 1.8  # freezing-point SST (sea_model.f90:285)
ABLCO2_REF = 6.0     # reference CO2 LW absorptivity (mod_radcon.f90 ablco2)
DEL_CO2 = 0.005      # CO2 absorptivity trend per year (forcing.f90:66)
IYEAR_REF = 1950     # trend reference year (forcing.f90:65)


@dataclasses.dataclass(frozen=True)
class LandSeaParams:
    """Host-side (numpy) constants for the slab models."""
    fmask_l: np.ndarray
    bmask_l: np.ndarray
    fmask_s: np.ndarray
    bmask_s: np.ndarray
    rhcapl: np.ndarray   # delt/heat-capacity (land)
    cdland: np.ndarray   # damping factor (land)
    rhcaps: np.ndarray   # delt/heat-capacity (sea)
    rhcapi: np.ndarray   # delt/heat-capacity (ice)
    cdsea: np.ndarray
    cdice: np.ndarray
    alb0: np.ndarray
    beta: float = 1.0    # heat-flux coefficient at sea/ice interface


class Climatology(NamedTuple):
    """Monthly climatologies as device arrays [12, il, ix]."""
    stl12: jnp.ndarray
    snowd12: jnp.ndarray
    soilw12: jnp.ndarray
    sst12: jnp.ndarray
    sice12: jnp.ndarray
    sstan3: jnp.ndarray  # [3, il, ix] anomaly window (zeros if unavailable)


def sea_domain(cdomain: str, deglat_s: np.ndarray, ix: int,
               dmask: np.ndarray) -> None:
    """Mark one named ocean domain in ``dmask`` (in place), [il, ix] layout.

    Loop-free rendering of the reference's per-point scans
    (sea_model.f90:446-523). Longitude of column i is i*360/ix degrees east;
    ``deglat_s`` is latitude in degrees, south -> north."""
    dlon = 360.0 / ix
    rlon = np.arange(ix) * dlon                    # [ix]
    lat = deglat_s[:, None]                        # [il, 1]
    if cdomain == "northe":
        dmask[(lat > 20.0) & np.ones(ix, bool)] = 1.0
    elif cdomain == "natlan":
        band = (lat > 20.0) & (lat < 80.0)
        dmask[band & ((rlon < 45.0) | (rlon > 260.0))] = 1.0
    elif cdomain == "npacif":
        band = (lat > 20.0) & (lat < 65.0)
        dmask[band & ((rlon > 120.0) & (rlon < 260.0))] = 1.0
    elif cdomain == "tropic":
        dmask[(lat > -30.0) & (lat < 30.0) & np.ones(ix, bool)] = 1.0
    elif cdomain == "indian":
        band = (lat > -30.0) & (lat < 30.0)
        dmask[band & ((rlon > 30.0) & (rlon < 120.0))] = 1.0
    elif cdomain == "elnino":
        arlat = np.abs(lat)
        wlat = np.where(arlat > 15.0, (0.1 * (25.0 - arlat)) ** 2, 1.0)
        rlonw = 300.0 - 2.0 * np.maximum(lat, 0.0)
        core = (rlon > 165.0) & (rlon < rlonw)
        ramp = (rlon > 155.0) & (rlon <= 165.0)
        sel = arlat < 25.0
        dmask[:] = np.where(sel & core, wlat, dmask)
        dmask[:] = np.where(sel & ramp, wlat * 0.1 * (rlon - 155.0), dmask)
    else:
        raise ValueError(f"unknown sea domain {cdomain!r}")


def build_sea_domain_mask(cfg: ModelConfig, radang: np.ndarray) -> np.ndarray:
    """Union of the enabled regional ocean domains (sea_model.f90:218-229),
    before boundary smoothing and land blanking."""
    il, ix = cfg.il, cfg.ix
    if cfg.l_globe:
        return np.ones((il, ix))
    dmask = np.zeros((il, ix))
    deglat_s = np.degrees(radang)
    for on, name in ((cfg.l_northe, "northe"), (cfg.l_natlan, "natlan"),
                     (cfg.l_npacif, "npacif"), (cfg.l_tropic, "tropic"),
                     (cfg.l_indian, "indian"), (cfg.l_elnino, "elnino")):
        if on:
            sea_domain(name, deglat_s, ix, dmask)
    return dmask


def build_land_sea(cfg: ModelConfig, bounds_fmask: np.ndarray,
                   alb0: np.ndarray, radang: np.ndarray,
                   search=None) -> Tuple[LandSeaParams, dict]:
    """land_model_init + sea_model_init (land_model.f90:47-181,
    sea_model.f90:79-251). Returns (params, monthly climatology dict)."""
    il, ix = cfg.il, cfg.ix
    tgt = (il, ix)
    thrsh = 0.1

    # --- masks ---
    fmask_l = bounds_fmask.copy()
    bmask_l = np.where(fmask_l >= thrsh, 1.0, 0.0)
    fmask_l = np.where(fmask_l >= thrsh,
                       np.where(bounds_fmask > 1.0 - thrsh, 1.0, fmask_l), 0.0)
    fmask_s = 1.0 - bounds_fmask
    bmask_s = np.where(fmask_s >= thrsh, 1.0, 0.0)
    fmask_s = np.where(fmask_s >= thrsh,
                       np.where(fmask_s > 1.0 - thrsh, 1.0, fmask_s), 0.0)

    # --- land climatologies ---
    stl12 = np.stack([fillsf(f, 0.0) for f in
                      load_boundary_file("land.nc", "stl", 12, search, tgt)])
    stl12 = forchk(bmask_l, 0.0, 400.0, 273.0, stl12, "stl")
    snowd12 = load_boundary_file("snow.nc", "snowd", 12, search, tgt)
    snowd12 = forchk(bmask_l, 0.0, 20000.0, 0.0, snowd12, "snowd")

    veg_high = load_boundary_file("surface.nc", "vegh", search=search,
                                  target_shape=tgt)
    veg_low = load_boundary_file("surface.nc", "vegl", search=search,
                                 target_shape=tgt)
    veg = np.maximum(0.0, veg_high + 0.8 * veg_low)
    swcap, swwil = 0.30, 0.17
    idep2 = 3
    swwil2 = idep2 * swwil
    rsw = 1.0 / (swcap + idep2 * (swcap - swwil))
    swl1 = load_boundary_file("soil.nc", "swl1", 12, search, tgt)
    swl2 = load_boundary_file("soil.nc", "swl2", 12, search, tgt)
    soilw12 = np.minimum(
        1.0, rsw * (swl1 + veg[None] * np.maximum(0.0, idep2 * swl2 - swwil2)))
    soilw12 = forchk(bmask_l, 0.0, 10.0, 0.0, soilw12, "soilw")

    # --- sea climatologies ---
    sst12 = np.stack([fillsf(f, 0.0) for f in
                      load_boundary_file("sea_surface_temperature.nc", "sst",
                                         12, search, tgt)])
    sst12 = forchk(bmask_s, 100.0, 400.0, 273.0, sst12, "sst")
    sice12 = np.maximum(load_boundary_file("sea_ice.nc", "icec", 12, search,
                                           tgt),
                        0.0)
    sice12 = forchk(bmask_s, 0.0, 1.0, 0.0, sice12, "sice")

    sstan3 = np.zeros((3, il, ix))

    # --- land heat capacities (land_model.f90:141-180) ---
    depth_soil, depth_lice, tdland = 1.0, 5.0, 40.0
    flandmin = 1.0 / 3.0
    hcapl = depth_soil * 2.50e6
    hcapli = depth_lice * 1.93e6
    dmask_l = np.where(fmask_l < flandmin, 0.0, 1.0)
    rhcapl = np.where(alb0 < 0.4, cfg.delt / hcapl, cfg.delt / hcapli)
    cdland = dmask_l * tdland / (1.0 + dmask_l * tdland)

    # --- sea heat capacities (sea_model.f90:101-250), global domain ---
    depth_ml, dept0_ml = 60.0, 40.0
    depth_ice, dept0_ice = 2.5, 1.5
    tdsst, tdice = 90.0, 30.0
    fseamin = 1.0 / 3.0
    coslat = np.cos(radang)  # [il]
    hcaps = 4.18e6 * (depth_ml + (dept0_ml - depth_ml) * coslat**3)
    hcapi = 1.93e6 * (depth_ice + (dept0_ice - depth_ice) * coslat**2)

    dmask_s = build_sea_domain_mask(cfg, radang)
    # smooth latitudinal domain boundaries (sea_model.f90:231-234; a no-op
    # for the all-ones global mask), then blank out land points
    dmask_s[1:-1] = 0.25 * (dmask_s[:-2] + 2.0 * dmask_s[1:-1]
                            + dmask_s[2:])
    dmask_s[fmask_s < fseamin] = 0.0
    rhcaps = np.broadcast_to((cfg.delt / hcaps)[:, None], (il, ix)).copy()
    rhcapi = np.broadcast_to((cfg.delt / hcapi)[:, None], (il, ix)).copy()
    cdsea = dmask_s * tdsst / (1.0 + dmask_s * tdsst)
    cdice = dmask_s * tdice / (1.0 + dmask_s * tdice)

    t = np.float64 if cfg.precision == "fp64" else np.float32
    cast = lambda a: np.asarray(a, dtype=t)
    params = LandSeaParams(
        fmask_l=cast(fmask_l), bmask_l=cast(bmask_l), fmask_s=cast(fmask_s),
        bmask_s=cast(bmask_s), rhcapl=cast(rhcapl), cdland=cast(cdland),
        rhcaps=cast(rhcaps), rhcapi=cast(rhcapi), cdsea=cast(cdsea),
        cdice=cast(cdice), alb0=cast(alb0))
    clim = dict(stl12=stl12, snowd12=snowd12, soilw12=soilw12, sst12=sst12,
                sice12=sice12, sstan3=sstan3)
    return params, clim


ANOMALY_FILE = "sea_surface_temperature_anomaly.nc"
ANOMALY_MONTHS = 420  # sea_model.f90:177


def _read_anomaly_month(cfg: ModelConfig, bmask_s: np.ndarray,
                        month_1b: int, search=None) -> np.ndarray:
    """One month slice of the 420-month anomaly file, range-checked
    (sea_model.f90:176-181, obs_ssta :366-384). Returns zeros when the file
    is absent (the reference ships a dangling symlink for it)."""
    try:
        find_boundary_file(ANOMALY_FILE, search)
    except FileNotFoundError:
        import warnings
        warnings.warn(f"{ANOMALY_FILE} not found; SST anomaly set to zero")
        return np.zeros_like(bmask_s)
    data = load_boundary_file(ANOMALY_FILE, "ssta", ANOMALY_MONTHS, search,
                              bmask_s.shape)
    idx = int(np.clip(month_1b - 1, 0, ANOMALY_MONTHS - 1))
    return forchk(bmask_s, -50.0, 50.0, 0.0, data[idx], "ssta")


def initial_anomaly_window(cfg: ModelConfig, bmask_s: np.ndarray,
                           isst0: int, search=None) -> np.ndarray:
    """Initial 3-month window around the start month (sea_model.f90:172-182):
    isst0 = (start_year - issty0)*12 + start_month."""
    window = np.zeros((3,) + bmask_s.shape)
    for m in range(1, 4):
        if (isst0 <= 1 and m != 2) or isst0 > 1:
            window[m - 1] = _read_anomaly_month(cfg, bmask_s,
                                                isst0 - 2 + m, search)
    return window


def advance_anomaly_window(cfg: ModelConfig, bmask_s: np.ndarray,
                           sstan3, next_month: int, search=None):
    """Month-start shift of the anomaly window (obs_ssta,
    sea_model.f90:366-384). sstan3 is the device [3, il, ix] array."""
    new = _read_anomaly_month(cfg, bmask_s, next_month, search)
    sstan3 = jnp.concatenate(
        [sstan3[1:], jnp.asarray(new, sstan3.dtype)[None]], axis=0)
    return sstan3


def climatology_to_device(cfg: ModelConfig, clim: dict) -> Climatology:
    t = cfg.rdtype
    return Climatology(**{k: jnp.asarray(v, t) for k, v in clim.items()})


def _interp(w: jnp.ndarray, clim: jnp.ndarray) -> jnp.ndarray:
    """Monthly interpolation as a weighted sum over the month axis."""
    return jnp.einsum("m,mji->ji", w, clim)


class DateScalars(NamedTuple):
    """Small date-derived inputs for the daily device update."""
    w5: jnp.ndarray      # [12] forin5 weights for imont1
    w2: jnp.ndarray      # [12] forint weights for imont1
    w2a: jnp.ndarray     # [3] forint weights for the anomaly window (imon=2)
    fsol: jnp.ndarray    # [il, 1] solar fields (host-computed trig of tyear)
    ozupp: jnp.ndarray
    ozone: jnp.ndarray
    zenit: jnp.ndarray
    stratz: jnp.ndarray
    ablco2: jnp.ndarray  # [] CO2 LW absorptivity (trend: forcing.f90:64-71)
    # next-day interpolation weights: the reference couples AFTER newdate
    # (speedy.f90:47-53), so the coupling following the day's LAST step uses
    # the next day's climatology interpolation.
    w5n: jnp.ndarray     # [12]
    w2n: jnp.ndarray     # [12]
    w2an: jnp.ndarray    # [3]


def make_date_scalars(cfg: ModelConfig, geom_np: dict, imont1: int,
                      tmonth: float, tyear: float,
                      year: int = 0,
                      imont1_next: Optional[int] = None,
                      tmonth_next: Optional[float] = None) -> DateScalars:
    """Host-side numpy leaves: device transfer happens once at the jit call
    boundary (eager per-field device puts cost ~4 ms/day, as much as the
    whole day of device compute).

    ``imont1_next``/``tmonth_next`` are the season vars of the NEXT calendar
    day (cal.season_vars(cal.next_day(date))), used for the day's final
    coupling step; when omitted they default to the current day's values
    (acceptable for benchmarks, required for Fortran-cadence parity runs).
    """
    t = np.float64 if cfg.precision == "fp64" else np.float32
    zon = zonal_average_fields(geom_np["sia"], geom_np["coa"], tyear)
    col = lambda a: np.asarray(a, t)[:, None]
    ablco2 = ABLCO2_REF
    if cfg.increase_co2:
        # linear trend of CO2 absorptivity (forcing.f90:64-71)
        ablco2 = ABLCO2_REF * np.exp(DEL_CO2 * (year + tyear - IYEAR_REF))
    if imont1_next is None:
        imont1_next, tmonth_next = imont1, tmonth
    return DateScalars(
        w5=np.asarray(forin5_weights(imont1, tmonth), t),
        w2=np.asarray(forint_weights(imont1, tmonth), t),
        w2a=np.asarray(forint_weights(2, tmonth, n=3), t),
        fsol=col(zon["fsol"]), ozupp=col(zon["ozupp"]),
        ozone=col(zon["ozone"]), zenit=col(zon["zenit"]),
        stratz=col(zon["stratz"]),
        ablco2=np.asarray(ablco2, t),
        w5n=np.asarray(forin5_weights(imont1_next, tmonth_next), t),
        w2n=np.asarray(forint_weights(imont1_next, tmonth_next), t),
        w2an=np.asarray(forint_weights(2, tmonth_next, n=3), t),
    )


def _interp_sea_clim(cfg: ModelConfig, clim: Climatology, w5, w2, w2a):
    """Climatology interpolation + sea-ice freezing-point adjustment
    (couple_sea_atm, sea_model.f90:277-305) for one set of date weights."""
    sstcl = _interp(w5, clim.sst12)
    sicecl = _interp(w2, clim.sice12)
    sstan = jnp.einsum("m,mji->ji", w2a, clim.sstan3) \
        if cfg.sst_anomaly_forcing else jnp.zeros_like(sstcl)

    warm = sstcl > SSTFR
    sicecl_w = jnp.minimum(0.5, sicecl)
    sstcl_w = jnp.where(sicecl_w > 0.0,
                        SSTFR + (sstcl - SSTFR) / (1.0 - sicecl_w), sstcl)
    sicecl_c = jnp.maximum(0.5, sicecl)
    ticecl_c = SSTFR + (sstcl - SSTFR) / sicecl_c
    sicecl = jnp.where(warm, sicecl_w, sicecl_c)
    ticecl = jnp.where(warm, SSTFR, ticecl_c)
    sstcl = jnp.where(warm, sstcl_w, SSTFR)
    return sstcl, sicecl, ticecl, sstan


def daily_update(cfg: ModelConfig, pp: PhysicsParams, lsp: LandSeaParams,
                 sc: sp.SpectralConsts, clim: Climatology, ds: DateScalars,
                 surf: SurfaceState) -> DailyForcing:
    """Device-side daily forcing update: climatology interpolation
    (couple_*_atm), sea-ice adjustment (sea_model.f90:283-305), albedo and
    orographic diffusion corrections (forcing.f90:49-99)."""
    stlcl = _interp(ds.w5, clim.stl12)
    snowdcl = _interp(ds.w2, clim.snowd12)
    soilwcl = _interp(ds.w2, clim.soilw12)
    sstcl, sicecl, ticecl, sstan = _interp_sea_clim(cfg, clim, ds.w5,
                                                    ds.w2, ds.w2a)
    # next-day interpolation for the day's final coupling (the reference
    # couples after newdate, speedy.f90:47-53)
    stlcl_nx = _interp(ds.w5n, clim.stl12)
    sstcl_nx, sicecl_nx, ticecl_nx, sstan_nx = _interp_sea_clim(
        cfg, clim, ds.w5n, ds.w2n, ds.w2an)

    # surface albedo (forcing.f90:55-62)
    fmask_l = jnp.asarray(lsp.fmask_l)
    snowc = jnp.minimum(1.0, snowdcl / SD2SC)
    alb0 = jnp.asarray(lsp.alb0)
    alb_l = alb0 + snowc * (ALBSN - alb0)
    # albedo uses the *previous* day's sea-ice state as the reference does
    # (sice_am from the last coupling step)
    alb_s = ALBSEA + surf.sice_am * (ALBICE - ALBSEA)
    albsfc = alb_s + fmask_l * (alb_l - alb_s)

    # orographic-correction spectral fields (forcing.f90:73-99)
    gamlat = GAMMA / (1000.0 * GRAV)
    phis0 = jnp.asarray(pp.phis0)
    corh = gamlat * phis0
    tcorh = sp.grid_to_spec(sc, corh)

    pexp = 1.0 / (RGAS * gamlat)
    tsfc = fmask_l * surf.stl_am + jnp.asarray(lsp.fmask_s) * surf.sst_am
    tref = tsfc + corh
    psfc = (tsfc / tref) ** pexp
    qref = get_qsat(tref, jnp.ones_like(psfc), -1.0)
    qsfc = get_qsat(tsfc, psfc, 1.0)
    qcorh = sp.grid_to_spec(sc, REFRH1 * (qref - qsfc))

    return DailyForcing(
        fsol=ds.fsol, ozupp=ds.ozupp, ozone=ds.ozone, zenit=ds.zenit,
        stratz=ds.stratz, ablco2=ds.ablco2,
        alb_l=alb_l, alb_s=alb_s, albsfc=albsfc,
        snowc=snowc, tcorh=tcorh, qcorh=qcorh,
        stlcl_ob=stlcl, snowd_am=snowdcl, soilw_am=soilwcl,
        sstcl_ob=sstcl, sicecl_ob=sicecl, ticecl_ob=ticecl, sstan_ob=sstan,
        stlcl_nx=stlcl_nx, sstcl_nx=sstcl_nx, sicecl_nx=sicecl_nx,
        ticecl_nx=ticecl_nx, sstan_nx=sstan_nx)


def select_couple_daily(daily: DailyForcing, use_next) -> DailyForcing:
    """The DailyForcing view used by couple_step: when ``use_next`` (a traced
    bool scalar) is set, the five climatology-interpolation fields switch to
    the next day's values — reproducing the reference's couple-after-newdate
    cadence at the day's last step (speedy.f90:47-53)."""
    sel = lambda nx, cur: jnp.where(use_next, nx, cur)
    return daily._replace(
        stlcl_ob=sel(daily.stlcl_nx, daily.stlcl_ob),
        sstcl_ob=sel(daily.sstcl_nx, daily.sstcl_ob),
        sicecl_ob=sel(daily.sicecl_nx, daily.sicecl_ob),
        ticecl_ob=sel(daily.ticecl_nx, daily.ticecl_ob),
        sstan_ob=sel(daily.sstan_nx, daily.sstan_ob))


def init_surface_state(cfg: ModelConfig, pp: PhysicsParams,
                       lsp: LandSeaParams, sc: sp.SpectralConsts,
                       clim: Climatology, ds: DateScalars) -> SurfaceState:
    """Day-0 initialization (couple_land_atm(0)/couple_sea_atm(0):
    land_model.f90:201-205, sea_model.f90:307-318)."""
    zero = jnp.zeros((cfg.il, cfg.ix), cfg.rdtype)
    surf0 = SurfaceState(stl_lm=zero, stl_am=zero, sst_om=zero,
                         tice_om=zero, sice_om=zero, sst_am=zero,
                         sice_am=zero, tice_am=zero, ssti_om=zero)
    daily = daily_update(cfg, pp, lsp, sc, clim, ds, surf0)
    sst_om = daily.sstcl_ob if cfg.sea_coupling_flag > 0 else zero
    surf = SurfaceState(
        stl_lm=daily.stlcl_ob, stl_am=daily.stlcl_ob,
        sst_om=sst_om, tice_om=daily.ticecl_ob, sice_om=daily.sicecl_ob,
        sst_am=zero, sice_am=zero, tice_am=zero, ssti_om=zero)
    return _update_am_fields(cfg, daily, surf)


def _update_am_fields(cfg: ModelConfig, daily: DailyForcing,
                      surf: SurfaceState) -> SurfaceState:
    """Sea-surface fields seen by the atmosphere (sea_model.f90:327-362)."""
    sstan_am = daily.sstan_ob if cfg.sst_anomaly_forcing \
        else jnp.zeros_like(daily.sstan_ob)
    if cfg.sea_coupling_flag <= 1:
        sst_am = daily.sstcl_ob + sstan_am
    else:  # flag 2 (>=3 gated at build)
        sst_am = surf.sst_om
    if cfg.ice_coupling_flag > 0:
        sice_am, tice_am = surf.sice_om, surf.tice_om
    else:
        sice_am, tice_am = daily.sicecl_ob, daily.ticecl_ob
    sst_am = sst_am + sice_am * (tice_am - sst_am)
    ssti_om = surf.sst_om + sice_am * (tice_am - surf.sst_om)
    return surf._replace(sst_am=sst_am, sice_am=sice_am, tice_am=tice_am,
                         ssti_om=ssti_om)


def couple_step(cfg: ModelConfig, lsp: LandSeaParams, daily: DailyForcing,
                surf: SurfaceState, fluxes: Fluxes) -> SurfaceState:
    """Per-step slab land + sea/ice integration (couple_sea_land,
    coupler.f90:30-38; run_land_model land_model.f90:224-239;
    run_sea_model sea_model.f90:387-444)."""
    # --- land ---
    if cfg.land_coupling_flag == 1:
        tanom = surf.stl_lm - daily.stlcl_ob
        tanom = jnp.asarray(lsp.cdland) * (
            tanom + jnp.asarray(lsp.rhcapl) * fluxes.sfc.hfluxn[0])
        stl_lm = tanom + daily.stlcl_ob
        stl_am = stl_lm
    else:
        stl_lm = surf.stl_lm
        stl_am = daily.stlcl_ob

    # --- sea + ice ---
    if cfg.sea_coupling_flag > 0 or cfg.ice_coupling_flag > 0:
        difice = ((ALBSEA - ALBICE) * fluxes.ssrd
                  + EMISFC * SBC * (SSTFR**4 - surf.tice_am**4)
                  + fluxes.sfc.shf[1] + fluxes.sfc.evap[1] * ALHC)
        hflux_i = fluxes.sfc.hfluxn[1] + difice * (1.0 - surf.sice_am)
        hflux = fluxes.sfc.hfluxn[1] \
            - daily.sicecl_ob * (hflux_i + lsp.beta * (SSTFR - surf.tice_om))
        tanom = surf.sst_om - daily.sstcl_ob
        tanom = jnp.asarray(lsp.cdsea) * (
            tanom + jnp.asarray(lsp.rhcaps) * hflux)
        sst_om = tanom + daily.sstcl_ob

        hflux_ice = hflux_i + lsp.beta * (SSTFR - surf.tice_om)
        tanom_i = surf.tice_om - daily.ticecl_ob
        anom0 = 20.0
        cdis = jnp.asarray(lsp.cdice) * (anom0 / (anom0 + jnp.abs(tanom_i)))
        tanom_i = cdis * (tanom_i + jnp.asarray(lsp.rhcapi) * hflux_ice)
        tice_om = tanom_i + daily.ticecl_ob
        sice_om = daily.sicecl_ob
    else:
        sst_om, tice_om, sice_om = surf.sst_om, surf.tice_om, surf.sice_om

    surf = surf._replace(stl_lm=stl_lm, stl_am=stl_am, sst_om=sst_om,
                         tice_om=tice_om, sice_om=sice_om)
    return _update_am_fields(cfg, daily, surf)
