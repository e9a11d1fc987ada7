"""Loop-literal NumPy transliteration of the reference surface layer:
date.f90, interpolation.f90, boundaries.f90, land_model.f90, sea_model.f90,
coupler.f90, forcing.f90.

TEST-ONLY ORACLE — see transforms.py header. (ix, il) layout. Boundary
files are read through the repo's verified loader (utils/io.py reproduces
input_output.f90:23-92 read semantics) and transposed to Fortran order.
"""
from __future__ import annotations

import numpy as np

from .transforms import GAMMA, GRAV, RGAS, REFRH1, Geometry, Spectral
from .physics import (ALBICE, ALBSEA, ALBSN, EMISFC, Radiation, get_qsat,
                      set_orog_land_sfc_drag)
from .transforms import ALHC, SBC


# ---------------------------------------------------------------------------
# date.f90
# ---------------------------------------------------------------------------
NCAL365 = [31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31]


class Date:
    """date.f90: model calendar state (iseasc = 1 path)."""

    def __init__(self, start, nsteps: int):
        self.nsteps = nsteps
        self.start = dict(start)
        self.d = dict(start)                     # model_datetime
        self.ndaycal = np.zeros((12, 2), dtype=int)
        self.ndaycal[:, 0] = NCAL365
        for jm in range(1, 12):
            self.ndaycal[jm, 1] = self.ndaycal[jm - 1, 0] \
                + self.ndaycal[jm - 1, 1]
        self._season()

    def _season(self):
        d = self.d
        self.imont1 = d["month"]
        self.tmonth = (d["day"] - 0.5) / float(self.ndaycal[d["month"] - 1, 0])
        self.tyear = (self.ndaycal[d["month"] - 1, 1] + d["day"] - 0.5) / 365.0

    def newdate(self):
        """date.f90:109-157 incl. the leap-February quirk (:129-139)."""
        d = self.d
        d["minute"] += int(24 * 60 / self.nsteps)
        if d["minute"] >= 60:
            d["minute"] %= 60
            d["hour"] += 1
        if d["hour"] >= 24:
            d["hour"] %= 24
            d["day"] += 1
        if d["year"] % 4 == 0 and d["month"] == 2:
            if d["day"] > 29:
                d["day"] = 1
                d["month"] += 1
        else:
            if d["day"] > self.ndaycal[d["month"] - 1, 0]:
                d["day"] = 1
                d["month"] += 1
        if d["month"] > 12:
            d["month"] = 1
            d["year"] += 1
        self._season()

    def equal(self, other) -> bool:
        return all(self.d[k] == other[k]
                   for k in ("year", "month", "day", "hour", "minute"))


# ---------------------------------------------------------------------------
# interpolation.f90
# ---------------------------------------------------------------------------
def forint(tmonth: float, imon: int, for12: np.ndarray) -> np.ndarray:
    """interpolation.f90:16-35; for12 is (..., 12) or (..., n)."""
    nmons = for12.shape[-1]
    if tmonth <= 0.5:
        imon2 = imon - 1 if imon != 1 else nmons
        wmon = 0.5 - tmonth
    else:
        imon2 = imon + 1 if imon != nmons else 1
        wmon = tmonth - 0.5
    return for12[..., imon - 1] + wmon * (for12[..., imon2 - 1]
                                          - for12[..., imon - 1])


def forin5(tmonth: float, imon: int, for12: np.ndarray) -> np.ndarray:
    """interpolation.f90:38-69."""
    im2, im1, ip1, ip2 = imon - 2, imon - 1, imon + 1, imon + 2
    if im2 < 1:
        im2 += 12
    if im1 < 1:
        im1 += 12
    if ip1 > 12:
        ip1 -= 12
    if ip2 > 12:
        ip2 -= 12
    c0 = 1.0 / 12.0
    t0 = c0 * tmonth
    t1 = c0 * (1.0 - tmonth)
    t2 = 0.25 * tmonth * (1.0 - tmonth)
    wm2 = -t1 + t2
    wm1 = -c0 + 8 * t1 - 6 * t2
    w0 = 7 * c0 + 10 * t2
    wp1 = -c0 + 8 * t0 - 6 * t2
    wp2 = -t0 + t2
    return (wm2 * for12[..., im2 - 1] + wm1 * for12[..., im1 - 1]
            + w0 * for12[..., imon - 1] + wp1 * for12[..., ip1 - 1]
            + wp2 * for12[..., ip2 - 1])


# ---------------------------------------------------------------------------
# boundaries.f90
# ---------------------------------------------------------------------------
def forchk(fmask, fmin, fmax, fset, field):
    """boundaries.f90:47-72; field (ix, il) or (ix, il, nf)."""
    field = field.copy()
    if field.ndim == 2:
        field = field[:, :, None]
        squeeze = True
    else:
        squeeze = False
    field[fmask <= 0.0, :] = fset
    return field[:, :, 0] if squeeze else field


def fillsf(sf, fmis):
    """boundaries.f90:96-142 (equator -> poles zonal fill)."""
    sf = sf.copy()
    ix, il = sf.shape
    for hemisphere in (1, 2):
        if hemisphere == 1:
            rows = range(il // 2, 0, -1)          # 1-based il/2 .. 1
        else:
            rows = range(il // 2 + 1, il + 1)
        for j in rows:
            col = sf[:, j - 1]
            miss = col < fmis
            nmis = int(miss.sum())
            if nmis == 0:
                continue
            sf2 = np.where(miss, 0.0, col)
            if nmis < ix:
                fmean = sf2.sum() / float(ix - nmis)
            sf2 = np.where(miss, fmean, col)
            left = np.roll(sf2, 1)
            right = np.roll(sf2, -1)
            sf[:, j - 1] = np.where(miss, 0.5 * (left + right), col)
    return sf


def load_bc(name: str, var: str, months=None):
    """Boundary read in Fortran (ix, il) order via the repo loader."""
    from speedy_tpu.utils.io import load_boundary_file
    data = load_boundary_file(name, var, months=months)
    if months is None:
        return np.ascontiguousarray(data.T)               # [il,ix] -> [ix,il]
    return np.ascontiguousarray(np.moveaxis(data, 0, -1).transpose(1, 0, 2))


class Boundaries:
    def __init__(self, sp: Spectral):
        """boundaries.f90:28-43."""
        self.phi0 = GRAV * load_bc("surface.nc", "orog")
        fsp = sp.grid_to_spec(self.phi0)
        for n in range(1, sp.nx + 1):
            for m in range(1, sp.mx + 1):
                if (m + n - 2) > sp.trunc:
                    fsp[m - 1, n - 1] = 0.0
        self.phis0 = sp.spec_to_grid(fsp, 1)
        self.fmask = load_bc("surface.nc", "lsm")
        self.alb0 = load_bc("surface.nc", "alb")


# ---------------------------------------------------------------------------
# land_model.f90
# ---------------------------------------------------------------------------
class LandModel:
    SD2SC = 60.0

    def __init__(self, bounds: Boundaries, delt: float):
        """land_model_init (land_model.f90:47-181)."""
        fmask, alb0 = bounds.fmask, bounds.alb0
        ix, il = fmask.shape
        thrsh = 0.1
        self.fmask_l = fmask.copy()
        self.bmask_l = np.zeros((ix, il))
        sel = self.fmask_l >= thrsh
        self.bmask_l[sel] = 1.0
        self.fmask_l = np.where(sel & (fmask > 1.0 - thrsh), 1.0,
                                np.where(sel, self.fmask_l, 0.0))

        self.stl12 = np.stack(
            [fillsf(load_bc("land.nc", "stl", 12)[:, :, m], 0.0)
             for m in range(12)], axis=-1)
        self.stl12 = forchk(self.bmask_l, 0.0, 400.0, 273.0, self.stl12)
        self.snowd12 = forchk(self.bmask_l, 0.0, 20000.0, 0.0,
                              load_bc("snow.nc", "snowd", 12))

        veg_high = load_bc("surface.nc", "vegh")
        veg_low = load_bc("surface.nc", "vegl")
        veg = np.maximum(0.0, veg_high + 0.8 * veg_low)
        swcap, swwil, idep2 = 0.30, 0.17, 3
        swwil2 = idep2 * swwil
        rsw = 1.0 / (swcap + idep2 * (swcap - swwil))
        swl1 = load_bc("soil.nc", "swl1", 12)
        swl2 = load_bc("soil.nc", "swl2", 12)
        self.soilw12 = np.minimum(
            1.0, rsw * (swl1 + veg[:, :, None]
                        * np.maximum(0.0, idep2 * swl2 - swwil2)))
        self.soilw12 = forchk(self.bmask_l, 0.0, 10.0, 0.0, self.soilw12)

        depth_soil, depth_lice, tdland = 1.0, 5.0, 40.0
        flandmin = 1.0 / 3.0
        hcapl = depth_soil * 2.50e6
        hcapli = depth_lice * 1.93e6
        dmask = np.where(self.fmask_l < flandmin, 0.0, 1.0)
        self.rhcapl = np.where(alb0 < 0.4, delt / hcapl, delt / hcapli)
        self.cdland = dmask * tdland / (1.0 + dmask * tdland)

        self.stl_lm = np.zeros((ix, il))
        self.stl_am = np.zeros((ix, il))
        self.snowd_am = np.zeros((ix, il))
        self.soilw_am = np.zeros((ix, il))
        self.land_coupling_flag = 1

    def couple_land_atm(self, day: int, date: Date, hfluxn_land):
        """land_model.f90:184-221."""
        self.stlcl_ob = forin5(date.tmonth, date.imont1, self.stl12)
        self.snowdcl_ob = forint(date.tmonth, date.imont1, self.snowd12)
        self.soilwcl_ob = forint(date.tmonth, date.imont1, self.soilw12)
        if day == 0:
            self.stl_lm = self.stlcl_ob.copy()
            self.stl_am = self.stlcl_ob.copy()
        else:
            if self.land_coupling_flag == 1:
                tanom = self.stl_lm - self.stlcl_ob
                tanom = self.cdland * (tanom + self.rhcapl * hfluxn_land)
                self.stl_lm = tanom + self.stlcl_ob
                self.stl_am = self.stl_lm.copy()
            else:
                self.stl_am = self.stlcl_ob.copy()
        self.snowd_am = self.snowdcl_ob.copy()
        self.soilw_am = self.soilwcl_ob.copy()


# ---------------------------------------------------------------------------
# sea_model.f90 (global domain, sea_coupling_flag = 0)
# ---------------------------------------------------------------------------
class SeaModel:
    def __init__(self, bounds: Boundaries, geom: Geometry, delt: float,
                 sst_anomaly_coupling_flag: int = 0):
        """sea_model_init (sea_model.f90:79-251). The anomaly file is not
        shipped with the reference data, so the default oracle run uses
        sst_anomaly_coupling_flag = 0 (the repo's sst_anomaly_forcing=False
        default)."""
        fmask = bounds.fmask
        ix, il = fmask.shape
        thrsh = 0.1
        self.fmask_s = 1.0 - fmask
        self.bmask_s = np.zeros((ix, il))
        sel = self.fmask_s >= thrsh
        self.bmask_s[sel] = 1.0
        self.fmask_s = np.where(sel & (self.fmask_s > 1.0 - thrsh), 1.0,
                                np.where(sel, self.fmask_s, 0.0))
        self.sst12 = np.stack(
            [fillsf(load_bc("sea_surface_temperature.nc", "sst",
                            12)[:, :, m], 0.0) for m in range(12)], axis=-1)
        self.sst12 = forchk(self.bmask_s, 100.0, 400.0, 273.0, self.sst12)
        self.sice12 = forchk(self.bmask_s, 0.0, 1.0, 0.0,
                             np.maximum(load_bc("sea_ice.nc", "icec", 12),
                                        0.0))
        self.sstan3 = np.zeros((ix, il, 3))
        self.hfseacl = np.zeros((ix, il))
        self.sst_anomaly_coupling_flag = sst_anomaly_coupling_flag
        self.sea_coupling_flag = 0
        self.ice_coupling_flag = 1

        depth_ml, dept0_ml = 60.0, 40.0
        depth_ice, dept0_ice = 2.5, 1.5
        tdsst, tdice = 90.0, 30.0
        fseamin = 1.0 / 3.0
        self.beta = 1.0
        deglat_s = geom.radang * 90.0 / np.arcsin(1.0)
        crad = np.arcsin(1.0) / 90.0
        coslat = np.cos(crad * deglat_s)
        hcaps = 4.18e6 * (depth_ml + (dept0_ml - depth_ml) * coslat ** 3)
        hcapi = 1.93e6 * (depth_ice + (dept0_ice - depth_ice) * coslat ** 2)
        dmask = np.ones((ix, il))
        # smoothing (sea_model.f90:231-234) is a no-op on the global mask
        sm = dmask.copy()
        sm[:, 1:-1] = 0.25 * (dmask[:, :-2] + 2 * dmask[:, 1:-1]
                              + dmask[:, 2:])
        dmask = sm
        dmask[self.fmask_s < fseamin] = 0.0
        self.rhcaps = np.broadcast_to(delt / hcaps, (ix, il)).copy()
        self.rhcapi = np.broadcast_to(delt / hcapi, (ix, il)).copy()
        self.cdsea = dmask * tdsst / (1.0 + dmask * tdsst)
        self.cdice = dmask * tdice / (1.0 + dmask * tdice)

        z = np.zeros((ix, il))
        self.sst_om = z.copy()
        self.sice_om = z.copy()
        self.tice_om = z.copy()
        self.ssti_om = z.copy()
        self.sst_am = z.copy()
        self.sstan_am = z.copy()
        self.sice_am = z.copy()
        self.tice_am = z.copy()

    def couple_sea_atm(self, day: int, date: Date, aux):
        """couple_sea_atm (sea_model.f90:253-363)."""
        self.sstcl_ob = forin5(date.tmonth, date.imont1, self.sst12)
        self.sicecl_ob = forint(date.tmonth, date.imont1, self.sice12)
        if self.sst_anomaly_coupling_flag > 0:
            # NB: the reference calls obs_ssta on EVERY step of a month's
            # first day (sea_model.f90:273); with the default data (no
            # anomaly file) the branch never executes
            self.sstan_ob = forint(date.tmonth, 2, self.sstan3)

        sstfr = 273.2 - 1.8
        sstcl = self.sstcl_ob
        warm = sstcl > sstfr
        sice_w = np.minimum(0.5, self.sicecl_ob)
        sst_w = np.where(sice_w > 0.0,
                         sstfr + (sstcl - sstfr) / (1.0 - sice_w), sstcl)
        sice_c = np.maximum(0.5, self.sicecl_ob)
        tice_c = sstfr + (sstcl - sstfr) / sice_c
        self.sicecl_ob = np.where(warm, sice_w, sice_c)
        self.ticecl_ob = np.where(warm, sstfr, tice_c)
        self.sstcl_ob = np.where(warm, sst_w, sstfr)

        if day == 0:
            self.sst_om = self.sstcl_ob.copy()
            self.tice_om = self.ticecl_ob.copy()
            self.sice_om = self.sicecl_ob.copy()
            if self.sea_coupling_flag <= 0:
                self.sst_om = np.zeros_like(self.sst_om)
        else:
            if self.sea_coupling_flag > 0 or self.ice_coupling_flag > 0:
                self._run_sea_model(aux)

        self.sstan_am = np.zeros_like(self.sst_om)
        if self.sea_coupling_flag <= 1:
            if self.sst_anomaly_coupling_flag > 0:
                self.sstan_am = self.sstan_ob
            self.sst_am = self.sstcl_ob + self.sstan_am

        if self.ice_coupling_flag > 0:
            self.sice_am = self.sice_om.copy()
            self.tice_am = self.tice_om.copy()
        else:
            self.sice_am = self.sicecl_ob.copy()
            self.tice_am = self.ticecl_ob.copy()
        self.sst_am = self.sst_am + self.sice_am * (self.tice_am
                                                    - self.sst_am)
        self.ssti_om = self.sst_om + self.sice_am * (self.tice_am
                                                     - self.sst_om)

    def _run_sea_model(self, aux):
        """run_sea_model (sea_model.f90:387-444)."""
        sstfr = 273.2 - 1.8
        difice = (ALBSEA - ALBICE) * aux["ssrd"] \
            + EMISFC * SBC * (sstfr ** 4 - self.tice_am ** 4) \
            + aux["shf"][:, :, 1] + aux["evap"][:, :, 1] * ALHC
        hflux_i = aux["hfluxn"][:, :, 1] + difice * (1.0 - self.sice_am)
        hflux = aux["hfluxn"][:, :, 1] - self.hfseacl \
            - self.sicecl_ob * (hflux_i + self.beta * (sstfr - self.tice_om))
        tanom = self.sst_om - self.sstcl_ob
        tanom = self.cdsea * (tanom + self.rhcaps * hflux)
        self.sst_om = tanom + self.sstcl_ob

        hflux = hflux_i + self.beta * (sstfr - self.tice_om)
        tanom = self.tice_om - self.ticecl_ob
        anom0 = 20.0
        cdis = self.cdice * (anom0 / (anom0 + np.abs(tanom)))
        tanom = cdis * (tanom + self.rhcapi * hflux)
        self.tice_om = tanom + self.ticecl_ob
        self.sice_om = self.sicecl_ob.copy()


# ---------------------------------------------------------------------------
# forcing.f90
# ---------------------------------------------------------------------------
def set_forcing(imode: int, date: Date, bounds: Boundaries, land: LandModel,
                sea: SeaModel, rad: Radiation, sp: Spectral, hd,
                increase_co2: bool = False):
    """set_forcing (forcing.f90:15-100). Mutates rad (albedo/solar fields)
    and hd.tcorh/qcorh."""
    if imode == 0:
        rad.radset()
        rad.forog = set_orog_land_sfc_drag(bounds.phis0)
        rad.ablco2_ref = rad.ablco2

    rad.get_zonal_average_fields(date.tyear)

    rad.snowc = np.minimum(1.0, land.snowd_am / LandModel.SD2SC)
    rad.alb_l = bounds.alb0 + rad.snowc * (ALBSN - bounds.alb0)
    rad.alb_s = ALBSEA + sea.sice_am * (ALBICE - ALBSEA)
    rad.albsfc = rad.alb_s + land.fmask_l * (rad.alb_l - rad.alb_s)

    if increase_co2:
        rad.ablco2 = rad.ablco2_ref * np.exp(
            0.005 * (date.d["year"] + date.tyear - 1950))

    gamlat = GAMMA / (1000.0 * GRAV)
    corh = gamlat * bounds.phis0
    hd.tcorh = sp.grid_to_spec(corh)

    pexp = 1.0 / (RGAS * gamlat)
    tsfc = land.fmask_l * land.stl_am + sea.fmask_s * sea.sst_am
    tref = tsfc + corh
    psfc = (tsfc / tref) ** pexp
    qref = get_qsat(tref, psfc / psfc, -1.0)
    qsfc = get_qsat(tsfc, psfc, 1.0)
    corh = REFRH1 * (qref - qsfc)
    hd.qcorh = sp.grid_to_spec(corh)
