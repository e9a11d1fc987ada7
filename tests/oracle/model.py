"""Loop-literal NumPy transliteration of the reference model driver:
tendencies.f90, physics.f90 (orchestrator), time_stepping.f90,
prognostics.f90 (rest state), initialization.f90, speedy.f90 (main loop).

TEST-ONLY ORACLE — see transforms.py header. The full model: spectral
dynamics + semi-implicit leapfrog + all physics + slab land/sea coupling,
advanced exactly in the reference's call order (including the
couple-after-newdate cadence, speedy.f90:38-53).
"""
from __future__ import annotations

import numpy as np

from .transforms import (AKAP, CP, GAMMA, GRAV, HSCALE, HSHUM, RGAS, REFRH1,
                         TDRS, Geometry, Spectral)
from .dynamics import (Diffusion, Geopotential, Implicit, check_diagnostics)
from .physics import (PhysicsConsts, Radiation, get_convection_tendencies,
                      get_lsc_tendencies, get_qsat, get_surface_fluxes,
                      get_vertical_diffusion_tend)
from .surface import Boundaries, Date, LandModel, SeaModel, set_forcing


class OracleSpeedy:
    """The assembled reference engine (T30L8 default configuration:
    land_coupling=1, sea_coupling=0, ice_coupling=1, no SST anomaly, SPPT
    off, nstrad=3, iseasc=1)."""

    # params.f90:19-43
    TRUNC, IX, IL, KX = 30, 96, 48, 8
    NSTEPS = 36
    ROB, WIL, ALPH = 0.05, 0.53, 0.5
    NSTRAD = 3

    def __init__(self, start=dict(year=1982, month=1, day=1, hour=0,
                                  minute=0)):
        self.delt = 86400.0 / self.NSTEPS
        g = Geometry(self.KX, self.IX, self.IL)
        self.g = g
        self.sp = Spectral(self.TRUNC, self.IX, self.IL, g)
        self.pc = PhysicsConsts(g)
        self.gp = Geopotential(g)
        self.hd = Diffusion(self.TRUNC, self.sp.mx, self.sp.nx, g,
                            self.NSTEPS)
        self.im = Implicit(self.sp.mx, self.sp.nx, self.KX, self.ALPH)
        self.date = Date(start, self.NSTEPS)
        self.bounds = Boundaries(self.sp)
        self.rad = Radiation(g, self.IX, self.IL)

        # prognostics.f90 globals
        mx, nx, kx = self.sp.mx, self.sp.nx, self.KX
        self.vor = np.zeros((mx, nx, kx, 2), dtype=np.complex128)
        self.div = np.zeros((mx, nx, kx, 2), dtype=np.complex128)
        self.t = np.zeros((mx, nx, kx, 2), dtype=np.complex128)
        self.ps = np.zeros((mx, nx, 2), dtype=np.complex128)
        self.tr = np.zeros((mx, nx, kx, 2, 1), dtype=np.complex128)
        self.phi = np.zeros((mx, nx, kx), dtype=np.complex128)
        self.phis = np.zeros((mx, nx), dtype=np.complex128)

        # auxiliaries.f90 flux globals
        ix, il = self.IX, self.IL
        self.aux = {k: np.zeros((ix, il)) for k in
                    ("precnv", "precls", "cbmf", "tsr", "ssrd", "ssr",
                     "slrd", "slr", "olr")}
        for k in ("slru", "ustr", "vstr", "shf", "evap"):
            self.aux[k] = np.zeros((ix, il, 3))
        self.aux["hfluxn"] = np.zeros((ix, il, 3))

        self.compute_shortwave = True          # shortwave_radiation.f90:68
        self.sw_state = {}                     # icltop/cloudc/clstr cache

        self._initialize()

    # ------------------------------------------------------------------
    # initialization.f90:12-82
    # ------------------------------------------------------------------
    def _initialize(self):
        self._init_prognostics()
        self.land = LandModel(self.bounds, self.delt)
        self.land.couple_land_atm(0, self.date,
                                  self.aux["hfluxn"][:, :, 0])
        self.sea = SeaModel(self.bounds, self.g, self.delt)
        self.sea.couple_sea_atm(0, self.date, self.aux)
        set_forcing(0, self.date, self.bounds, self.land, self.sea,
                    self.rad, self.sp, self.hd)
        self._first_step()

    def _init_prognostics(self):
        """initialize_from_rest_state (prognostics.f90:34-127)."""
        g, sp, kx = self.g, self.sp, self.KX
        gam1 = GAMMA / (1000.0 * GRAV)
        self.phis = sp.grid_to_spec(self.bounds.phis0)
        tref, ttop = 288.0, 216.0
        gam2 = gam1 / tref
        rgam = RGAS * gam1
        rgamr = 1.0 / rgam
        surfs = -gam1 * self.phis
        self.t[0, 0, 0, 0] = np.sqrt(2.0) * ttop
        self.t[0, 0, 1, 0] = np.sqrt(2.0) * ttop
        surfs[0, 0] = np.sqrt(2.0) * tref - gam1 * self.phis[0, 0]
        for k in range(3, kx + 1):
            self.t[:, :, k - 1, 0] = surfs * g.fsg[k - 1] ** rgam
        rlog0 = np.log(1.013)
        surfg = rlog0 + rgamr * np.log(1.0 - gam2 * self.bounds.phis0)
        self.ps[:, :, 0] = sp.grid_to_spec(surfg)
        if self.IX == 4 * (self.IL // 2):
            self.ps[:, :, 0] = sp.trunct(self.ps[:, :, 0])
        esref = 17.0
        qref = REFRH1 * 0.622 * esref
        qexp = HSCALE / HSHUM
        surfg = qref * np.exp(qexp * surfg)
        surfs = sp.grid_to_spec(surfg)
        if self.IX == 4 * (self.IL // 2):
            surfs = sp.trunct(surfs)
        for k in range(3, kx + 1):
            self.tr[:, :, k - 1, 0, 0] = surfs * g.fsg[k - 1] ** qexp
        check_diagnostics(sp, self.vor[:, :, :, 0], self.div[:, :, :, 0],
                          self.t[:, :, :, 0], 0)
        self.phi = self.gp.get_geopotential(self.t[:, :, :, 0], self.phis)

    # ------------------------------------------------------------------
    # time_stepping.f90
    # ------------------------------------------------------------------
    def _first_step(self):
        """time_stepping.f90:12-24."""
        self.im.initialize(0.5 * self.delt, self.g, self.hd)
        self.step(1, 1, 0.5 * self.delt)
        self.im.initialize(self.delt, self.g, self.hd)
        self.step(1, 2, self.delt)
        self.im.initialize(2 * self.delt, self.g, self.hd)

    def step(self, j1: int, j2: int, dt: float):
        """time_stepping.f90:35-122."""
        hd = self.hd
        vordt, divdt, tdt, psdt, trdt = self.get_tendencies(j2)

        vordt = hd.apply(self.vor[:, :, :, 0], vordt, hd.dmp, hd.dmp1)
        divdt = hd.apply(self.div[:, :, :, 0], divdt, hd.dmpd, hd.dmp1d)
        ctmp = self.t[:, :, :, 0] \
            + hd.tcorh[:, :, None] * hd.tcorv[None, None, :]
        tdt = hd.apply(ctmp, tdt, hd.dmp, hd.dmp1)

        sdrag = 1.0 / (TDRS * 3600.0)
        vordt[0, :, 0] -= sdrag * self.vor[0, :, 0, 0]
        divdt[0, :, 0] -= sdrag * self.div[0, :, 0, 0]

        vordt = hd.apply(self.vor[:, :, :, 0], vordt, hd.dmps, hd.dmp1s)
        divdt = hd.apply(self.div[:, :, :, 0], divdt, hd.dmps, hd.dmp1s)
        tdt = hd.apply(ctmp, tdt, hd.dmps, hd.dmp1s)

        ctmp = self.tr[:, :, :, 0, 0] \
            + hd.qcorh[:, :, None] * hd.qcorv[None, None, :]
        trdt0 = hd.apply(ctmp, trdt[:, :, :, 0], hd.dmpd, hd.dmp1d)

        eps = 0.0 if j1 == 1 else self.ROB
        self.ps = self._step_field_2d(j1, dt, eps, self.ps, psdt)
        self.vor = self._step_field_3d(j1, dt, eps, self.vor, vordt)
        self.div = self._step_field_3d(j1, dt, eps, self.div, divdt)
        self.t = self._step_field_3d(j1, dt, eps, self.t, tdt)
        self.tr[:, :, :, :, 0] = self._step_field_3d(
            j1, dt, eps, self.tr[:, :, :, :, 0], trdt0)

    def _step_field_3d(self, j1, dt, eps, inp, fdt):
        out = np.empty_like(inp)
        for k in range(inp.shape[2]):
            out[:, :, k, :] = self._step_field_2d(j1, dt, eps,
                                                  inp[:, :, k, :],
                                                  fdt[:, :, k])
        return out

    def _step_field_2d(self, j1, dt, eps, inp, fdt):
        """time_stepping.f90:142-167. NB: the Williams line reads the
        FILTERED output(:,:,1) — transliterated exactly."""
        out = inp.copy()
        if self.IX == (self.IL // 2) * 4:
            fdt = self.sp.trunct(fdt)
        fnew = out[:, :, 0] + dt * fdt
        out[:, :, 0] = out[:, :, j1 - 1] + self.WIL * eps \
            * (out[:, :, 0] - 2 * out[:, :, j1 - 1] + fnew)
        out[:, :, 1] = fnew - (1.0 - self.WIL) * eps \
            * (out[:, :, 0] - 2.0 * out[:, :, j1 - 1] + fnew)
        return out

    # ------------------------------------------------------------------
    # tendencies.f90
    # ------------------------------------------------------------------
    def get_tendencies(self, j2: int):
        """tendencies.f90:11-37 (alph = 0.5 -> implicit branch)."""
        vordt, divdt, tdt, psdt, trdt = \
            self.get_grid_point_tendencies(1, j2)
        divdt, tdt, psdt = self.get_spectral_tendencies(divdt, tdt, psdt, 1)
        divdt, tdt, psdt = self.im.implicit_terms(divdt, tdt, psdt)
        return vordt, divdt, tdt, psdt, trdt

    def get_grid_point_tendencies(self, j1: int, j2: int):
        """tendencies.f90:49-235."""
        g, sp, kx = self.g, self.sp, self.KX
        ix, il = self.IX, self.IL
        im = self.im

        ug = np.zeros((ix, il, kx))
        vg = np.zeros((ix, il, kx))
        tg = np.zeros((ix, il, kx))
        vorg = np.zeros((ix, il, kx))
        divg = np.zeros((ix, il, kx))
        trg = np.zeros((ix, il, kx, 1))
        for k in range(kx):
            vorg[:, :, k] = sp.spec_to_grid(self.vor[:, :, k, j2 - 1], 1)
            divg[:, :, k] = sp.spec_to_grid(self.div[:, :, k, j2 - 1], 1)
            tg[:, :, k] = sp.spec_to_grid(self.t[:, :, k, j2 - 1], 1)
            trg[:, :, k, 0] = sp.spec_to_grid(self.tr[:, :, k, j2 - 1, 0], 1)
            ucos, vcos = sp.uvspec(self.vor[:, :, k, j2 - 1],
                                   self.div[:, :, k, j2 - 1])
            vg[:, :, k] = sp.spec_to_grid(vcos, 2)
            ug[:, :, k] = sp.spec_to_grid(ucos, 2)
            vorg[:, :, k] += g.coriol[None, :]

        umean = (ug * g.dhs[None, None, :]).sum(axis=2)
        vmean = (vg * g.dhs[None, None, :]).sum(axis=2)
        dmean = (divg * g.dhs[None, None, :]).sum(axis=2)

        dx, dy = sp.grad(self.ps[:, :, j2 - 1])
        px = sp.spec_to_grid(dx, 2)
        py = sp.spec_to_grid(dy, 2)
        psdt = sp.grid_to_spec(-umean * px - vmean * py)
        psdt[0, 0] = 0.0

        sigdt = np.zeros((ix, il, kx + 1))
        sigm = np.zeros((ix, il, kx + 1))
        puv = np.zeros((ix, il, kx))
        for k in range(kx):
            puv[:, :, k] = (ug[:, :, k] - umean) * px \
                + (vg[:, :, k] - vmean) * py
        for k in range(kx):
            sigdt[:, :, k + 1] = sigdt[:, :, k] - g.dhs[k] \
                * (puv[:, :, k] + divg[:, :, k] - dmean)
            sigm[:, :, k + 1] = sigm[:, :, k] - g.dhs[k] * puv[:, :, k]

        tgg = tg - im.tref[None, None, :]

        temp = np.zeros((ix, il, kx + 1))
        utend = np.zeros((ix, il, kx))
        vtend = np.zeros((ix, il, kx))
        ttend = np.zeros((ix, il, kx))
        trtend = np.zeros((ix, il, kx, 1))

        for k in range(2, kx + 1):
            temp[:, :, k - 1] = sigdt[:, :, k - 1] * (ug[:, :, k - 1]
                                                      - ug[:, :, k - 2])
        for k in range(1, kx + 1):
            utend[:, :, k - 1] = vg[:, :, k - 1] * vorg[:, :, k - 1] \
                - tgg[:, :, k - 1] * RGAS * px \
                - (temp[:, :, k] + temp[:, :, k - 1]) * g.dhsr[k - 1]
        for k in range(2, kx + 1):
            temp[:, :, k - 1] = sigdt[:, :, k - 1] * (vg[:, :, k - 1]
                                                      - vg[:, :, k - 2])
        for k in range(1, kx + 1):
            vtend[:, :, k - 1] = -ug[:, :, k - 1] * vorg[:, :, k - 1] \
                - tgg[:, :, k - 1] * RGAS * py \
                - (temp[:, :, k] + temp[:, :, k - 1]) * g.dhsr[k - 1]
        for k in range(2, kx + 1):
            temp[:, :, k - 1] = sigdt[:, :, k - 1] * (tgg[:, :, k - 1]
                                                      - tgg[:, :, k - 2]) \
                + sigm[:, :, k - 1] * (im.tref[k - 1] - im.tref[k - 2])
        for k in range(1, kx + 1):
            ttend[:, :, k - 1] = tgg[:, :, k - 1] * divg[:, :, k - 1] \
                - (temp[:, :, k] + temp[:, :, k - 1]) * g.dhsr[k - 1] \
                + g.fsgr[k - 1] * tgg[:, :, k - 1] \
                * (sigdt[:, :, k] + sigdt[:, :, k - 1]) \
                + im.tref3[k - 1] * (sigm[:, :, k] + sigm[:, :, k - 1]) \
                + AKAP * (tg[:, :, k - 1] * puv[:, :, k - 1]
                          - tgg[:, :, k - 1] * dmean)
        # tracer tendency incl. the temp(:,:,2:3)=0 quirk
        # (tendencies.f90:185-196)
        for k in range(2, kx + 1):
            temp[:, :, k - 1] = sigdt[:, :, k - 1] * (trg[:, :, k - 1, 0]
                                                      - trg[:, :, k - 2, 0])
        temp[:, :, 1:3] = 0.0
        for k in range(1, kx + 1):
            trtend[:, :, k - 1, 0] = trg[:, :, k - 1, 0] * divg[:, :, k - 1] \
                - (temp[:, :, k] + temp[:, :, k - 1]) * g.dhsr[k - 1]

        # physics at time level j1 (tendencies.f90:200-206)
        self.phi = self.gp.get_geopotential(self.t[:, :, :, j1 - 1],
                                            self.phis)
        utend, vtend, ttend, trtend = self.get_physical_tendencies(
            j1, utend, vtend, ttend, trtend)

        # forward transforms (tendencies.f90:212-234)
        mx, nx = sp.mx, sp.nx
        vordt = np.zeros((mx, nx, kx), dtype=np.complex128)
        divdt = np.zeros((mx, nx, kx), dtype=np.complex128)
        tdt = np.zeros((mx, nx, kx), dtype=np.complex128)
        trdt = np.zeros((mx, nx, kx, 1), dtype=np.complex128)
        for k in range(kx):
            vordt[:, :, k], divdt[:, :, k] = sp.vdspec(
                utend[:, :, k], vtend[:, :, k], 2)
            divdt[:, :, k] -= sp.laplacian(sp.grid_to_spec(
                0.5 * (ug[:, :, k] ** 2 + vg[:, :, k] ** 2)))
            _, tdt[:, :, k] = sp.vdspec(-ug[:, :, k] * tgg[:, :, k],
                                        -vg[:, :, k] * tgg[:, :, k], 2)
            tdt[:, :, k] += sp.grid_to_spec(ttend[:, :, k])
            _, trdt[:, :, k, 0] = sp.vdspec(
                -ug[:, :, k] * trg[:, :, k, 0],
                -vg[:, :, k] * trg[:, :, k, 0], 2)
            trdt[:, :, k, 0] += sp.grid_to_spec(trtend[:, :, k, 0])
        return vordt, divdt, tdt, psdt, trdt

    def get_spectral_tendencies(self, divdt, tdt, psdt, j2):
        """tendencies.f90:242-293."""
        g, sp, kx = self.g, self.sp, self.KX
        im = self.im
        dmeanc = np.zeros_like(psdt)
        for k in range(kx):
            dmeanc += self.div[:, :, k, j2 - 1] * g.dhs[k]
        psdt = psdt - dmeanc
        psdt[0, 0] = 0.0

        sigdtc = np.zeros(psdt.shape + (kx + 1,), dtype=np.complex128)
        for k in range(1, kx):
            sigdtc[:, :, k] = sigdtc[:, :, k - 1] \
                - g.dhs[k - 1] * (self.div[:, :, k - 1, j2 - 1] - dmeanc)
        dumk = np.zeros(psdt.shape + (kx + 1,), dtype=np.complex128)
        for k in range(2, kx + 1):
            dumk[:, :, k - 1] = sigdtc[:, :, k - 1] \
                * (im.tref[k - 1] - im.tref[k - 2])
        for k in range(1, kx + 1):
            tdt[:, :, k - 1] = tdt[:, :, k - 1] \
                - (dumk[:, :, k] + dumk[:, :, k - 1]) * g.dhsr[k - 1] \
                + im.tref3[k - 1] * (sigdtc[:, :, k] + sigdtc[:, :, k - 1]) \
                - im.tref2[k - 1] * dmeanc

        self.phi = self.gp.get_geopotential(self.t[:, :, :, j2 - 1],
                                            self.phis)
        for k in range(kx):
            divdt[:, :, k] = divdt[:, :, k] - sp.laplacian(
                self.phi[:, :, k]
                + RGAS * im.tref[k] * self.ps[:, :, j2 - 1])
        return divdt, tdt, psdt

    # ------------------------------------------------------------------
    # physics.f90:43-223
    # ------------------------------------------------------------------
    def get_physical_tendencies(self, j1, utend, vtend, ttend, trtend):
        g, sp, pc, kx = self.g, self.sp, self.pc, self.KX
        ix, il = self.IX, self.IL
        aux = self.aux

        ug = np.zeros((ix, il, kx))
        vg = np.zeros((ix, il, kx))
        tg = np.zeros((ix, il, kx))
        qg = np.zeros((ix, il, kx))
        phig = np.zeros((ix, il, kx))
        for k in range(kx):
            ucos, vcos = sp.uvspec(self.vor[:, :, k, j1 - 1],
                                   self.div[:, :, k, j1 - 1])
            ug[:, :, k] = sp.spec_to_grid(ucos, 2)
            vg[:, :, k] = sp.spec_to_grid(vcos, 2)
            tg[:, :, k] = sp.spec_to_grid(self.t[:, :, k, j1 - 1], 1)
            qg[:, :, k] = sp.spec_to_grid(self.tr[:, :, k, j1 - 1, 0], 1)
            phig[:, :, k] = sp.spec_to_grid(self.phi[:, :, k], 1)
        pslg = sp.spec_to_grid(self.ps[:, :, j1 - 1], 1)

        psg = np.exp(pslg)
        rps = 1.0 / psg
        qg = np.maximum(qg, 0.0)
        se = CP * tg + phig
        rh = np.zeros((ix, il, kx))
        qsat = np.zeros((ix, il, kx))
        for k in range(kx):
            qsat[:, :, k] = get_qsat(tg[:, :, k], psg, g.fsg[k])
            rh[:, :, k] = qg[:, :, k] / qsat[:, :, k]

        # precipitation
        iptop, aux["cbmf"], aux["precnv"], tt_cnv, qt_cnv = \
            get_convection_tendencies(pc, g, psg, se, qg, qsat)
        for k in range(2, kx + 1):
            tt_cnv[:, :, k - 1] *= rps * pc.grdscp[k - 1]
            qt_cnv[:, :, k - 1] *= rps * pc.grdsig[k - 1]
        icnv = kx - iptop

        iptop, aux["precls"], tt_lsc, qt_lsc = \
            get_lsc_tendencies(g, psg, qg, qsat, iptop)
        ttend = ttend + tt_cnv + tt_lsc
        trtend = trtend + (qt_cnv + qt_lsc)[:, :, :, None]

        # radiation
        if self.compute_shortwave:
            gse = (se[:, :, kx - 2] - se[:, :, kx - 1]) \
                / (phig[:, :, kx - 2] - phig[:, :, kx - 1])
            icltop, cloudc, clstr = self.rad.clouds(
                qg, rh, aux["precnv"], aux["precls"], iptop, gse,
                self.land.fmask_l)
            aux["ssrd"], aux["ssr"], aux["tsr"], tt_rsw = \
                self.rad.get_shortwave_rad_fluxes(psg, qg, icltop, cloudc,
                                                  clstr)
            for k in range(kx):
                tt_rsw[:, :, k] *= rps * pc.grdscp[k]
            self.sw_state = dict(tt_rsw=tt_rsw)

        aux["slrd"], tt_rlw = self.rad.get_downward_longwave_rad_fluxes(tg)

        sfc = get_surface_fluxes(
            pc, g, self.rad, self.rad.forog, self.land.stl_am,
            self.land.soilw_am, psg, ug, vg, tg, qg, rh, phig,
            self.bounds.phis0, self.land.fmask_l, self.sea.sst_am,
            aux["ssrd"], aux["slrd"])
        for k in ("ustr", "vstr", "shf", "evap", "slru"):
            aux[k] = sfc[k]
        aux["hfluxn"][:, :, :2] = sfc["hfluxn"]
        ts = sfc["tsfc"]

        aux["slr"], aux["olr"], tt_rlw = \
            self.rad.get_upward_longwave_rad_fluxes(
                tg, ts, aux["slrd"], aux["slru"][:, :, 2], tt_rlw)
        for k in range(kx):
            tt_rlw[:, :, k] *= rps * pc.grdscp[k]
        ttend = ttend + self.sw_state["tt_rsw"] + tt_rlw

        # PBL
        ut_pbl, vt_pbl, tt_pbl, qt_pbl = get_vertical_diffusion_tend(
            pc, g, se, rh, qg, qsat, phig, icnv)
        ut_pbl[:, :, kx - 1] += aux["ustr"][:, :, 2] * rps * pc.grdsig[kx - 1]
        vt_pbl[:, :, kx - 1] += aux["vstr"][:, :, 2] * rps * pc.grdsig[kx - 1]
        tt_pbl[:, :, kx - 1] += aux["shf"][:, :, 2] * rps * pc.grdscp[kx - 1]
        qt_pbl[:, :, kx - 1] += aux["evap"][:, :, 2] * rps * pc.grdsig[kx - 1]
        utend = utend + ut_pbl
        vtend = vtend + vt_pbl
        ttend = ttend + tt_pbl
        trtend = trtend + qt_pbl[:, :, :, None]
        return utend, vtend, ttend, trtend

    # ------------------------------------------------------------------
    # speedy.f90:24-54 main loop
    # ------------------------------------------------------------------
    def run(self, n_steps: int, record=None):
        """Advance n_steps regular steps (after the built-in first_step).
        record(self, model_step) is called after each step if given.

        NB: owns the model_step counter across calls — the set_forcing
        cadence, shortwave cadence and coupling day counter all key off it
        (speedy.f90:21-53), so repeated run(1) calls are equivalent to one
        run(n)."""
        model_step = getattr(self, "_model_step", 1)
        for _ in range(n_steps):
            if (model_step - 1) % self.NSTEPS == 0:
                set_forcing(1, self.date, self.bounds, self.land, self.sea,
                            self.rad, self.sp, self.hd)
            self.compute_shortwave = (model_step % self.NSTRAD) == 1
            self.step(2, 2, 2 * self.delt)
            check_diagnostics(self.sp, self.vor[:, :, :, 1],
                              self.div[:, :, :, 1], self.t[:, :, :, 1],
                              model_step)
            model_step += 1
            self.date.newdate()
            day = 1 + model_step // self.NSTEPS
            self.land.couple_land_atm(day, self.date,
                                      self.aux["hfluxn"][:, :, 0])
            self.sea.couple_sea_atm(day, self.date, self.aux)
            if record is not None:
                record(self, model_step - 1)
        self._model_step = model_step
        return self
