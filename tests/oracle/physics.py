"""Loop-literal NumPy transliteration of the reference physics suite:
physics.f90, humidity.f90, convection.f90, large_scale_condensation.f90,
shortwave_radiation.f90, longwave_radiation.f90 (+ mod_radcon.f90),
surface_fluxes.f90, vertical_diffusion.f90.

TEST-ONLY ORACLE — see transforms.py header. (ix, il) layout; horizontal
(i, j) loops are vectorized over the grid (each column's arithmetic is
independent and identical to the Fortran's scalar path), vertical k loops
and the data-dependent convection column loop stay literal.
"""
from __future__ import annotations

import numpy as np

from .transforms import (AKAP, ALHC, ALHS, CP, GRAV, P0, RGAS, SBC, Geometry)

# mod_radcon.f90:22-27
ALBSEA = 0.07
ALBICE = 0.60
ALBSN = 0.60
EPSLW = 0.05
EMISFC = 0.98


class PhysicsConsts:
    """physics.f90:12-39 — sigl/sigh/grdsig/grdscp/wvi."""

    def __init__(self, g: Geometry):
        kx = g.kx
        self.sigh = np.zeros(kx + 1)          # sigh(0:kx)
        self.sigh[0] = g.hsg[0]
        self.sigl = np.log(g.fsg)
        self.sigh[1:] = g.hsg[1:]
        self.grdsig = GRAV / (g.dhs * P0)
        self.grdscp = self.grdsig / CP
        self.wvi = np.zeros((kx, 2))
        for k in range(1, kx):
            self.wvi[k - 1, 0] = 1.0 / (self.sigl[k] - self.sigl[k - 1])
            self.wvi[k - 1, 1] = (np.log(self.sigh[k]) - self.sigl[k - 1]) \
                * self.wvi[k - 1, 0]
        self.wvi[kx - 1, 0] = 0.0
        self.wvi[kx - 1, 1] = (np.log(0.99) - self.sigl[kx - 1]) \
            * self.wvi[kx - 2, 0]


# ---------------------------------------------------------------------------
# humidity.f90
# ---------------------------------------------------------------------------
def get_qsat(ta, ps, sig):
    """humidity.f90:44-78; ta/ps (ix, il), sig scalar."""
    e0, c1, c2, t0, t1, t2 = 6.108e-3, 17.269, 21.875, 273.16, 35.86, 7.66
    qsat = np.where(ta >= t0,
                    e0 * np.exp(c1 * (ta - t0) / (ta - t1)),
                    e0 * np.exp(c2 * (ta - t0) / (ta - t2)))
    if sig <= 0.0:
        qsat = 622.0 * qsat / (ps.flat[0] - 0.378 * qsat)
    else:
        qsat = 622.0 * qsat / (sig * ps - 0.378 * qsat)
    return qsat


# ---------------------------------------------------------------------------
# convection.f90
# ---------------------------------------------------------------------------
PSMIN, TRCNV, RHBL, RHIL, ENTMAX, SMF = 0.8, 6.0, 0.9, 0.7, 0.5, 0.8


def diagnose_convection(pc: PhysicsConsts, g: Geometry, psa, se, qa, qsat):
    """convection.f90:170-245. Returns (itop, qdif); itop is 1-based level
    index, kx+1 for stable columns."""
    ix, il = psa.shape
    kx = g.kx
    nl1, nlp = kx - 1, kx + 1
    wvi = pc.wvi
    mss = np.zeros((ix, il, kx + 1))          # index 2..kx used (1-based)
    for k in range(2, kx + 1):
        mss[:, :, k] = se[:, :, k - 1] + ALHC * qsat[:, :, k - 1]
    rlhc = 1.0 / ALHC

    itop = np.full((ix, il), nlp, dtype=int)
    qdif = np.zeros((ix, il))

    psa_ok = psa > PSMIN
    mse0 = se[:, :, kx - 1] + ALHC * qa[:, :, kx - 1]
    mse1 = np.minimum(mse0, se[:, :, nl1 - 1] + ALHC * qa[:, :, nl1 - 1])
    mss0 = np.maximum(mse0, mss[:, :, kx])

    ktop1 = np.full((ix, il), kx, dtype=int)
    ktop2 = np.full((ix, il), kx, dtype=int)
    msthr = np.zeros((ix, il))
    for k in range(kx - 3, 2, -1):            # 1-based kx-3 .. 3
        mss2 = mss[:, :, k] + wvi[k - 1, 1] * (mss[:, :, k + 1] - mss[:, :, k])
        c1 = mss0 > mss2
        ktop1 = np.where(c1, k, ktop1)
        c2 = mse1 > mss2
        ktop2 = np.where(c2, k, ktop2)
        msthr = np.where(c2, mss2, msthr)

    qthr0 = RHBL * qsat[:, :, kx - 1]
    qthr1 = RHBL * qsat[:, :, nl1 - 1]
    lqthr = (qa[:, :, kx - 1] > qthr0) & (qa[:, :, nl1 - 1] > qthr1)

    deep = psa_ok & (ktop1 < kx) & (ktop2 < kx)
    shal = psa_ok & (ktop1 < kx) & (ktop2 >= kx) & lqthr
    itop = np.where(deep | shal, ktop1, itop)
    qdif = np.where(deep,
                    np.maximum(qa[:, :, kx - 1] - qthr0,
                               (mse0 - msthr) * rlhc),
                    np.where(shal, qa[:, :, kx - 1] - qthr0, qdif))
    return itop, qdif


def get_convection_tendencies(pc: PhysicsConsts, g: Geometry,
                              psa, se, qa, qsat):
    """convection.f90:27-158. Returns (itop, cbmf, precnv, dfse, dfqa)."""
    ix, il = psa.shape
    kx = g.kx
    nl1, nlp = kx - 1, kx + 1
    fqmax = 5.0
    fm0 = P0 * g.dhs[kx - 1] / (GRAV * TRCNV * 3600.0)
    rdps = 2.0 / (1.0 - PSMIN)
    wvi = pc.wvi

    dfse = np.zeros((ix, il, kx))
    dfqa = np.zeros((ix, il, kx))
    cbmf = np.zeros((ix, il))
    precnv = np.zeros((ix, il))

    entr = np.zeros(kx)                       # entr(2:kx-1), 1-based
    sentr = 0.0
    for k in range(2, nl1 + 1):
        entr[k - 1] = max(0.0, g.fsg[k - 1] - 0.5) ** 2
        sentr += entr[k - 1]
    sentr = ENTMAX / sentr
    entr *= sentr

    itop, qdif = diagnose_convection(pc, g, psa, se, qa, qsat)

    for i, j in zip(*np.nonzero(itop != nlp)):
        # 3.1 boundary layer (cloud base)
        k = kx
        k1 = k - 1
        qmax = max(1.01 * qa[i, j, k - 1], qsat[i, j, k - 1])
        sb = se[i, j, k1 - 1] + wvi[k1 - 1, 1] * (se[i, j, k - 1]
                                                  - se[i, j, k1 - 1])
        qb = qa[i, j, k1 - 1] + wvi[k1 - 1, 1] * (qa[i, j, k - 1]
                                                  - qa[i, j, k1 - 1])
        qb = min(qb, qa[i, j, k - 1])
        fpsa = psa[i, j] * min(1.0, (psa[i, j] - PSMIN) * rdps)
        fmass = fm0 * fpsa * min(fqmax, qdif[i, j] / (qmax - qb))
        cbmf[i, j] = fmass
        fus = fmass * se[i, j, k - 1]
        fuq = fmass * qmax
        fds = fmass * sb
        fdq = fmass * qb
        dfse[i, j, k - 1] = fds - fus
        dfqa[i, j, k - 1] = fdq - fuq

        # 3.2 intermediate layers (entrainment), k = kx-1 .. itop+1
        for k in range(kx - 1, itop[i, j], -1):
            k1 = k - 1
            dfse[i, j, k - 1] = fus - fds
            dfqa[i, j, k - 1] = fuq - fdq
            enmass = entr[k - 1] * psa[i, j] * cbmf[i, j]
            fmass += enmass
            fus += enmass * se[i, j, k - 1]
            fuq += enmass * qa[i, j, k - 1]
            sb = se[i, j, k1 - 1] + wvi[k1 - 1, 1] * (se[i, j, k - 1]
                                                      - se[i, j, k1 - 1])
            qb = qa[i, j, k1 - 1] + wvi[k1 - 1, 1] * (qa[i, j, k - 1]
                                                      - qa[i, j, k1 - 1])
            fds = fmass * sb
            fdq = fmass * qb
            dfse[i, j, k - 1] += fds - fus
            dfqa[i, j, k - 1] += fdq - fuq
            delq = RHIL * qsat[i, j, k - 1] - qa[i, j, k - 1]
            if delq > 0.0:
                fsq = SMF * cbmf[i, j] * delq
                dfqa[i, j, k - 1] += fsq
                dfqa[i, j, kx - 1] -= fsq

        # 3.3 top layer (condensation and detrainment)
        k = itop[i, j]
        qsatb = qsat[i, j, k - 1] + wvi[k - 1, 1] * (qsat[i, j, k]
                                                     - qsat[i, j, k - 1])
        precnv[i, j] = max(fuq - fmass * qsatb, 0.0)
        dfse[i, j, k - 1] = fus - fds + ALHC * precnv[i, j]
        dfqa[i, j, k - 1] = fuq - fdq - precnv[i, j]

    return itop, cbmf, precnv, dfse, dfqa


# ---------------------------------------------------------------------------
# large_scale_condensation.f90
# ---------------------------------------------------------------------------
TRLSC, RHLSC, DRHLSC, RHBLSC = 4.0, 0.9, 0.1, 0.95


def get_lsc_tendencies(g: Geometry, psa, qa, qsat, itop):
    """large_scale_condensation.f90:33-95. Mutates itop; returns
    (itop, precls, dtlsc, dqlsc)."""
    ix, il = psa.shape
    kx = g.kx
    qsmax = 10.0
    rtlsc = 1.0 / (TRLSC * 3600.0)
    tfact = ALHC / CP
    prg = P0 / GRAV
    dtlsc = np.zeros((ix, il, kx))
    dqlsc = np.zeros((ix, il, kx))
    precls = np.zeros((ix, il))
    psa2 = psa ** 2

    for k in range(2, kx + 1):
        sig2 = g.fsg[k - 1] ** 2
        rhref = RHLSC + DRHLSC * (sig2 - 1.0)
        if k == kx:
            rhref = max(rhref, RHBLSC)
        dqmax = qsmax * sig2 * rtlsc
        dqa = rhref * qsat[:, :, k - 1] - qa[:, :, k - 1]
        cond = dqa < 0.0
        itop = np.where(cond, np.minimum(k, itop), itop)
        dqlsc[:, :, k - 1] = np.where(cond, dqa * rtlsc, 0.0)
        dtlsc[:, :, k - 1] = np.where(
            cond, tfact * np.minimum(-dqa * rtlsc, dqmax * psa2), 0.0)

    for k in range(2, kx + 1):
        precls -= g.dhs[k - 1] * prg * dqlsc[:, :, k - 1]
    precls = precls * psa
    return itop, precls, dtlsc, dqlsc


# ---------------------------------------------------------------------------
# shortwave_radiation.f90 constants
# ---------------------------------------------------------------------------
SOLC = 342.0
RHCL1, RHCL2, QACL, WPCL, PMAXCL = 0.30, 1.00, 0.20, 0.2, 10.0
CLSMAX, CLSMINL, GSE_S0, GSE_S1 = 0.60, 0.15, 0.25, 0.40
ALBCL, ALBCLS, EPSSW = 0.43, 0.50, 0.020
ABSDRY, ABSAER, ABSWV1, ABSWV2 = 0.033, 0.033, 0.022, 15.000
ABSCL1, ABSCL2 = 0.015, 0.15
ABLWIN, ABLWV1, ABLWV2, ABLCL1, ABLCL2 = 0.3, 0.7, 50.0, 12.0, 0.6


class Radiation:
    """mod_radcon.f90 state + SW/LW routines; persists tau2/st4a/stratc/
    flux/qcloud/fsol... between calls exactly like the Fortran module."""

    def __init__(self, g: Geometry, ix: int, il: int):
        self.g = g
        kx = g.kx
        self.ablco2 = 6.0
        self.fband = np.zeros((301, 4))       # rows: T = 100..400
        self.fsol = np.zeros((ix, il))
        self.ozone = np.zeros((ix, il))
        self.ozupp = np.zeros((ix, il))
        self.zenit = np.zeros((ix, il))
        self.stratz = np.zeros((ix, il))
        self.qcloud = np.zeros((ix, il))
        self.alb_l = np.zeros((ix, il))
        self.alb_s = np.zeros((ix, il))
        self.albsfc = np.zeros((ix, il))
        self.snowc = np.zeros((ix, il))
        self.tau2 = np.zeros((ix, il, kx, 4))
        self.st4a = np.zeros((ix, il, kx, 2))
        self.stratc = np.zeros((ix, il, 2))
        self.flux = np.zeros((ix, il, 4))

    # -- longwave_radiation.f90:197-220 --
    def radset(self):
        eps1 = 1.0 - EPSLW
        for jtemp in range(200, 321):
            r = jtemp - 100
            self.fband[r, 1] = (0.148 - 3.0e-6 * (jtemp - 247) ** 2) * eps1
            self.fband[r, 2] = (0.356 - 5.2e-6 * (jtemp - 282) ** 2) * eps1
            self.fband[r, 3] = (0.314 + 1.0e-5 * (jtemp - 315) ** 2) * eps1
            self.fband[r, 0] = eps1 - (self.fband[r, 1] + self.fband[r, 2]
                                       + self.fband[r, 3])
        for jb in range(4):
            self.fband[:100, jb] = self.fband[100, jb]
            self.fband[221:, jb] = self.fband[220, jb]

    def _fband_at(self, ta, jb):
        """fband(nint(T), jb) gather; Fortran nint = round-half-away."""
        idx = np.floor(ta + 0.5).astype(int) - 100
        idx = np.clip(idx, 0, 300)
        return self.fband[idx, jb]

    # -- shortwave_radiation.f90:238-284 + 287-329 --
    def get_zonal_average_fields(self, tyear: float):
        g = self.g
        il = g.il
        alpha = 4.0 * np.arcsin(1.0) * (tyear + 10.0 / 365.0)
        dalpha = 0.0
        coz1 = 1.0 * max(0.0, np.cos(alpha - dalpha))
        coz2 = 1.8
        azen, nzen = 1.0, 2
        rzen = -np.cos(alpha) * 23.45 * np.arcsin(1.0) / 90.0
        fs0 = 6.0
        topsr = self._solar(tyear, 4.0 * SOLC)
        for j in range(il):
            flat2 = 1.5 * g.sia[j] ** 2 - 0.5
            self.fsol[:, j] = topsr[j]
            ozupp = 0.5 * EPSSW
            ozone = 0.4 * EPSSW * (1.0 + coz1 * g.sia[j] + coz2 * flat2)
            self.zenit[:, j] = 1.0 + azen * (
                1.0 - (g.coa[j] * np.cos(rzen)
                       + g.sia[j] * np.sin(rzen))) ** nzen
            self.ozupp[:, j] = self.fsol[:, j] * ozupp * self.zenit[:, j]
            self.ozone[:, j] = self.fsol[:, j] * ozone * self.zenit[:, j]
            self.stratz[:, j] = max(fs0 - topsr[j], 0.0)

    def _solar(self, tyear: float, csol: float):
        g = self.g
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
        topsr = np.zeros(g.il)
        for j in range(g.il):
            ch0 = min(1.0, max(-1.0, -tdecl * g.sia[j] / g.coa[j]))
            h0 = np.arccos(ch0)
            topsr[j] = csolp * fdis * (h0 * g.sia[j] * sdecl
                                       + np.sin(h0) * g.coa[j] * cdecl)
        return topsr

    # -- shortwave_radiation.f90:332-410 --
    def clouds(self, qa, rh, precnv, precls, iptop, gse, fmask):
        g = self.g
        kx = g.kx
        nl1, nlp = kx - 1, kx + 1
        rrcl = 1.0 / (RHCL2 - RHCL1)

        cond = rh[:, :, nl1 - 1] > RHCL1
        cloudc = np.where(cond, rh[:, :, nl1 - 1] - RHCL1, 0.0)
        icltop = np.where(cond, nl1, nlp)
        for k in range(3, kx - 1):            # 1-based 3 .. kx-2
            drh = rh[:, :, k - 1] - RHCL1
            better = (drh > cloudc) & (qa[:, :, k - 1] > QACL)
            cloudc = np.where(better, drh, cloudc)
            icltop = np.where(better, k, icltop)

        pr1 = np.minimum(PMAXCL, 86.4 * (precnv + precls))
        cloudc = np.minimum(1.0, WPCL * np.sqrt(pr1)
                            + np.minimum(1.0, cloudc * rrcl) ** 2)
        icltop = np.minimum(iptop, icltop)

        self.qcloud = qa[:, :, nl1 - 1].copy()

        clfact = 1.2
        rgse = 1.0 / (GSE_S1 - GSE_S0)
        fstab = np.maximum(0.0, np.minimum(1.0, rgse * (gse - GSE_S0)))
        clstr = fstab * np.maximum(CLSMAX - clfact * cloudc, 0.0)
        clstrl = np.maximum(clstr, CLSMINL) * rh[:, :, kx - 1]
        clstr = clstr + fmask * (clstrl - clstr)
        return icltop, cloudc, clstr

    # -- shortwave_radiation.f90:74-234 --
    def get_shortwave_rad_fluxes(self, psa, qa, icltop, cloudc, clstr):
        g = self.g
        kx = g.kx
        nl1 = kx - 1
        fband2 = 0.05
        fband1 = 1.0 - fband2
        dhs = g.dhs
        tau2 = self.tau2
        flux = self.flux
        dfabs = np.zeros_like(qa)

        tau2[:] = 0.0
        # cloud albedo deposited at cloud-top level (k index 1-based)
        has_cl = icltop <= kx
        idx = np.where(has_cl, icltop - 1, 0)
        ii, jj = np.meshgrid(np.arange(psa.shape[0]),
                             np.arange(psa.shape[1]), indexing="ij")
        vals = np.where(has_cl, ALBCL * cloudc, 0.0)
        tau2[ii[has_cl], jj[has_cl], idx[has_cl], 2] = vals[has_cl]
        tau2[:, :, kx - 1, 2] = ALBCLS * clstr

        psaz = psa * self.zenit
        acloud = cloudc * np.minimum(ABSCL1 * self.qcloud, ABSCL2)
        tau2[:, :, 0, 0] = np.exp(-psaz * dhs[0] * ABSDRY)
        for k in range(2, nl1 + 1):
            abs1 = ABSDRY + ABSAER * g.fsg[k - 1] ** 2
            in_cloud = k >= icltop
            tau2[:, :, k - 1, 0] = np.where(
                in_cloud,
                np.exp(-psaz * dhs[k - 1]
                       * (abs1 + ABSWV1 * qa[:, :, k - 1] + acloud)),
                np.exp(-psaz * dhs[k - 1]
                       * (abs1 + ABSWV1 * qa[:, :, k - 1])))
        abs1 = ABSDRY + ABSAER * g.fsg[kx - 1] ** 2
        tau2[:, :, kx - 1, 0] = np.exp(
            -psaz * dhs[kx - 1] * (abs1 + ABSWV1 * qa[:, :, kx - 1]))
        for k in range(2, kx + 1):
            tau2[:, :, k - 1, 1] = np.exp(-psaz * dhs[k - 1] * ABSWV2
                                          * qa[:, :, k - 1])

        # 3. downward flux
        ftop = self.fsol.copy()
        flux[:, :, 0] = self.fsol * fband1
        flux[:, :, 1] = self.fsol * fband2

        dfabs[:, :, 0] = flux[:, :, 0]
        flux[:, :, 0] = tau2[:, :, 0, 0] * (flux[:, :, 0]
                                            - self.ozupp * psa)
        dfabs[:, :, 0] -= flux[:, :, 0]

        dfabs[:, :, 1] = flux[:, :, 0]
        flux[:, :, 0] = tau2[:, :, 1, 0] * (flux[:, :, 0]
                                            - self.ozone * psa)
        dfabs[:, :, 1] -= flux[:, :, 0]

        for k in range(3, kx + 1):
            tau2[:, :, k - 1, 2] = flux[:, :, 0] * tau2[:, :, k - 1, 2]
            flux[:, :, 0] = flux[:, :, 0] - tau2[:, :, k - 1, 2]
            dfabs[:, :, k - 1] = flux[:, :, 0]
            flux[:, :, 0] = tau2[:, :, k - 1, 0] * flux[:, :, 0]
            dfabs[:, :, k - 1] -= flux[:, :, 0]

        for k in range(2, kx + 1):
            dfabs[:, :, k - 1] += flux[:, :, 1]
            flux[:, :, 1] = tau2[:, :, k - 1, 1] * flux[:, :, 1]
            dfabs[:, :, k - 1] -= flux[:, :, 1]

        # 4. upward flux
        fsfcd = flux[:, :, 0] + flux[:, :, 1]
        flux[:, :, 0] = flux[:, :, 0] * self.albsfc
        fsfc = fsfcd - flux[:, :, 0]
        for k in range(kx, 0, -1):
            dfabs[:, :, k - 1] += flux[:, :, 0]
            flux[:, :, 0] = tau2[:, :, k - 1, 0] * flux[:, :, 0]
            dfabs[:, :, k - 1] -= flux[:, :, 0]
            flux[:, :, 0] = flux[:, :, 0] + tau2[:, :, k - 1, 2]
        ftop = ftop - flux[:, :, 0]

        # 5. longwave transmissivity initialization (the reference's
        # LW-tau-set-inside-SW quirk, :190-233)
        k = 1
        tau2[:, :, 0, 0] = np.exp(-psa * dhs[0] * ABLWIN)
        tau2[:, :, 0, 1] = np.exp(-psa * dhs[0] * self.ablco2)
        tau2[:, :, 0, 2] = 1.0
        tau2[:, :, 0, 3] = 1.0
        for k in range(2, kx + 1, kx - 2):    # k = 2 and k = kx
            tau2[:, :, k - 1, 0] = np.exp(-psa * dhs[k - 1] * ABLWIN)
            tau2[:, :, k - 1, 1] = np.exp(-psa * dhs[k - 1] * self.ablco2)
            tau2[:, :, k - 1, 2] = np.exp(-psa * dhs[k - 1] * ABLWV1
                                          * qa[:, :, k - 1])
            tau2[:, :, k - 1, 3] = np.exp(-psa * dhs[k - 1] * ABLWV2
                                          * qa[:, :, k - 1])
        acloud = cloudc * ABLCL2
        for k in range(3, nl1 + 1):
            deltap = psa * dhs[k - 1]
            acloud1 = np.where(k < icltop, acloud, ABLCL1 * cloudc)
            tau2[:, :, k - 1, 0] = np.exp(-deltap * (ABLWIN + acloud1))
            tau2[:, :, k - 1, 1] = np.exp(-deltap * self.ablco2)
            tau2[:, :, k - 1, 2] = np.exp(
                -deltap * np.maximum(ABLWV1 * qa[:, :, k - 1], acloud))
            tau2[:, :, k - 1, 3] = np.exp(
                -deltap * np.maximum(ABLWV2 * qa[:, :, k - 1], acloud))

        eps1 = EPSLW / (dhs[0] + dhs[1])
        self.stratc[:, :, 0] = self.stratz * psa
        self.stratc[:, :, 1] = eps1 * psa
        return fsfcd, fsfc, ftop, dfabs

    # -- longwave_radiation.f90:16-117 --
    def get_downward_longwave_rad_fluxes(self, ta):
        g = self.g
        kx = g.kx
        nl1 = kx - 1
        st4a, tau2, flux = self.st4a, self.tau2, self.flux
        wvi = PhysicsConsts(g).wvi  # same table; cheap to rebuild
        dfabs = np.zeros_like(ta)

        for k in range(1, nl1 + 1):
            st4a[:, :, k - 1, 0] = ta[:, :, k - 1] + wvi[k - 1, 1] \
                * (ta[:, :, k] - ta[:, :, k - 1])
        st4a[:, :, 0, 1] = 0.75 * ta[:, :, 0] + 0.25 * st4a[:, :, 0, 0]
        st4a[:, :, 1, 1] = 0.50 * ta[:, :, 1] \
            + 0.25 * (st4a[:, :, 0, 0] + st4a[:, :, 1, 0])
        anis = 1.0
        for k in range(3, nl1 + 1):
            st4a[:, :, k - 1, 1] = 0.5 * anis * np.maximum(
                st4a[:, :, k - 1, 0] - st4a[:, :, k - 2, 0], 0.0)
        st4a[:, :, kx - 1, 1] = anis * np.maximum(
            ta[:, :, kx - 1] - st4a[:, :, nl1 - 1, 0], 0.0)

        for k in range(1, 3):
            st4a[:, :, k - 1, 0] = SBC * st4a[:, :, k - 1, 1] ** 4
            st4a[:, :, k - 1, 1] = 0.0
        for k in range(3, kx + 1):
            st3a = SBC * ta[:, :, k - 1] ** 3
            st4a[:, :, k - 1, 0] = st3a * ta[:, :, k - 1]
            st4a[:, :, k - 1, 1] = 4.0 * st3a * st4a[:, :, k - 1, 1]

        fsfcd = np.zeros(ta.shape[:2])
        # 3.1 stratosphere
        k = 1
        for jb in range(2):
            emis = 1.0 - tau2[:, :, 0, jb]
            brad = self._fband_at(ta[:, :, 0], jb) \
                * (st4a[:, :, 0, 0] + emis * st4a[:, :, 0, 1])
            flux[:, :, jb] = emis * brad
            dfabs[:, :, 0] -= flux[:, :, jb]
        flux[:, :, 2:4] = 0.0

        # 3.2 troposphere
        for jb in range(4):
            for k in range(2, kx + 1):
                emis = 1.0 - tau2[:, :, k - 1, jb]
                brad = self._fband_at(ta[:, :, k - 1], jb) \
                    * (st4a[:, :, k - 1, 0] + emis * st4a[:, :, k - 1, 1])
                dfabs[:, :, k - 1] += flux[:, :, jb]
                flux[:, :, jb] = tau2[:, :, k - 1, jb] * flux[:, :, jb] \
                    + emis * brad
                dfabs[:, :, k - 1] -= flux[:, :, jb]

        for jb in range(4):
            fsfcd += EMISFC * flux[:, :, jb]
        corlw = EPSLW * EMISFC * st4a[:, :, kx - 1, 0]
        dfabs[:, :, kx - 1] -= corlw
        fsfcd += corlw
        return fsfcd, dfabs

    # -- longwave_radiation.f90:120-194 --
    def get_upward_longwave_rad_fluxes(self, ta, ts, fsfcd, fsfcu, dfabs):
        g = self.g
        kx = g.kx
        st4a, tau2, flux = self.st4a, self.tau2, self.flux
        refsfc = 1.0 - EMISFC
        fsfc = fsfcu - fsfcd
        for jb in range(4):
            flux[:, :, jb] = self._fband_at(ts, jb) * fsfcu \
                + refsfc * flux[:, :, jb]
        dfabs[:, :, kx - 1] += EPSLW * fsfcu
        for jb in range(4):
            for k in range(kx, 1, -1):
                emis = 1.0 - tau2[:, :, k - 1, jb]
                brad = self._fband_at(ta[:, :, k - 1], jb) \
                    * (st4a[:, :, k - 1, 0] - emis * st4a[:, :, k - 1, 1])
                dfabs[:, :, k - 1] += flux[:, :, jb]
                flux[:, :, jb] = tau2[:, :, k - 1, jb] * flux[:, :, jb] \
                    + emis * brad
                dfabs[:, :, k - 1] -= flux[:, :, jb]
        for jb in range(2):
            emis = 1.0 - tau2[:, :, 0, jb]
            brad = self._fband_at(ta[:, :, 0], jb) \
                * (st4a[:, :, 0, 0] - emis * st4a[:, :, 0, 1])
            dfabs[:, :, 0] += flux[:, :, jb]
            flux[:, :, jb] = tau2[:, :, 0, jb] * flux[:, :, jb] + emis * brad
            dfabs[:, :, 0] -= flux[:, :, jb]
        corlw1 = g.dhs[0] * self.stratc[:, :, 1] * st4a[:, :, 0, 0] \
            + self.stratc[:, :, 0]
        corlw2 = g.dhs[1] * self.stratc[:, :, 1] * st4a[:, :, 1, 0]
        dfabs[:, :, 0] -= corlw1
        dfabs[:, :, 1] -= corlw2
        ftop = corlw1 + corlw2
        for jb in range(4):
            ftop = ftop + flux[:, :, jb]
        return fsfc, ftop, dfabs


# ---------------------------------------------------------------------------
# surface_fluxes.f90
# ---------------------------------------------------------------------------
FWIND0, FTEMP0, FHUM0 = 0.95, 1.0, 0.0
CDL, CDS_, CHL, CHS_ = 2.4e-3, 1.0e-3, 1.2e-3, 0.9e-3
VGUST, CTDAY, DTHETA, FSTAB_SF, HDRAG = 5.0, 1.0e-2, 3.0, 0.67, 2000.0
CLAMBDA, CLAMBSN = 7.0, 7.0


def set_orog_land_sfc_drag(phi0):
    """surface_fluxes.f90:300-309."""
    rhdrag = 1.0 / (GRAV * HDRAG)
    return 1.0 + rhdrag * (1.0 - np.exp(-np.maximum(phi0, 0.0) * rhdrag))


def get_surface_fluxes(pc: PhysicsConsts, g: Geometry, rad: Radiation,
                       forog, stl_am, soilw_am,
                       psa, ua, va, ta, qa, rh, phi, phi0, fmask, tsea,
                       ssrd, slrd):
    """surface_fluxes.f90:42-296 with lfluxland=.true. (the only path the
    default configuration exercises; the sea-only re-call applies when
    sea_coupling_flag > 0, which the reference `stop`s on at init anyway).

    Returns dict of (ustr, vstr, shf, evap, slru [ix,il,3]; hfluxn [ix,il,2];
    tsfc, tskin, u0, v0, t0)."""
    kx = g.kx
    nl1 = kx - 1
    ix, il = psa.shape
    esbc = EMISFC * SBC

    ustr = np.zeros((ix, il, 3))
    vstr = np.zeros((ix, il, 3))
    shf = np.zeros((ix, il, 3))
    evap = np.zeros((ix, il, 3))
    slru = np.zeros((ix, il, 3))
    hfluxn = np.zeros((ix, il, 2))
    t1 = np.zeros((ix, il, 2))
    t2 = np.zeros((ix, il, 2))
    qsat0 = np.zeros((ix, il, 2))
    q1 = np.zeros((ix, il, 2))
    denvvs = np.zeros((ix, il, 3))
    astab = 0.5                                # lscasym = .true.

    # 1.1 wind
    u0 = FWIND0 * ua[:, :, kx - 1]
    v0 = FWIND0 * va[:, :, kx - 1]

    # 1.2 temperature
    rcp = 1.0 / CP
    dt1 = pc.wvi[kx - 1, 1] * (ta[:, :, kx - 1] - ta[:, :, nl1 - 1])
    t1[:, :, 0] = ta[:, :, kx - 1] + dt1
    t1[:, :, 1] = t1[:, :, 0] - phi0 * dt1 / (RGAS * 288.0
                                              * pc.sigl[kx - 1])
    t2[:, :, 1] = ta[:, :, kx - 1] + rcp * phi[:, :, kx - 1]
    t2[:, :, 0] = t2[:, :, 1] - rcp * phi0
    unstable = ta[:, :, kx - 1] > ta[:, :, nl1 - 1]
    # ftemp0 = 1 so the blend reduces to t1 in the unstable branch
    t1[:, :, 0] = np.where(unstable,
                           FTEMP0 * t1[:, :, 0] + (1 - FTEMP0) * t2[:, :, 0],
                           ta[:, :, kx - 1])
    t1[:, :, 1] = np.where(unstable,
                           FTEMP0 * t1[:, :, 1] + (1 - FTEMP0) * t2[:, :, 1],
                           ta[:, :, kx - 1])
    t0 = t1[:, :, 1] + fmask * (t1[:, :, 0] - t1[:, :, 1])

    # 1.3 density * wind speed
    denvvs[:, :, 0] = (P0 * psa / (RGAS * t0)) \
        * np.sqrt(u0 ** 2 + v0 ** 2 + VGUST ** 2)

    # 2.1 effective skin temperature
    tskin = stl_am + CTDAY * np.sqrt(g.coa)[None, :] * ssrd \
        * (1.0 - rad.alb_l) * psa

    # 2.2 stability correction (land)
    rdth = FSTAB_SF / DTHETA
    dthl = np.where(tskin > t2[:, :, 0],
                    np.minimum(DTHETA, tskin - t2[:, :, 0]),
                    np.maximum(-DTHETA, astab * (tskin - t2[:, :, 0])))
    denvvs[:, :, 1] = denvvs[:, :, 0] * (1.0 + dthl * rdth)

    # 2.3 wind stress (land)
    cdldv = CDL * denvvs[:, :, 0] * forog
    ustr[:, :, 0] = -cdldv * ua[:, :, kx - 1]
    vstr[:, :, 0] = -cdldv * va[:, :, kx - 1]

    # 2.4 sensible heat flux (land)
    chlcp = CHL * CP
    shf[:, :, 0] = chlcp * denvvs[:, :, 1] * (tskin - t1[:, :, 0])

    # 2.5 evaporation (fhum0 = 0 branch)
    q1[:, :, 0] = qa[:, :, kx - 1]
    qsat0[:, :, 0] = get_qsat(tskin, psa, 1.0)
    evap[:, :, 0] = CHL * denvvs[:, :, 1] * np.maximum(
        0.0, soilw_am * qsat0[:, :, 0] - q1[:, :, 0])

    # 3. land energy balance -> skin temperature adjustment
    tsk3 = tskin ** 3
    dslr = 4.0 * esbc * tsk3
    slru[:, :, 0] = esbc * tsk3 * tskin
    hfluxn[:, :, 0] = ssrd * (1.0 - rad.alb_l) + slrd \
        - (slru[:, :, 0] + shf[:, :, 0] + ALHC * evap[:, :, 0])
    clamb = CLAMBDA + rad.snowc * (CLAMBSN - CLAMBDA)
    hfluxn[:, :, 0] -= clamb * (tskin - stl_am)
    dtskin = tskin + 1.0
    qsat0[:, :, 1] = get_qsat(dtskin, psa, 1.0)
    qsat0[:, :, 1] = np.where(evap[:, :, 0] > 0.0,
                              soilw_am * (qsat0[:, :, 1] - qsat0[:, :, 0]),
                              0.0)
    dtskin = hfluxn[:, :, 0] / (clamb + dslr + CHL * denvvs[:, :, 1]
                                * (CP + ALHC * qsat0[:, :, 1]))
    tskin = tskin + dtskin
    shf[:, :, 0] += chlcp * denvvs[:, :, 1] * dtskin
    evap[:, :, 0] += CHL * denvvs[:, :, 1] * qsat0[:, :, 1] * dtskin
    slru[:, :, 0] += dslr * dtskin
    hfluxn[:, :, 0] = clamb * (tskin - stl_am)

    # sea stability correction
    dths = np.where(tsea > t2[:, :, 1],
                    np.minimum(DTHETA, tsea - t2[:, :, 1]),
                    np.maximum(-DTHETA, astab * (tsea - t2[:, :, 1])))
    denvvs[:, :, 2] = denvvs[:, :, 0] * (1.0 + dths * rdth)
    q1[:, :, 1] = qa[:, :, kx - 1]

    # 4.2 wind stress (sea)
    cdsdv = CDS_ * denvvs[:, :, 2]
    ustr[:, :, 1] = -cdsdv * ua[:, :, kx - 1]
    vstr[:, :, 1] = -cdsdv * va[:, :, kx - 1]

    # 4.3-4.5 sea fluxes. NB the reference's sea hfluxn uses +shf +evap
    # (surface_fluxes.f90:278) — sign quirk reproduced
    shf[:, :, 1] = CHS_ * CP * denvvs[:, :, 2] * (tsea - t1[:, :, 1])
    qsat0[:, :, 1] = get_qsat(tsea, psa, 1.0)
    evap[:, :, 1] = CHS_ * denvvs[:, :, 2] * (qsat0[:, :, 1] - q1[:, :, 1])
    slru[:, :, 1] = esbc * tsea ** 4
    hfluxn[:, :, 1] = ssrd * (1.0 - rad.alb_s) + slrd - slru[:, :, 1] \
        + shf[:, :, 1] + ALHC * evap[:, :, 1]

    # weighted averages
    for a in (ustr, vstr, shf, evap, slru):
        a[:, :, 2] = a[:, :, 1] + fmask * (a[:, :, 0] - a[:, :, 1])
    tsfc = tsea + fmask * (stl_am - tsea)
    tskin = tsea + fmask * (tskin - tsea)
    t0 = t1[:, :, 1] + fmask * (t1[:, :, 0] - t1[:, :, 1])

    return dict(ustr=ustr, vstr=vstr, shf=shf, evap=evap, slru=slru,
                hfluxn=hfluxn, tsfc=tsfc, tskin=tskin, u0=u0, v0=v0, t0=t0)


# ---------------------------------------------------------------------------
# vertical_diffusion.f90
# ---------------------------------------------------------------------------
TRSHC, TRVDI, TRVDS, REDSHC, RHGRAD, SEGRAD = 6.0, 24.0, 6.0, 0.5, 0.5, 0.1


def get_vertical_diffusion_tend(pc: PhysicsConsts, g: Geometry,
                                se, rh, qa, qsat, phi, icnv):
    """vertical_diffusion.f90:30-143."""
    kx = g.kx
    nl1 = kx - 1
    ix, il = se.shape[:2]
    cshc = g.dhs[kx - 1] / 3600.0
    cvdi = (pc.sigh[nl1] - pc.sigh[1]) / ((nl1 - 1) * 3600.0)
    fshcq = cshc / TRSHC
    fshcse = cshc / (TRSHC * CP)
    fvdiq = cvdi / TRVDI
    fvdise = cvdi / (TRVDS * CP)
    rsig = 1.0 / g.dhs
    rsig1 = np.zeros(kx)
    # rsig1(k) = 1/(1 - sigh(k)), k = 1..nl1 (vertical_diffusion.f90:69);
    # sigh is the 0:kx half-level array, so 1-based k indexes pc.sigh[k]
    rsig1[:nl1] = 1.0 / (1.0 - pc.sigh[1:nl1 + 1])

    utenvd = np.zeros((ix, il, kx))
    vtenvd = np.zeros((ix, il, kx))
    ttenvd = np.zeros((ix, il, kx))
    qtenvd = np.zeros((ix, il, kx))

    # 2. shallow convection
    drh0 = RHGRAD * (g.fsg[kx - 1] - g.fsg[nl1 - 1])
    fvdiq2 = fvdiq * pc.sigh[nl1]
    dmse = se[:, :, kx - 1] - se[:, :, nl1 - 1] \
        + ALHC * (qa[:, :, kx - 1] - qsat[:, :, nl1 - 1])
    drh = rh[:, :, kx - 1] - rh[:, :, nl1 - 1]
    fcnv = np.where(icnv > 0, REDSHC, 1.0)
    shallow = dmse >= 0.0
    fluxse = np.where(shallow, fcnv * fshcse * dmse, 0.0)
    ttenvd[:, :, nl1 - 1] = fluxse * rsig[nl1 - 1]
    ttenvd[:, :, kx - 1] = -fluxse * rsig[kx - 1]
    moist = shallow & (drh >= 0.0)
    fluxq = np.where(moist, fcnv * fshcq * qsat[:, :, kx - 1] * drh, 0.0)
    dry_diff = (~shallow) & (drh > drh0)
    fluxq = np.where(dry_diff, fvdiq2 * qsat[:, :, nl1 - 1] * drh, fluxq)
    qtenvd[:, :, nl1 - 1] = fluxq * rsig[nl1 - 1]
    qtenvd[:, :, kx - 1] = -fluxq * rsig[kx - 1]

    # 3. moisture diffusion above the PBL
    for k in range(3, kx - 1):                # 1-based 3 .. kx-2
        if pc.sigh[k] > 0.5:
            drh0 = RHGRAD * (g.fsg[k] - g.fsg[k - 1])
            fvdiq2 = fvdiq * pc.sigh[k]
            drh = rh[:, :, k] - rh[:, :, k - 1]
            act = drh >= drh0
            fluxq = np.where(act, fvdiq2 * qsat[:, :, k - 1] * drh, 0.0)
            qtenvd[:, :, k - 1] += fluxq * rsig[k - 1]
            qtenvd[:, :, k] -= fluxq * rsig[k]

    # 4. super-adiabatic damping (with the downward-compensation loop)
    for k in range(1, nl1 + 1):
        se0 = se[:, :, k] + SEGRAD * (phi[:, :, k - 1] - phi[:, :, k])
        act = se[:, :, k - 1] < se0
        fluxse = np.where(act, fvdise * (se0 - se[:, :, k - 1]), 0.0)
        ttenvd[:, :, k - 1] += fluxse * rsig[k - 1]
        for k1 in range(k + 1, kx + 1):
            ttenvd[:, :, k1 - 1] -= fluxse * rsig1[k - 1]
    return utenvd, vtenvd, ttenvd, qtenvd
