"""Loop-literal NumPy transliteration of the reference dynamical core:
matrix_inversion.f90, geopotential.f90, implicit.f90,
horizontal_diffusion.f90, tendencies.f90, time_stepping.f90,
prognostics.f90 (rest state), diagnostics.f90.

TEST-ONLY ORACLE — see transforms.py header. Fortran (ix, il)/(mx, nx)
layout, complex128 spectral state, k-loops kept literal.
"""
from __future__ import annotations

import numpy as np

from .transforms import (AKAP, GAMMA, GRAV, HSCALE, HSHUM, RGAS, REARTH,
                         REFRH1, TDRS, THD, THDD, THDS, Geometry, Spectral)


# ---------------------------------------------------------------------------
# matrix_inversion.f90 — Numerical-Recipes LU inverse (used only at setup)
# ---------------------------------------------------------------------------
def ludcmp(a: np.ndarray):
    """matrix_inversion.f90:10-80. Returns (lu, indx, d)."""
    n = a.shape[0]
    a = a.copy()
    indx = np.zeros(n, dtype=int)
    vv = np.zeros(n)
    d = 1.0
    tiny = 1.0e-20
    for i in range(n):
        aamax = np.abs(a[i, :]).max()
        if aamax == 0.0:
            raise ZeroDivisionError("singular matrix")
        vv[i] = 1.0 / aamax
    for j in range(n):
        for i in range(j):
            s = a[i, j]
            for k in range(i):
                s -= a[i, k] * a[k, j]
            a[i, j] = s
        aamax = 0.0
        imax = j
        for i in range(j, n):
            s = a[i, j]
            for k in range(j):
                s -= a[i, k] * a[k, j]
            a[i, j] = s
            dum = vv[i] * abs(s)
            if dum >= aamax:
                imax = i
                aamax = dum
        if j != imax:
            a[[imax, j], :] = a[[j, imax], :]
            d = -d
            vv[imax] = vv[j]
        indx[j] = imax
        if a[j, j] == 0.0:
            a[j, j] = tiny
        if j != n - 1:
            a[j + 1:, j] /= a[j, j]
    return a, indx, d


def lubksb(lu: np.ndarray, indx: np.ndarray, b: np.ndarray) -> np.ndarray:
    """matrix_inversion.f90:82-113."""
    n = lu.shape[0]
    b = b.copy()
    ii = -1
    for i in range(n):
        ll = indx[i]
        s = b[ll]
        b[ll] = b[i]
        if ii >= 0:
            for jj in range(ii, i):
                s -= lu[i, jj] * b[jj]
        elif s != 0.0:
            ii = i
        b[i] = s
    for i in range(n - 1, -1, -1):
        s = b[i]
        for jj in range(i + 1, n):
            s -= lu[i, jj] * b[jj]
        b[i] = s / lu[i, i]
    return b


def matinv(a: np.ndarray) -> np.ndarray:
    """matrix_inversion.f90:115-133."""
    n = a.shape[0]
    lu, indx, _ = ludcmp(a)
    out = np.zeros((n, n))
    for j in range(n):
        e = np.zeros(n)
        e[j] = 1.0
        out[:, j] = lubksb(lu, indx, e)
    return out


# ---------------------------------------------------------------------------
# geopotential.f90
# ---------------------------------------------------------------------------
class Geopotential:
    def __init__(self, g: Geometry):
        kx = g.kx
        self.g = g
        self.xgeop1 = np.zeros(kx)
        self.xgeop2 = np.zeros(kx)
        for k in range(1, kx + 1):
            self.xgeop1[k - 1] = RGAS * np.log(g.hsg[k] / g.fsg[k - 1])
            if k != kx:
                self.xgeop2[k] = RGAS * np.log(g.fsg[k] / g.hsg[k])

    def get_geopotential(self, t: np.ndarray, phis: np.ndarray) -> np.ndarray:
        """geopotential.f90:33-57; t is (mx, nx, kx) complex."""
        g, kx = self.g, self.g.kx
        phi = np.zeros_like(t)
        phi[:, :, kx - 1] = phis + self.xgeop1[kx - 1] * t[:, :, kx - 1]
        for k in range(kx - 1, 0, -1):           # 1-based kx-1 .. 1
            phi[:, :, k - 1] = (phi[:, :, k] + self.xgeop2[k] * t[:, :, k]
                                + self.xgeop1[k - 1] * t[:, :, k - 1])
        # lapse-rate correction on m=1 (zonal) coefficients only (:53-56)
        for k in range(2, kx):                   # 1-based 2 .. kx-1
            corf = self.xgeop1[k - 1] * 0.5 \
                * np.log(g.hsg[k] / g.fsg[k - 1]) \
                / np.log(g.fsg[k] / g.fsg[k - 2])
            phi[0, :, k - 1] = phi[0, :, k - 1] \
                + corf * (t[0, :, k] - t[0, :, k - 2])
        return phi


# ---------------------------------------------------------------------------
# horizontal_diffusion.f90
# ---------------------------------------------------------------------------
class Diffusion:
    def __init__(self, trunc: int, mx: int, nx: int, g: Geometry,
                 nsteps: int):
        if nsteps % 2 != 0:
            raise ValueError("Invalid no. of time steps")
        npowhd = 4
        hdiff = 1.0 / (THD * 3600.0)
        hdifd = 1.0 / (THDD * 3600.0)
        hdifs = 1.0 / (THDS * 3600.0)
        rlap = 1.0 / float(trunc * (trunc + 1))
        self.dmp = np.zeros((mx, nx))
        self.dmpd = np.zeros((mx, nx))
        self.dmps = np.zeros((mx, nx))
        for jn in range(1, nx + 1):
            for km in range(1, mx + 1):
                twn = float(km + jn - 2)
                elap = twn * (twn + 1.0) * rlap
                elapn = elap ** npowhd
                self.dmp[km - 1, jn - 1] = hdiff * elapn
                self.dmpd[km - 1, jn - 1] = hdifd * elapn
                self.dmps[km - 1, jn - 1] = hdifs * elap
        # orographic-correction vertical profiles (:69-81)
        kx = g.kx
        rgam = RGAS * GAMMA / (1000.0 * GRAV)
        qexp = HSCALE / HSHUM
        self.tcorv = np.zeros(kx)
        self.qcorv = np.zeros(kx)
        for k in range(2, kx + 1):
            self.tcorv[k - 1] = g.fsg[k - 1] ** rgam
            if k > 2:
                self.qcorv[k - 1] = g.fsg[k - 1] ** qexp
        # horizontal parts, set daily by set_forcing (forcing.f90:82,99)
        self.tcorh = np.zeros((mx, nx), dtype=np.complex128)
        self.qcorh = np.zeros((mx, nx), dtype=np.complex128)
        # implicit factors, set by initialize_implicit
        self.dmp1 = np.zeros((mx, nx))
        self.dmp1d = np.zeros((mx, nx))
        self.dmp1s = np.zeros((mx, nx))

    @staticmethod
    def apply(field, fdt_in, dmp, dmp1):
        """horizontal_diffusion.f90:86-106 (2d/3d overloads)."""
        if field.ndim == 3:
            return (fdt_in - dmp[:, :, None] * field) * dmp1[:, :, None]
        return (fdt_in - dmp * field) * dmp1


# ---------------------------------------------------------------------------
# implicit.f90
# ---------------------------------------------------------------------------
class Implicit:
    def __init__(self, mx: int, nx: int, kx: int, alph: float):
        self.mx, self.nx, self.kx = mx, nx, kx
        self.alph = alph

    def initialize(self, dt: float, g: Geometry, hd: Diffusion):
        """implicit.f90:38-166 (also refreshes hd.dmp1*)."""
        mx, nx, kx = self.mx, self.nx, self.kx
        hd.dmp1 = 1.0 / (1.0 + hd.dmp * dt)
        hd.dmp1d = 1.0 / (1.0 + hd.dmpd * dt)
        hd.dmp1s = 1.0 / (1.0 + hd.dmps * dt)

        rgam = RGAS * GAMMA / (1000.0 * GRAV)
        self.tref = 288.0 * np.maximum(0.2, g.fsg) ** rgam
        self.tref1 = RGAS * self.tref
        self.tref2 = AKAP * self.tref
        self.tref3 = g.fsgr * self.tref

        xi = dt * self.alph
        xxi = xi / (REARTH * REARTH)
        self.dhsx = xi * g.dhs
        self.elz = np.zeros((mx, nx))
        for n in range(1, nx + 1):
            for m in range(1, mx + 1):
                self.elz[m - 1, n - 1] = float(m + n - 2) \
                    * float(m + n - 1) * xxi

        ya = np.zeros((kx, kx))
        xa = np.zeros((kx, kx))
        for k in range(kx):
            for k1 in range(kx):
                ya[k, k1] = -AKAP * self.tref[k] * g.dhs[k1]
        for k in range(2, kx + 1):
            xa[k - 1, k - 2] = 0.5 * (AKAP * self.tref[k - 1] / g.fsg[k - 1]
                                      - (self.tref[k - 1] - self.tref[k - 2])
                                      / g.dhs[k - 1])
        for k in range(1, kx):
            xa[k - 1, k - 1] = 0.5 * (AKAP * self.tref[k - 1] / g.fsg[k - 1]
                                      - (self.tref[k] - self.tref[k - 1])
                                      / g.dhs[k - 1])
        # sig(k) = xb(k,k')*d(k')
        dsum = np.cumsum(g.dhs)
        xb = np.zeros((kx, kx))
        for k in range(1, kx):
            for k1 in range(1, kx + 1):
                xb[k - 1, k1 - 1] = g.dhs[k1 - 1] * dsum[k - 1]
                if k1 <= k:
                    xb[k - 1, k1 - 1] -= g.dhs[k1 - 1]
        # t(k) = tex(k) + xc(k,k')*d(k')
        xc = np.zeros((kx, kx))
        for k in range(kx):
            for k1 in range(kx):
                xc[k, k1] = ya[k, k1]
                for k2 in range(kx - 1):
                    xc[k, k1] += xa[k, k2] * xb[k2, k1]
        # P(K)=XD(K,K')*T(K')
        xd = np.zeros((kx, kx))
        for k in range(1, kx + 1):
            for k1 in range(k + 1, kx + 1):
                xd[k - 1, k1 - 1] = RGAS * np.log(g.hsg[k1] / g.hsg[k1 - 1])
        for k in range(1, kx + 1):
            xd[k - 1, k - 1] = RGAS * np.log(g.hsg[k] / g.fsg[k - 1])
        # P(K)=YE(K)+XE(K,K')*D(K')
        xe = np.zeros((kx, kx))
        for k in range(kx):
            for k1 in range(kx):
                for k2 in range(kx):
                    xe[k, k1] += xd[k, k2] * xc[k2, k1]

        self.xj = np.zeros((kx, kx, mx + nx + 1))
        for l in range(1, mx + nx + 2):
            xxx = (float(l) * float(l + 1)) / (REARTH * REARTH)
            xf = xi * xi * xxx * (np.outer(RGAS * self.tref, g.dhs) - xe)
            xf[np.diag_indices(kx)] += 1.0
            self.xj[:, :, l - 1] = matinv(xf)

        self.xc = xc * xi
        self.xd = xd

    def implicit_terms(self, divdt, tdt, psdt):
        """implicit.f90:168-217. Mutates and returns (divdt, tdt, psdt)."""
        mx, nx, kx = self.mx, self.nx, self.kx
        ye = np.zeros_like(tdt)
        for k1 in range(kx):
            for k in range(kx):
                ye[:, :, k] += self.xd[k, k1] * tdt[:, :, k1]
        for k in range(kx):
            ye[:, :, k] += self.tref1[k] * psdt
        yf = divdt + self.elz[:, :, None] * ye
        divdt = np.zeros_like(divdt)
        for n in range(1, nx + 1):
            for m in range(1, mx + 1):
                if (m + n - 2) != 0:
                    for k1 in range(kx):
                        divdt[m - 1, n - 1, :] += \
                            self.xj[:, k1, m + n - 3] * yf[m - 1, n - 1, k1]
        for k in range(kx):
            psdt = psdt - divdt[:, :, k] * self.dhsx[k]
        for k in range(kx):
            for k1 in range(kx):
                tdt[:, :, k] = tdt[:, :, k] + self.xc[k, k1] * divdt[:, :, k1]
        return divdt, tdt, psdt


# ---------------------------------------------------------------------------
# diagnostics.f90
# ---------------------------------------------------------------------------
def check_diagnostics(sp: Spectral, vor, div, t, istep: int):
    """diagnostics.f90:17-75. Returns (reke[kx], deke[kx], tmean[kx]);
    raises RuntimeError when outside the accepted ranges."""
    kx = vor.shape[2]
    diag = np.zeros((kx, 3))
    for k in range(kx):
        diag[k, 2] = np.sqrt(0.5) * t[0, 0, k].real
        temp = sp.inverse_laplacian(vor[:, :, k])
        diag[k, 0] = -np.sum((temp[1:, :] * np.conj(vor[1:, :, k])).real)
        temp = sp.inverse_laplacian(div[:, :, k])
        diag[k, 1] = -np.sum((temp[1:, :] * np.conj(div[1:, :, k])).real)
    for k in range(kx):
        if (diag[k, 0] > 500.0 or diag[k, 1] > 500.0
                or diag[k, 2] < 180.0 or diag[k, 2] > 320.0):
            raise RuntimeError(
                f"oracle: model variables out of accepted range at step "
                f"{istep}: {diag[k]}")
    return diag
