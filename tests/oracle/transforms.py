"""Loop-literal NumPy transliteration of the reference's spectral-transform
layer: geometry.f90, legendre.f90, fourier.f90, spectral.f90.

TEST-ONLY ORACLE. This is an independent second implementation of the
reference algorithms (Fortran file:line cited throughout), structured like
the Fortran (per-latitude loops, packed-real Legendre tables, banded n+-1
operators) rather than like the production JAX code (batched einsum chains).
It exists so `tests/test_fortran_oracle.py` can diff the production model
step-by-step against an engine whose only design goal is fidelity.

Layout convention: Fortran (ix, il) / (mx, nx) array order, float64 /
complex128 throughout, 0-based indices (translation noted where offsets
matter). The one deliberate substitution: FFTPACK's rfftf1/rfftb1 butterfly
kernels (fftpack.f90) are replaced by np.fft.rfft/irfft, which compute the
same DFT to roundoff; the FFTPACK coefficient *packing* of fourier.f90:56-82
is reproduced exactly.
"""
from __future__ import annotations

import numpy as np

# physical_constants.f90:16-29
REARTH = 6.371e6
OMEGA = 7.292e-5
GRAV = 9.81
P0 = 1.0e5
CP = 1004.0
AKAP = 2.0 / 7.0
RGAS = AKAP * CP
ALHC = 2501.0
ALHS = 2801.0
SBC = 5.67e-8

# dynamical_constants.f90:12-23
GAMMA = 6.0
HSCALE = 7.5
HSHUM = 2.5
REFRH1 = 0.7
THD = 2.4
THDD = 2.4
THDS = 12.0
TDRS = 24.0 * 30.0


class Geometry:
    """geometry.f90: vertical sigma tables + Gaussian-seed latitudes."""

    def __init__(self, kx: int, ix: int, il: int):
        self.kx, self.ix, self.il = kx, ix, il
        iy = il // 2
        self.iy = iy
        # geometry.f90:42-49 half sigma levels
        if kx == 5:
            hsg = [0.000, 0.150, 0.350, 0.650, 0.900, 1.000]
        elif kx == 7:
            hsg = [0.020, 0.140, 0.260, 0.420, 0.600, 0.770, 0.900, 1.000]
        elif kx == 8:
            hsg = [0.000, 0.050, 0.140, 0.260, 0.420, 0.600, 0.770, 0.900,
                   1.000]
        else:
            raise ValueError(kx)
        self.hsg = np.array(hsg)
        # geometry.f90:52-60
        self.dhs = self.hsg[1:] - self.hsg[:-1]
        self.fsg = 0.5 * (self.hsg[1:] + self.hsg[:-1])
        self.dhsr = 0.5 / self.dhs
        self.fsgr = AKAP / (2.0 * self.fsg)
        # geometry.f90:66-87 — NB sia_half is the *non-iterated* asymptotic
        # seed cos(pi(j-1/4)/(il+1/2)), a deliberate reference quirk
        j = np.arange(1, iy + 1, dtype=np.float64)
        self.sia_half = np.cos(3.141592654 * (j - 0.25) / (il + 0.5))
        self.coa_half = np.sqrt(1.0 - self.sia_half ** 2)
        self.sia = np.zeros(il)
        self.coa = np.zeros(il)
        self.radang = np.zeros(il)
        self.sia[:iy] = -self.sia_half
        self.sia[iy:] = self.sia_half[::-1]
        self.coa[:iy] = self.coa_half
        self.coa[iy:] = self.coa_half[::-1]
        self.radang[:iy] = -np.arcsin(self.sia_half)
        self.radang[iy:] = np.arcsin(self.sia_half)[::-1]
        self.cosg = self.coa.copy()
        self.cosgr = 1.0 / self.coa
        self.cosgr2 = 1.0 / self.coa ** 2
        self.coriol = 2.0 * OMEGA * self.sia


def gaussian_weights(iy: int) -> np.ndarray:
    """Newton-iterated Gaussian quadrature weights (legendre.f90:161-191)."""
    n = 2 * iy
    w = np.zeros(iy)
    for i in range(1, iy + 1):
        z = np.cos(3.141592654 * (i - 0.25) / (n + 0.5))
        z1 = 2.0
        while abs(z - z1) > np.finfo(np.float64).eps:
            p1, p2 = 1.0, 0.0
            for jj in range(1, n + 1):
                p3 = p2
                p2 = p1
                p1 = ((2.0 * jj - 1.0) * z * p2 - (jj - 1.0) * p3) / jj
            pp = n * (z * p1 - p2) / (z ** 2 - 1.0)
            z1 = z
            z = z1 - p1 / pp
        w[i - 1] = 2.0 / ((1.0 - z ** 2) * pp ** 2)
    return w


class Spectral:
    """legendre.f90 + fourier.f90 + spectral.f90 constants and transforms."""

    def __init__(self, trunc: int, ix: int, il: int, geom: Geometry):
        self.trunc, self.ix, self.il = trunc, ix, il
        mx, nx, iy = trunc + 1, trunc + 2, il // 2
        self.mx, self.nx, self.iy = mx, nx, iy
        g = geom

        self.wt = gaussian_weights(iy)

        # nsh2(n): 2x number of m-entries within the l<=trunc+1 triangle
        # (legendre.f90:34-41)
        self.nsh2 = np.zeros(nx, dtype=int)
        for n in range(1, nx + 1):
            for m in range(1, mx + 1):
                l = (m - 1) + n - 1
                if l <= trunc + 1 or ix != 4 * iy:
                    self.nsh2[n - 1] += 2

        # epsi/repsi recurrence coefficients (legendre.f90:43-57)
        epsi = np.zeros((mx + 1, nx + 1))
        repsi = np.zeros((mx + 1, nx + 1))
        for m in range(1, mx + 2):
            for n in range(1, nx + 2):
                emm2 = float(m - 1) ** 2
                ell2 = float(n + m - 2) ** 2
                if n == nx + 1:
                    epsi[m - 1, n - 1] = 0.0
                elif n == 1 and m == 1:
                    epsi[m - 1, n - 1] = 0.0
                else:
                    epsi[m - 1, n - 1] = np.sqrt((ell2 - emm2)
                                                 / (4.0 * ell2 - 1.0))
                if epsi[m - 1, n - 1] > 0.0:
                    repsi[m - 1, n - 1] = 1.0 / epsi[m - 1, n - 1]
        self.epsi, self.repsi = epsi, repsi

        # associated Legendre polynomials, duplicated re/im
        # (legendre.f90:59-70, 194-237)
        self.cpol = np.zeros((2 * mx, nx, iy))
        for j in range(1, iy + 1):
            poly = self._legendre_poly(j, g)
            self.cpol[0::2, :, j - 1] = poly
            self.cpol[1::2, :, j - 1] = poly

        # packed-real triangle mask: entry (mr, n) participates in Legendre
        # sums iff mr < nsh2(n) (legendre.f90:92-103 loop bounds)
        self.shmask = np.zeros((2 * mx, nx))
        for n in range(nx):
            self.shmask[:self.nsh2[n], n] = 1.0

        # spectral.f90:41-57 wavenumber arrays
        m0 = np.arange(mx, dtype=np.float64)[:, None]
        n0 = np.arange(nx, dtype=np.float64)[None, :]
        ltot = m0 + n0  # l = (m-1)+(n-1) with 1-based m,n
        self.el2 = ltot * (ltot + 1.0) / REARTH ** 2
        self.el4 = self.el2 ** 2
        self.trfilt = np.where(ltot <= trunc, 1.0, 0.0)
        self.elm2 = np.zeros((mx, nx))
        self.elm2[1:, :] = 1.0 / self.el2[1:, :]
        self.elm2[0, 1:] = 1.0 / self.el2[0, 1:]
        self.elm2[0, 0] = 0.0

        # spectral.f90:61-81 gradient / uv coupling coefficients
        self.gradx = np.zeros(mx)
        self.gradym = np.zeros((mx, nx))
        self.gradyp = np.zeros((mx, nx))
        self.uvdx = np.zeros((mx, nx))
        self.uvdym = np.zeros((mx, nx))
        self.uvdyp = np.zeros((mx, nx))
        self.vddym = np.zeros((mx, nx))
        self.vddyp = np.zeros((mx, nx))
        # NB the Fortran's index variable m2 = m1+1 has the same VALUE as the
        # 1-based index m, so epsi(m2, n) is epsi[m-1, n-1] 0-based and
        # epsi(m2, n+1) is epsi[m-1, n]
        for m in range(1, mx + 1):
            for n in range(1, nx + 1):
                m1 = m - 1          # zonal wavenumber
                el1 = float(m1 + n - 1)
                if n == 1:
                    self.gradx[m - 1] = float(m1) / REARTH
                    self.uvdx[m - 1, 0] = -REARTH / float(m1 + 1)
                    self.uvdym[m - 1, 0] = 0.0
                    self.vddym[m - 1, 0] = 0.0
                else:
                    self.uvdx[m - 1, n - 1] = -REARTH * m1 / (el1 * (el1 + 1))
                    self.gradym[m - 1, n - 1] = (el1 - 1.0) \
                        * epsi[m - 1, n - 1] / REARTH
                    self.uvdym[m - 1, n - 1] = -REARTH \
                        * epsi[m - 1, n - 1] / el1
                    self.vddym[m - 1, n - 1] = (el1 + 1) \
                        * epsi[m - 1, n - 1] / REARTH
                self.gradyp[m - 1, n - 1] = (el1 + 2.0) \
                    * epsi[m - 1, n] / REARTH
                self.uvdyp[m - 1, n - 1] = -REARTH * epsi[m - 1, n] \
                    / (el1 + 1.0)
                self.vddyp[m - 1, n - 1] = el1 * epsi[m - 1, n] / REARTH

        self._geom = g

    def _legendre_poly(self, j: int, g: Geometry) -> np.ndarray:
        """legendre.f90:194-237 at half-latitude j (1-based)."""
        mx, nx = self.mx, self.nx
        small = 1.0e-30
        y = g.coa_half[j - 1]
        x = g.sia_half[j - 1]
        consq = np.zeros(mx)
        for m in range(1, mx + 1):
            consq[m - 1] = np.sqrt(0.5 * (2.0 * m + 1.0) / m)
        alp = np.zeros((mx + 1, nx))
        alp[0, 0] = np.sqrt(0.5)
        for m in range(2, mx + 2):
            alp[m - 1, 0] = consq[m - 2] * y * alp[m - 2, 0]
        for m in range(1, mx + 2):
            alp[m - 1, 1] = (x * alp[m - 1, 0]) * self.repsi[m - 1, 1]
        for n in range(3, nx + 1):
            for m in range(1, mx + 2):
                alp[m - 1, n - 1] = (x * alp[m - 1, n - 2]
                                     - self.epsi[m - 1, n - 2]
                                     * alp[m - 1, n - 3]) \
                    * self.repsi[m - 1, n - 1]
        alp[np.abs(alp) <= small] = 0.0
        return alp[:mx, :nx]

    # ---------------- Legendre transforms (legendre.f90:74-155) -----------
    def legendre_inv(self, inp: np.ndarray) -> np.ndarray:
        """(2mx, nx) packed-real -> (2mx, il)."""
        out = np.zeros((2 * self.mx, self.il))
        masked = inp * self.shmask
        for j in range(1, self.iy + 1):
            j1 = self.il + 1 - j
            cp = self.cpol[:, :, j - 1]
            even = (masked[:, 0::2] * cp[:, 0::2]).sum(axis=1)
            odd = (masked[:, 1::2] * cp[:, 1::2]).sum(axis=1)
            out[:, j1 - 1] = even + odd
            out[:, j - 1] = even - odd
        return out

    def legendre_dir(self, inp: np.ndarray) -> np.ndarray:
        """(2mx, il) -> (2mx, nx); Gaussian weights folded in."""
        iy, il = self.iy, self.il
        even = np.zeros((2 * self.mx, iy))
        odd = np.zeros((2 * self.mx, iy))
        for j in range(1, iy + 1):
            j1 = il + 1 - j
            even[:, j - 1] = (inp[:, j1 - 1] + inp[:, j - 1]) * self.wt[j - 1]
            odd[:, j - 1] = (inp[:, j1 - 1] - inp[:, j - 1]) * self.wt[j - 1]
        out = np.zeros((2 * self.mx, self.nx))
        # n = 1..trunc+1 (1-based), parity of n-1 (legendre.f90:139-155)
        for n in range(1, self.trunc + 2):
            src = even if (n - 1) % 2 == 0 else odd
            lim = self.nsh2[n - 1]
            out[:lim, n - 1] = (self.cpol[:lim, n - 1, :]
                                * src[:lim, :]).sum(axis=1)
        return out

    # ---------------- Fourier transforms (fourier.f90:23-82) --------------
    def fourier_inv(self, inp: np.ndarray, kcos: int) -> np.ndarray:
        """(2mx, il) packed coeffs -> (ix, il) grid; kcos=2 scales 1/cos."""
        ix, il, mx = self.ix, self.il, self.mx
        out = np.zeros((ix, il))
        for j in range(il):
            c = np.zeros(ix // 2 + 1, dtype=np.complex128)
            c[0] = inp[0, j]                      # a(0); imag slot dropped
            c[1:mx] = inp[2:2 * mx:2, j] + 1j * inp[3:2 * mx:2, j]
            grid = np.fft.irfft(c, n=ix) * ix
            if kcos == 1:
                out[:, j] = grid
            else:
                out[:, j] = grid * self._geom.cosgr[j]
        return out

    def fourier_dir(self, inp: np.ndarray) -> np.ndarray:
        """(ix, il) grid -> (2mx, il) packed coeffs, scaled by 1/ix."""
        ix, il, mx = self.ix, self.il, self.mx
        out = np.zeros((2 * mx, il))
        for j in range(il):
            c = np.fft.rfft(inp[:, j]) / ix
            out[0, j] = c[0].real
            out[1, j] = 0.0
            out[2:2 * mx:2, j] = c[1:mx].real
            out[3:2 * mx:2, j] = c[1:mx].imag
        return out

    # ---------------- spectral.f90 operators ------------------------------
    @staticmethod
    def _c2r(spec: np.ndarray) -> np.ndarray:
        out = np.empty((2 * spec.shape[0], spec.shape[1]))
        out[0::2] = spec.real
        out[1::2] = spec.imag
        return out

    @staticmethod
    def _r2c(packed: np.ndarray) -> np.ndarray:
        return packed[0::2] + 1j * packed[1::2]

    def laplacian(self, inp):
        return -inp * self.el2

    def inverse_laplacian(self, inp):
        return -inp * self.elm2

    def spec_to_grid(self, vorm: np.ndarray, kcos: int) -> np.ndarray:
        return self.fourier_inv(self.legendre_inv(self._c2r(vorm)), kcos)

    def grid_to_spec(self, vorg: np.ndarray) -> np.ndarray:
        return self._r2c(self.legendre_dir(self.fourier_dir(vorg)))

    def grad(self, psi):
        """spectral.f90:129-147."""
        nx, trunc = self.nx, self.trunc
        psdx = self.gradx[:, None] * psi * 1j
        psdy = np.zeros_like(psi)
        psdy[:, 0] = self.gradyp[:, 0] * psi[:, 1]
        psdy[:, nx - 1] = -self.gradym[:, nx - 1] * psi[:, trunc]
        for n in range(2, trunc + 2):
            psdy[:, n - 1] = (-self.gradym[:, n - 1] * psi[:, n - 2]
                              + self.gradyp[:, n - 1] * psi[:, n])
        return psdx, psdy

    def vds(self, ucosm, vcosm):
        """spectral.f90:152-176."""
        nx, trunc = self.nx, self.trunc
        zp = self.gradx[:, None] * ucosm * 1j
        zc = self.gradx[:, None] * vcosm * 1j
        vorm = np.zeros_like(ucosm)
        divm = np.zeros_like(ucosm)
        vorm[:, 0] = zc[:, 0] - self.vddyp[:, 0] * ucosm[:, 1]
        vorm[:, nx - 1] = self.vddym[:, nx - 1] * ucosm[:, trunc]
        divm[:, 0] = zp[:, 0] + self.vddyp[:, 0] * vcosm[:, 1]
        divm[:, nx - 1] = -self.vddym[:, nx - 1] * vcosm[:, trunc]
        for n in range(2, trunc + 2):
            vorm[:, n - 1] = (self.vddym[:, n - 1] * ucosm[:, n - 2]
                              - self.vddyp[:, n - 1] * ucosm[:, n]
                              + zc[:, n - 1])
            divm[:, n - 1] = (-self.vddym[:, n - 1] * vcosm[:, n - 2]
                              + self.vddyp[:, n - 1] * vcosm[:, n]
                              + zp[:, n - 1])
        return vorm, divm

    def uvspec(self, vorm, divm):
        """spectral.f90:178-201."""
        nx, trunc = self.nx, self.trunc
        zp = self.uvdx * vorm * 1j
        zc = self.uvdx * divm * 1j
        ucosm = np.zeros_like(vorm)
        vcosm = np.zeros_like(vorm)
        ucosm[:, 0] = zc[:, 0] - self.uvdyp[:, 0] * vorm[:, 1]
        ucosm[:, nx - 1] = self.uvdym[:, nx - 1] * vorm[:, trunc]
        vcosm[:, 0] = zp[:, 0] + self.uvdyp[:, 0] * divm[:, 1]
        vcosm[:, nx - 1] = -self.uvdym[:, nx - 1] * divm[:, trunc]
        for n in range(2, trunc + 2):
            vcosm[:, n - 1] = (-self.uvdym[:, n - 1] * divm[:, n - 2]
                               + self.uvdyp[:, n - 1] * divm[:, n]
                               + zp[:, n - 1])
            ucosm[:, n - 1] = (self.uvdym[:, n - 1] * vorm[:, n - 2]
                               - self.uvdyp[:, n - 1] * vorm[:, n]
                               + zc[:, n - 1])
        return ucosm, vcosm

    def vdspec(self, ug, vg, kcos):
        """spectral.f90:203-232."""
        if kcos == 2:
            scale = self._geom.cosgr
        else:
            scale = self._geom.cosgr2
        ug1 = ug * scale[None, :]
        vg1 = vg * scale[None, :]
        specu = self.grid_to_spec(ug1)
        specv = self.grid_to_spec(vg1)
        return self.vds(specu, specv)

    def trunct(self, vor):
        return vor * self.trfilt
