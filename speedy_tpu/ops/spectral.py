"""Spectral transform core: spherical-harmonic <-> Gaussian-grid transforms.

TPU-native redesign of the reference's L2 layer (source/spectral.f90,
source/legendre.f90, source/fourier.f90, source/fftpack.f90):

* Spectral fields are **packed real** arrays of trailing shape [mx, nx, 2]
  (zonal wavenumber m, n-index with total wavenumber l = m + n, re/im) — the
  same packed-complex layout the reference uses (legendre.f90:14 "2*mx ...
  represent complex variables"), chosen here because the TPU backend has no
  complex arithmetic: every transform stage is a real einsum on the MXU.
* The zonal FFT (fourier.f90:23-82 + the 1232-line vendored FFTPACK) becomes
  a precomputed real **DFT matmul**: at ix=96 (or 256 at T85) a dense
  [mx,2] x [2mx, ix] contraction is a few-microsecond MXU op that fuses with
  the Legendre einsum, whereas XLA FFT is unavailable on this backend. The
  packing matches FFTPACK's exactly: coefficient m = (1/ix) * sum_i f_i
  exp(-2*pi*i*m*i/ix), m=0 imaginary part identically zero
  (fourier.f90:72-80).
* The Legendre transforms (legendre.f90:74-155) are single batched einsums
  against a full-latitude polynomial table: the even/odd parity decomposition
  is folded in as per-hemisphere signs (-1)^n, and the triangular-truncation
  limits (nsh2, legendre.f90:33-41) are folded in as zero entries. One einsum
  per direction handles every field/level/ensemble member at once.
* Grid fields have trailing shape [il, ix], latitude south -> north
  (geometry.f90:65).

Deliberately reproduced reference quirks (required for numerical parity):

* Legendre polynomials are evaluated at the *asymptotic approximations* of
  the Gauss nodes (geometry.f90:68) while quadrature weights use
  Newton-iterated nodes (legendre.f90:158-191); the transform pair is
  therefore not an exact quadrature, exactly like the reference (roundtrip
  error ~4e-3 at T30; 3.5e-15 with iterated nodes).
* The meridional-coupling operators omit the i*m ("z") term on the last n
  row (spectral.f90:159-162, 185-188).
* ``uvdx`` on the n=0 row is -a/(m+1) even for m=0 (spectral.f90:68).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np
import jax.numpy as jnp

from ..config import ModelConfig
from ..constants import REARTH, PI_F


class SpectralConsts(NamedTuple):
    """Precomputed device-constant tables for all spectral operations."""

    cpol_inv: jnp.ndarray  # [mx, nx, il] synthesis table (parity + truncation folded in)
    cpol_dir: jnp.ndarray  # [mx, nx, il] analysis table (+ Gaussian weights)
    dft_syn: jnp.ndarray   # [mx, 2, ix] zonal DFT synthesis matrix
    dft_ana: jnp.ndarray   # [mx, 2, ix] zonal DFT analysis matrix (1/ix folded in)
    el2: jnp.ndarray       # [mx, nx] l(l+1)/a^2
    el4: jnp.ndarray       # [mx, nx] el2^2
    elm2: jnp.ndarray      # [mx, nx] 1/el2 (0 at l=0)
    trfilt: jnp.ndarray    # [mx, nx] triangular-truncation filter (l <= trunc)
    gradx: jnp.ndarray     # [mx] m/a
    gradym: jnp.ndarray    # [mx, nx]
    gradyp: jnp.ndarray    # [mx, nx]
    uvdx: jnp.ndarray      # [mx, nx]
    uvdym: jnp.ndarray     # [mx, nx]
    uvdyp: jnp.ndarray     # [mx, nx]
    vddym: jnp.ndarray     # [mx, nx]
    vddyp: jnp.ndarray     # [mx, nx]
    zrow_mask: jnp.ndarray  # [nx] 1 on rows carrying the i*m term (all but last)
    cosgr: jnp.ndarray     # [il] 1/cos(lat)
    cosgr2: jnp.ndarray    # [il] 1/cos^2(lat)
    wt: jnp.ndarray        # [iy] Gaussian weights (diagnostics/tests)


# ---------------------------------------------------------------------------
# Packed-complex helpers (trailing axis of size 2 = re, im)
# ---------------------------------------------------------------------------

def to_complex(x: jnp.ndarray) -> jnp.ndarray:
    """[..., 2] packed real -> complex (host-side analysis / tests only)."""
    return x[..., 0] + 1j * x[..., 1]


def from_complex(c) -> jnp.ndarray:
    """complex -> [..., 2] packed real."""
    c = jnp.asarray(c)
    return jnp.stack([jnp.real(c), jnp.imag(c)], axis=-1)


def cmul_i(x: jnp.ndarray) -> jnp.ndarray:
    """Multiply a packed-complex array by the imaginary unit i."""
    return jnp.stack([-x[..., 1], x[..., 0]], axis=-1)


# ---------------------------------------------------------------------------
# Host-side setup (float64 numpy)
# ---------------------------------------------------------------------------

def gauss_weights(iy: int) -> np.ndarray:
    """Gaussian quadrature weights for the 2*iy-point rule, pole -> equator.

    Newton-iterated Gauss-Legendre nodes; only the weights are kept — the
    polynomial evaluation points deliberately remain the asymptotic seeds
    (see module docstring). Reference: legendre.f90:158-191.
    """
    n = 2 * iy
    i = np.arange(1, iy + 1, dtype=np.float64)
    z = np.cos(PI_F * (i - 0.25) / (n + 0.5))
    eps = np.finfo(np.float64).eps
    for _ in range(100):
        p1 = np.ones_like(z)
        p2 = np.zeros_like(z)
        for jj in range(1, n + 1):
            p3 = p2
            p2 = p1
            p1 = ((2.0 * jj - 1.0) * z * p2 - (jj - 1.0) * p3) / jj
        pp = n * (z * p1 - p2) / (z**2 - 1.0)
        z_new = z - p1 / pp
        if np.all(np.abs(z_new - z) <= eps):
            z = z_new
            break
        z = z_new
    # recompute pp at the converged nodes for the weight formula
    p1 = np.ones_like(z)
    p2 = np.zeros_like(z)
    for jj in range(1, n + 1):
        p3 = p2
        p2 = p1
        p1 = ((2.0 * jj - 1.0) * z * p2 - (jj - 1.0) * p3) / jj
    pp = n * (z * p1 - p2) / (z**2 - 1.0)
    return 2.0 / ((1.0 - z**2) * pp**2)


def epsilon_table(mx: int, nx: int) -> np.ndarray:
    """eps[m, n] = sqrt((l^2 - m^2)/(4 l^2 - 1)) with l = m + n, shape
    [mx+1, nx+1]; zero on the n = nx column and at (0, 0).
    Reference: legendre.f90:43-57."""
    m = np.arange(mx + 1, dtype=np.float64)[:, None]
    n = np.arange(nx + 1, dtype=np.float64)[None, :]
    ell = m + n
    with np.errstate(divide="ignore", invalid="ignore"):
        eps = np.sqrt((ell**2 - m**2) / (4.0 * ell**2 - 1.0))
    eps[np.isnan(eps)] = 0.0
    eps[:, nx] = 0.0
    eps[0, 0] = 0.0
    return eps


def legendre_polys(cfg: ModelConfig, sia_half: np.ndarray,
                   coa_half: np.ndarray, eps: np.ndarray) -> np.ndarray:
    """Normalized associated Legendre polynomials P[m, n, j] at the iy
    half-latitudes (j = 0 nearest the pole), via the reference's stabilized
    three-term recurrence in l with 1e-30 flush (legendre.f90:194-237)."""
    mx, nx = cfg.mx, cfg.nx
    x = sia_half[None, :]  # sin(lat), [1, iy]
    y = coa_half[None, :]  # cos(lat)

    alp = np.zeros((mx + 1, nx, cfg.iy), dtype=np.float64)
    # diagonal l = m: P_m^m
    alp[0, 0] = np.sqrt(0.5)
    for m in range(1, mx + 1):
        consq = np.sqrt(0.5 * (2.0 * m + 1.0) / m)
        alp[m, 0] = consq * y[0] * alp[m - 1, 0]
    # l = m + 1 band
    reps = np.where(eps > 0.0, 1.0 / np.where(eps > 0.0, eps, 1.0), 0.0)
    alp[:, 1] = x * alp[:, 0] * reps[: mx + 1, 1][:, None]
    # upward recurrence in n (i.e. in l)
    for n in range(2, nx):
        alp[:, n] = (x * alp[:, n - 1]
                     - eps[: mx + 1, n - 1][:, None] * alp[:, n - 2]) \
            * reps[: mx + 1, n][:, None]
    alp[np.abs(alp) <= 1.0e-30] = 0.0
    return alp[:mx, :nx]


def dft_matrices(mx: int, ix: int) -> Tuple[np.ndarray, np.ndarray]:
    """Real DFT synthesis/analysis matrices matching the FFTPACK packing.

    analysis:  F_m = (1/ix) sum_i g_i exp(-2 pi i m x_i)   (fourier.f90:72-80)
    synthesis: g_i = F_0 + 2 sum_{m>=1} [re_m cos - im_m sin]  (rfftb x ix)
    Returned shapes [mx, 2, ix]; the m=0 imaginary rows are identically zero,
    which reproduces the reference's dropped a(0) imaginary slot.
    """
    m = np.arange(mx, dtype=np.float64)[:, None]
    theta = 2.0 * np.pi * m * np.arange(ix, dtype=np.float64)[None, :] / ix
    cos, sin = np.cos(theta), np.sin(theta)
    w = np.where(m == 0, 1.0, 2.0)
    syn = np.stack([w * cos, -w * sin], axis=1)          # [mx, 2, ix]
    ana = np.stack([cos / ix, -sin / ix], axis=1)        # [mx, 2, ix]
    ana[0, 1, :] = 0.0  # exact zero (sin(0) already is; keep it explicit)
    return syn, ana


def build_spectral_np(cfg: ModelConfig, geom_np: dict) -> dict:
    """All spectral tables as float64 numpy arrays."""
    mx, nx, il, iy, trunc = cfg.mx, cfg.nx, cfg.il, cfg.iy, cfg.trunc

    wt = gauss_weights(iy)
    eps = epsilon_table(mx, nx)
    poly = legendre_polys(cfg, geom_np["sia_half"], geom_np["coa_half"], eps)
    dft_syn, dft_ana = dft_matrices(mx, cfg.ix)

    m0 = np.arange(mx, dtype=np.float64)[:, None]
    n0 = np.arange(nx, dtype=np.float64)[None, :]
    ell = m0 + n0  # total wavenumber l of entry (m, n)

    # Eigenvalue tables (spectral.f90:41-57)
    el2 = ell * (ell + 1.0) / REARTH**2
    el4 = el2**2
    elm2 = np.zeros_like(el2)
    elm2[el2 > 0.0] = 1.0 / el2[el2 > 0.0]
    trfilt = (ell <= trunc).astype(np.float64)

    # Meridional-coupling coefficient tables (spectral.f90:61-81).
    # epsm[m, n] = eps_l^m at the entry's own l; epsp = eps_(l+1)^m.
    epsm = eps[:mx, :nx]
    epsp = eps[:mx, 1: nx + 1]
    gradx = np.arange(mx, dtype=np.float64) / REARTH
    with np.errstate(divide="ignore", invalid="ignore"):
        gradym = np.where(n0 > 0, (ell - 1.0) * epsm / REARTH, 0.0)
        uvdx = np.where(n0 > 0, -REARTH * m0 / (ell * (ell + 1.0)),
                        -REARTH / (m0 + 1.0))
        uvdym = np.where(n0 > 0, -REARTH * epsm / np.where(ell > 0, ell, 1.0), 0.0)
        vddym = np.where(n0 > 0, (ell + 1.0) * epsm / REARTH, 0.0)
    gradyp = (ell + 2.0) * epsp / REARTH
    uvdyp = -REARTH * epsp / (ell + 1.0)
    vddyp = ell * epsp / REARTH

    # The i*m term is dropped on the last n row (spectral.f90:159-162,185-188)
    zrow_mask = np.ones(nx, dtype=np.float64)
    zrow_mask[nx - 1] = 0.0

    # Full-latitude synthesis/analysis tables. Latitude j_full runs
    # south -> north; half index j (0 = nearest pole) maps to southern row j
    # and northern row il-1-j. Southern values pick up the polynomial parity
    # sign (-1)^n (parity of n' - m' = n, legendre.f90:135-138).
    parity = np.where((np.arange(nx) % 2) == 0, 1.0, -1.0)[None, :, None]
    cpol_inv = np.zeros((mx, nx, il), dtype=np.float64)
    for j in range(iy):
        cpol_inv[:, :, j] = poly[:, :, j] * parity[:, :, 0]      # south
        cpol_inv[:, :, il - 1 - j] = poly[:, :, j]               # north

    # Triangular-shape masks (nsh2, legendre.f90:33-41): coefficients beyond
    # l = trunc+1 are ignored by both transform directions when ix == 4*iy;
    # the analysis additionally never writes the last n row
    # (legendre.f90:142-154 loop bounds n = 1..trunc+1).
    if cfg.ix == 4 * iy:
        mask_inv = (m0 + n0 <= trunc + 1).astype(np.float64)
    else:
        mask_inv = np.ones((mx, nx), dtype=np.float64)
    mask_dir = mask_inv * (n0 <= trunc).astype(np.float64)

    wt_full = np.concatenate([wt, wt[::-1]])  # weight per full latitude
    cpol_inv = cpol_inv * mask_inv[:, :, None]
    # mask_dir is nested inside mask_inv, so masking the already-masked
    # synthesis table is exact.
    cpol_dir = cpol_inv * mask_dir[:, :, None] * wt_full[None, None, :]

    return dict(
        cpol_inv=cpol_inv, cpol_dir=cpol_dir, dft_syn=dft_syn, dft_ana=dft_ana,
        el2=el2, el4=el4, elm2=elm2,
        trfilt=trfilt, gradx=gradx, gradym=gradym, gradyp=gradyp, uvdx=uvdx,
        uvdym=uvdym, uvdyp=uvdyp, vddym=vddym, vddyp=vddyp,
        zrow_mask=zrow_mask, cosgr=geom_np["cosgr"], cosgr2=geom_np["cosgr2"],
        wt=wt,
    )


def build_spectral(cfg: ModelConfig, geom_np: dict) -> SpectralConsts:
    t = cfg.rdtype
    tables = build_spectral_np(cfg, geom_np)
    # optional bf16 storage of the big matmul tables (cfg.tables_bf16):
    # the MXU rounds fp32 operands to bf16 anyway, so this halves their
    # HBM footprint/traffic with near-zero additional rounding
    big = {"cpol_inv", "cpol_dir", "dft_syn", "dft_ana"} \
        if (getattr(cfg, "tables_bf16", False)
            and cfg.precision == "fp32") else set()
    return SpectralConsts(**{
        k: jnp.asarray(v, dtype=jnp.bfloat16 if k in big else t)
        for k, v in tables.items()})


# ---------------------------------------------------------------------------
# Runtime transforms (pure jax; batched over arbitrary leading dims).
# Spectral arrays: [..., mx, nx, 2]. Grid arrays: [..., il, ix].
# ---------------------------------------------------------------------------

def legendre_inv(sc: SpectralConsts, spec: jnp.ndarray) -> jnp.ndarray:
    """[..., mx, nx, 2] -> [..., il, mx, 2] zonal Fourier coefficients.
    Reference: legendre.f90:74-111 (parity split folded into cpol_inv)."""
    return jnp.einsum("...mnr,mnj->...jmr", spec, sc.cpol_inv)


def legendre_dir(sc: SpectralConsts, fm: jnp.ndarray) -> jnp.ndarray:
    """[..., il, mx, 2] -> [..., mx, nx, 2].
    Reference: legendre.f90:114-155 (weights folded into cpol_dir)."""
    return jnp.einsum("...jmr,mnj->...mnr", fm, sc.cpol_dir)


def fourier_inv(sc: SpectralConsts, fm: jnp.ndarray) -> jnp.ndarray:
    """[..., il, mx, 2] Fourier coefficients -> [..., il, ix] grid
    (fourier.f90:23-53 as a DFT matmul)."""
    return jnp.einsum("...jmr,mri->...ji", fm, sc.dft_syn)


def fourier_dir(sc: SpectralConsts, grid: jnp.ndarray) -> jnp.ndarray:
    """[..., il, ix] grid -> [..., il, mx, 2], 1/ix normalized
    (fourier.f90:56-82 as a DFT matmul)."""
    return jnp.einsum("...ji,mri->...jmr", grid, sc.dft_ana)


def spec_to_grid(sc: SpectralConsts, spec: jnp.ndarray,
                 scale_by_inv_cos: bool = False) -> jnp.ndarray:
    """Spherical harmonics -> grid (spectral.f90:98-110).

    ``scale_by_inv_cos`` corresponds to the reference's kcos=2 path
    (fourier.f90:47-51): divide by cos(lat), used when synthesizing true
    winds from U = u cos(lat).
    """
    grid = fourier_inv(sc, legendre_inv(sc, spec))
    if scale_by_inv_cos:
        grid = grid * sc.cosgr[:, None]
    return grid


def grid_to_spec(sc: SpectralConsts, grid: jnp.ndarray) -> jnp.ndarray:
    """Grid -> spherical harmonics (spectral.f90:112-122)."""
    return legendre_dir(sc, fourier_dir(sc, grid))


# ---- spectral-space operators (no transforms) ----

def _t(table: jnp.ndarray) -> jnp.ndarray:
    """Broadcast an [mx, nx] coefficient table over the re/im axis."""
    return table[..., None]


def _shift_down_n(x: jnp.ndarray) -> jnp.ndarray:
    """y[..., n, :] = x[..., n-1, :], zero at n=0 (coupling to l-1)."""
    return jnp.concatenate(
        [jnp.zeros_like(x[..., :1, :]), x[..., :-1, :]], axis=-2)


def _shift_up_n(x: jnp.ndarray) -> jnp.ndarray:
    """y[..., n, :] = x[..., n+1, :], zero at n=nx-1 (coupling to l+1)."""
    return jnp.concatenate(
        [x[..., 1:, :], jnp.zeros_like(x[..., :1, :])], axis=-2)


def laplacian(sc: SpectralConsts, spec: jnp.ndarray) -> jnp.ndarray:
    """del^2 (spectral.f90:84-89)."""
    return -spec * _t(sc.el2)


def inverse_laplacian(sc: SpectralConsts, spec: jnp.ndarray) -> jnp.ndarray:
    """del^-2 (spectral.f90:91-96)."""
    return -spec * _t(sc.elm2)


def grad(sc: SpectralConsts, psi: jnp.ndarray
         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Spectral zonal/meridional gradient operators (spectral.f90:124-144).
    Outputs follow the reference's scaling conventions (one cos(lat) factor
    carried by the grids; callers divide by cos as needed)."""
    psdx = cmul_i(psi) * sc.gradx[:, None, None]
    psdy = (-_t(sc.gradym) * _shift_down_n(psi)
            + _t(sc.gradyp) * _shift_up_n(psi))
    return psdx, psdy


def vds(sc: SpectralConsts, ucosm: jnp.ndarray, vcosm: jnp.ndarray
        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Spectral (u/cos, v/cos) coefficients -> (vorticity, divergence)
    (spectral.f90:146-171): the 1/(1-mu^2) metric factor is applied in grid
    space by ``vdspec`` and the mu-derivative moved onto the polynomials by
    parts, which is why the meridional coupling is banded."""
    zmask = sc.zrow_mask[:, None]
    zp = cmul_i(ucosm) * sc.gradx[:, None, None]
    zc = cmul_i(vcosm) * sc.gradx[:, None, None]
    vorm = (_t(sc.vddym) * _shift_down_n(ucosm)
            - _t(sc.vddyp) * _shift_up_n(ucosm) + zc * zmask)
    divm = (-_t(sc.vddym) * _shift_down_n(vcosm)
            + _t(sc.vddyp) * _shift_up_n(vcosm) + zp * zmask)
    return vorm, divm


def uvspec(sc: SpectralConsts, vorm: jnp.ndarray, divm: jnp.ndarray
           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(vorticity, divergence) spectral -> (U, V) = (u, v) cos(lat) spectral
    (spectral.f90:173-196)."""
    zmask = sc.zrow_mask[:, None]
    zp = cmul_i(vorm) * _t(sc.uvdx)
    zc = cmul_i(divm) * _t(sc.uvdx)
    ucosm = (_t(sc.uvdym) * _shift_down_n(vorm)
             - _t(sc.uvdyp) * _shift_up_n(vorm) + zc * zmask)
    vcosm = (-_t(sc.uvdym) * _shift_down_n(divm)
             + _t(sc.uvdyp) * _shift_up_n(divm) + zp * zmask)
    return ucosm, vcosm


def vdspec(sc: SpectralConsts, ug: jnp.ndarray, vg: jnp.ndarray,
           half_cos_scaling: bool) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Grid (u, v)-like fields -> spectral (vorticity, divergence)-like
    tendencies (spectral.f90:198-227). ``half_cos_scaling`` True corresponds
    to the reference's kcos=2 (inputs already carry one cos factor)."""
    scale = sc.cosgr if half_cos_scaling else sc.cosgr2
    ug1 = ug * scale[:, None]
    vg1 = vg * scale[:, None]
    # one analysis chain for both wind components (split after the einsums)
    uv = grid_to_spec(sc, jnp.stack([ug1, vg1], axis=0))
    return vds(sc, uv[0], uv[1])


def trunct(sc: SpectralConsts, spec: jnp.ndarray) -> jnp.ndarray:
    """Triangular truncation filter (spectral.f90:229-233)."""
    return spec * _t(sc.trfilt)
