"""Semi-implicit gravity-wave solver.

Reference: source/implicit.f90. The per-total-wavenumber kx-by-kx systems
(implicit.f90:144-158) are LU-inverted in the reference; here the inverse
matrices are precomputed per spectral entry (m, n) with numpy at setup —
a [mx, nx, kx, kx] tensor — so the per-step correction is one batched
einsum over all (m, n, re/im) at once on the MXU.

One ImplicitConsts is built per step length; the leapfrog bootstrap needs
three (dt/2, dt, 2dt — time_stepping.f90:12-24).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np
import jax.numpy as jnp

from ..config import ModelConfig
from ..constants import AKAP, GAMMA, GRAV, REARTH, RGAS


class ImplicitConsts(NamedTuple):
    tref: jnp.ndarray    # [kx] reference T profile
    tref1: jnp.ndarray   # [kx] rgas * tref
    tref2: jnp.ndarray   # [kx] akap * tref
    tref3: jnp.ndarray   # [kx] fsgr * tref
    xd: jnp.ndarray      # [kx, kx] hydrostatic operator
    xc: jnp.ndarray      # [kx, kx] T-from-divergence operator, scaled by xi
    xj: jnp.ndarray      # [mx, nx, kx, kx] inverse implicit matrices (0 at l=0)
    dhsx: jnp.ndarray    # [kx] xi * dhs
    elz: jnp.ndarray     # [mx, nx] l(l+1) * xi / a^2
    dmp1: jnp.ndarray    # [mx, nx] implicit del^8 factor, T/vorticity
    dmp1d: jnp.ndarray   # [mx, nx] implicit del^8 factor, divergence
    dmp1s: jnp.ndarray   # [mx, nx] implicit del^2 stratospheric factor


def build_implicit_np(cfg: ModelConfig, geom_np: dict, diff_np: dict,
                      dt: float) -> dict:
    """Float64 setup (implicit.f90:36-165)."""
    kx, mx, nx = cfg.kx, cfg.mx, cfg.nx
    hsg, dhs, fsg, fsgr = (geom_np[k] for k in ("hsg", "dhs", "fsg", "fsgr"))

    dmp1 = 1.0 / (1.0 + diff_np["dmp"] * dt)
    dmp1d = 1.0 / (1.0 + diff_np["dmpd"] * dt)
    dmp1s = 1.0 / (1.0 + diff_np["dmps"] * dt)

    rgam = RGAS * GAMMA / (1000.0 * GRAV)
    tref = 288.0 * np.maximum(0.2, fsg) ** rgam
    tref1 = RGAS * tref
    tref2 = AKAP * tref
    tref3 = fsgr * tref

    xi = dt * cfg.alph
    xxi = xi / REARTH**2
    dhsx = xi * dhs

    m0 = np.arange(mx, dtype=np.float64)[:, None]
    n0 = np.arange(nx, dtype=np.float64)[None, :]
    ell = m0 + n0
    elz = ell * (ell + 1.0) * xxi

    # T(k) = ... + ya(k,k') d(k') + xa(k,k') sig(k')  (implicit.f90:81-97)
    ya = -AKAP * np.outer(tref, dhs)
    xa = np.zeros((kx, kx))
    for k in range(1, kx):
        xa[k, k - 1] = 0.5 * (AKAP * tref[k] / fsg[k]
                              - (tref[k] - tref[k - 1]) / dhs[k])
    for k in range(kx - 1):
        xa[k, k] = 0.5 * (AKAP * tref[k] / fsg[k]
                          - (tref[k + 1] - tref[k]) / dhs[k])

    # sig(k) = xb(k,k') d(k')  (implicit.f90:99-110)
    dsum = np.cumsum(dhs)
    xb = np.zeros((kx, kx))
    for k in range(kx - 1):
        for k1 in range(kx):
            xb[k, k1] = dhs[k1] * dsum[k]
            if k1 <= k:
                xb[k, k1] -= dhs[k1]

    # t(k) = ... + xc(k,k') d(k')  (implicit.f90:112-120)
    xc = ya + xa @ xb

    # p(k) = xd(k,k') t(k')  (implicit.f90:122-132)
    xd = np.zeros((kx, kx))
    for k in range(kx):
        for k1 in range(k + 1, kx):
            xd[k, k1] = RGAS * np.log(hsg[k1 + 1] / hsg[k1])
        xd[k, k] = RGAS * np.log(hsg[k + 1] / fsg[k])

    xe = xd @ xc

    # Per-(m,n) implicit matrices and their inverses (implicit.f90:144-158).
    core = np.outer(tref1, dhs) - xe                      # [kx, kx]
    lam = (xi**2) * (ell * (ell + 1.0)) / REARTH**2       # [mx, nx]
    xf = np.eye(kx)[None, None] + lam[:, :, None, None] * core[None, None]
    xj = np.linalg.inv(xf)
    xj[0, 0] = 0.0  # l = 0: divergence correction zeroed (implicit.f90:200)

    return dict(tref=tref, tref1=tref1, tref2=tref2, tref3=tref3, xd=xd,
                xc=xc * xi, xj=xj, dhsx=dhsx, elz=elz,
                dmp1=dmp1, dmp1d=dmp1d, dmp1s=dmp1s)


def build_implicit(cfg: ModelConfig, geom_np: dict, diff_np: dict,
                   dt: float) -> ImplicitConsts:
    t = cfg.rdtype
    tables = build_implicit_np(cfg, geom_np, diff_np, dt)
    return ImplicitConsts(**{k: jnp.asarray(v, t) for k, v in tables.items()})


def implicit_terms(ic: ImplicitConsts, divdt: jnp.ndarray, tdt: jnp.ndarray,
                   psdt: jnp.ndarray
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Semi-implicit correction of (divdt, tdt, psdt) (implicit.f90:168-217).

    Shapes: divdt/tdt [kx, mx, nx, 2], psdt [mx, nx, 2]. Returns the
    corrected tendencies.
    """
    # ye = xd . tdt + tref1 * psdt
    ye = jnp.einsum("kq,qmnr->kmnr", ic.xd, tdt) \
        + ic.tref1[:, None, None, None] * psdt[None]
    yf = divdt + ic.elz[None, :, :, None] * ye
    # divdt <- xj . yf  (batched per (m, n); zero at l = 0)
    divdt_new = jnp.einsum("mnkq,qmnr->kmnr", ic.xj, yf)
    psdt_new = psdt - jnp.einsum("kmnr,k->mnr", divdt_new, ic.dhsx)
    tdt_new = tdt + jnp.einsum("kq,qmnr->kmnr", ic.xc, divdt_new)
    return divdt_new, tdt_new, psdt_new
