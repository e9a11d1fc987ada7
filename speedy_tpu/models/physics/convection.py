"""Simplified Tiedtke mass-flux convection.

Reference: source/convection.f90. The per-column `cycle`/variable-top loops
become masked static level loops: the downward entrainment sweep runs over
all candidate levels with per-column activity masks, which vectorizes over
the whole grid on the VPU. Level indices (itop) are kept 1-based to match
the reference's conventions; itop = kx+1 means "no convection".
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ...constants import ALHC, GRAV, P0
from . import rowops

PSMIN = 0.8    # minimum normalized ps for convection
TRCNV = 6.0    # relaxation time (h)
RHBL = 0.9     # boundary-layer RH threshold
RHIL = 0.7     # intermediate-layer RH threshold (secondary flux)
ENTMAX = 0.5   # max entrainment (fraction of cloud-base mass flux)
SMF = 0.8      # secondary/primary mass flux ratio


def diagnose_convection(wvi2: jnp.ndarray, psa, se, qa, qsat
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (itop [il,ix] 1-based, qdif) (convection.f90:170-245).

    wvi2: [kx] half-level interpolation weights (physics.f90:32-38).
    """
    kx = se.shape[0]
    nl1 = kx - 1  # 1-based index of next-to-lowest level

    mss = se + ALHC * qsat  # saturation moist static energy (levels 2..kx used)
    mse0 = se[kx - 1] + ALHC * qa[kx - 1]
    mse1 = jnp.minimum(mse0, se[nl1 - 1] + ALHC * qa[nl1 - 1])
    mss0 = jnp.maximum(mse0, mss[kx - 1])

    # half-level interpolated saturation MSE for 1-based k = 3 .. kx-3
    ks = list(range(3, kx - 2))  # 1-based candidate levels
    big = jnp.full_like(psa, float(kx))
    ktop1 = big
    ktop2 = big
    msthr = jnp.zeros_like(psa)
    # scan upward from the smallest k so the *minimum* qualifying level and
    # its mss2 win (the reference's downward loop keeps the last, i.e.
    # smallest, k).
    for k in ks:
        k0 = k - 1
        mss2 = mss[k0] + wvi2[k0] * (mss[k0 + 1] - mss[k0])
        c1 = mss0 > mss2
        c2 = mse1 > mss2
        ktop1 = jnp.minimum(ktop1, jnp.where(c1, float(k), float(kx)))
        # keep msthr of the smallest qualifying ktop2
        newk2 = jnp.where(c2, float(k), float(kx))
        take = newk2 < ktop2
        msthr = jnp.where(take, mss2, msthr)
        ktop2 = jnp.minimum(ktop2, newk2)

    qthr0 = RHBL * qsat[kx - 1]
    qthr1 = RHBL * qsat[nl1 - 1]
    lqthr = (qa[kx - 1] > qthr0) & (qa[nl1 - 1] > qthr1)

    base_ok = (psa > PSMIN) & (ktop1 < kx)
    conv_deep = base_ok & (ktop2 < kx)
    conv_rh = base_ok & (ktop2 >= kx) & lqthr
    conv = conv_deep | conv_rh

    itop = jnp.where(conv, ktop1, float(kx + 1)).astype(jnp.int32)
    qdif = jnp.where(
        conv_deep,
        jnp.maximum(qa[kx - 1] - qthr0, (mse0 - msthr) / ALHC),
        jnp.where(conv_rh, qa[kx - 1] - qthr0, 0.0))
    return itop, qdif


def convection(geom_fsg: jnp.ndarray, geom_dhs: jnp.ndarray,
               wvi2: jnp.ndarray, psa, se, qa, qsat
               ) -> Tuple[jnp.ndarray, ...]:
    """-> (itop, cbmf, precnv, dfse, dfqa) (convection.f90:27-158).

    dfse/dfqa are net fluxes per layer (unscaled: the caller applies
    rps*grdscp / rps*grdsig as in physics.f90:127-130).
    """
    kx = se.shape[0]
    nl1 = kx - 1
    fqmax = 5.0
    fm0 = P0 * float(geom_dhs[kx - 1]) / (GRAV * TRCNV * 3600.0)
    rdps = 2.0 / (1.0 - PSMIN)

    # entrainment profile, 1-based k = 2..kx-1 (convection.f90:62-70)
    entr = jnp.maximum(0.0, geom_fsg[1: kx - 1] - 0.5) ** 2
    entr = entr * (ENTMAX / jnp.sum(entr))  # [kx-2], index k-2 for 1-based k

    itop, qdif = diagnose_convection(wvi2, psa, se, qa, qsat)
    conv = itop <= kx

    dfse = jnp.zeros_like(se)
    dfqa = jnp.zeros_like(se)

    # --- 3.1 boundary layer / cloud base (1-based k = kx) ---
    qmax = jnp.maximum(1.01 * qa[kx - 1], qsat[kx - 1])
    sb = se[nl1 - 1] + wvi2[nl1 - 1] * (se[kx - 1] - se[nl1 - 1])
    qb = qa[nl1 - 1] + wvi2[nl1 - 1] * (qa[kx - 1] - qa[nl1 - 1])
    qb = jnp.minimum(qb, qa[kx - 1])
    fpsa = psa * jnp.minimum(1.0, (psa - PSMIN) * rdps)
    fmass0 = fm0 * fpsa * jnp.minimum(fqmax, qdif / jnp.maximum(qmax - qb, 1e-30))
    cbmf = jnp.where(conv, fmass0, 0.0)

    fmass = cbmf
    fus = cbmf * se[kx - 1]
    fuq = cbmf * qmax
    fds = cbmf * sb
    fdq = cbmf * qb
    dfse = rowops.row_set(dfse, kx - 1, jnp.where(conv, fds - fus, 0.0))
    dfqa = rowops.row_set(dfqa, kx - 1, jnp.where(conv, fdq - fuq, 0.0))

    # --- 3.2 intermediate layers, downward static sweep k = kx-1 .. 2 ---
    precnv = jnp.zeros_like(psa)
    for k in range(kx - 1, 1, -1):  # 1-based
        k0 = k - 1
        mid = conv & (k >= itop + 1)
        top = conv & (k == itop)

        # entering the mid region: flux at the layer's lower boundary
        dfse = rowops.row_add(dfse, k0, jnp.where(mid, fus - fds, 0.0))
        dfqa = rowops.row_add(dfqa, k0, jnp.where(mid, fuq - fdq, 0.0))

        enmass = entr[k - 2] * psa * cbmf
        fmass_n = fmass + enmass
        fus_n = fus + enmass * se[k0]
        fuq_n = fuq + enmass * qa[k0]
        sb_k = se[k0 - 1] + wvi2[k0 - 1] * (se[k0] - se[k0 - 1])
        qb_k = qa[k0 - 1] + wvi2[k0 - 1] * (qa[k0] - qa[k0 - 1])
        fds_n = fmass_n * sb_k
        fdq_n = fmass_n * qb_k

        dfse = rowops.row_add(dfse, k0, jnp.where(mid, fds_n - fus_n, 0.0))
        dfqa = rowops.row_add(dfqa, k0, jnp.where(mid, fdq_n - fuq_n, 0.0))

        # secondary moisture flux (convection.f90:136-142)
        delq = RHIL * qsat[k0] - qa[k0]
        fsq = jnp.where(mid & (delq > 0.0), SMF * cbmf * delq, 0.0)
        dfqa = rowops.row_add(dfqa, k0, fsq)
        dfqa = rowops.row_add(dfqa, kx - 1, -fsq)

        # --- 3.3 top layer: condensation and detrainment ---
        qsatb = qsat[k0] + wvi2[k0] * (qsat[k0 + 1] - qsat[k0])
        prec_k = jnp.maximum(fuq - fmass * qsatb, 0.0)
        precnv = jnp.where(top, prec_k, precnv)
        dfse = rowops.row_add(dfse, k0,
                              jnp.where(top, fus - fds + ALHC * prec_k, 0.0))
        dfqa = rowops.row_add(dfqa, k0,
                              jnp.where(top, fuq - fdq - prec_k, 0.0))

        # commit running accumulators only where the mid sweep was active
        fmass = jnp.where(mid, fmass_n, fmass)
        fus = jnp.where(mid, fus_n, fus)
        fuq = jnp.where(mid, fuq_n, fuq)
        fds = jnp.where(mid, fds_n, fds)
        fdq = jnp.where(mid, fdq_n, fdq)

    return itop, cbmf, precnv, dfse, dfqa
