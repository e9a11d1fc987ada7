"""Longwave radiation: 4-band emission/absorption sweeps.

Reference: source/longwave_radiation.f90. The Planck band-fraction table
fband(100:400, 4) becomes a [301, 4] gather with the temperature index
clamped to the table range (the reference guarantees this by construction);
`nint` is matched with floor(T + 0.5) for the positive temperatures
involved.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp

from ...constants import SBC
from . import rowops
from .shortwave import EPSLW, EMISFC

NBAND = 4


def build_fband() -> np.ndarray:
    """Energy fraction emitted in each LW band as f(T), T = 100..400 K
    (longwave_radiation.f90:197-220). Returns [301, 4] (index T-100).

    TEST FIXTURE ONLY: the model evaluates the clamped quadratics directly
    (`_fband_at`); tests/test_physics.py verifies the direct evaluation is
    bit-identical to this table in fp64."""
    fband = np.zeros((301, 4))
    eps1 = 1.0 - EPSLW
    t = np.arange(200, 321, dtype=np.float64)
    i = t.astype(int) - 100
    fband[i, 1] = (0.148 - 3.0e-6 * (t - 247.0)**2) * eps1
    fband[i, 2] = (0.356 - 5.2e-6 * (t - 282.0)**2) * eps1
    fband[i, 3] = (0.314 + 1.0e-5 * (t - 315.0)**2) * eps1
    fband[i, 0] = eps1 - fband[i, 1] - fband[i, 2] - fband[i, 3]
    fband[:100] = fband[100]
    fband[221:] = fband[220]
    return fband


def _fband_at(ta: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """fband rows for nint(ta) -> [..., 4].

    Evaluated directly as the clamped quadratics the table is built from
    (longwave_radiation.f90:204-216) on the nint-quantized temperature —
    the same arithmetic as build_fband, so fp64 results are bit-identical
    to the table lookup, without materializing a [..., 4] gather of a
    301-row table (the gather + its layout copies were ~10% of the
    64-member step's device time). The quantize-then-clamp reproduces the
    table's constant extension below 200 K / above 320 K.
    """
    tq = jnp.clip(jnp.floor(ta + 0.5), 200.0, 320.0)
    eps1 = 1.0 - EPSLW
    f1 = (0.148 - 3.0e-6 * (tq - 247.0) ** 2) * eps1
    f2 = (0.356 - 5.2e-6 * (tq - 282.0) ** 2) * eps1
    f3 = (0.314 + 1.0e-5 * (tq - 315.0) ** 2) * eps1
    f0 = eps1 - f1 - f2 - f3
    # axis: where the 4-band axis lands (axis=1 for [kx, 4, il, ix] etc.).
    # Stacking straight onto the target axis instead of stack(-1)+moveaxis
    # keeps the last-two (lat, lon) dims vector-friendly for the Pallas
    # fused kernel (Mosaic cannot layout-cast a trailing 4-band axis).
    return jnp.stack([f0, f1, f2, f3], axis=axis)


def downward_longwave(wvi2: np.ndarray, tau2: jnp.ndarray, ta: jnp.ndarray
                      ) -> Tuple[jnp.ndarray, ...]:
    """-> (slrd, dfabs, st4a1, st4a2, flux) (longwave_radiation.f90:16-117).

    st4a1/st4a2 ([kx, il, ix]) and the 4 band fluxes are passed on to the
    upward computation within the same step.
    """
    kx = ta.shape[0]
    nl1 = kx - 1

    # half-level temperatures (1-based k = 1..kx-1)
    thalf = ta[:-1] + wvi2[: kx - 1, None, None] * (ta[1:] - ta[:-1])

    # stratospheric mean temperatures and tropospheric gradients
    st4a2 = [None] * kx
    st4a2[0] = 0.75 * ta[0] + 0.25 * thalf[0]
    st4a2[1] = 0.50 * ta[1] + 0.25 * (thalf[0] + thalf[1])
    for k in range(2, nl1):  # 0-based levels 2..kx-2 (1-based 3..nl1)
        st4a2[k] = 0.5 * jnp.maximum(thalf[k] - thalf[k - 1], 0.0)
    st4a2[kx - 1] = jnp.maximum(ta[kx - 1] - thalf[nl1 - 1], 0.0)

    # blackbody emission
    st4a1 = [None] * kx
    for k in range(2):
        st4a1[k] = SBC * st4a2[k]**4
        st4a2[k] = jnp.zeros_like(ta[k])
    for k in range(2, kx):
        st3a = SBC * ta[k]**3
        st4a1[k] = st3a * ta[k]
        st4a2[k] = 4.0 * st3a * st4a2[k]
    st4a1 = jnp.stack(st4a1, axis=0)
    st4a2 = jnp.stack(st4a2, axis=0)

    dfabs = jnp.zeros_like(ta)
    fb = _fband_at(ta, axis=1)  # [kx, 4, il, ix]

    # 3.1 stratosphere, bands 1-2, k=1
    flux = [None] * NBAND
    for jb in range(2):
        emis = 1.0 - tau2[jb, 0]
        brad = fb[0, jb] * (st4a1[0] + emis * st4a2[0])
        flux[jb] = emis * brad
        dfabs = rowops.row_add(dfabs, 0, -flux[jb])
    for jb in range(2, NBAND):
        flux[jb] = jnp.zeros_like(ta[0])

    # 3.2 troposphere
    for jb in range(NBAND):
        f = flux[jb]
        for k in range(1, kx):
            emis = 1.0 - tau2[jb, k]
            brad = fb[k, jb] * (st4a1[k] + emis * st4a2[k])
            dfabs = rowops.row_add(dfabs, k, f)
            f = tau2[jb, k] * f + emis * brad
            dfabs = rowops.row_add(dfabs, k, -f)
        flux[jb] = f

    slrd = EMISFC * (flux[0] + flux[1] + flux[2] + flux[3])

    # 3.4 "black" band correction
    corlw = EPSLW * EMISFC * st4a1[kx - 1]
    dfabs = rowops.row_add(dfabs, kx - 1, -corlw)
    slrd = slrd + corlw

    return slrd, dfabs, st4a1, st4a2, jnp.stack(flux, axis=0)


def downward_longwave_vec(wvi2: np.ndarray, tau2: jnp.ndarray,
                          ta: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """Band-vectorized variant of downward_longwave (same per-band
    arithmetic; only the 4-band dfabs sum is reassociated, roundoff-level).

    ~4x fewer sweep ops and scatter-free dfabs assembly (r04 measured
    0.1048 -> 0.1034 ms/member-step) — but REVERTED as the default after
    the 90-day T85 stability gate failed (commit 6758aa7; day-34 blowups
    across three configs). Kept behind cfg.lw_band_vectorized=True for the
    stability investigation (docs/STABILITY.md): this is the canonical
    "parity-green roundoff change that destabilizes the long horizon".
    """
    kx = ta.shape[0]
    nl1 = kx - 1

    thalf = ta[:-1] + wvi2[: kx - 1, None, None] * (ta[1:] - ta[:-1])

    st4a2 = [None] * kx
    st4a2[0] = 0.75 * ta[0] + 0.25 * thalf[0]
    st4a2[1] = 0.50 * ta[1] + 0.25 * (thalf[0] + thalf[1])
    for k in range(2, nl1):
        st4a2[k] = 0.5 * jnp.maximum(thalf[k] - thalf[k - 1], 0.0)
    st4a2[kx - 1] = jnp.maximum(ta[kx - 1] - thalf[nl1 - 1], 0.0)

    st4a1 = [None] * kx
    for k in range(2):
        st4a1[k] = SBC * st4a2[k]**4
        st4a2[k] = jnp.zeros_like(ta[k])
    for k in range(2, kx):
        st3a = SBC * ta[k]**3
        st4a1[k] = st3a * ta[k]
        st4a2[k] = 4.0 * st3a * st4a2[k]
    st4a1 = jnp.stack(st4a1, axis=0)
    st4a2 = jnp.stack(st4a2, axis=0)

    fb = _fband_at(ta, axis=1)  # [kx, 4, il, ix]

    # 3.1 stratosphere, bands 1-2, k=1
    emis0 = 1.0 - tau2[:2, 0]
    brad0 = fb[0, :2] * (st4a1[0] + emis0 * st4a2[0])
    flux = jnp.concatenate(
        [emis0 * brad0, jnp.zeros_like(tau2[2:, 0])], axis=0)  # [4, il, ix]
    dfabs_levels = [-jnp.sum(flux[:2], axis=0)]

    # 3.2 troposphere (all 4 bands at once)
    for k in range(1, kx):
        emis = 1.0 - tau2[:, k]
        brad = fb[k] * (st4a1[k] + emis * st4a2[k])
        dfa = jnp.sum(flux, axis=0)
        flux = tau2[:, k] * flux + emis * brad
        dfabs_levels.append(dfa - jnp.sum(flux, axis=0))

    slrd = EMISFC * jnp.sum(flux, axis=0)

    # 3.4 "black" band correction
    corlw = EPSLW * EMISFC * st4a1[kx - 1]
    dfabs_levels[kx - 1] = dfabs_levels[kx - 1] - corlw
    slrd = slrd + corlw
    dfabs = jnp.stack(dfabs_levels, axis=0)

    return slrd, dfabs, st4a1, st4a2, flux


def upward_longwave_vec(dhs: np.ndarray, tau2: jnp.ndarray,
                        stratc: jnp.ndarray, ta: jnp.ndarray,
                        ts: jnp.ndarray, fsfcd: jnp.ndarray,
                        fsfcu: jnp.ndarray, st4a1: jnp.ndarray,
                        st4a2: jnp.ndarray, flux: jnp.ndarray,
                        dfabs: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """Band-vectorized variant of upward_longwave (see
    downward_longwave_vec for why it is not the default)."""
    kx = ta.shape[0]
    refsfc = 1.0 - EMISFC
    slr = fsfcu - fsfcd

    fb_ts = _fband_at(ts, axis=0)   # [4, il, ix]
    fb = _fband_at(ta, axis=1)      # [kx, 4, il, ix]
    fluxes = fb_ts * fsfcu + refsfc * flux       # [4, il, ix]

    dfa_add = [jnp.zeros_like(ta[0]) for _ in range(kx)]
    dfa_add[kx - 1] = EPSLW * fsfcu

    for k in range(kx - 1, 0, -1):  # 0-based kx-1 .. 1
        emis = 1.0 - tau2[:, k]
        brad = fb[k] * (st4a1[k] - emis * st4a2[k])
        pre = jnp.sum(fluxes, axis=0)
        fluxes = tau2[:, k] * fluxes + emis * brad
        dfa_add[k] = dfa_add[k] + pre - jnp.sum(fluxes, axis=0)

    # stratosphere k=1, bands 1-2
    emis0 = 1.0 - tau2[:2, 0]
    brad0 = fb[0, :2] * (st4a1[0] - emis0 * st4a2[0])
    pre = jnp.sum(fluxes[:2], axis=0)
    fluxes = jnp.concatenate([tau2[:2, 0] * fluxes[:2] + emis0 * brad0,
                              fluxes[2:]], axis=0)
    dfa_add[0] = dfa_add[0] + pre - jnp.sum(fluxes[:2], axis=0)

    corlw1 = dhs[0] * stratc[1] * st4a1[0] + stratc[0]
    corlw2 = dhs[1] * stratc[1] * st4a1[1]
    dfa_add[0] = dfa_add[0] - corlw1
    dfa_add[1] = dfa_add[1] - corlw2
    olr = corlw1 + corlw2 + jnp.sum(fluxes, axis=0)
    dfabs = dfabs + jnp.stack(dfa_add, axis=0)
    return slr, olr, dfabs


def upward_longwave(dhs: np.ndarray, tau2: jnp.ndarray,
                    stratc: jnp.ndarray, ta: jnp.ndarray, ts: jnp.ndarray,
                    fsfcd: jnp.ndarray, fsfcu: jnp.ndarray,
                    st4a1: jnp.ndarray, st4a2: jnp.ndarray,
                    flux: jnp.ndarray, dfabs: jnp.ndarray
                    ) -> Tuple[jnp.ndarray, ...]:
    """-> (slr, olr, dfabs) (longwave_radiation.f90:120-194)."""
    kx = ta.shape[0]
    refsfc = 1.0 - EMISFC
    slr = fsfcu - fsfcd

    fb_ts = _fband_at(ts, axis=0)  # [4, il, ix]
    fb = _fband_at(ta, axis=1)     # [kx, 4, il, ix]
    fluxes = [fb_ts[jb] * fsfcu + refsfc * flux[jb]
              for jb in range(NBAND)]

    dfabs = rowops.row_add(dfabs, kx - 1, EPSLW * fsfcu)

    for jb in range(NBAND):
        f = fluxes[jb]
        for k in range(kx - 1, 0, -1):  # 0-based kx-1 .. 1
            emis = 1.0 - tau2[jb, k]
            brad = fb[k, jb] * (st4a1[k] - emis * st4a2[k])
            dfabs = rowops.row_add(dfabs, k, f)
            f = tau2[jb, k] * f + emis * brad
            dfabs = rowops.row_add(dfabs, k, -f)
        fluxes[jb] = f

    # stratosphere k=1, bands 1-2
    for jb in range(2):
        emis = 1.0 - tau2[jb, 0]
        brad = fb[0, jb] * (st4a1[0] - emis * st4a2[0])
        dfabs = rowops.row_add(dfabs, 0, fluxes[jb])
        fluxes[jb] = tau2[jb, 0] * fluxes[jb] + emis * brad
        dfabs = rowops.row_add(dfabs, 0, -fluxes[jb])

    corlw1 = dhs[0] * stratc[1] * st4a1[0] + stratc[0]
    corlw2 = dhs[1] * stratc[1] * st4a1[1]
    dfabs = rowops.row_add(dfabs, 0, -corlw1)
    dfabs = rowops.row_add(dfabs, 1, -corlw2)
    olr = corlw1 + corlw2 + fluxes[0] + fluxes[1] + fluxes[2] + fluxes[3]
    return slr, olr, dfabs
