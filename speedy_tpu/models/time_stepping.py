"""Leapfrog time stepping with Robert-Williams filtering.

Reference: source/time_stepping.f90. A pure function of the state; the
three-step bootstrap (first_step) uses three ImplicitConsts sets built for
dt/2, dt and 2dt (time_stepping.f90:12-24).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp

from ..config import ModelConfig
from ..constants import TDRS
from ..ops import spectral as sp
from .hdiffusion import DiffusionConsts, apply_diffusion
from .implicit import ImplicitConsts
from .state import PrognosticState
from .tendencies import DynConsts, get_tendencies


class OrographicCorrection(NamedTuple):
    """Daily-updated horizontal orographic-correction fields
    (forcing.f90:73-99); zero for the adiabatic core."""
    tcorh: jnp.ndarray  # [mx, nx, 2]
    qcorh: jnp.ndarray  # [mx, nx, 2]


def zero_orographic_correction(cfg: ModelConfig) -> OrographicCorrection:
    z = jnp.zeros((cfg.mx, cfg.nx, 2), cfg.rdtype)
    return OrographicCorrection(tcorh=z, qcorh=z)


def _step_field(cfg: ModelConfig, sc, j1: int, dt: float, eps: float,
                field2: jnp.ndarray, fdt: jnp.ndarray) -> jnp.ndarray:
    """Robert-Williams filtered leapfrog update of one two-time-level field
    (time_stepping.f90:142-167). ``field2`` has the time axis in front."""
    if cfg.ix == 4 * (cfg.il // 2):
        fdt = sp.trunct(sc, fdt)
    fold = field2[j1 - 1]  # F(j1): the filter's center value
    fnew = field2[0] + dt * fdt
    f1 = fold + cfg.wil * eps * (field2[0] - 2.0 * fold + fnew)
    f2 = fnew - (1.0 - cfg.wil) * eps * (f1 - 2.0 * fold + fnew)
    return jnp.stack([f1, f2], axis=0)


def step(cfg: ModelConfig, dyn: DynConsts, dc: DiffusionConsts,
         ic: ImplicitConsts, state: PrognosticState,
         j1: int, j2: int, dt: float,
         corr: OrographicCorrection,
         physics_fn=None, sppt_spec=None) -> Tuple[PrognosticState, object]:
    """One (possibly bootstrap) time step (time_stepping.f90:35-122).

    j1=1, j2=1: forward step; j1=1, j2=2: first leapfrog; j1=2, j2=2:
    filtered leapfrog. ``j1``/``j2`` are 1-based static ints matching the
    reference's convention (time level j maps to array index j-1).
    ``sppt_spec``: pre-updated SPPT spectral state whose synthesis rides
    the dynamics transform batch (None = in-physics gen_sppt fallback).
    """
    sc = dyn.sc
    vordt, divdt, tdt, psdt, trdt, aux = get_tendencies(
        cfg, dyn, ic, state, j2 - 1, physics_fn, sppt_spec)

    # ---- horizontal diffusion (time_stepping.f90:62-102) ----
    vordt = apply_diffusion(state.vor[0], vordt, dc.dmp, ic.dmp1)
    divdt = apply_diffusion(state.div[0], divdt, dc.dmpd, ic.dmp1d)

    ctmp = state.t[0] + corr.tcorh[None] * dc.tcorv[:, None, None, None]
    tdt = apply_diffusion(ctmp, tdt, dc.dmp, ic.dmp1)

    # stratospheric zonal-mean wind drag at the top level
    # (time_stepping.f90:77-81): m=0 row, level 0
    sdrag = 1.0 / (TDRS * 3600.0)
    vordt = vordt.at[0, 0].add(-sdrag * state.vor[0, 0, 0])
    divdt = divdt.at[0, 0].add(-sdrag * state.div[0, 0, 0])

    vordt = apply_diffusion(state.vor[0], vordt, dc.dmps, ic.dmp1s)
    divdt = apply_diffusion(state.div[0], divdt, dc.dmps, ic.dmp1s)
    tdt = apply_diffusion(ctmp, tdt, dc.dmps, ic.dmp1s)

    # tracer (humidity) diffusion with orographic correction; note the
    # reference uses the divergence coefficients here (time_stepping.f90:96)
    qtmp = state.tr[0, 0] + corr.qcorh[None] * dc.qcorv[:, None, None, None]
    trdt = trdt.at[0].set(
        apply_diffusion(qtmp, trdt[0], dc.dmpd, ic.dmp1d))

    # ---- Robert-Williams leapfrog (time_stepping.f90:104-121) ----
    eps = 0.0 if j1 == 1 else cfg.rob
    ps = _step_field(cfg, sc, j1, dt, eps, state.ps, psdt)
    vor = _step_field(cfg, sc, j1, dt, eps, state.vor, vordt)
    div = _step_field(cfg, sc, j1, dt, eps, state.div, divdt)
    t = _step_field(cfg, sc, j1, dt, eps, state.t, tdt)
    tr = jnp.stack([
        _step_field(cfg, sc, j1, dt, eps, state.tr[:, i], trdt[i])
        for i in range(cfg.ntr)], axis=1)

    return PrognosticState(vor=vor, div=div, t=t, ps=ps, tr=tr), aux


def first_step(cfg: ModelConfig, dyn: DynConsts, dc: DiffusionConsts,
               ic_half: ImplicitConsts, ic_full: ImplicitConsts,
               state: PrognosticState, corr: OrographicCorrection,
               physics_fn=None) -> Tuple[PrognosticState, object]:
    """Leapfrog bootstrap (time_stepping.f90:12-24): forward half step, then
    a full first leapfrog step; the caller continues with the 2dt set."""
    state, aux = step(cfg, dyn, dc, ic_half, state, 1, 1, 0.5 * cfg.delt,
                      corr, physics_fn)
    state, aux = step(cfg, dyn, dc, ic_full, state, 1, 2, cfg.delt,
                      corr, physics_fn)
    return state, aux
