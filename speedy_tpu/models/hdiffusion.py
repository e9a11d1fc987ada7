"""Horizontal (hyper)diffusion coefficients and application.

Reference: source/horizontal_diffusion.f90. del^8 damping for T/vorticity
and divergence (npowhd=4), del^2 stratospheric extra diffusion, and the
orographic-correction vertical profiles. The implicit factors
1/(1 + dmp*dt) depend on the step length and live in the per-dt
ImplicitConsts (initialize_implicit, implicit.f90:50-54).
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from ..config import ModelConfig
from ..constants import GAMMA, GRAV, HSCALE, HSHUM, RGAS, THD, THDD, THDS


class DiffusionConsts(NamedTuple):
    dmp: jnp.ndarray    # [mx, nx] explicit del^8 damping, T and vorticity
    dmpd: jnp.ndarray   # [mx, nx] explicit del^8 damping, divergence
    dmps: jnp.ndarray   # [mx, nx] explicit del^2 stratospheric damping
    tcorv: jnp.ndarray  # [kx] orographic T-correction vertical profile
    qcorv: jnp.ndarray  # [kx] orographic q-correction vertical profile


def build_diffusion_np(cfg: ModelConfig, geom_np: dict) -> dict:
    """Float64 tables (horizontal_diffusion.f90:36-82)."""
    assert cfg.nsteps % 2 == 0, "Invalid no. of time steps"
    npowhd = 4
    # damping times default to the reference's T30-tuned constants
    # (dynamical_constants.f90:17-20) but are config-overridable: the
    # stretch presets resolve far more energetic small scales and need
    # proportionally stronger damping (t170 sets these; measured r04)
    hdiff = 1.0 / (getattr(cfg, "thd", THD) * 3600.0)
    hdifd = 1.0 / (getattr(cfg, "thdd", THDD) * 3600.0)
    hdifs = 1.0 / (getattr(cfg, "thds", THDS) * 3600.0)
    rlap = 1.0 / (cfg.trunc * (cfg.trunc + 1))

    m0 = np.arange(cfg.mx, dtype=np.float64)[:, None]
    n0 = np.arange(cfg.nx, dtype=np.float64)[None, :]
    twn = m0 + n0
    elap = twn * (twn + 1.0) * rlap
    dmp = hdiff * elap**npowhd
    dmpd = hdifd * elap**npowhd
    dmps = hdifs * elap

    rgam = RGAS * GAMMA / (1000.0 * GRAV)
    qexp = HSCALE / HSHUM
    fsg = geom_np["fsg"]
    tcorv = np.zeros(cfg.kx)
    qcorv = np.zeros(cfg.kx)
    tcorv[1:] = fsg[1:] ** rgam
    qcorv[2:] = fsg[2:] ** qexp
    return dict(dmp=dmp, dmpd=dmpd, dmps=dmps, tcorv=tcorv, qcorv=qcorv)


def build_diffusion(cfg: ModelConfig, geom_np: dict) -> DiffusionConsts:
    t = cfg.rdtype
    tables = build_diffusion_np(cfg, geom_np)
    return DiffusionConsts(**{k: jnp.asarray(v, t) for k, v in tables.items()})


def apply_diffusion(field: jnp.ndarray, fdt: jnp.ndarray,
                    dmp: jnp.ndarray, dmp1: jnp.ndarray) -> jnp.ndarray:
    """fdt_out = (fdt_in - dmp*field) * dmp1, broadcast over levels and the
    re/im axis (horizontal_diffusion.f90:86-105)."""
    return (fdt - dmp[..., None] * field) * dmp1[..., None]
