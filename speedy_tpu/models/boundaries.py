"""Time-invariant boundary conditions: orography, land-sea mask, albedo.

Reference: source/boundaries.f90. Host-side numpy setup producing device
constants; the spectrally-filtered orography feeds the rest-state init and
the geopotential (boundaries.f90:28-43, 75-94).
"""
from __future__ import annotations

import logging
from typing import NamedTuple, Optional

import numpy as np
import jax.numpy as jnp

from ..config import ModelConfig
from ..constants import GRAV
from ..ops import spectral as sp
from ..utils.io import load_boundary_file


class Boundaries(NamedTuple):
    fmask: jnp.ndarray   # [il, ix] fractional land-sea mask
    phi0: jnp.ndarray    # [il, ix] unfiltered surface geopotential
    phis0: jnp.ndarray   # [il, ix] spectrally-filtered surface geopotential
    phis: jnp.ndarray    # [mx, nx, 2] spectral surface geopotential
    alb0: jnp.ndarray    # [il, ix] bare-land annual-mean albedo


def spectral_truncation_np(cfg: ModelConfig, tables: dict,
                           fg: np.ndarray) -> np.ndarray:
    """Grid -> spectral -> truncate l <= trunc -> grid (boundaries.f90:75-94),
    in float64 numpy at setup time."""
    fm = np.einsum("ji,mri->jmr", fg, tables["dft_ana"])
    spec = np.einsum("jmr,mnj->mnr", fm, tables["cpol_dir"])
    m0 = np.arange(cfg.mx)[:, None, None]
    n0 = np.arange(cfg.nx)[None, :, None]
    spec = spec * ((m0 + n0) <= cfg.trunc)
    fm2 = np.einsum("mnr,mnj->jmr", spec, tables["cpol_inv"])
    return np.einsum("jmr,mri->ji", fm2, tables["dft_syn"])


def grid_to_spec_np(tables: dict, fg: np.ndarray) -> np.ndarray:
    fm = np.einsum("...ji,mri->...jmr", fg, tables["dft_ana"])
    return np.einsum("...jmr,mnj->...mnr", fm, tables["cpol_dir"])


def forchk(fmask: np.ndarray, fmin: float, fmax: float, fset: float,
           field: np.ndarray, name: str = "field") -> np.ndarray:
    """Range-check a surface field against the mask; points with zero mask are
    set to ``fset`` (boundaries.f90:47-72). Returns the repaired field.

    Input-QC observability: counts masked points outside [fmin, fmax] per 2D
    slice like the reference's ``nfault`` counter (boundaries.f90:58-66 — the
    reference accumulates it but never prints; we log it when nonzero)."""
    field = field.copy()
    masked = fmask > 0.0
    vals = field[..., masked]
    nfault = int(((vals < fmin) | (vals > fmax)).sum())
    if nfault:
        logging.getLogger(__name__).warning(
            "forchk: %d out-of-range point(s) in %r (allowed [%g, %g])",
            nfault, name, fmin, fmax)
    field[..., ~masked] = fset
    return field


def fillsf(sf: np.ndarray, fmis: float) -> np.ndarray:
    """Replace missing values (< fmis) by zonal fill, equator -> poles
    (boundaries.f90:96-142). [il, ix] layout, latitude south -> north."""
    sf = sf.copy()
    il, ix = sf.shape
    # hemisphere 1: j = il/2 - 1 down to 0 (equator -> south pole);
    # hemisphere 2: j = il/2 up to il - 1 (equator -> north pole)
    order = list(range(il // 2 - 1, -1, -1)) + list(range(il // 2, il))
    for j in order:
        row = sf[j]
        miss = row < fmis
        if not miss.any():
            continue
        nmis = int(miss.sum())
        work = np.where(miss, 0.0, row)
        if nmis < ix:
            fmean = work.sum() / (ix - nmis)
        work = np.where(miss, fmean, row)
        left = np.roll(work, 1)
        right = np.roll(work, -1)
        sf[j] = np.where(miss, 0.5 * (left + right), row)
    return sf


def build_boundaries(cfg: ModelConfig, sp_tables: dict,
                     search: Optional[list] = None) -> Boundaries:
    """Read surface.nc and build the boundary constants
    (boundaries.f90:28-43)."""
    t = cfg.rdtype
    tgt = (cfg.il, cfg.ix)
    orog = load_boundary_file("surface.nc", "orog", search=search,
                              target_shape=tgt)
    phi0 = GRAV * orog
    phis0 = spectral_truncation_np(cfg, sp_tables, phi0)
    phis = grid_to_spec_np(sp_tables, phis0)
    fmask = load_boundary_file("surface.nc", "lsm", search=search,
                               target_shape=tgt)
    alb0 = load_boundary_file("surface.nc", "alb", search=search,
                              target_shape=tgt)
    return Boundaries(
        fmask=jnp.asarray(fmask, t),
        phi0=jnp.asarray(phi0, t),
        phis0=jnp.asarray(phis0, t),
        phis=jnp.asarray(phis, t),
        alb0=jnp.asarray(alb0, t),
    )
