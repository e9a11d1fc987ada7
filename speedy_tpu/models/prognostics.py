"""Rest-state initial conditions.

Reference: source/prognostics.f90:34-127. Reference atmosphere at rest:
288 K surface / 216 K stratosphere two-regime temperature profile, log(ps)
hydrostatically balanced with the orography, humidity from a fixed relative
humidity and scale-height profile.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import ModelConfig
from ..constants import GAMMA, GRAV, HSCALE, HSHUM, REFRH1, RGAS
from .boundaries import Boundaries, grid_to_spec_np
from .state import PrognosticState, zeros_state


def rest_state(cfg: ModelConfig, geom_np: dict, sp_tables: dict,
               bounds: Boundaries) -> PrognosticState:
    """Build the initial PrognosticState (time level 0 populated; level 1 is
    filled by the leapfrog bootstrap)."""
    mx, nx, kx = cfg.mx, cfg.nx, cfg.kx
    fsg = geom_np["fsg"]
    phis = np.asarray(bounds.phis, dtype=np.float64)    # [mx, nx, 2]
    phis0 = np.asarray(bounds.phis0, dtype=np.float64)  # [il, ix]

    gam1 = GAMMA / (1000.0 * GRAV)
    tref, ttop = 288.0, 216.0
    gam2 = gam1 / tref
    rgam = RGAS * gam1
    rgamr = 1.0 / rgam

    # --- temperature (prognostics.f90:62-83) ---
    t = np.zeros((kx, mx, nx, 2))
    surfs = -gam1 * phis
    # global-mean coefficients: value * sqrt(2) since P00 = 1/sqrt(2)
    t[0, 0, 0, 0] = np.sqrt(2.0) * ttop
    t[1, 0, 0, 0] = np.sqrt(2.0) * ttop
    surfs[0, 0, 0] = np.sqrt(2.0) * tref - gam1 * phis[0, 0, 0]
    surfs[0, 0, 1] = -gam1 * phis[0, 0, 1]
    for k in range(2, kx):
        t[k] = surfs * fsg[k] ** rgam

    # --- log(ps) hydrostatically balanced with orography
    # (prognostics.f90:85-96); p_ref = 1013 hPa at z=0 ---
    rlog0 = np.log(1.013)
    surfg = rlog0 + rgamr * np.log(1.0 - gam2 * phis0)
    ps = grid_to_spec_np(sp_tables, surfg)
    m0 = np.arange(mx)[:, None, None]
    n0 = np.arange(nx)[None, :, None]
    trunc_mask = (m0 + n0) <= cfg.trunc
    if cfg.ix == 4 * cfg.iy:
        ps = ps * trunc_mask

    # --- humidity (prognostics.f90:98-117): q g/kg from RH=0.7 ---
    esref = 17.0
    qref = REFRH1 * 0.622 * esref
    qexp = HSCALE / HSHUM
    qsurf_g = qref * np.exp(qexp * surfg)
    qsurf = grid_to_spec_np(sp_tables, qsurf_g)
    if cfg.ix == 4 * cfg.iy:
        qsurf = qsurf * trunc_mask
    tr = np.zeros((cfg.ntr, kx, mx, nx, 2))
    for k in range(2, kx):
        tr[0, k] = qsurf * fsg[k] ** qexp

    state = zeros_state(cfg)
    rt = cfg.rdtype
    return state._replace(
        t=state.t.at[0].set(jnp.asarray(t, rt)),
        ps=state.ps.at[0].set(jnp.asarray(ps, rt)),
        tr=state.tr.at[0].set(jnp.asarray(tr, rt)),
    )
