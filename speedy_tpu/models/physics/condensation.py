"""Large-scale condensation: relaxation of q to a sigma-dependent RH
threshold, with latent heating and diagnosed precipitation.

Reference: source/large_scale_condensation.f90. Fully elementwise.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp

from ...constants import ALHC, CP, GRAV, P0
from . import rowops

TRLSC = 4.0    # relaxation time (h)
RHLSC = 0.9    # RH threshold at sigma=1
DRHLSC = 0.1   # vertical range of RH threshold
RHBLSC = 0.95  # boundary-layer RH threshold


def large_scale_condensation(geom_fsg: jnp.ndarray, geom_dhs: jnp.ndarray,
                             psa: jnp.ndarray, qa: jnp.ndarray,
                             qsat: jnp.ndarray, itop: jnp.ndarray
                             ) -> Tuple[jnp.ndarray, ...]:
    """(psa [il,ix], qa/qsat [kx,il,ix], itop [il,ix] 1-based cloud-top) ->
    (itop, precls, dtlsc, dqlsc). Reference lines 33-95."""
    kx = qa.shape[0]
    qsmax = 10.0
    rtlsc = 1.0 / (TRLSC * 3600.0)
    tfact = ALHC / CP
    prg = P0 / GRAV
    psa2 = psa**2

    # host-side level profile: keep it numpy so the [kx] -> [kx,1,1]
    # expansions below fold to constants at trace time (a traced 1-D ->
    # 3-D reshape is an unsupported Mosaic layout cast in the fused
    # Pallas kernel)
    sig2 = np.asarray(geom_fsg)**2           # [kx]
    rhref = RHLSC + DRHLSC * (sig2 - 1.0)
    rhref[kx - 1] = max(float(rhref[kx - 1]), RHBLSC)
    dqmax = qsmax * sig2 * rtlsc

    dqa = rhref[:, None, None] * qsat - qa   # [kx, il, ix]
    cond = dqa < 0.0
    dqlsc = jnp.where(cond, dqa * rtlsc, 0.0)
    dtlsc = jnp.where(
        cond,
        tfact * jnp.minimum(-dqlsc, dqmax[:, None, None] * psa2), 0.0)
    # level 1 (k=0) excluded (lsc f90:58-59, loops start at k=2)
    dqlsc = rowops.row_set(dqlsc, 0, 0.0)
    dtlsc = rowops.row_set(dtlsc, 0, 0.0)
    cond = rowops.row_set(cond, 0, False)

    # cloud-top update: itop = min(lowest condensing k, itop), 1-based
    k1b = np.arange(1, kx + 1)[:, None, None]  # np: Pallas-safe constant
    ktop = jnp.min(jnp.where(cond, k1b, kx + 1), axis=0)
    itop = jnp.minimum(ktop, itop)

    precls = -jnp.sum(geom_dhs[1:, None, None] * prg * dqlsc[1:], axis=0) * psa
    return itop, precls, dtlsc, dqlsc
