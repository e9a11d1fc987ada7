"""Prognostic model state as an immutable pytree.

Replaces the reference's module-level global arrays (prognostics.f90:16-24)
with an explicit functional state. Spectral fields use the packed real
layout [..., mx, nx, 2]; the leapfrog's two time levels are a leading axis
of size 2 (level 0 = F(1), level 1 = F(2) in the reference's notation).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class PrognosticState(NamedTuple):
    """Spectral prognostics at both leapfrog time levels.

    Shapes (reference prognostics.f90:16-20, time level moved to front):
      vor, div, t: [2, kx, mx, nx, 2]
      ps:          [2, mx, nx, 2]      log(p_s / p0)
      tr:          [2, ntr, kx, mx, nx, 2]   tracer 0 = specific humidity g/kg
    """
    vor: jnp.ndarray
    div: jnp.ndarray
    t: jnp.ndarray
    ps: jnp.ndarray
    tr: jnp.ndarray


def zeros_state(cfg) -> PrognosticState:
    t = cfg.rdtype
    kx, mx, nx, ntr = cfg.kx, cfg.mx, cfg.nx, cfg.ntr
    return PrognosticState(
        vor=jnp.zeros((2, kx, mx, nx, 2), t),
        div=jnp.zeros((2, kx, mx, nx, 2), t),
        t=jnp.zeros((2, kx, mx, nx, 2), t),
        ps=jnp.zeros((2, mx, nx, 2), t),
        tr=jnp.zeros((2, ntr, kx, mx, nx, 2), t),
    )
