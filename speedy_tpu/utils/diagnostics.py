"""Model diagnostics and the numerical-stability guard.

Reference: source/diagnostics.f90. Per-level eddy kinetic energy of the
rotational and divergent flow plus global-mean temperature; the host-side
guard reproduces the reference's hard abort outside the accepted ranges
(diagnostics.f90:59-69).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops import spectral as sp


class Diagnostics(NamedTuple):
    reke: jnp.ndarray   # [kx] rotational eddy kinetic energy
    deke: jnp.ndarray   # [kx] divergent eddy kinetic energy
    tmean: jnp.ndarray  # [kx] global-mean temperature (K)


class InstabilityError(RuntimeError):
    pass


def compute_diagnostics(sc: sp.SpectralConsts, vor: jnp.ndarray,
                        div: jnp.ndarray, t: jnp.ndarray) -> Diagnostics:
    """vor/div/t are spectral [kx, mx, nx, 2] at one time level
    (diagnostics.f90:29-50). Jit-safe."""
    def eke(x):
        # -sum_{m>=1,n} Re(invlap(x) * conj(x)); for packed reals the real
        # part of a*conj(b) is a_re*b_re + a_im*b_im.
        inv = sp.inverse_laplacian(sc, x)
        return -jnp.sum(inv[:, 1:] * x[:, 1:], axis=(-3, -2, -1))

    tmean = jnp.sqrt(0.5) * t[:, 0, 0, 0]
    return Diagnostics(reke=eke(vor), deke=eke(div), tmean=tmean)


def check_diagnostics(diag: Diagnostics, istep: int) -> None:
    """Host-side guard: abort on instability (diagnostics.f90:59-69)."""
    import numpy as np
    reke = np.asarray(diag.reke)
    deke = np.asarray(diag.deke)
    tmean = np.asarray(diag.tmean)
    bad = (np.any(reke > 500.0) or np.any(deke > 500.0)
           or np.any(tmean < 180.0) or np.any(tmean > 320.0)
           or not (np.all(np.isfinite(reke)) and np.all(np.isfinite(deke))
                   and np.all(np.isfinite(tmean))))
    if bad:
        raise InstabilityError(
            f"Model variables out of accepted range at step {istep}: "
            f"reke={reke}, deke={deke}, temp={tmean}")


def format_diagnostics(diag: Diagnostics, istep: int) -> str:
    import numpy as np
    fmt = lambda a: "".join(f"{x:8.2f}" for x in np.asarray(a))
    return (f" step ={istep:6d} reke ={fmt(diag.reke)}\n"
            f"{'':13s} deke ={fmt(diag.deke)}\n"
            f"{'':13s} temp ={fmt(diag.tmean)}")
