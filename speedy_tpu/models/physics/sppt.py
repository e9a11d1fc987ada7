"""SPPT: stochastically perturbed parametrization tendencies.

Reference: source/sppt.f90 (ECMWF SPPT, Palmer et al. 2009). Spectral AR(1)
multiplicative noise. The TPU build replaces the reference's
system-clock-seeded Fortran RNG (sppt.f90:119-132, irreproducible) with
explicit jax.random keys: runs are reproducible and ensembles vmap over
member keys. The AR(1) state is initialized with the stationary
distribution at model build (the reference does the equivalent
(1-phi^2)^(-1/2) draw on first use, sppt.f90:74-86).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ...constants import REARTH
from ...ops import spectral as sp

TIME_DECORR = 6.0        # decorrelation time (h)
LEN_DECORR = 500000.0    # decorrelation length (m)
STDDEV = 0.33            # grid-point standard deviation


class SpptState(NamedTuple):
    spec: jnp.ndarray  # [kx, mx, nx, 2] AR(1) spectral state
    key: jnp.ndarray   # PRNG key


def sppt_sigma(cfg, el2: np.ndarray) -> np.ndarray:
    """Wavenumber-dependent noise amplitude sigma[mx, nx] (sppt.f90:74-84)."""
    phi = np.exp(-(24.0 / cfg.nsteps) / TIME_DECORR)
    n = np.arange(1, cfg.trunc + 1, dtype=np.float64)
    f0 = np.sum((2 * n + 1) * np.exp(-0.5 * (LEN_DECORR / REARTH)**2
                                     * n * (n + 1)))
    f0 = np.sqrt((STDDEV**2 * (1 - phi**2)) / (2 * f0))
    return f0 * np.exp(-0.25 * LEN_DECORR**2 * el2)


def sppt_phi(cfg) -> float:
    return float(np.exp(-(24.0 / cfg.nsteps) / TIME_DECORR))


def init_sppt_state(cfg, sigma: np.ndarray, seed: int = 0) -> SpptState:
    """Stationary-distribution initialization of the AR(1) state."""
    phi = sppt_phi(cfg)
    key, sub = jax.random.split(jax.random.PRNGKey(seed))
    eta = _clipped_normal(sub, (cfg.kx, cfg.mx, cfg.nx, 2), cfg.rdtype)
    spec = (1 - phi**2) ** (-0.5) * jnp.asarray(sigma, cfg.rdtype)[:, :, None] * eta
    return SpptState(spec=spec, key=key)


def _clipped_normal(key, shape, dtype):
    eta = jax.random.normal(key, shape, dtype)
    return jnp.clip(eta, -10.0, 10.0)


def sppt_ar1(cfg, sigma: np.ndarray,
             state: SpptState) -> Tuple[jnp.ndarray, SpptState]:
    """AR(1) spectral update only (sppt.f90:84-90). The synthesis of the
    returned spec rides the main dynamics transform batch
    (tendencies.grid_dynamics_tendencies) — one more field in the same
    einsum chain instead of a separate small transform dispatch."""
    phi = sppt_phi(cfg)
    key, sub = jax.random.split(state.key)
    eta = _clipped_normal(sub, state.spec.shape, state.spec.dtype)
    spec = phi * state.spec \
        + jnp.asarray(sigma, state.spec.dtype)[:, :, None] * eta
    return spec, SpptState(spec=spec, key=key)


def gen_sppt(cfg, sc: sp.SpectralConsts, sigma: np.ndarray,
             state: SpptState) -> Tuple[jnp.ndarray, SpptState]:
    """AR(1) update + transform to a grid pattern clipped to [-1, 1]
    (sppt.f90:45-99). Returns ([kx, il, ix] pattern, new state).
    Standalone path (used by the leapfrog bootstrap, where the reference
    advances the AR(1) once per internal step); the hot path pre-batches
    the synthesis via sppt_ar1."""
    spec, state = sppt_ar1(cfg, sigma, state)
    grid = sp.spec_to_grid(sc, spec)
    grid = jnp.clip(grid, -1.0, 1.0)
    return grid, state
