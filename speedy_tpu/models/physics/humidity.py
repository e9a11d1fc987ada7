"""Humidity utilities: saturation specific humidity and conversions.

Reference: source/humidity.f90. Elementwise; the ice branch (T < 273.16)
becomes a where-select.
"""
from __future__ import annotations

import jax.numpy as jnp


def get_qsat(ta: jnp.ndarray, psa, sig: float) -> jnp.ndarray:
    """Saturation specific humidity in g/kg (humidity.f90:44-78).

    ``ta``: temperature [K]; ``psa``: normalized surface pressure p/p0
    (broadcastable to ta); ``sig``: sigma level, or <= 0 for the
    constant-pressure variant (which uses psa itself as the pressure).
    """
    e0, c1, c2 = 6.108e-3, 17.269, 21.875
    t0, t1, t2 = 273.16, 35.86, 7.66
    es = jnp.where(
        ta >= t0,
        e0 * jnp.exp(c1 * (ta - t0) / (ta - t1)),
        e0 * jnp.exp(c2 * (ta - t0) / (ta - t2)),
    )
    if isinstance(sig, (int, float)) and sig <= 0.0:
        # constant-pressure variant (reference uses the scalar ps(1,1);
        # callers pass that value as psa)
        return 622.0 * es / (psa - 0.378 * es)
    return 622.0 * es / (sig * psa - 0.378 * es)


def spec_hum_to_rel_hum(ta, psa, sig, qa):
    """-> (rh, qsat) (humidity.f90:17-27)."""
    qsat = get_qsat(ta, psa, sig)
    return qa / qsat, qsat


def rel_hum_to_spec_hum(ta, psa, sig, rh):
    """-> (qa, qsat) (humidity.f90:31-41)."""
    qsat = get_qsat(ta, psa, sig)
    return rh * qsat, qsat
