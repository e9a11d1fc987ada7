"""Boundary-file reading (NetCDF4/HDF5 via h5py).

Replaces the reference's NetCDF-Fortran read path (input_output.f90:15-92).
Semantics preserved exactly:
* files store latitude north -> south; the model grid runs south -> north, so
  fields are flipped on read (input_output.f90:36,58,88);
* values <= -999 are set to zero (missing-data convention,
  input_output.f90:37,62,89);
* files hold float32; values are promoted to float64 for host-side setup.

Returned arrays use the [il, ix] (lat, lon) layout, or [12, il, ix] for
monthly climatologies.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None

# Default search path for boundary files: the reference repo's T30
# climatology directory, overridable via environment or argument.
DEFAULT_BC_PATHS = [
    os.environ.get("SPEEDY_BC_PATH", ""),
    "data/bc/t30/clim",
    "/root/reference/data/bc/t30/clim",
]


def find_boundary_file(name: str, search: Optional[list] = None) -> str:
    for base in (search or DEFAULT_BC_PATHS):
        if not base:
            continue
        path = os.path.join(base, name)
        if os.path.exists(path):
            return path
    raise FileNotFoundError(
        f"boundary file {name!r} not found in {search or DEFAULT_BC_PATHS}")


def load_boundary_file(name: str, var: str,
                       months: Optional[int] = None,
                       search: Optional[list] = None) -> np.ndarray:
    """Read a 2D field ([il, ix]) or monthly climatology ([months, il, ix]).

    Mirrors the three overloads of input_output.f90:23-92: latitude flip
    N->S -> S->N and <=-999 -> 0.
    """
    path = find_boundary_file(name, search)
    with h5py.File(path, "r") as f:
        data = np.asarray(f[var], dtype=np.float64)
    if months is not None:
        assert data.ndim == 3 and data.shape[0] == months, (name, var, data.shape)
        data = data[:, ::-1, :]
    else:
        assert data.ndim == 2, (name, var, data.shape)
        data = data[::-1, :]
    data[data <= -999.0] = 0.0
    return data
