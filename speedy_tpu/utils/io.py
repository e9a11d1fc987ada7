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


def gaussian_seed_lats(il: int) -> np.ndarray:
    """Latitudes (radians, south -> north) of the il-point model grid, using
    the reference's asymptotic Gauss-node seed (geometry.f90:66-76)."""
    from ..constants import PI_F
    iy = il // 2
    j = np.arange(1, iy + 1, dtype=np.float64)
    sia_half = np.cos(PI_F * (j - 0.25) / (il + 0.5))
    lat_half = np.arcsin(sia_half)  # pole -> equator
    return np.concatenate([-lat_half, lat_half[::-1]])


def regrid_latlon(field: np.ndarray, il_dst: int, ix_dst: int) -> np.ndarray:
    """Bilinear regrid of [..., il_src, ix_src] fields between Gaussian-seed
    grids: periodic linear interpolation in longitude, linear in latitude
    with clamping poleward of the source's outermost rows.

    New capability relative to the reference (which ships resolution-keyed
    boundary files, run.sh:8): lets any resolution preset run off the T30
    climatology when no native files exist.
    """
    *lead, il_src, ix_src = field.shape
    if (il_src, ix_src) == (il_dst, ix_dst):
        return field
    flat = field.reshape(-1, il_src, ix_src)

    # Fill values (e.g. the NetCDF float default ~9.97e36 used by the land/
    # sea climatology files over the opposite surface) must not be blended
    # into valid points: interpolate with validity weighting and backfill
    # all-invalid targets with the per-slice valid mean (forchk then
    # repairs anything outside the relevant mask).
    valid = (np.abs(flat) < 1.0e30).astype(np.float64)
    fill_mean = np.array([
        s[v > 0].mean() if (v > 0).any() else 0.0
        for s, v in zip(flat, valid)])
    num = flat * valid

    def interp(a):
        # longitude: uniform periodic
        xl = np.arange(ix_dst) * (ix_src / ix_dst)
        i0 = np.floor(xl).astype(int) % ix_src
        i1 = (i0 + 1) % ix_src
        wx = (xl - np.floor(xl))[None, None, :]
        a = a[:, :, i0] * (1.0 - wx) + a[:, :, i1] * wx
        # latitude: linear on the seed latitudes, clamped at the poles
        lat_src = gaussian_seed_lats(il_src)
        lat_dst = gaussian_seed_lats(il_dst)
        j1 = np.searchsorted(lat_src, lat_dst).clip(1, il_src - 1)
        j0 = j1 - 1
        wy = ((lat_dst - lat_src[j0]) / (lat_src[j1] - lat_src[j0]))
        wy = np.clip(wy, 0.0, 1.0)[None, :, None]
        return a[:, j0, :] * (1.0 - wy) + a[:, j1, :] * wy

    num_i, den_i = interp(num), interp(valid)
    out = np.where(den_i > 1.0e-12, num_i / np.maximum(den_i, 1.0e-12),
                   fill_mean[:, None, None])
    return out.reshape(*lead, il_dst, ix_dst)


def load_boundary_file(name: str, var: str,
                       months: Optional[int] = None,
                       search: Optional[list] = None,
                       target_shape: Optional[tuple] = None) -> np.ndarray:
    """Read a 2D field ([il, ix]) or monthly climatology ([months, il, ix]).

    Mirrors the three overloads of input_output.f90:23-92: latitude flip
    N->S -> S->N and <=-999 -> 0. If ``target_shape`` (il, ix) differs from
    the file's grid, the field is bilinearly regridded (capability beyond
    the reference, which requires resolution-matched files).
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
    if target_shape is not None:
        data = regrid_latlon(data, *target_shape)
    return data
