#!/usr/bin/env python
"""Interpolate model output from sigma levels to pressure levels.

TPU-build replacement for the reference's scripts/sigma_to_pressure.py
(which uses iris); this version reads the model's own NetCDF output with
scipy and performs log-pressure linear interpolation per column.

Usage:
    python scripts/sigma_to_pressure.py rundir/198201020000.nc \
        --levels 925 850 700 500 300 200 100 --out out_p.nc
"""
import argparse

import numpy as np
from scipy.io import netcdf_file


def sigma_to_pressure(ps, sigma, field, plevs_pa):
    """field [kx, lat, lon] on sigma levels -> [np, lat, lon] on pressure
    levels (linear in log p; clamped outside the column range)."""
    kx, nlat, nlon = field.shape
    p_model = sigma[:, None, None] * ps[None]          # [kx, lat, lon]
    logp = np.log(p_model)
    out = np.empty((len(plevs_pa), nlat, nlon), field.dtype)
    for i, p in enumerate(plevs_pa):
        lp = np.log(p)
        # find bracketing model levels per column
        idx = np.clip(np.sum(logp < lp, axis=0), 1, kx - 1)
        lo = idx - 1
        hi = idx
        take = lambda a, k: np.take_along_axis(a, k[None], axis=0)[0]
        l0, l1 = take(logp, lo), take(logp, hi)
        f0, f1 = take(field, lo), take(field, hi)
        w = np.clip((lp - l0) / (l1 - l0), 0.0, 1.0)
        out[i] = f0 + w * (f1 - f0)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input", help="model output NetCDF file")
    ap.add_argument("--levels", type=float, nargs="+",
                    default=[925, 850, 700, 500, 300, 200, 100],
                    help="pressure levels in hPa")
    ap.add_argument("--out", required=True)
    ap.add_argument("--vars", nargs="+", default=["u", "v", "t", "q", "phi"])
    args = ap.parse_args()

    src = netcdf_file(args.input, mmap=False)
    sigma = np.asarray(src.variables["lev"][:], np.float64)
    ps = np.asarray(src.variables["ps"][0], np.float64)
    plevs = np.asarray(args.levels, np.float64) * 100.0  # hPa -> Pa

    dst = netcdf_file(args.out, "w")
    dst.createDimension("time", None)
    dst.createDimension("lon", src.dimensions["lon"])
    dst.createDimension("lat", src.dimensions["lat"])
    dst.createDimension("plev", len(plevs))
    for dim in ("time", "lon", "lat"):
        v = src.variables[dim]
        nv = dst.createVariable(dim, "f", (dim,))
        nv[:] = v[:]
    pv = dst.createVariable("plev", "f", ("plev",))
    pv.units = b"Pa"
    pv[:] = plevs.astype(np.float32)

    for name in args.vars:
        f = np.asarray(src.variables[name][0], np.float64)
        interp = sigma_to_pressure(ps, sigma, f, plevs)
        v = dst.createVariable(name, "f", ("time", "plev", "lat", "lon"))
        v[0] = interp.astype(np.float32)
    dst.close()
    print(f"wrote {args.out}: {args.vars} on {len(plevs)} pressure levels")


if __name__ == "__main__":
    main()
