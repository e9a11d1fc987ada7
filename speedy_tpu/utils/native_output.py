"""ctypes bindings for the native asynchronous NetCDF writer.

The C++ worker (native/ncwriter.cpp) encodes NetCDF-3 classic files and
performs disk I/O on a background thread, so output-every-step runs never
block the step loop. Falls back to the scipy-based NetCDFWriter when the
shared library is unavailable (it is auto-built with g++ on first use).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from ..config import ModelConfig
from ..geometry import build_geometry_np
from .calendar import Datetime

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB = None


def _load_library() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    so = os.path.abspath(os.path.join(_NATIVE_DIR, "libncwriter.so"))
    src = os.path.abspath(os.path.join(_NATIVE_DIR, "ncwriter.cpp"))
    if not os.path.exists(so) and os.path.exists(src):
        try:
            subprocess.run(
                ["g++", "-O2", "-std=c++17", "-fPIC", "-Wall", "-shared",
                 "-o", so, src, "-lpthread"],
                check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
    if not os.path.exists(so):
        return None
    lib = ctypes.CDLL(so)
    FP = ctypes.POINTER(ctypes.c_float)
    sig = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
           FP, FP, FP, ctypes.c_float, ctypes.c_char_p,
           FP, FP, FP, FP, FP, FP]
    lib.ncw_write_file.argtypes = sig
    lib.ncw_write_file.restype = ctypes.c_int
    lib.ncw_submit.argtypes = sig
    lib.ncw_submit.restype = ctypes.c_int
    lib.ncw_drain.restype = ctypes.c_int
    lib.ncw_pending.restype = ctypes.c_int
    _LIB = lib
    return lib


def native_available() -> bool:
    return _load_library() is not None


class AsyncNetCDFWriter:
    """Drop-in replacement for utils.output.NetCDFWriter backed by the C++
    async worker. Call .drain() (or use as context manager) before reading
    the files back."""

    def __init__(self, cfg: ModelConfig, outdir: str = ".",
                 synchronous: bool = False):
        lib = _load_library()
        if lib is None:
            raise RuntimeError("native ncwriter unavailable (g++ build "
                               "failed); use utils.output.NetCDFWriter")
        self._lib = lib
        self.cfg = cfg
        self.outdir = outdir
        self.synchronous = synchronous
        os.makedirs(outdir, exist_ok=True)
        geom = build_geometry_np(cfg)
        self.lat = np.ascontiguousarray(np.degrees(geom["radang"]),
                                        np.float32)
        self.lon = np.ascontiguousarray(np.arange(cfg.ix) * 360.0 / cfg.ix,
                                        np.float32)
        self.lev = np.ascontiguousarray(geom["fsg"], np.float32)

    def __call__(self, step: int, date: Datetime, start: Datetime,
                 fields: dict) -> str:
        cfg = self.cfg
        name = f"{date.year:04d}{date.month:02d}{date.day:02d}" \
            f"{date.hour:02d}{date.minute:02d}.nc"
        path = os.path.join(self.outdir, name)
        units = (f"hours since {start.year:04d}-{start.month:02d}-"
                 f"{start.day:02d} {start.hour:02d}:{start.minute:02d}:0.0")
        FP = ctypes.POINTER(ctypes.c_float)
        arrs = {k: np.ascontiguousarray(fields[k], np.float32)
                for k in ("u", "v", "t", "q", "phi", "ps")}
        fn = self._lib.ncw_write_file if self.synchronous \
            else self._lib.ncw_submit
        rc = fn(path.encode(), cfg.ix, cfg.il, cfg.kx,
                self.lon.ctypes.data_as(FP), self.lat.ctypes.data_as(FP),
                self.lev.ctypes.data_as(FP),
                ctypes.c_float(step * 24.0 / cfg.nsteps), units.encode(),
                *[arrs[k].ctypes.data_as(FP)
                  for k in ("u", "v", "t", "q", "phi", "ps")])
        if rc != 0:
            raise IOError(f"ncwriter failed for {path} (rc={rc})")
        return path

    def drain(self) -> None:
        errors = self._lib.ncw_drain()
        if errors:
            raise IOError(f"ncwriter: {errors} async writes failed")

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.drain()
