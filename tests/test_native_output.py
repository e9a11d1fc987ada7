"""Native C++ async NetCDF writer: byte-level format validation against
scipy's independent NetCDF3 reader, and sync/async equivalence."""
import os

import numpy as np
import pytest

from speedy_tpu.config import t30
from speedy_tpu.utils.calendar import Datetime
from speedy_tpu.utils.native_output import (AsyncNetCDFWriter,
                                            native_available)
from speedy_tpu.utils.output import NetCDFWriter


pytestmark = pytest.mark.skipif(not native_available(),
                                reason="g++/native writer unavailable")


def _fields(cfg, seed=0):
    rng = np.random.default_rng(seed)
    return dict(
        u=rng.normal(0, 10, (cfg.kx, cfg.il, cfg.ix)),
        v=rng.normal(0, 10, (cfg.kx, cfg.il, cfg.ix)),
        t=rng.normal(260, 20, (cfg.kx, cfg.il, cfg.ix)),
        q=rng.uniform(0, 0.02, (cfg.kx, cfg.il, cfg.ix)),
        phi=rng.normal(5000, 3000, (cfg.kx, cfg.il, cfg.ix)),
        ps=rng.normal(1.0e5, 3e3, (cfg.il, cfg.ix)),
    )


def test_native_writer_matches_scipy_writer(tmp_path):
    from scipy.io import netcdf_file
    cfg = t30()
    fields = _fields(cfg)
    date = Datetime(1982, 3, 14, 6, 40)
    start = Datetime(1982, 1, 1)

    w_py = NetCDFWriter(cfg, outdir=str(tmp_path / "py"))
    w_cc = AsyncNetCDFWriter(cfg, outdir=str(tmp_path / "cc"),
                             synchronous=True)
    p1 = w_py(107, date, start, fields)
    p2 = w_cc(107, date, start, fields)
    assert os.path.basename(p1) == os.path.basename(p2) == "198203140640.nc"

    f1 = netcdf_file(p1, mmap=False)
    f2 = netcdf_file(p2, mmap=False)
    assert set(f1.variables) == set(f2.variables)
    for k in f1.variables:
        a, b = f1.variables[k], f2.variables[k]
        np.testing.assert_array_equal(np.asarray(a[:]), np.asarray(b[:]), k)
        for att in ("long_name", "units"):
            assert getattr(a, att, None) == getattr(b, att, None), (k, att)


def test_async_submission_and_drain(tmp_path):
    from scipy.io import netcdf_file
    cfg = t30()
    start = Datetime(1982, 1, 1)
    with AsyncNetCDFWriter(cfg, outdir=str(tmp_path)) as w:
        paths = []
        date = start
        from speedy_tpu.utils.calendar import newdate
        for step in range(1, 9):
            date = newdate(date, cfg.nsteps)
            paths.append(w(step, date, start, _fields(cfg, seed=step)))
    # drained: every file is complete and readable
    for step, p in enumerate(paths, start=1):
        f = netcdf_file(p, mmap=False)
        np.testing.assert_allclose(float(f.variables["time"][0]),
                                   step * 24.0 / cfg.nsteps, rtol=1e-6)
        expect = _fields(cfg, seed=step)["t"].astype(np.float32)
        np.testing.assert_array_equal(np.asarray(f.variables["t"][0]),
                                      expect)
