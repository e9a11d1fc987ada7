"""Benchmark the reference's ACTUAL default workload: output every step.

The shipped run configuration writes one NetCDF file per time step
(/root/reference/namelist.nml:3 nsteps_out=1; run.sh:52). This measures a
2-day T30L8 run (72 steps, 72+1 output files) through:
  1. no output            (Model.run_fast — the headline-bench path)
  2. Model.run, scipy writer      (synchronous host-side encoding)
  3. Model.run, async C++ writer  (native/ncwriter.cpp background thread)

Prints one JSON line per configuration with sim-days/min and the overhead
vs no-output. Run on the TPU for BASELINE.md numbers; runs anywhere.
"""
import json
import os
import shutil
import sys
import tempfile
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/speedy_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from speedy_tpu.config import t30
from speedy_tpu.models.model import Model
from speedy_tpu.utils.calendar import Datetime
from speedy_tpu.utils.output import NetCDFWriter
from speedy_tpu.utils.native_output import AsyncNetCDFWriter, native_available

N_DAYS = 2


def timed_run(model, writer_factory, label, results):
    start, end = Datetime(1982, 1, 1), Datetime(1982, 1, 1 + N_DAYS)
    outdir = tempfile.mkdtemp(prefix="speedy_bench_out_")
    # warm-up pass compiles the collect_output=True day program
    w = writer_factory(outdir)
    state = model.run(start, end, output_writer=w, verbose=False)
    if hasattr(w, "drain"):
        w.drain()
    nfiles_expect = len(os.listdir(outdir))
    shutil.rmtree(outdir)

    outdir = tempfile.mkdtemp(prefix="speedy_bench_out_")
    w = writer_factory(outdir)
    t0 = time.time()
    state = model.run(start, end, output_writer=w, verbose=False)
    if hasattr(w, "drain"):
        w.drain()
    wall = time.time() - t0
    nfiles = len(os.listdir(outdir))
    assert nfiles == nfiles_expect == N_DAYS * 36 + 1, (nfiles, nfiles_expect)
    shutil.rmtree(outdir)
    results[label] = N_DAYS / wall * 60.0


def timed_noout(model, results):
    state = model.run_fast(Datetime(1982, 1, 1), N_DAYS)  # compile
    t0 = time.time()
    state = model.run_fast(Datetime(1982, 1, 1), N_DAYS, state=state,
                           check=True)
    wall = time.time() - t0
    results["no_output"] = N_DAYS / wall * 60.0


def main():
    cfg = t30(precision="fp32", nsteps_out=1, nstdia=10**9)
    model = Model(cfg)
    results = {}
    timed_noout(model, results)
    timed_run(model, lambda d: NetCDFWriter(cfg, outdir=d), "scipy_writer",
              results)
    if native_available():
        timed_run(model, lambda d: AsyncNetCDFWriter(cfg, outdir=d),
                  "async_native_writer", results)
    base = results["no_output"]
    for label, dpm in results.items():
        print(json.dumps({
            "metric": f"sim_days_per_minute_t30l8_output_every_step",
            "config": label,
            "value": round(dpm, 1),
            "unit": "simulated-days/min",
            "overhead_vs_no_output_pct": round((base / dpm - 1.0) * 100, 1),
        }))


if __name__ == "__main__":
    main()
