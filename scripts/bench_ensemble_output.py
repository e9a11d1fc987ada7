"""BASELINE config 4 at full output depth: 64-member SPPT ensemble with
the reference's one-file-per-step output schema written per member
(memberNNN/yyyymmddhhmm.nc) through the async C++ NetCDF writer.

Prints one JSON line with member-days/min for the no-output and
output-every-step cases and the decomposition (device compute vs
device->host fetch vs writer drain), mirroring scripts/bench_output.py's
single-model methodology.

Usage: python scripts/bench_ensemble_output.py [--members 64] [--days 2]
"""
import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/speedy_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from speedy_tpu.config import t30
from speedy_tpu.models.model import Model
from speedy_tpu.parallel.ensemble import Ensemble
from speedy_tpu.utils import calendar as cal


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--members", type=int, default=64)
    ap.add_argument("--days", type=int, default=2)
    args = ap.parse_args()

    cfg = t30(precision="fp32", sppt_on=True)
    model = Model(cfg)
    start = cal.Datetime(1982, 1, 1)
    ens = Ensemble(model, args.members, base_seed=7)
    estate = ens.initialize(start)
    mdays = args.members * args.days

    # no-output reference (warm up the collect_output=False program)
    e2, _ = ens.run_days(estate, start, args.days)
    jax.block_until_ready(e2.prog.vor)
    t0 = time.time()
    e2, _ = ens.run_days(e2, cal.Datetime(1982, 1, 1 + args.days),
                         args.days)
    jax.block_until_ready(e2.prog.vor)
    t_noout = time.time() - t0

    outdir = tempfile.mkdtemp(prefix="speedy_ens_out_")
    try:
        def make_writer(i):
            d = os.path.join(outdir, f"member{i:03d}")
            try:
                from speedy_tpu.utils.native_output import AsyncNetCDFWriter
                return AsyncNetCDFWriter(cfg, d)
            except Exception:
                from speedy_tpu.utils.output import NetCDFWriter
                return NetCDFWriter(cfg, d)
        writers = [make_writer(i) for i in range(args.members)]
        # warm up the collect_output=True program outside the timed window
        _ = ens.run_days(estate, start, 1, output_writers=writers)
        for w in writers:
            if hasattr(w, "drain"):
                w.drain()
        shutil.rmtree(outdir); os.makedirs(outdir)
        writers = [make_writer(i) for i in range(args.members)]

        t0 = time.time()
        e3, _ = ens.run_days(estate, start, args.days,
                             output_writers=writers)
        jax.block_until_ready(e3.prog.vor)
        t_run = time.time() - t0
        t0 = time.time()
        for w in writers:
            if hasattr(w, "drain"):
                w.drain()
        t_drain = time.time() - t0

        nfiles = sum(len(os.listdir(os.path.join(outdir, d)))
                     for d in os.listdir(outdir))
        expect = args.members * args.days * cfg.nsteps
        assert nfiles == expect, (nfiles, expect)
    finally:
        shutil.rmtree(outdir, ignore_errors=True)

    print(json.dumps({
        "metric": "ensemble_output_every_step",
        "members": args.members, "days": args.days,
        "member_days_per_min_no_output": round(mdays / t_noout * 60, 1),
        "member_days_per_min_with_output": round(
            mdays / (t_run + t_drain) * 60, 1),
        "run_s": round(t_run, 1), "drain_s": round(t_drain, 1),
        "files_written": nfiles}))


if __name__ == "__main__":
    main()
