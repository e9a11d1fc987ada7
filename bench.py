"""Benchmark: simulated-days per wall-clock minute for the full coupled
T30L8 model (all physics, slab surface models, daily forcing) on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline note (BASELINE.md): the reference publishes no numbers and cannot
be built in-container (no gfortran/NetCDF-Fortran). vs_baseline is measured
against a conservative estimate of the serial Fortran reference's speed:
~50 sim-days/min on one modern CPU core (T30L8 is ~5 MFLOP-scale per step;
contemporary reports of SPEEDY run ~1 year in ~10 min single-core).
"""
import json
import time

import jax

from speedy_tpu.config import t30
from speedy_tpu.models.model import Model
from speedy_tpu.models import coupling
from speedy_tpu.utils import calendar as cal

FORTRAN_BASELINE_DAYS_PER_MIN = 50.0


def main():
    cfg = t30(precision="fp32")
    model = Model(cfg)
    start = cal.Datetime(1982, 1, 1)
    state = model.initialize(start)

    imont1, tmonth, tyear = cal.season_vars(start, cfg.iseasc, start.month)
    ds = coupling.make_date_scalars(cfg, model.geom_np, imont1, tmonth, tyear)

    # compile + warm up
    state, _ = model._run_day(model.mc, state, ds, collect_output=False)
    jax.block_until_ready(state.prog.vor)

    # timed: N simulated days (full physics + coupling + daily forcing)
    n_days = 20
    t0 = time.time()
    date = start
    for _ in range(n_days):
        imont1, tmonth, tyear = cal.season_vars(date, cfg.iseasc, start.month)
        ds = coupling.make_date_scalars(cfg, model.geom_np, imont1, tmonth,
                                        tyear)
        state, _ = model._run_day(model.mc, state, ds, collect_output=False)
        for _ in range(cfg.nsteps):
            date = cal.newdate(date, cfg.nsteps)
    jax.block_until_ready(state.prog.vor)
    wall = time.time() - t0

    days_per_min = n_days / wall * 60.0
    print(json.dumps({
        "metric": "sim_days_per_minute_t30l8_full_physics",
        "value": round(days_per_min, 1),
        "unit": "simulated-days/min",
        "vs_baseline": round(days_per_min / FORTRAN_BASELINE_DAYS_PER_MIN, 2),
    }))


if __name__ == "__main__":
    main()
