"""Ensemble weak-scaling diagnosis: member-count sweep + XLA cost analysis.

For n in {1, 8, 16, 32, 64}: compile the 1-day vmapped span, pull XLA's
cost_analysis (flops, bytes accessed), time the steady-state execution,
and report ms/member-step, achieved HBM bandwidth and achieved FLOP/s.
This tells us whether the 64-member span is FLOP-, bandwidth- or
latency-bound, and where the single->64 member inflation comes from.
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/speedy_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from speedy_tpu.config import t30
from speedy_tpu.models.model import Model
from speedy_tpu.models import coupling
from speedy_tpu.parallel.ensemble import Ensemble
from speedy_tpu.utils import calendar as cal

DAYS = 5


def build_ds_days(cfg, model, start, n_days):
    ds_list, date = [], start
    for _ in range(n_days):
        imont1, tmonth, tyear = cal.season_vars(date, cfg.iseasc,
                                                start.month)
        im_n, tm_n, _ = cal.season_vars(cal.next_day(date), cfg.iseasc,
                                        start.month)
        ds_list.append(coupling.make_date_scalars(
            cfg, model.geom_np, imont1, tmonth, tyear, year=date.year,
            imont1_next=im_n, tmonth_next=tm_n))
        for _ in range(cfg.nsteps):
            date = cal.newdate(date, cfg.nsteps)
    return jax.tree.map(lambda *xs: np.stack(xs), *ds_list)


def main():
    cfg = t30(precision="fp32", sppt_on=True, diag_every=3)
    model = Model(cfg)
    start = cal.Datetime(1982, 1, 1)
    run_span = model.raw_fns["run_span"]

    for n in (1, 8, 16, 32, 64):
        ens = Ensemble(model, n, base_seed=7)
        estate = ens.initialize(start)
        ds_days = build_ds_days(cfg, model, start, DAYS)
        vspan = jax.jit(jax.vmap(run_span, in_axes=(None, 0, None)))
        lowered = vspan.lower(model.mc, estate, ds_days)
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = ca.get("flops", float("nan"))
        bytes_acc = ca.get("bytes accessed", float("nan"))

        warm, _ = compiled(model.mc, estate, ds_days)
        assert bool(jnp.all(jnp.isfinite(warm.prog.vor)))
        t0 = time.time()
        out, _ = compiled(model.mc, warm, ds_days)
        ok = bool(jnp.all(jnp.isfinite(out.prog.vor)))
        wall = time.time() - t0
        assert ok

        msteps = n * DAYS * cfg.nsteps
        ms_per = wall / msteps * 1e3
        print(f"n={n:3d}: {ms_per:.4f} ms/member-step  "
              f"wall={wall:.2f}s  "
              f"flops/member-step={flops/msteps/1e6:.1f}MF  "
              f"bytes/member-step={bytes_acc/msteps/1e6:.1f}MB  "
              f"achieved_BW={bytes_acc/wall/1e9:.0f}GB/s  "
              f"achieved_TF={flops/wall/1e12:.2f}TF/s", flush=True)


if __name__ == "__main__":
    main()
