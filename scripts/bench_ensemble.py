"""SPPT ensemble throughput benchmark (BASELINE config 4: 64-member T30L8).

Every member runs the full coupled model (all physics, slab surface, daily
forcing) with member-unique SPPT stochastic-physics streams. The whole
ensemble-day span is ONE on-device computation: members ride a vmapped
leading axis, days ride a lax.scan — so the measurement reflects device
throughput, not host dispatch.

The reference has no ensemble capability at all (one serial process per
member, run by hand; SURVEY section 2 parallelism inventory) — at the
estimated ~50 sim-days/min per serial Fortran process, 64 members deliver
~3200 member-days/min on 64 CPU cores. This reports member-days/min on one
chip.

Usage: python scripts/bench_ensemble.py [--members 64] [--days 10]
       python scripts/bench_ensemble.py --sweep 64,128,256,512
(--sweep maps the weak-scaling curve past the config-4 floor of 64:
 the r03 measurement found 123% efficiency AT 64, i.e. the chip is not
 yet saturated there — VERDICT r04 weak item 6.)
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/speedy_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from speedy_tpu.config import t30
from speedy_tpu.models.model import Model
from speedy_tpu.models import coupling
from speedy_tpu.parallel.ensemble import Ensemble
from speedy_tpu.utils import calendar as cal


def bench_one(model, cfg, members: int, days: int) -> dict:
    ens = Ensemble(model, members, base_seed=7)
    start = cal.Datetime(1982, 1, 1)
    estate = ens.initialize(start)

    # per-day date scalars for the span, stacked on a leading day axis
    ds_list, date = [], start
    for _ in range(days):
        imont1, tmonth, tyear = cal.season_vars(date, cfg.iseasc, start.month)
        ds_list.append(coupling.make_date_scalars(cfg, model.geom_np, imont1,
                                                  tmonth, tyear,
                                                  year=date.year))
        for _ in range(cfg.nsteps):
            date = cal.newdate(date, cfg.nsteps)
    ds_days = jax.tree.map(lambda *xs: np.stack(xs), *ds_list)

    run_span = model.raw_fns["run_span"]
    vspan = jax.jit(jax.vmap(run_span, in_axes=(None, 0, None)))

    # compile + warm up (forced value readback — on the tunneled backend,
    # block_until_ready alone does not reliably wait for execution)
    warm, _ = vspan(model.mc, estate, ds_days)
    assert bool(jnp.all(jnp.isfinite(warm.prog.vor)))

    # timed call continues from the warm-up's output state, so its inputs
    # differ from the warm-up call and a repeat-execution-eliding backend
    # cannot serve a cached result (bench_transforms.py methodology note)
    t0 = time.time()
    out, guard = vspan(model.mc, warm, ds_days)
    finite = bool(jnp.all(jnp.isfinite(out.prog.vor)))
    wall = time.time() - t0
    assert finite
    # members must actually differ (SPPT streams are member-unique)
    vor_end = np.asarray(out.prog.vor[:, 1])
    spread = float(np.std(vor_end, axis=0).max())
    assert spread > 0.0, "ensemble members did not diverge"

    member_days = members * days
    return {
        "metric": "ensemble_member_days_per_min_t30l8_sppt",
        "value": round(member_days / wall * 60.0, 1),
        "unit": "member-days/min",
        "members": members,
        "days": days,
        "wall_s": round(wall, 2),
        "max_member_spread_vor": spread,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--members", type=int, default=64)
    ap.add_argument("--days", type=int, default=10)
    ap.add_argument("--sweep", default=None,
                    help="comma list of member counts, e.g. 64,128,256,512")
    ap.add_argument("--fused", action="store_true",
                    help="fuse_physics=True (Pallas column-physics kernel)")
    args = ap.parse_args()

    cfg = t30(precision="fp32", sppt_on=True, diag_every=3,
              fuse_physics=args.fused)
    model = Model(cfg)
    counts = ([int(x) for x in args.sweep.split(",")] if args.sweep
              else [args.members])
    for n in counts:
        r = bench_one(model, cfg, n, args.days)
        if args.fused:
            r["fused"] = True
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
