"""A/B experiments on the latency-bound step (VERDICT r03 item 2).

Measures end-to-end ms/member-step of config variants on the same 5-day
64-member workload as scripts/profile_ensemble.py. Results (r04, repeats
within +-0.5%; now recorded in BASELINE.md):

  diag_every=1 (reference cadence, default)  0.121 ms/member-step
  diag_every=3 (benches opt in)              0.105  <- 13.5% win
  donate_argnums on the state                neutral
  scan_unroll=12 (full triple unroll)        neutral
  synthesis_split=True                       UNSTABLE on TPU (config.py)
  LW band vectorization                      0.1034 but REVERTED (6758aa7):
                                             destabilizes 90-day T85; the
                                             honest post-revert figure is
                                             0.1045 (BASELINE.md r04)

Usage: python scripts/bench_step_variants.py
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
from speedy_tpu.parallel.ensemble import Ensemble
from speedy_tpu.utils import calendar as cal
from scripts.profile_ensemble import build_ds_days

DAYS = 5
MEMBERS = 64

VARIANTS = {
    "per-step-diag": dict(),            # diag_every=1 (landed default)
    "bench-diag": dict(diag_every=3),   # benches opt into per-triple
    "unroll12": dict(scan_unroll=12),
}


def main():
    start = cal.Datetime(1982, 1, 1)
    results = {}
    for label, kw in VARIANTS.items():
        cfg = t30(precision="fp32", sppt_on=True, **kw)
        model = Model(cfg)
        ens = Ensemble(model, MEMBERS, base_seed=7)
        estate = ens.initialize(start)
        ds_days = build_ds_days(cfg, model, start, DAYS)
        vspan = jax.jit(jax.vmap(model.raw_fns["run_span"],
                                 in_axes=(None, 0, None)))
        compiled = vspan.lower(model.mc, estate, ds_days).compile()
        warm, _ = compiled(model.mc, estate, ds_days)
        assert bool(jnp.all(jnp.isfinite(warm.prog.vor)))
        t0 = time.time()
        out, _ = compiled(model.mc, warm, ds_days)
        ok = bool(jnp.all(jnp.isfinite(out.prog.vor)))
        wall = time.time() - t0
        assert ok
        ms = wall / (MEMBERS * DAYS * cfg.nsteps) * 1e3
        results[label] = ms
        print(f"{label:14s}: {ms:.4f} ms/member-step (wall {wall:.2f}s)")
    print({k: round(v, 4) for k, v in results.items()})


if __name__ == "__main__":
    main()
