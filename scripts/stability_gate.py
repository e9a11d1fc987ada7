"""Automated long-horizon stability gate (VERDICT r04 item 3).

The round-4 lesson: 30-day runs are NOT enough to qualify fp32 stretch
presets — parity-green compile changes (LW band vectorization, commit
6758aa7) passed every test and the 30-day runs, then blew up a 90-day
T85 run at day 34. This script is the REQUIRED pre-merge gate for any
change touching compiled numerics: it runs every preset to the 90-day
standard with the per-step stability guard (diag_every=1, the
reference's cadence — speedy.f90:41 / diagnostics.f90:59-69) plus
end-of-run climate sanity checks, and prints one JSON line per preset.

Pass criteria per preset:
  * guard clean every step of every day (reke/deke < 500, 180 < T < 320)
  * day-90 global-mean surface air T in [270, 300] K
  * day-90 zonal-mean jet max at sigma=0.2 in [15, 90] m/s

Usage:
  python scripts/stability_gate.py                      # all presets, 90 d
  python scripts/stability_gate.py --presets t85,t170   # subset
  python scripts/stability_gate.py --days 30            # quick look only
Runs are serialized (one TPU job at a time). Wall time is dominated by
XLA compiles on a cold cache (~3-30 min/preset); warm-cache device time
for the full 5-preset gate is a few minutes.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

DEFAULT_PRESETS = "t30,t42,t63,t85,t170"


def gate_preset(name: str, n_days: int, fused: bool = False) -> dict:
    import jax
    from speedy_tpu.config import from_preset
    from speedy_tpu.models.model import Model
    from speedy_tpu.utils import calendar as cal

    cfg = from_preset(name, precision="fp32", fuse_physics=fused)
    # diag_every=1 default: the guard samples every step
    model = Model(cfg)
    start = cal.Datetime(1982, 1, 1)
    t0 = time.time()
    result = dict(preset=name, days=n_days, diag_every=cfg.diag_every,
                  dt_s=cfg.delt, fused=fused, guard_clean=False)
    try:
        state = model.run_fast(start, n_days, check=True)
    except Exception as e:  # guard raise includes the failing day index
        result["error"] = f"{type(e).__name__}: {e}"[:300]
        result["wall_s"] = round(time.time() - t0, 1)
        return result
    result["guard_clean"] = True

    # end-of-run climate sanity (docs/CLIMATOLOGY.md ranges, held loose
    # enough for a single day-90 snapshot's synoptic variability)
    g = {k: np.asarray(v)
         for k, v in model._gridded(model.mc, state.prog).items()}
    geom = model.geom_np
    wt = model.sp_np["wt"]
    wfull = np.concatenate([wt, wt[::-1]])
    wfull = wfull / wfull.sum()
    kjet = int(np.argmin(np.abs(geom["fsg"] - 0.2)))
    t_sfc = float((g["t"][cfg.kx - 1].mean(axis=-1) * wfull).sum())
    jet_max = float(g["u"][kjet].mean(axis=-1).max())
    result.update(
        t_sfc_global_K=round(t_sfc, 2), jet_max_ms=round(jet_max, 1),
        t_sfc_ok=bool(270.0 <= t_sfc <= 300.0),
        jet_ok=bool(15.0 <= jet_max <= 90.0),
        wall_s=round(time.time() - t0, 1))
    result["pass"] = bool(result["guard_clean"] and result["t_sfc_ok"]
                          and result["jet_ok"])
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--presets", default=DEFAULT_PRESETS)
    ap.add_argument("--days", type=int, default=90)
    ap.add_argument("--fused", action="store_true")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/speedy_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    ok = True
    for name in args.presets.split(","):
        r = gate_preset(name.strip(), args.days, args.fused)
        ok = ok and r.get("pass", False)
        print(json.dumps(r), flush=True)
    print(json.dumps({"metric": "stability_gate",
                      "presets": args.presets, "days": args.days,
                      "pass": ok}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
