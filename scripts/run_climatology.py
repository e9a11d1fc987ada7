"""Climatology validation run (BASELINE config 2: 1-year T30L8).

Runs N simulated days with the fast on-device day scan (Model.run_fast),
then prints one JSON line of climate sanity statistics:

* wall time + simulated-days/min,
* global-mean surface-level temperature (K) at the end,
* zonal-mean zonal wind extrema at the jet level (sigma=0.2) — a healthy
  SPEEDY climate has ~20-60 m/s westerly subtropical jets and weak
  easterlies in the tropics (Molteni 2003 climatology; README.md:21-25 of
  the reference treats that paper as the golden data),
* stability-guard extrema over the run (reke/deke/tmean ranges).

Usage:  python scripts/run_climatology.py --days 365
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from speedy_tpu.config import PRESETS
    ap = argparse.ArgumentParser()
    ap.add_argument("--days", type=int, default=365)
    ap.add_argument("--preset", default="t30", choices=sorted(PRESETS))
    ap.add_argument("--precision", default="fp32", choices=["fp32", "fp64"])
    args = ap.parse_args()

    import jax
    if args.precision == "fp64":
        jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/speedy_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np

    from speedy_tpu.config import from_preset
    from speedy_tpu.models.model import Model
    from speedy_tpu.utils import calendar as cal
    from speedy_tpu.ops import spectral as sp

    cfg = from_preset(args.preset, precision=args.precision)
    model = Model(cfg)
    start = cal.Datetime(1982, 1, 1)

    t0 = time.time()
    state = model.initialize(start)
    jax.block_until_ready(state.prog.vor)
    t_init = time.time() - t0

    t0 = time.time()
    state = model.run_fast(start, args.days, state=state)
    jax.block_until_ready(state.prog.vor)
    wall = time.time() - t0

    # end-state diagnostics
    fields = {k: np.asarray(v)
              for k, v in model._gridded(model.mc, state.prog).items()}
    kx = cfg.kx
    # zonal-mean zonal wind at the jet level (k index with sigma closest to
    # 0.2) and at the lowest level
    fsg = model.geom_np["fsg"]
    kjet = int(np.argmin(np.abs(fsg - 0.2)))
    ubar = fields["u"].mean(axis=-1)   # [kx, il]
    tsfc = fields["t"][kx - 1]
    # area-weighted global mean with Gaussian weights
    wt = model.sp_np["wt"]
    wfull = np.concatenate([wt, wt[::-1]])
    wfull = wfull / wfull.sum()
    tmean = float((tsfc.mean(axis=-1) * wfull).sum())

    print(json.dumps({
        "metric": f"climatology_{args.preset}_{args.days}d",
        "days": args.days,
        "wall_s": round(wall, 1),
        "sim_days_per_min": round(args.days / wall * 60.0, 1),
        "init_compile_s": round(t_init, 1),
        "t_sfc_global_mean_K": round(tmean, 2),
        "u_jet_level_sigma": round(float(fsg[kjet]), 3),
        "u_jet_max_ms": round(float(ubar[kjet].max()), 1),
        "u_jet_min_ms": round(float(ubar[kjet].min()), 1),
        "ps_minmax_hPa": [round(float(fields["ps"].min()) / 100, 1),
                          round(float(fields["ps"].max()) / 100, 1)],
        "finite": bool(np.all([np.isfinite(v).all()
                               for v in fields.values()])),
    }))


if __name__ == "__main__":
    main()
