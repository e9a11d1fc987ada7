"""Multi-year climatology with on-device monthly-mean accumulation
(VERDICT r03 item 4; BASELINE config 2 at full depth).

Runs N years of T30L8 (default 6: 1 spin-up + 5 climatology), month by
month. Each month is one jitted on-device scan over days whose carry
accumulates
  * day-end gridded u and T            (monthly means of daily snapshots)
  * per-step precnv/precls/olr/tsr/ssr (monthly means of step fluxes)
so the host fetches ~1 MB once per month instead of per-step fields.

Outputs /tmp/speedy_climatology.npz with per-month means and prints a
DJF/JJA summary table: zonal-mean zonal-wind jet maxima (sigma=0.2),
global precipitation (mm/day), OLR statistics — the quantities the SPEEDY
papers (Molteni 2003, QJRMS; reference README.md:21-25) validate against.
The papers are not retrievable in this container (zero egress), so the
comparison targets printed are the standard observed-climatology values
those papers benchmark SPEEDY on; docs/CLIMATOLOGY.md records both.

Optionally (--elnino) repeats years 2+ with a +2 K El Nino-region SST
anomaly (sea_model.f90:499-519 weight mask) and prints the tropical
Pacific precipitation response — exercising the regional-domain + anomaly
machinery end to end.

Usage: python scripts/run_multiyear.py --years 6 [--elnino]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_month_span(model):
    """Jitted scan over one month's days accumulating monthly sums."""
    import jax
    import jax.numpy as jnp
    cfg = model.cfg
    run_day = model.raw_fns["run_day"]
    gridded = model.raw_fns["gridded_fields"]

    def month_span(mc, state, ds_days):
        def day_body(carry, ds):
            st, acc = carry
            st, outs = run_day(mc, st, ds, False, True, cfg.diag_every)
            g = gridded(mc, st.prog)
            fl = outs.fluxes
            acc = dict(
                u=acc["u"] + g["u"], t=acc["t"] + g["t"],
                precnv=acc["precnv"] + jnp.sum(fl.precnv, axis=0),
                precls=acc["precls"] + jnp.sum(fl.precls, axis=0),
                olr=acc["olr"] + jnp.sum(fl.olr, axis=0),
                tsr=acc["tsr"] + jnp.sum(fl.tsr, axis=0),
                ssr=acc["ssr"] + jnp.sum(fl.ssr, axis=0),
            )
            guard = (jnp.max(outs.diag.reke, axis=0),
                     jnp.max(outs.diag.deke, axis=0),
                     jnp.min(outs.diag.tmean, axis=0),
                     jnp.max(outs.diag.tmean, axis=0))
            return (st, acc), guard

        t = cfg.rdtype
        acc0 = dict(
            u=jnp.zeros((cfg.kx, cfg.il, cfg.ix), t),
            t=jnp.zeros((cfg.kx, cfg.il, cfg.ix), t),
            precnv=jnp.zeros((cfg.il, cfg.ix), t),
            precls=jnp.zeros((cfg.il, cfg.ix), t),
            olr=jnp.zeros((cfg.il, cfg.ix), t),
            tsr=jnp.zeros((cfg.il, cfg.ix), t),
            ssr=jnp.zeros((cfg.il, cfg.ix), t),
        )
        (state, acc), guard = jax.lax.scan(day_body, (state, acc0), ds_days)
        return state, acc, guard

    return jax.jit(month_span)


def build_ds_month(model, start_of_month, run_start, n_days):
    import jax
    from speedy_tpu.models import coupling
    from speedy_tpu.utils import calendar as cal
    cfg = model.cfg
    ds_list, d = [], start_of_month
    for _ in range(n_days):
        imont1, tmonth, tyear = cal.season_vars(d, cfg.iseasc,
                                                run_start.month)
        im_n, tm_n, _ = cal.season_vars(cal.next_day(d), cfg.iseasc,
                                        run_start.month)
        ds_list.append(coupling.make_date_scalars(
            cfg, model.geom_np, imont1, tmonth, tyear, year=d.year,
            imont1_next=im_n, tmonth_next=tm_n))
        for _ in range(cfg.nsteps):
            d = cal.newdate(d, cfg.nsteps)
    return jax.tree.map(lambda *xs: np.stack(xs), *ds_list), d


def run_years(model, start, n_years, month_span):
    """-> dict of [n_months, ...] monthly-mean arrays + final state."""
    import jax
    import jax.numpy as jnp
    from speedy_tpu.models import coupling
    from speedy_tpu.utils import calendar as cal
    cfg = model.cfg
    state = model.initialize(start)
    date = start
    months = []
    for im in range(12 * n_years):
        if cfg.sst_anomaly_forcing and im > 0:
            # monthly advance of the anomaly window (obs_ssta,
            # sea_model.f90:366-384) — the same real file-driven path
            # Model.run uses. NOTE the reference indexes with the RUN START
            # year (sea_model.f90:378), not the model year — a reproduced
            # quirk; a constant-in-time anomaly file is immune to it.
            next_month = (start.year - cfg.issty0) * 12 + date.month
            sstan3 = coupling.advance_anomaly_window(
                cfg, model.lsp.bmask_s, model.mc.clim.sstan3, next_month,
                model._bc_search)
            model.mc = model.mc._replace(
                clim=model.mc.clim._replace(sstan3=sstan3))
        nd = cal.NDAYCAL[date.month - 1]
        ds_days, next_date = build_ds_month(model, date, start, nd)
        state, acc, guard = month_span(model.mc, state, ds_days)
        reke, deke, tmin, tmax = [np.asarray(g) for g in guard]
        assert np.isfinite(reke).all() and reke.max() < 500.0 \
            and deke.max() < 500.0 and tmin.min() > 180.0 \
            and tmax.max() < 320.0, (date, reke.max(), tmin.min())
        acc = {k: np.asarray(v) for k, v in acc.items()}
        steps = nd * cfg.nsteps
        month = dict(
            year=date.year, month=date.month,
            u=acc["u"] / nd, t=acc["t"] / nd,
            precip=(acc["precnv"] + acc["precls"]) / steps,
            olr=acc["olr"] / steps, tsr=acc["tsr"] / steps,
            ssr=acc["ssr"] / steps)
        months.append(month)
        print(f"  {date.year}-{date.month:02d} done "
              f"(olr mean {month['olr'].mean():.1f})", flush=True)
        date = next_date
    return months, state


def season_mean(months, season, skip_years=None):
    if skip_years is None:  # single-year runs have no spin-up year to drop
        n_years = len({m["year"] for m in months})
        skip_years = 1 if n_years > 1 else 0
    sel = {"DJF": (12, 1, 2), "JJA": (6, 7, 8)}[season]
    first_year = min(m["year"] for m in months)
    picked = [m for m in months
              if m["month"] in sel and m["year"] >= first_year + skip_years]
    return {k: np.mean([m[k] for m in picked], axis=0)
            for k in ("u", "t", "precip", "olr")}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--years", type=int, default=6)
    ap.add_argument("--preset", default="t30")
    ap.add_argument("--elnino", action="store_true")
    ap.add_argument("--out", default="/tmp/speedy_climatology.npz")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/speedy_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from speedy_tpu.config import from_preset
    from speedy_tpu.models.model import Model
    from speedy_tpu.utils import calendar as cal

    cfg = from_preset(args.preset, precision="fp32")
    model = Model(cfg)
    month_span = build_month_span(model)
    start = cal.Datetime(1982, 1, 1)

    t0 = time.time()
    print(f"control run: {args.years} years {args.preset}L{cfg.kx}")
    months, _ = run_years(model, start, args.years, month_span)
    wall = time.time() - t0

    # save BEFORE the summary so a summary bug cannot lose the run
    # (object array of per-month dicts: np.load needs allow_pickle=True)
    np.savez(args.out, months=np.array(months, dtype=object))

    # --- summary ---
    geom = model.geom_np
    fsg = geom["fsg"]
    kjet = int(np.argmin(np.abs(fsg - 0.2)))
    wt = model.sp_np["wt"]
    wfull = np.concatenate([wt, wt[::-1]]); wfull = wfull / wfull.sum()
    lats = np.degrees(geom["radang"])

    summary = {}
    for season in ("DJF", "JJA"):
        s = season_mean(months, season)
        ubar = s["u"].mean(axis=-1)          # [kx, il]
        jet = ubar[kjet]
        gm = lambda f: float((f.mean(axis=-1) * wfull).sum())
        summary[season] = dict(
            jet_max_ms=round(float(jet.max()), 1),
            jet_max_lat=round(float(lats[int(jet.argmax())]), 1),
            precip_global_mmday=round(gm(s["precip"]) * 86.4, 2),
            olr_global_Wm2=round(gm(s["olr"]), 1),
            olr_min_Wm2=round(float(s["olr"].min()), 1),
            olr_max_Wm2=round(float(s["olr"].max()), 1),
            t_sfc_global_K=round(gm(s["t"][cfg.kx - 1]), 1),
        )
    print(json.dumps({"metric": f"climatology_{args.preset}_{args.years}y",
                      "wall_s": round(wall, 1), **summary}))

    if args.elnino:
        # Anomaly-forced experiment through the REAL file machinery:
        # a synthetic 420-month anomaly file with a constant +2 K El Nino
        # -region anomaly (the sea_model.f90:499-519 weight mask) is
        # written to disk, the model runs with sst_anomaly_forcing=True,
        # and the monthly obs_ssta window advance reads it back — the full
        # sea_model anomaly path end to end.
        import tempfile
        import h5py
        from speedy_tpu.models.coupling import sea_domain
        from speedy_tpu.utils.io import DEFAULT_BC_PATHS
        from speedy_tpu.config import t30 as t30_preset

        print("El Nino experiment: +2 K weighted anomaly via anomaly file")
        wmask = np.zeros((cfg.il, cfg.ix))
        sea_domain("elnino", np.degrees(geom["radang"]), cfg.ix, wmask)
        tdir = tempfile.mkdtemp(prefix="speedy_elnino_")
        with h5py.File(os.path.join(
                tdir, "sea_surface_temperature_anomaly.nc"), "w") as f:
            # loader flips latitude (file is N->S); mask is S->N
            f.create_dataset("ssta", data=np.broadcast_to(
                2.0 * wmask[::-1], (420, cfg.il, cfg.ix)))
        cfg_en = t30_preset(precision="fp32", sst_anomaly_forcing=True)
        model_en = Model(cfg_en, bc_search=[tdir] + DEFAULT_BC_PATHS)
        month_span_en = build_month_span(model_en)
        t0 = time.time()
        months_en, _ = run_years(model_en, start, args.years, month_span_en)
        for season in ("DJF",):
            c = season_mean(months, season)
            e = season_mean(months_en, season)
            dprec = (e["precip"] - c["precip"]) * 86.4
            w = wmask / max(wmask.sum(), 1)
            print(json.dumps({
                "metric": "elnino_response_DJF",
                "wall_s": round(time.time() - t0, 1),
                "dprecip_nino_region_mmday":
                    round(float((dprec * w).sum()), 2),
                "dprecip_global_mmday":
                    round(float((dprec.mean(axis=-1) * wfull).sum()), 3),
                "dt_sfc_nino_K": round(float(
                    ((e["t"][cfg.kx - 1] - c["t"][cfg.kx - 1]) * w).sum()),
                    2)}))


if __name__ == "__main__":
    main()
