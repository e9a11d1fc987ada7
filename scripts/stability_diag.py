"""Long-horizon fp32 stability diagnostics (VERDICT r04 item 1).

Three independent round-4 symptoms point at one undiagnosed mechanism:
synthesis_split NaN by day 8, the LW band vectorization's day-34-48
blowups at 90-day T85 (commit 6758aa7), and T170's thin margin at
dt=300. All are parity-green roundoff-level changes to the fp32 TPU
compile that flip a stable 90-day climate into a blowup. This script
produces the evidence needed to NAME the mechanism:

  * runs a preset in N-day chunks through (and past) a blowup,
  * snapshots LEVEL- and TOTAL-WAVENUMBER-resolved rotational/divergent
    KE and temperature variance each chunk (from the spectral state, so
    growth can be localized in (l, level) space),
  * records the per-day guard extrema (reke/deke/tmean) without raising,
  * stops only when the state goes non-finite or wildly unphysical.

A/B knobs map to the candidate mechanisms in VERDICT r04 item 1:
  --lwvec        : re-land the reverted LW band vectorization (reproducer)
  --rob R        : Robert filter strength (default preset's 0.05)
  --thd/--thdd/--thds : horizontal-diffusion damping times, hours
  --f32-matmul   : float32 matmul precision (tests the bf16-transform-
                   roundoff hypothesis; TPU matmuls default to bf16 inputs)
  --sdrag-div    : (diagnosis aid) none yet

Usage:
  python scripts/stability_diag.py --preset t85 --days 90 --lwvec \
      --out /tmp/stab_t85_lwvec.npz
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def spectra(model, state) -> dict:
    """Per-(total wavenumber, level) spectra from the spectral state.

    Packed-real layout [kx, mx, nx, 2]; entry (m, j) has total wavenumber
    l = m + j; m=0 counts once, m>0 twice (conjugate symmetry). Rotational
    KE(l, k) = sum_m |vor|^2 / (l(l+1)/a^2) (x0.5), divergent likewise
    from div; T variance is the plain power spectrum.
    """
    cfg = model.cfg
    sp = model.sp_np
    elm2 = sp["elm2"]                       # [mx, nx]
    mx, nx = cfg.mx, cfg.nx
    m0 = np.arange(mx)[:, None]
    j0 = np.arange(nx)[None, :]
    ell = (m0 + j0).astype(int)             # [mx, nx]
    cnt = np.where(m0 == 0, 1.0, 2.0)       # conjugate-symmetry weight
    nell = int(ell.max()) + 1

    def per_l(power):                        # power: [kx, mx, nx]
        out = np.zeros((nell, power.shape[0]))
        flat = (power * cnt[None]).reshape(power.shape[0], -1)
        np.add.at(out, ell.reshape(-1), flat.T)
        return out                           # [nell, kx]

    vor = np.asarray(state.prog.vor[1], np.float64)   # [kx, mx, nx, 2]
    div = np.asarray(state.prog.div[1], np.float64)
    t = np.asarray(state.prog.t[1], np.float64)
    p2 = lambda a: a[..., 0]**2 + a[..., 1]**2
    return dict(
        ke_rot=per_l(0.5 * p2(vor) * elm2[None]),
        ke_div=per_l(0.5 * p2(div) * elm2[None]),
        t_var=per_l(p2(t)),
        vor_max=float(np.abs(vor).max()), div_max=float(np.abs(div).max()))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="t85")
    ap.add_argument("--days", type=int, default=90)
    ap.add_argument("--chunk", type=int, default=3)
    ap.add_argument("--lwvec", action="store_true", default=None,
                    help="force LW band vectorization ON (config default\n                    is already True; --no-lwvec forces the reference\n                    sweep order)")
    ap.add_argument("--no-lwvec", dest="lwvec", action="store_false")
    ap.add_argument("--rob", type=float, default=None)
    ap.add_argument("--wil", type=float, default=None)
    ap.add_argument("--thd", type=float, default=None)
    ap.add_argument("--thdd", type=float, default=None)
    ap.add_argument("--thds", type=float, default=None)
    ap.add_argument("--nsteps", type=int, default=None)
    ap.add_argument("--f32-matmul", action="store_true")
    ap.add_argument("--out", default="/tmp/stability_diag.npz")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/speedy_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.f32_matmul:
        jax.config.update("jax_default_matmul_precision", "float32")

    from speedy_tpu.config import from_preset
    from speedy_tpu.models.model import Model
    from speedy_tpu.utils import calendar as cal

    kw = dict(precision="fp32")
    if args.lwvec is not None:
        kw["lw_band_vectorized"] = args.lwvec
    for f in ("rob", "wil", "thd", "thdd", "thds", "nsteps"):
        v = getattr(args, f)
        if v is not None:
            kw[f] = v
    cfg = from_preset(args.preset, **kw)
    model = Model(cfg)
    start = cal.Datetime(1982, 1, 1)
    state = model.initialize(start)
    date = start

    snaps, guards = [], []
    t0 = time.time()
    day = 0
    status = "clean"
    snaps.append(dict(day=0, **spectra(model, state)))
    while day < args.days:
        chunk = min(args.chunk, args.days - day)
        ds_days, date = model.make_ds_days(date, start, chunk)
        state, guard = model._run_span(model.mc, state, ds_days)
        reke, deke, tmin, tmax = [np.asarray(g) for g in guard]
        day += chunk
        for di in range(chunk):
            guards.append(dict(day=day - chunk + di + 1,
                               reke=float(reke[di].max()),
                               deke=float(deke[di].max()),
                               tmin=float(tmin[di].min()),
                               tmax=float(tmax[di].max())))
        s = spectra(model, state)
        snaps.append(dict(day=day, **s))
        g = guards[-1]
        print(json.dumps(dict(day=day, reke=round(g["reke"], 2),
                              deke=round(g["deke"], 2),
                              tmin=round(g["tmin"], 1),
                              tmax=round(g["tmax"], 1),
                              vor_max=f'{s["vor_max"]:.3e}')), flush=True)
        if not np.isfinite(reke).all() or not np.isfinite(s["vor_max"]):
            status = "nan"
            break
        if g["reke"] > 5000.0 or g["deke"] > 5000.0:
            status = "blowup"
            break

    nell = snaps[0]["ke_rot"].shape[0]
    np.savez(args.out,
             days=np.array([s["day"] for s in snaps]),
             ke_rot=np.stack([s["ke_rot"] for s in snaps]),
             ke_div=np.stack([s["ke_div"] for s in snaps]),
             t_var=np.stack([s["t_var"] for s in snaps]),
             vor_max=np.array([s["vor_max"] for s in snaps]),
             guard=np.array([[g["day"], g["reke"], g["deke"],
                              g["tmin"], g["tmax"]] for g in guards]))
    first_bad = next((g["day"] for g in guards
                      if g["reke"] > 500 or g["deke"] > 500
                      or not (180 < g["tmin"] and g["tmax"] < 320)), None)
    print(json.dumps(dict(
        metric="stability_diag", preset=args.preset, days_run=day,
        status=status, first_guard_trip_day=first_bad,
        lwvec=cfg.lw_band_vectorized, f32_matmul=args.f32_matmul,
        rob=cfg.rob, thd=cfg.thd, thdd=cfg.thdd, thds=cfg.thds,
        nsteps=cfg.nsteps, out=args.out,
        wall_s=round(time.time() - t0, 1))))


if __name__ == "__main__":
    main()
