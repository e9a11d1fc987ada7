"""fp32 accuracy qualification (VERDICT r03 item 5).

The headline perf numbers are fp32 (with backend-default bf16 MXU
multiplies); parity is certified in fp64. This script bridges the two by
measuring how fast precision-induced trajectory divergence grows relative
to the physically meaningful uncertainty — the SPPT ensemble spread — at
the same lead time.

Three divergence curves over a 30-day T30L8 run (identical init/forcing):
  1. fp64 vs fp32, both on CPU          (pure precision signal)
  2. fp32 bf16-matmul vs fp32 float32-matmul, both on TPU
                                        (MXU multiply precision signal)
  3. 64-member SPPT fp32 ensemble spread on TPU (the physical yardstick)

Metric: global RMS of the sigma=0.51 (k=4) temperature grid field, and of
surface pressure. Reported per day: rms(a-b) and the ensemble
spread rms(member std), plus the lead time at which each precision signal
crosses 10% / 50% / 100% of the spread.

Run CPU part:  python scripts/fp32_qualification.py --part cpu
Run TPU parts: python scripts/fp32_qualification.py --part tpu
(Two invocations because fp64 needs the CPU backend and x64 must be set
before JAX initializes.)
Results land in /tmp/fp32_qual_{cpu,tpu}_{preset}.npz; --part report
prints the combined table for BASELINE.md.

r05 (VERDICT r04 item 4): --preset t85/t170 qualifies the stretch
presets where fp32 is the only option. The CPU fp64 leg is the cost
driver (fp64 CPU T170 steps are slow); --days trims the window — the
early-window drift-vs-spread ratio is the decision quantity.
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

DAYS = 30          # overridden by --days
PRESET = "t30"     # overridden by --preset
MEMBERS = 64
K_MID = 4  # sigma = 0.51


def daily_fields(model, state):
    import jax
    g = model._gridded(model.mc, state.prog)
    return np.asarray(g["t"][K_MID]), np.asarray(g["ps"])


def run_daily(model, start, n_days, state=None):
    """Day-by-day run capturing (t_mid, ps) after each day."""
    from speedy_tpu.utils import calendar as cal
    snaps = []
    if state is None:
        state = model.initialize(start)
    date = start
    for _ in range(n_days):
        state = model.run_fast(date, 1, state=state, check=False)
        for _ in range(model.cfg.nsteps):
            date = cal.newdate(date, model.cfg.nsteps)
        snaps.append(daily_fields(model, state))
    t = np.stack([s[0] for s in snaps])
    ps = np.stack([s[1] for s in snaps])
    return t, ps


def part_cpu():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    from speedy_tpu.config import from_preset
    from speedy_tpu.models.model import Model
    from speedy_tpu.utils import calendar as cal

    start = cal.Datetime(1982, 1, 1)
    out = {}
    for prec in ("fp64", "fp32"):
        m = Model(from_preset(PRESET, precision=prec))
        t, ps = run_daily(m, start, DAYS)
        out[f"t_{prec}"], out[f"ps_{prec}"] = t, ps
        print(f"cpu {prec}: done ({DAYS} days)")
    np.savez(f"/tmp/fp32_qual_cpu_{PRESET}.npz", **out)


def part_tpu():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/speedy_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from speedy_tpu.config import from_preset
    from speedy_tpu.models.model import Model
    from speedy_tpu.parallel.ensemble import Ensemble
    from speedy_tpu.utils import calendar as cal

    start = cal.Datetime(1982, 1, 1)
    out = {}

    # matmul-precision pair (single deterministic runs)
    for label, mp in (("bf16", None), ("f32mm", "float32")):
        jax.config.update("jax_default_matmul_precision", mp)
        m = Model(from_preset(PRESET, precision="fp32"))
        t, ps = run_daily(m, start, DAYS)
        out[f"t_{label}"], out[f"ps_{label}"] = t, ps
        print(f"tpu {label}: done")
    jax.config.update("jax_default_matmul_precision", None)

    # 64-member SPPT ensemble: daily member fields
    cfg = from_preset(PRESET, precision="fp32", sppt_on=True)
    m = Model(cfg)
    ens = Ensemble(m, MEMBERS, base_seed=7)
    estate = ens.initialize(start)
    date = start
    t_days, ps_days = [], []
    for _ in range(DAYS):
        estate, date = ens.run_days(estate, date, 1)
        g = jax.jit(jax.vmap(m.raw_fns["gridded_fields"],
                             in_axes=(None, 0)))(m.mc, estate.prog)
        t_days.append(np.asarray(g["t"][:, K_MID]))
        ps_days.append(np.asarray(g["ps"]))
    out["t_ens"] = np.stack(t_days)    # [day, member, il, ix]
    out["ps_ens"] = np.stack(ps_days)
    print("tpu ensemble: done")
    np.savez(f"/tmp/fp32_qual_tpu_{PRESET}.npz", **out)


def rms(a):
    return float(np.sqrt(np.mean(np.square(a))))


def part_report():
    cpu = np.load(f"/tmp/fp32_qual_cpu_{PRESET}.npz")
    tpu = np.load(f"/tmp/fp32_qual_tpu_{PRESET}.npz")
    print(f"{'day':>4} {'fp32drift(K)':>13} {'bf16drift(K)':>13} "
          f"{'spread(K)':>10} {'fp32/spread':>12} {'bf16/spread':>12}")
    rows = []
    for d in range(min(DAYS, len(cpu["t_fp64"]), len(tpu["t_bf16"]))):
        drift = rms(cpu["t_fp64"][d] - cpu["t_fp32"][d])
        mdrift = rms(tpu["t_bf16"][d] - tpu["t_f32mm"][d])
        spread = rms(tpu["t_ens"][d].std(axis=0))
        rows.append((d + 1, drift, mdrift, spread))
        print(f"{d+1:>4} {drift:>13.4f} {mdrift:>13.4f} {spread:>10.4f} "
              f"{drift/spread:>12.3f} {mdrift/spread:>12.3f}")
    for frac in (0.1, 0.5, 1.0):
        c1 = next((r[0] for r in rows if r[1] >= frac * r[3]), None)
        c2 = next((r[0] for r in rows if r[2] >= frac * r[3]), None)
        print(f"fp32 drift reaches {frac:4.0%} of ensemble spread at day "
              f"{c1}; bf16-matmul drift at day {c2}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--part", choices=["cpu", "tpu", "report"],
                    required=True)
    ap.add_argument("--preset", default="t30")
    ap.add_argument("--days", type=int, default=30)
    ap.add_argument("--members", type=int, default=64)
    args = ap.parse_args()
    DAYS = args.days
    PRESET = args.preset
    MEMBERS = args.members
    {"cpu": part_cpu, "tpu": part_tpu, "report": part_report}[args.part]()
