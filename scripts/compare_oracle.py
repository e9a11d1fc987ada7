"""Step-by-step diff of the production JAX model against the loop-literal
NumPy oracle (tests/oracle/) on the reference default config: T30L8, start
1982-01-01, fp64 both.  Prints max relative error per prognostic per step.

Usage: python scripts/compare_oracle.py [n_steps]
"""
import os
import sys
import time

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=1").strip()

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from speedy_tpu.config import t30                                # noqa: E402
from speedy_tpu.models.model import Model                        # noqa: E402
from speedy_tpu.models import coupling                           # noqa: E402
from speedy_tpu.utils import calendar as cal                     # noqa: E402
from tests.oracle.model import OracleSpeedy                      # noqa: E402


def jax_to_oracle(prog):
    """Map PrognosticState -> oracle layout complex (mx, nx, kx, 2)."""
    def c(a):  # [..., mx, nx, 2] packed -> complex [..., mx, nx]
        a = np.asarray(a)
        return a[..., 0] + 1j * a[..., 1]
    vor = np.moveaxis(c(prog.vor), [0, 1], [3, 2])   # [mx, nx, kx, 2]
    div = np.moveaxis(c(prog.div), [0, 1], [3, 2])
    t = np.moveaxis(c(prog.t), [0, 1], [3, 2])
    ps = np.moveaxis(c(prog.ps), 0, 2)               # [mx, nx, 2]
    tr = np.moveaxis(c(prog.tr[:, 0]), [0, 1], [3, 2])
    return dict(vor=vor, div=div, t=t, ps=ps, tr=tr)


def relerr(a, b):
    den = max(np.abs(b).max(), 1e-30)
    return np.abs(a - b).max() / den


def compare(prog, om, label):
    j = jax_to_oracle(prog)
    o = dict(vor=om.vor, div=om.div, t=om.t, ps=om.ps,
             tr=om.tr[:, :, :, :, 0])
    errs = {k: relerr(j[k], o[k]) for k in j}
    line = " ".join(f"{k}={v:.2e}" for k, v in errs.items())
    print(f"{label:>10s}: {line}", flush=True)
    return max(errs.values())


def main(n_steps=72):
    cfg = t30(precision="fp64", nstdia=10**9)
    print("building JAX model...", flush=True)
    m = Model(cfg)
    start = cal.Datetime(1982, 1, 1)
    state = m.initialize(start)

    print("building oracle...", flush=True)
    t0 = time.time()
    om = OracleSpeedy()
    print(f"oracle init+first_step: {time.time() - t0:.1f}s", flush=True)

    compare(state.prog, om, "post-boot")

    # Run the oracle ONCE for the whole span (its run() owns the model_step
    # counter: set_forcing cadence, SW cadence, coupling day counter),
    # recording prognostic snapshots after each step.
    snaps = {}

    def record(model, istep):
        snaps[istep] = dict(vor=model.vor.copy(), div=model.div.copy(),
                            t=model.t.copy(), ps=model.ps.copy(),
                            tr=model.tr.copy())

    t0 = time.time()
    om.run(n_steps, record=record)
    t_or = time.time() - t0
    print(f"oracle wall: {t_or:.1f}s for {n_steps} steps "
          f"= {n_steps / 36 / (t_or / 60):.1f} sim-days/min", flush=True)

    one_step = jax.jit(m.raw_fns["one_step"],
                       static_argnames=("compute_sw",))
    daily_fn = jax.jit(
        lambda ds, surf: coupling.daily_update(cfg, m.pp, m.lsp,
                                               m.mc.dyn.sc, m.mc.clim, ds,
                                               surf))

    class Snap:
        pass

    date = start
    daily = None
    worst = 0.0
    for step_i in range(1, n_steps + 1):
        if (step_i - 1) % cfg.nsteps == 0:
            imont1, tmonth, tyear = cal.season_vars(date, cfg.iseasc,
                                                    start.month)
            im_n, tm_n, _ = cal.season_vars(cal.next_day(date), cfg.iseasc,
                                            start.month)
            ds = coupling.make_date_scalars(cfg, m.geom_np, imont1, tmonth,
                                            tyear, year=date.year,
                                            imont1_next=im_n,
                                            tmonth_next=tm_n)
            daily = daily_fn(ds, state.surf)
        compute_sw = (step_i % cfg.nstrad) == 1
        last_of_day = (step_i % cfg.nsteps) == 0
        state, _ = one_step(m.mc, state, daily, compute_sw, last_of_day)
        date = cal.newdate(date, cfg.nsteps)
        s = Snap()
        for k, v in snaps[step_i].items():
            setattr(s, k, v)
        worst = max(worst, compare(state.prog, s, f"step {step_i}"))
    print(f"worst relative error over {n_steps} steps: {worst:.2e}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 72)
