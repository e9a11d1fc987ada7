"""A/B experiments on the latency-bound step (VERDICT r03 item 2).

The round-3 trace shows the 64-member day-span spends ~20% of device-op
time in the scan/while envelope (carry copies) and ~8.6% in two copy-starts
staging the [64,65,48,96] merged-synthesis stack. This script measures the
end-to-end member-step time of candidate fixes against the baseline on the
same 5-day 64-member workload as scripts/profile_ensemble.py:

  baseline   current jitted vmapped span
  donate     jit(..., donate_argnums) on the ensemble state: lets XLA alias
             the state input/output buffers across the call boundary
  lean-diag  stability diagnostics computed once per triple (3 steps)
             instead of every step: measures the diagnostic chain's share
             of the latency-bound step (the guard semantics stay per-day
             extrema either way; the reference checks every step, so this
             is a measurement probe, not a default)

Each variant prints ms/member-step; negative results get recorded in
BASELINE.md like the r02 scan_unroll experiment.
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


def time_compiled(compiled, mc, estate, ds_days, msteps, label):
    warm, _ = compiled(mc, estate, ds_days)
    assert bool(jnp.all(jnp.isfinite(warm.prog.vor)))
    t0 = time.time()
    out, _ = compiled(mc, warm, ds_days)
    ok = bool(jnp.all(jnp.isfinite(out.prog.vor)))
    wall = time.time() - t0
    assert ok
    print(f"{label:12s}: {wall / msteps * 1e3:.4f} ms/member-step "
          f"(wall {wall:.2f}s)")
    return wall / msteps * 1e3


def main():
    cfg = t30(precision="fp32", sppt_on=True)
    model = Model(cfg)
    start = cal.Datetime(1982, 1, 1)
    ens = Ensemble(model, MEMBERS, base_seed=7)
    estate = ens.initialize(start)
    ds_days = build_ds_days(cfg, model, start, DAYS)
    run_span = model.raw_fns["run_span"]
    msteps = MEMBERS * DAYS * cfg.nsteps

    results = {}

    vspan = jax.jit(jax.vmap(run_span, in_axes=(None, 0, None)))
    results["baseline"] = time_compiled(
        vspan.lower(model.mc, estate, ds_days).compile(),
        model.mc, estate, ds_days, msteps, "baseline")

    # --- donation: state buffer aliasing across the jit boundary ---
    vspan_d = jax.jit(jax.vmap(run_span, in_axes=(None, 0, None)),
                      donate_argnums=(1,))
    # donation invalidates the input; keep a fresh copy for each call
    e2 = jax.tree.map(jnp.array, estate)
    warm, _ = vspan_d(model.mc, e2, ds_days)
    assert bool(jnp.all(jnp.isfinite(warm.prog.vor)))
    t0 = time.time()
    out, _ = vspan_d(model.mc, warm, ds_days)
    ok = bool(jnp.all(jnp.isfinite(out.prog.vor)))
    wall = time.time() - t0
    assert ok
    results["donate"] = wall / msteps * 1e3
    print(f"{'donate':12s}: {results['donate']:.4f} ms/member-step "
          f"(wall {wall:.2f}s)")

    # --- lean diagnostics: once per triple instead of every step ---
    lean = _make_lean_span(model, cfg)
    vlean = jax.jit(jax.vmap(lean, in_axes=(None, 0, None)))
    results["lean-diag"] = time_compiled(
        vlean.lower(model.mc, estate, ds_days).compile(),
        model.mc, estate, ds_days, msteps, "lean-diag")

    # --- full unroll of the triple scan (removes the inner while loop;
    # r02 measured unroll=4 negative, but full unroll also removes the
    # carry copies, not just amortizes them) ---
    cfg_u = t30(precision="fp32", sppt_on=True, scan_unroll=12)
    model_u = Model(cfg_u)
    span_u = model_u.raw_fns["run_span"]
    vspan_u = jax.jit(jax.vmap(span_u, in_axes=(None, 0, None)))
    results["unroll12"] = time_compiled(
        vspan_u.lower(model_u.mc, estate, ds_days).compile(),
        model_u.mc, estate, ds_days, msteps, "unroll12")

    # --- lean + unroll combined ---
    lean_u = _make_lean_span(model_u, cfg_u, unroll=12)
    vlean_u = jax.jit(jax.vmap(lean_u, in_axes=(None, 0, None)))
    results["lean+unroll"] = time_compiled(
        vlean_u.lower(model_u.mc, estate, ds_days).compile(),
        model_u.mc, estate, ds_days, msteps, "lean+unroll")

    # repeat baseline and the winner to bound dispatch noise
    results["baseline2"] = time_compiled(
        vspan.lower(model.mc, estate, ds_days).compile(),
        model.mc, estate, ds_days, msteps, "baseline2")
    results["lean-diag2"] = time_compiled(
        vlean.lower(model.mc, estate, ds_days).compile(),
        model.mc, estate, ds_days, msteps, "lean-diag2")

    print({k: round(v, 4) for k, v in results.items()})


def _make_lean_span(model, cfg, unroll=1):
    """run_span variant with diagnostics computed once per triple."""
    from speedy_tpu.models import coupling
    from speedy_tpu.utils.diagnostics import compute_diagnostics

    one_step = model.raw_fns["one_step"]
    pp, lsp = model.pp, model.lsp

    def run_day(mc, state, ds):
        daily = coupling.daily_update(cfg, pp, lsp, mc.dyn.sc, mc.clim, ds,
                                      state.surf)
        n_triples = cfg.nsteps // cfg.nstrad

        def triple(carry, idx):
            st = carry
            for i in range(cfg.nstrad):
                last = (idx == n_triples - 1) if i == cfg.nstrad - 1 \
                    else None
                st, _out = one_step(mc, st, daily, compute_sw=(i == 0),
                                    couple_next=last)
            diag = compute_diagnostics(mc.dyn.sc, st.prog.vor[1],
                                       st.prog.div[1], st.prog.t[1])
            return st, diag
        return jax.lax.scan(triple, state, jnp.arange(n_triples),
                            unroll=unroll)

    def run_span(mc, state, ds_days):
        def day_body(st, ds):
            st, diag = run_day(mc, st, ds)
            guard = (jnp.max(diag.reke, axis=0), jnp.max(diag.deke, axis=0),
                     jnp.min(diag.tmean, axis=0), jnp.max(diag.tmean, axis=0))
            return st, guard
        return jax.lax.scan(day_body, state, ds_days)

    return run_span


if __name__ == "__main__":
    main()
