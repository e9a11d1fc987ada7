"""Top-level model: build, initialize, run.

Replaces the reference's initialization.f90 + speedy.f90 driver. The model
state (prognostics + surface + radiation + SPPT) advances through a fully
jitted per-day function (nsteps steps as a scan over shortwave triples);
the host only computes tiny date-derived scalars once per day and handles
output and the stability guard.

All device constants travel as explicit jit arguments (ModelConsts) —
closing over device arrays is not portable to this TPU backend; host-side
numpy tables (PhysicsParams, LandSeaParams, config) are closed over and
embed as XLA constants.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..constants import GRAV, P0
from ..geometry import build_geometry, build_geometry_np
from ..ops import spectral as sp
from ..utils import calendar as cal
from ..utils.diagnostics import (Diagnostics, compute_diagnostics,
                                 check_diagnostics, format_diagnostics)
from . import boundaries as bnd
from . import coupling
from .geopotential import build_geopotential, get_geopotential
from .hdiffusion import build_diffusion, build_diffusion_np, DiffusionConsts
from .implicit import build_implicit, ImplicitConsts
from .physics import build_physics_params, get_physical_tendencies
from .physics.shortwave import init_radiation_state, RadiationState
from .physics.sppt import init_sppt_state, SpptState
from .prognostics import rest_state
from .state import PrognosticState
from .tendencies import DynConsts
from .time_stepping import OrographicCorrection, first_step, step


class ModelConsts(NamedTuple):
    """Device-constant pytrees, passed through jit boundaries."""
    dyn: DynConsts
    dc: DiffusionConsts
    ic_half: ImplicitConsts
    ic_full: ImplicitConsts
    ic_2dt: ImplicitConsts
    clim: coupling.Climatology


class ModelState(NamedTuple):
    """Full model state advanced by the step loop."""
    prog: PrognosticState
    surf: coupling.SurfaceState
    rad: RadiationState
    sppt: Optional[SpptState]


class StepOutputs(NamedTuple):
    diag: Diagnostics
    # physics flux diagnostics (precip/radiation; auxiliaries.f90:15-33),
    # populated only when run_day(collect_fluxes=True) — the climatology
    # accumulation path. None otherwise (an empty pytree subtree).
    fluxes: Optional[object] = None


def _make_step_fns(cfg: ModelConfig, pp, lsp):
    """Build the jitted per-day and bootstrap functions. cfg/pp/lsp are
    host-side (hashable-by-identity closures with numpy tables)."""

    def make_physics_fn(mc: ModelConsts, daily, mstate: ModelState,
                        compute_sw: bool):
        def physics_fn(pg):
            return get_physical_tendencies(
                cfg, pp, mc.dyn.sc, daily, mstate.surf, mstate.rad,
                mstate.sppt, compute_sw, pg)
        return physics_fn

    def one_step(mc: ModelConsts, state: ModelState, daily,
                 compute_sw: bool, couple_next=None,
                 with_fluxes: bool = False, with_diag: bool = True
                 ) -> Tuple[ModelState, StepOutputs]:
        """``couple_next``: traced bool scalar (or None) — the day's last
        step couples with the NEXT day's climatology interpolation, matching
        the reference's couple-after-newdate cadence (speedy.f90:47-53)."""
        corr = OrographicCorrection(tcorh=daily.tcorh, qcorh=daily.qcorh)
        if cfg.sppt_on:
            # AR(1) update here; pattern synthesis rides the dynamics
            # transform batch (tendencies.grid_dynamics_tendencies)
            from .physics.sppt import sppt_ar1
            sppt_spec, sppt_new = sppt_ar1(cfg, pp.sppt_sigma, state.sppt)
            mstate = state._replace(sppt=sppt_new)
        else:
            sppt_spec, sppt_new, mstate = None, state.sppt, state
        phys = make_physics_fn(mc, daily, mstate, compute_sw)
        prog, aux = step(cfg, mc.dyn, mc.dc, mc.ic_2dt, state.prog,
                         2, 2, 2 * cfg.delt, corr, phys, sppt_spec)
        cdaily = daily if couple_next is None \
            else coupling.select_couple_daily(daily, couple_next)
        surf = coupling.couple_step(cfg, lsp, cdaily, state.surf, aux.fluxes)
        new = ModelState(prog=prog, surf=surf, rad=aux.rad,
                         sppt=sppt_new if cfg.sppt_on else state.sppt)
        diag = compute_diagnostics(mc.dyn.sc, prog.vor[1], prog.div[1],
                                   prog.t[1]) if with_diag else None
        # surface-flux subtree dropped: climatology accumulation needs the
        # [il, ix] precip/radiation fields only
        fl = aux.fluxes._replace(sfc=None) if with_fluxes else None
        return new, StepOutputs(diag=diag, fluxes=fl)

    def run_day(mc: ModelConsts, state: ModelState, ds,
                collect_output: bool, collect_fluxes: bool = False,
                diag_every: int = 1):
        """``diag_every``: compute the stability diagnostics every that
        many steps (must divide nstrad; 1 = the reference's per-step
        cadence, speedy.f90:41). outs.diag has nsteps // diag_every rows.
        The per-step diagnostic chain costs ~13.5% of the latency-bound
        step (scripts/bench_step_variants.py, r04)."""
        assert cfg.nstrad % diag_every == 0, (diag_every, cfg.nstrad)
        daily = coupling.daily_update(cfg, pp, lsp, mc.dyn.sc, mc.clim, ds,
                                      state.surf)
        n_triples = cfg.nsteps // cfg.nstrad

        def triple(carry, idx):
            st = carry
            diags, fls, grids = [], [], []
            for i in range(cfg.nstrad):
                last = (idx == n_triples - 1) if i == cfg.nstrad - 1 \
                    else None
                st, out = one_step(mc, st, daily, compute_sw=(i == 0),
                                   couple_next=last,
                                   with_fluxes=collect_fluxes,
                                   with_diag=((i + 1) % diag_every == 0))
                if out.diag is not None:
                    diags.append(out.diag)
                if collect_fluxes:
                    fls.append(out.fluxes)
                if collect_output:
                    grids.append(gridded_fields(mc, st.prog))
            stack = lambda xs: jax.tree.map(lambda *ys: jnp.stack(ys), *xs)
            outs = StepOutputs(diag=stack(diags),
                               fluxes=stack(fls) if collect_fluxes else None)
            if collect_output:
                grids = stack(grids)
                return st, (outs, grids)
            return st, outs

        state, ys = jax.lax.scan(triple, state, jnp.arange(n_triples),
                                 unroll=cfg.scan_unroll)
        ys = jax.tree.map(lambda a: a.reshape((-1,) + a.shape[2:]), ys)
        return state, ys

    def boot(mc: ModelConsts, state: ModelState, ds) -> ModelState:
        daily = coupling.daily_update(cfg, pp, lsp, mc.dyn.sc, mc.clim, ds,
                                      state.surf)
        corr = OrographicCorrection(tcorh=daily.tcorh, qcorh=daily.qcorh)
        phys = make_physics_fn(mc, daily, state, compute_sw=True)
        prog, aux = first_step(cfg, mc.dyn, mc.dc, mc.ic_half, mc.ic_full,
                               state.prog, corr, phys)
        return state._replace(prog=prog, rad=aux.rad,
                              sppt=aux.sppt if cfg.sppt_on else state.sppt)

    def gridded_fields(mc: ModelConsts, prog: PrognosticState,
                       level: int = 0) -> dict:
        """Physical-space output fields (input_output.f90:183-206)."""
        kx = cfg.kx
        sc = mc.dyn.sc
        ucos, vcos = sp.uvspec(sc, prog.vor[level], prog.div[level])
        wind = sp.spec_to_grid(sc, jnp.concatenate([ucos, vcos], axis=0),
                               scale_by_inv_cos=True)
        phi = get_geopotential(mc.dyn.gc, prog.t[level], mc.dyn.phis)
        scal = jnp.concatenate(
            [prog.t[level], prog.tr[level, 0], phi, prog.ps[level][None]],
            axis=0)
        g = sp.spec_to_grid(sc, scal)
        return dict(u=wind[:kx], v=wind[kx:], t=g[:kx],
                    q=g[kx:2 * kx] * 1.0e-3, phi=g[2 * kx:3 * kx] / GRAV,
                    ps=P0 * jnp.exp(g[3 * kx]))

    def run_span(mc: ModelConsts, state: ModelState, ds_days):
        """Scan over whole days entirely on device: ds_days is a DateScalars
        pytree stacked on a leading day axis. Returns per-day guard extrema
        (max reke/deke, min/max tmean over the day's steps)."""
        def day_body(st, ds):
            st, outs = run_day(mc, st, ds, collect_output=False,
                               diag_every=cfg.diag_every)
            guard = (jnp.max(outs.diag.reke, axis=0),
                     jnp.max(outs.diag.deke, axis=0),
                     jnp.min(outs.diag.tmean, axis=0),
                     jnp.max(outs.diag.tmean, axis=0))
            return st, guard
        return jax.lax.scan(day_body, state, ds_days)

    run_span_jit = jax.jit(run_span)
    run_day_jit = jax.jit(run_day, static_argnames=("collect_output",
                                                    "collect_fluxes",
                                                    "diag_every"))
    boot_jit = jax.jit(boot)
    gridded_jit = jax.jit(gridded_fields, static_argnames=("level",))
    raw = dict(run_day=run_day, boot=boot, one_step=one_step,
               gridded_fields=gridded_fields, run_span=run_span)
    return run_day_jit, boot_jit, gridded_jit, run_span_jit, raw


class Model:
    """Build-once, run-many model driver (initialization.f90:12-82)."""

    def __init__(self, cfg: ModelConfig, bc_search=None, sppt_seed: int = 0):
        self._bc_search = bc_search
        if (cfg.synthesis_split and not cfg.allow_unstable
                and jax.default_backend() != "cpu"):
            # documented-unstable on TPU (config.py synthesis_split note):
            # bit-identical to the merged path on CPU, NaN by day ~8 on TPU.
            raise ValueError(
                "synthesis_split=True is numerically unstable on TPU "
                "backends (eddy KE 7->115->1800->NaN over 8 days; see "
                "config.py). Pass allow_unstable=True to run it anyway.")
        if cfg.sea_coupling_flag >= 1:
            # parity with sea_model.f90:188-190
            raise NotImplementedError(
                "sea_coupling_flag >= 1 not implemented (reference stops too)")
        self.cfg = cfg
        self.geom_np = build_geometry_np(cfg)
        self.sp_np = sp.build_spectral_np(cfg, self.geom_np)
        sc = sp.build_spectral(cfg, self.geom_np)
        self.bounds = bnd.build_boundaries(cfg, self.sp_np, search=bc_search)
        dyn = DynConsts(sc=sc, geom=build_geometry(cfg),
                        gc=build_geopotential(cfg, self.geom_np),
                        phis=self.bounds.phis)
        self.diff_np = build_diffusion_np(cfg, self.geom_np)

        fmask = np.asarray(self.bounds.fmask, np.float64)
        alb0 = np.asarray(self.bounds.alb0, np.float64)
        phi0 = np.asarray(self.bounds.phi0, np.float64)
        phis0 = np.asarray(self.bounds.phis0, np.float64)
        self.lsp, clim_np = coupling.build_land_sea(
            cfg, fmask, alb0, self.geom_np["radang"], search=bc_search)
        self.pp = build_physics_params(cfg, self.geom_np, self.sp_np,
                                       self.lsp.fmask_l, self.lsp.fmask_s,
                                       phi0, phis0)
        self.mc = ModelConsts(
            dyn=dyn, dc=build_diffusion(cfg, self.geom_np),
            ic_half=build_implicit(cfg, self.geom_np, self.diff_np,
                                   0.5 * cfg.delt),
            ic_full=build_implicit(cfg, self.geom_np, self.diff_np, cfg.delt),
            ic_2dt=build_implicit(cfg, self.geom_np, self.diff_np,
                                  2 * cfg.delt),
            clim=coupling.climatology_to_device(cfg, clim_np))
        self.sppt_seed = sppt_seed
        (self._run_day, self._boot, self._gridded, self._run_span,
         self.raw_fns) = _make_step_fns(cfg, self.pp, self.lsp)

    # ------------------------------------------------------------------
    def initialize(self, start: cal.Datetime) -> ModelState:
        cfg = self.cfg
        if cfg.sst_anomaly_forcing:
            # initial 3-month SST anomaly window (sea_model.f90:172-182)
            isst0 = (start.year - cfg.issty0) * 12 + start.month
            window = coupling.initial_anomaly_window(
                cfg, self.lsp.bmask_s, isst0, self._bc_search)
            self.mc = self.mc._replace(clim=self.mc.clim._replace(
                sstan3=jnp.asarray(window, cfg.rdtype)))
        imont1, tmonth, tyear = cal.season_vars(start, cfg.iseasc,
                                                start.month)
        im_n, tm_n, _ = cal.season_vars(cal.next_day(start), cfg.iseasc,
                                        start.month)
        ds = coupling.make_date_scalars(cfg, self.geom_np, imont1, tmonth,
                                        tyear, year=start.year,
                                        imont1_next=im_n, tmonth_next=tm_n)
        prog = rest_state(cfg, self.geom_np, self.sp_np, self.bounds)
        surf = coupling.init_surface_state(cfg, self.pp, self.lsp,
                                           self.mc.dyn.sc, self.mc.clim, ds)
        rad = init_radiation_state(cfg)
        sppt = init_sppt_state(cfg, self.pp.sppt_sigma, self.sppt_seed) \
            if cfg.sppt_on else None
        state = ModelState(prog=prog, surf=surf, rad=rad, sppt=sppt)
        return self._boot(self.mc, state, ds)

    # ------------------------------------------------------------------
    def make_ds_days(self, date: cal.Datetime, start: cal.Datetime,
                     n_days: int):
        """DateScalars for n_days starting at `date` (run began at
        `start`), stacked on a leading day axis for run_span; returns
        (ds_days, end_date)."""
        cfg = self.cfg
        ds_list, d = [], date
        for _ in range(n_days):
            imont1, tmonth, tyear = cal.season_vars(d, cfg.iseasc,
                                                    start.month)
            im_n, tm_n, _ = cal.season_vars(cal.next_day(d), cfg.iseasc,
                                            start.month)
            ds_list.append(coupling.make_date_scalars(
                cfg, self.geom_np, imont1, tmonth, tyear, year=d.year,
                imont1_next=im_n, tmonth_next=tm_n))
            for _ in range(cfg.nsteps):
                d = cal.newdate(d, cfg.nsteps)
        return jax.tree.map(lambda *xs: np.stack(xs), *ds_list), d

    # ------------------------------------------------------------------
    def run_fast(self, start: cal.Datetime, n_days: int,
                 state: Optional[ModelState] = None,
                 check: bool = True, max_chunk_days: int = 90
                 ) -> ModelState:
        """Fast path: the whole span runs as one on-device scan over days
        (chunked at month boundaries when SST-anomaly forcing is active,
        and at ``max_chunk_days`` regardless — single device dispatches
        beyond ~2 minutes can trip backend watchdogs; a 180-day T170
        dispatch reproducibly crashed the tunneled worker, r05).
        No per-step output; the stability guard is checked per day from the
        returned extrema. Used for climatology runs and benchmarks."""
        cfg = self.cfg
        if state is None:
            state = self.initialize(start)
        date = start
        days_left = n_days
        while days_left > 0:
            # chunk until the next anomaly-window update (month start)
            if cfg.sst_anomaly_forcing:
                if date.day == 1 and date != start:
                    next_month = (start.year - cfg.issty0) * 12 + date.month
                    sstan3 = coupling.advance_anomaly_window(
                        cfg, self.lsp.bmask_s, self.mc.clim.sstan3,
                        next_month, self._bc_search)
                    self.mc = self.mc._replace(
                        clim=self.mc.clim._replace(sstan3=sstan3))
                chunk = min(days_left,
                            cal.NDAYCAL[date.month - 1] - date.day + 1)
            else:
                chunk = days_left
            chunk = min(chunk, max_chunk_days)
            ds_days, d = self.make_ds_days(date, start, chunk)
            state, guard = self._run_span(self.mc, state, ds_days)
            if check:
                reke, deke, tmin, tmax = [np.asarray(g) for g in guard]
                for di in range(chunk):
                    diag = Diagnostics(reke=reke[di], deke=deke[di],
                                       tmean=np.where(tmin[di] < 180.0,
                                                      tmin[di], tmax[di]))
                    check_diagnostics(diag, di)
            date = d
            days_left -= chunk
        return state

    def run(self, start: cal.Datetime, end: cal.Datetime,
            output_writer=None, verbose: bool = True,
            state: Optional[ModelState] = None,
            resume_date: Optional[cal.Datetime] = None,
            model_step: int = 0,
            checkpoint_every: int = 0,
            checkpoint_dir: Optional[str] = None) -> ModelState:
        """Main loop (speedy.f90:27-54), day-chunked.

        ``state``/``resume_date``/``model_step`` resume from a checkpoint
        (utils.checkpoint); ``checkpoint_every`` > 0 writes a checkpoint
        every that many days into ``checkpoint_dir``.
        """
        cfg = self.cfg
        if state is None:
            state = self.initialize(start)
            date = start
        else:
            date = resume_date if resume_date is not None else start
        if not date < end:
            raise ValueError(
                f"run start/resume date {date} is not before end {end}")
        if output_writer is not None and model_step == 0:
            output_writer(0, date, start, jax.tree.map(
                np.asarray, self._gridded(self.mc, state.prog)))
        if checkpoint_every and checkpoint_dir:
            import os
            os.makedirs(checkpoint_dir, exist_ok=True)
        day_count = 0
        while date < end:
            if cfg.sst_anomaly_forcing and date.day == 1 and model_step > 0:
                # monthly advance of the anomaly window (obs_ssta,
                # sea_model.f90:366-384; triggered from couple_sea_atm:273)
                next_month = (start.year - cfg.issty0) * 12 + date.month
                sstan3 = coupling.advance_anomaly_window(
                    cfg, self.lsp.bmask_s, self.mc.clim.sstan3, next_month,
                    self._bc_search)
                self.mc = self.mc._replace(
                    clim=self.mc.clim._replace(sstan3=sstan3))
            imont1, tmonth, tyear = cal.season_vars(date, cfg.iseasc,
                                                    start.month)
            im_n, tm_n, _ = cal.season_vars(cal.next_day(date), cfg.iseasc,
                                            start.month)
            ds = coupling.make_date_scalars(cfg, self.geom_np, imont1,
                                            tmonth, tyear, year=date.year,
                                            imont1_next=im_n,
                                            tmonth_next=tm_n)
            collect = output_writer is not None
            state, ys = self._run_day(self.mc, state, ds,
                                      collect_output=collect)
            outs, grids = ys if collect else (ys, None)
            if collect:
                # ONE bulk device->host fetch per day: per-step slice
                # fetches cost a host round trip each (36 steps x 6 fields
                # ~ 5 s/day on a tunneled backend vs ~0.8 s bulk)
                grids = {k: np.asarray(v) for k, v in grids.items()}
            day_diag = jax.tree.map(np.asarray, outs.diag)
            for i in range(cfg.nsteps):
                model_step += 1
                date = cal.newdate(date, cfg.nsteps)
                diag_i = Diagnostics(*[a[i] for a in day_diag])
                if model_step % cfg.nstdia == 0 and verbose:
                    print(format_diagnostics(diag_i, model_step))
                check_diagnostics(diag_i, model_step)
                if output_writer is not None and \
                        model_step % cfg.nsteps_out == 0:
                    fields = {k: v[i] for k, v in grids.items()}
                    output_writer(model_step, date, start, fields)
                if not date < end:
                    break
            day_count += 1
            if checkpoint_every and checkpoint_dir and \
                    day_count % checkpoint_every == 0:
                from ..utils.checkpoint import save_checkpoint
                import os
                name = (f"ckpt_{date.year:04d}{date.month:02d}"
                        f"{date.day:02d}{date.hour:02d}{date.minute:02d}.npz")
                save_checkpoint(os.path.join(checkpoint_dir, name), state,
                                date, model_step, start=start,
                                sstan3=np.asarray(self.mc.clim.sstan3),
                                cfg=cfg)
        return state
