"""Ensemble forecasting: members vmapped on a leading axis, optionally
sharded over the 'dp' mesh axis.

New capability relative to the reference (which runs ensembles by hand, one
process per member; SURVEY section 2 parallelism inventory). With SPPT on,
each member carries its own PRNG key, so a 64-member ensemble is one
vmapped, optionally multi-chip, jitted computation.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..models.model import Model, ModelState
from ..models import coupling
from ..models.physics.sppt import init_sppt_state
from ..utils import calendar as cal
from .mesh import make_mesh, ensemble_state_sharding, replicated


class Ensemble:
    """n_members copies of the model state advanced together."""

    def __init__(self, model: Model, n_members: int, base_seed: int = 0,
                 mesh=None):
        self.model = model
        self.n = n_members
        self.base_seed = base_seed
        self.mesh = mesh
        cfg = model.cfg

        run_day = model.raw_fns["run_day"]
        vrun = jax.vmap(run_day, in_axes=(None, 0, None, None),
                        axis_name="member")

        def run_day_ens(mc, estate, ds, collect_output):
            return vrun(mc, estate, ds, collect_output)

        # with a mesh, member states are device_put with 'dp'/'sp' shardings
        # at initialize(); jit propagates those input shardings.
        self._run_jit = jax.jit(run_day_ens,
                                static_argnames=("collect_output",))

    def initialize(self, start: cal.Datetime) -> ModelState:
        """Identical deterministic init per member; with SPPT, member-unique
        AR(1) states and keys."""
        model, cfg = self.model, self.model.cfg
        state = model.initialize(start)
        estate = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (self.n,) + x.shape), state)
        if cfg.sppt_on:
            sppts = [init_sppt_state(cfg, model.pp.sppt_sigma,
                                     self.base_seed + i)
                     for i in range(self.n)]
            sppt = jax.tree.map(lambda *xs: jnp.stack(xs), *sppts)
            estate = estate._replace(sppt=sppt)
        if self.mesh is not None:
            sh = ensemble_state_sharding(self.mesh, estate)
            estate = jax.device_put(estate, sh)
        return estate

    def run_days(self, estate: ModelState, start: cal.Datetime,
                 n_days: int, output_writers=None, model_step: int = 0
                 ) -> Tuple[ModelState, cal.Datetime]:
        """Advance all members n_days; returns (state, end date).

        ``output_writers``: optional list of n per-member writer callables
        with the model.run signature ``writer(step, date, start, fields)``
        (e.g. one NetCDFWriter per memberNNN/ directory). When given, every
        step's grid fields for every member are written — the ensemble
        analog of the reference's one-file-per-step output contract
        (input_output.f90:95-217). The day's grids come back in ONE bulk
        device->host fetch ([members, nsteps, ...] per field), the same
        batching model.run uses (per-slice fetches cost a host round trip
        each on a tunneled backend).
        """
        model, cfg = self.model, self.model.cfg
        if output_writers is not None:
            assert len(output_writers) == self.n
            if model_step == 0:
                # initial-condition snapshot, mirroring Model.run's
                # output_writer(0, ...) and the reference's t=0 file
                # (input_output.f90 via speedy.f90:50); one vmapped
                # compute + bulk fetch, not n tunneled per-member fetches
                g0 = jax.jit(jax.vmap(model.raw_fns["gridded_fields"],
                                      in_axes=(None, 0)))(
                    model.mc, estate.prog)
                g0 = {k: np.asarray(v) for k, v in g0.items()}
                for m, w in enumerate(output_writers):
                    w(0, start, start, {k: v[m] for k, v in g0.items()})
        date = start
        for _ in range(n_days):
            imont1, tmonth, tyear = cal.season_vars(date, cfg.iseasc,
                                                    start.month)
            im_n, tm_n, _ = cal.season_vars(cal.next_day(date), cfg.iseasc,
                                            start.month)
            ds = coupling.make_date_scalars(cfg, model.geom_np, imont1,
                                            tmonth, tyear, year=date.year,
                                            imont1_next=im_n,
                                            tmonth_next=tm_n)
            collect = output_writers is not None
            estate, ys = self._run_jit(model.mc, estate, ds,
                                       collect_output=collect)
            if collect:
                _, grids = ys
                grids = {k: np.asarray(v) for k, v in grids.items()}
            for i in range(cfg.nsteps):
                date = cal.newdate(date, cfg.nsteps)
                if collect:
                    for m, w in enumerate(output_writers):
                        w(model_step + i + 1, date, start,
                          {k: v[m, i] for k, v in grids.items()})
            model_step += cfg.nsteps
        return estate, date

    def member_fields(self, estate: ModelState, member: int) -> dict:
        one = jax.tree.map(lambda x: x[member], estate)
        return self.model._gridded(self.model.mc, one.prog)
