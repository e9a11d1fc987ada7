"""Checkpoint/resume, ensemble, and sharded-equivalence tests."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from speedy_tpu.config import t30
from speedy_tpu.models import coupling
from speedy_tpu.models.model import Model
from speedy_tpu.parallel.ensemble import Ensemble
from speedy_tpu.parallel.mesh import (make_mesh, ensemble_state_sharding,
                                      replicated)
from speedy_tpu.utils import calendar as cal
from speedy_tpu.utils.checkpoint import save_checkpoint, load_checkpoint


@pytest.fixture(scope="module")
def model32():
    return Model(t30(precision="fp32"))


@pytest.fixture(scope="module")
def state32(model32):
    return model32.initialize(cal.Datetime(1982, 1, 1))


@pytest.fixture(scope="module")
def ds32(model32):
    cfg = model32.cfg
    imont1, tmonth, tyear = cal.season_vars(cal.Datetime(1982, 1, 1),
                                            cfg.iseasc, 1)
    return coupling.make_date_scalars(cfg, model32.geom_np, imont1, tmonth,
                                      tyear)


@pytest.mark.smoke
def test_checkpoint_roundtrip(tmp_path, model32, state32):
    path = str(tmp_path / "ckpt.npz")
    date = cal.Datetime(1982, 1, 5, 12, 0)
    start = cal.Datetime(1982, 1, 1)
    sstan3 = np.asarray(model32.mc.clim.sstan3)
    save_checkpoint(path, state32, date, model_step=162, start=start,
                    sstan3=sstan3, cfg=model32.cfg)
    restored, rdate, rstep, extras = load_checkpoint(path, state32,
                                                     cfg=model32.cfg)
    assert rdate == date and rstep == 162
    assert extras["start"] == start
    np.testing.assert_array_equal(extras["sstan3"], sstan3)
    for a, b in zip(jax.tree.leaves(state32), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_config_mismatch_raises(tmp_path, model32, state32):
    """Resuming under a different physics config must fail loudly instead of
    silently continuing a different model (ADVICE round 1)."""
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, state32, cal.Datetime(1982, 1, 2),
                    cfg=model32.cfg)
    bad = t30(precision="fp32", increase_co2=True)
    with pytest.raises(ValueError, match="config mismatch"):
        load_checkpoint(path, state32, cfg=bad)


def test_checkpoint_sppt_state_not_silently_dropped(tmp_path):
    """A checkpoint saved with SPPT on must refuse to load into a template
    without the SPPT leaves (ADVICE round 1: template sppt=None used to
    silently drop the AR(1) state)."""
    cfg = t30(precision="fp32", sppt_on=True)
    m = Model(cfg)
    st = m.initialize(cal.Datetime(1982, 1, 1))
    path = str(tmp_path / "sppt_ck.npz")
    save_checkpoint(path, st, cal.Datetime(1982, 1, 1), cfg=cfg)
    template = st._replace(sppt=None)  # what --sppt-less resume builds
    with pytest.raises(ValueError, match="drop"):
        load_checkpoint(path, template)


def test_run_resume_past_end_raises(model32, state32):
    """Resume at/after --end must error, not loop forever (ADVICE round 1)."""
    with pytest.raises(ValueError, match="not before end"):
        model32.run(cal.Datetime(1982, 1, 1), cal.Datetime(1982, 1, 2),
                    state=state32, resume_date=cal.Datetime(1982, 1, 3),
                    verbose=False)


def test_checkpoint_resume_continues_identically(model32, state32, ds32,
                                                 tmp_path):
    """A step from a restored checkpoint is bit-identical to an uninterrupted
    run (determinism = the TPU build's replacement for the reference's
    output-diff workflow, SURVEY section 4)."""
    m = model32
    s1, _ = m._run_day(m.mc, state32, ds32, collect_output=False)

    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, state32, cal.Datetime(1982, 1, 1))
    restored, _, _, _ = load_checkpoint(path, state32)
    s2, _ = m._run_day(m.mc, restored, ds32, collect_output=False)
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ensemble_sppt_spread(ds32):
    """SPPT members with distinct keys diverge; without SPPT, members stay
    identical (BASELINE config 4 mechanics)."""
    cfg = t30(precision="fp32", sppt_on=True)
    m = Model(cfg)
    ens = Ensemble(m, n_members=4, base_seed=7)
    estate = ens.initialize(cal.Datetime(1982, 1, 1))
    estate, _ = ens.run_days(estate, cal.Datetime(1982, 1, 1), 1)
    vor = np.asarray(estate.prog.vor)
    # member spread exists
    spread = np.abs(vor - vor[:1]).max()
    assert spread > 1e-8, "SPPT members did not diverge"
    assert np.all(np.isfinite(vor))


def _one_step_sharded_vs_single(cfg, n_dp, n_sp, bound=1e-12):
    """One full model step (physics + dynamics + coupling fluxes), sharded
    over an n_dp x n_sp mesh vs unsharded, fp64 roundoff equality."""
    m = Model(cfg)
    start = cal.Datetime(1982, 1, 1)
    state = m.initialize(start)
    imont1, tmonth, tyear = cal.season_vars(start, m.cfg.iseasc, 1)
    ds = coupling.make_date_scalars(m.cfg, m.geom_np, imont1, tmonth, tyear,
                                    year=start.year)
    daily = coupling.daily_update(m.cfg, m.pp, m.lsp, m.mc.dyn.sc, m.mc.clim,
                                  ds, state.surf)
    one_step = m.raw_fns["one_step"]
    ref, _ = jax.jit(one_step, static_argnums=(3,))(m.mc, state, daily, True)

    mesh = make_mesh(n_dp, n_sp)
    vstep = jax.vmap(one_step, in_axes=(None, 0, None, None))
    jstep = jax.jit(vstep, static_argnums=(3,))
    estate = jax.tree.map(lambda x: jnp.broadcast_to(x, (n_dp,) + x.shape),
                          state)
    estate = jax.device_put(estate, ensemble_state_sharding(mesh, estate))
    with mesh:
        out, _ = jstep(m.mc, estate, daily, True)
        jax.block_until_ready(out.prog.vor)
    for name in ("vor", "div", "t", "ps", "tr"):
        a = np.asarray(getattr(ref.prog, name))
        b = np.asarray(getattr(out.prog, name))
        err = np.abs(b - a).max() / np.abs(a).max()
        assert err < bound, (name, err)


def test_tensor_parallel_contraction_fallback():
    """When the spectral n axis does not divide the 'sp' mesh axis, spectral
    state stays replicated and the Legendre analysis becomes a tensor-
    parallel contraction over latitude shards (partial products + one psum).
    T30 nx=32 over sp=3 forces this path; result must match unsharded to
    fp64 roundoff."""
    _one_step_sharded_vs_single(t30(precision="fp64"), n_dp=2, n_sp=3)


def test_t85_sharded_step_matches_single_device():
    """BASELINE config 5 (T85L8 sharded stretch): nx=87 is indivisible, so
    spectral fields ride replicated (TP-contraction scheme) while grids
    shard latitude; one full step matches unsharded to fp64 roundoff."""
    from speedy_tpu.config import t85
    _one_step_sharded_vs_single(t85(precision="fp64"), n_dp=2, n_sp=4)


@pytest.mark.slow
def test_t85_sharded_full_day_matches_single_device():
    """BASELINE config 5 at full depth: an entire T85 day (96 steps incl.
    the daily forcing update, TP-contraction analysis, coupling and the
    grid_to_spec of tcorh/qcorh inside daily_update) over a dp=2 x sp=4
    mesh matches the unsharded day to fp64 roundoff."""
    from speedy_tpu.config import t85
    m = Model(t85(precision="fp64"))
    start = cal.Datetime(1982, 1, 1)
    state = m.initialize(start)
    imont1, tmonth, tyear = cal.season_vars(start, m.cfg.iseasc, 1)
    ds = coupling.make_date_scalars(m.cfg, m.geom_np, imont1, tmonth, tyear)
    ref, _ = m._run_day(m.mc, state, ds, collect_output=False)

    mesh = make_mesh(2, 4)
    run_day = m.raw_fns["run_day"]
    vrun = jax.vmap(run_day, in_axes=(None, 0, None, None))
    jrun = jax.jit(vrun, static_argnums=(3,))
    estate = jax.tree.map(lambda x: jnp.broadcast_to(x, (2,) + x.shape),
                          state)
    estate = jax.device_put(estate, ensemble_state_sharding(mesh, estate))
    with mesh:
        out, _ = jrun(m.mc, estate, ds, False)
        jax.block_until_ready(out.prog.vor)
    for name in ("vor", "div", "t", "ps", "tr"):
        a = np.asarray(getattr(ref.prog, name))
        b = np.asarray(getattr(out.prog, name))
        scale = np.abs(a).max()
        for member in range(2):
            err = np.abs(b[member] - a).max() / scale
            assert err < 1e-11, (name, member, err)


def test_sharded_run_matches_single_device():
    """One sharded day over an 8-device dp x sp mesh reproduces the
    single-device result to fp64 roundoff: the XLA-inserted collectives and
    the partitioning are exactly semantics-preserving (SURVEY section 4
    distributed-level test). Run in fp64 because fp32 reduction-order noise
    amplified through 36 nonlinear steps can reach O(0.1) in vorticity —
    a chaos-growth artifact, not a partitioning signal."""
    m = Model(t30(precision="fp64"))
    start = cal.Datetime(1982, 1, 1)
    state = m.initialize(start)
    imont1, tmonth, tyear = cal.season_vars(start, m.cfg.iseasc, 1)
    ds = coupling.make_date_scalars(m.cfg, m.geom_np, imont1, tmonth, tyear)
    ref, _ = m._run_day(m.mc, state, ds, collect_output=False)

    mesh = make_mesh(2, 4)
    run_day = m.raw_fns["run_day"]
    vrun = jax.vmap(run_day, in_axes=(None, 0, None, None))
    jrun = jax.jit(vrun, static_argnums=(3,))

    estate = jax.tree.map(lambda x: jnp.broadcast_to(x, (2,) + x.shape),
                          state)
    sh = ensemble_state_sharding(mesh, estate)
    estate = jax.device_put(estate, sh)
    with mesh:
        out, _ = jrun(m.mc, estate, ds, False)
        jax.block_until_ready(out.prog.vor)

    for name in ("vor", "div", "t", "ps", "tr"):
        a = np.asarray(getattr(ref.prog, name))
        b = np.asarray(getattr(out.prog, name))
        scale = np.abs(a).max()
        for member in range(2):
            err = np.abs(b[member] - a).max() / scale
            assert err < 1e-12, (name, member, err)


@pytest.mark.slow
def test_t170_sharded_step_matches_single_device():
    """North-star scale (T170, 512x256): nx=172 and il=256 divide sp=4, so
    both spectral-n and grid-latitude axes genuinely shard (the divisible
    scheme, not T85's TP-contraction fallback); one full coupled step
    matches unsharded to fp64 roundoff."""
    from speedy_tpu.config import t170
    _one_step_sharded_vs_single(t170(precision="fp64"), n_dp=2, n_sp=4)


@pytest.mark.slow
def test_t170_sharded_sw_triple_matches_single_device():
    """North-star scale, multi-step: one full SW triple (3 coupled steps,
    SW radiation on the first — the model's basic repeating program unit,
    physics.f90:144-186 cadence) under the divisible n-shard scheme on a
    dp=2 x sp=4 mesh matches unsharded to fp64 roundoff. Extends the
    one-step check (above) through the RadiationState carry: the LW tau
    computed on the SW step is consumed across the 2 SW-skip steps, so
    sharding errors that only surface via the carried radiation state
    would be caught here (VERDICT r04 item 6)."""
    from speedy_tpu.config import t170
    m = Model(t170(precision="fp64"))
    start = cal.Datetime(1982, 1, 1)
    state = m.initialize(start)
    imont1, tmonth, tyear = cal.season_vars(start, m.cfg.iseasc, 1)
    ds = coupling.make_date_scalars(m.cfg, m.geom_np, imont1, tmonth, tyear,
                                    year=start.year)
    daily = coupling.daily_update(m.cfg, m.pp, m.lsp, m.mc.dyn.sc,
                                  m.mc.clim, ds, state.surf)
    one_step = m.raw_fns["one_step"]

    def triple(mc, st, dly):
        for i in range(3):
            st, _ = one_step(mc, st, dly, i == 0)
        return st

    ref = jax.jit(triple)(m.mc, state, daily)
    jax.block_until_ready(ref.prog.vor)

    mesh = make_mesh(2, 4)
    vtriple = jax.vmap(triple, in_axes=(None, 0, None))
    estate = jax.tree.map(lambda x: jnp.broadcast_to(x, (2,) + x.shape),
                          state)
    estate = jax.device_put(estate, ensemble_state_sharding(mesh, estate))
    with mesh:
        out = jax.jit(vtriple)(m.mc, estate, daily)
        jax.block_until_ready(out.prog.vor)
    for name in ("vor", "div", "t", "ps", "tr"):
        a = np.asarray(getattr(ref.prog, name))
        b = np.asarray(getattr(out.prog, name))
        scale = np.abs(a).max()
        for member in range(2):
            err = np.abs(b[member] - a).max() / scale
            assert err < 1e-11, (name, member, err)


@pytest.mark.slow
def test_ensemble_per_step_output(tmp_path):
    """Ensemble.run_days with per-member writers: every member writes the
    reference's one-file-per-step schema (input_output.f90:95-217) into its
    own memberNNN/ directory — BASELINE config 4 output-complete."""
    from speedy_tpu.utils.output import NetCDFWriter

    cfg = t30(precision="fp32", sppt_on=True)
    m = Model(cfg)
    ens = Ensemble(m, n_members=2, base_seed=3)
    start = cal.Datetime(1982, 1, 1)
    estate = ens.initialize(start)
    writers = [NetCDFWriter(cfg, str(tmp_path / f"member{i:03d}"))
               for i in range(2)]
    estate, end = ens.run_days(estate, start, 1, output_writers=writers)
    assert end == cal.Datetime(1982, 1, 2)
    for i in range(2):
        files = sorted((tmp_path / f"member{i:03d}").glob("*.nc"))
        # nsteps + the t=0 initial-condition snapshot (the reference
        # writes one at model_step-1 == 0, input_output.f90 via
        # speedy.f90:50; ADVICE r04)
        assert len(files) == cfg.nsteps + 1, (i, len(files))
        assert files[0].name == "198201010000.nc"
        assert files[-1].name == "198201020000.nc"
    # members differ (SPPT) and the files record it
    from scipy.io import netcdf_file
    with netcdf_file(str(tmp_path / "member000" / "198201020000.nc")) as a, \
            netcdf_file(str(tmp_path / "member001" / "198201020000.nc")) as b:
        ta = a.variables["t"][:].copy()
        tb = b.variables["t"][:].copy()
    assert np.abs(ta - tb).max() > 0.0


@pytest.mark.slow
def test_ensemble_spinup_eddy_energy_bounded():
    """Regression guard for span-compile numerics: the SPPT ensemble's
    eddy kinetic energy must grow through spin-up at the healthy rate
    (r04 measured ~5 -> ~46 over 10 days on the merged-synthesis path).
    The synthesis_split experiment showed a compile variant can be
    bit-identical per day yet diverge through the scanned span
    (7 -> 115 -> 1800 -> NaN by day 8); this test bounds day-10 reke at
    ~4x the healthy value so such a regression fails loudly."""
    import jax.numpy as jnp

    cfg = t30(precision="fp32", sppt_on=True)
    m = Model(cfg)
    ens = Ensemble(m, n_members=8, base_seed=7)
    start = cal.Datetime(1982, 1, 1)
    estate = ens.initialize(start)
    run_span = m.raw_fns["run_span"]
    vspan = jax.jit(jax.vmap(run_span, in_axes=(None, 0, None)))

    ds_list = []
    date = start
    for _ in range(10):
        imont1, tmonth, tyear = cal.season_vars(date, cfg.iseasc,
                                                start.month)
        im_n, tm_n, _ = cal.season_vars(cal.next_day(date), cfg.iseasc,
                                        start.month)
        ds_list.append(coupling.make_date_scalars(
            cfg, m.geom_np, imont1, tmonth, tyear, year=date.year,
            imont1_next=im_n, tmonth_next=tm_n))
        for _ in range(cfg.nsteps):
            date = cal.newdate(date, cfg.nsteps)
    ds_days = jax.tree.map(lambda *xs: np.stack(xs), *ds_list)

    out, guard = vspan(m.mc, estate, ds_days)
    assert np.isfinite(np.asarray(out.prog.vor)).all()
    reke_daily = np.asarray(guard[0]).max(axis=(0, 2))  # [10]
    assert reke_daily[-1] < 200.0, reke_daily
    # and eddies actually spin up (members are not frozen)
    assert reke_daily[-1] > 2.0, reke_daily
