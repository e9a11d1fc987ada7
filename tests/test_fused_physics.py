"""Fused Pallas column physics == plain XLA path.

The fused kernel (physics/fused.py) calls grid_physics_core — the same
code the plain path traces — on latitude tiles, so equality here is a
check of the Pallas plumbing (block specs, tiling, output packing), not
of reimplemented arithmetic. Runs in interpret mode on the CPU test
backend; the real-TPU drive is scripts/bench_step_variants.py +
stability_gate.py.
"""
import numpy as np
import pytest
import jax

from speedy_tpu.config import t30, t85
from speedy_tpu.models.model import Model
from speedy_tpu.models import coupling
from speedy_tpu.utils import calendar as cal

# interpret-mode Pallas on CPU is slow (~2 min for the pair) — the
# default tier runs these; the <60 s smoke tier keeps only a dispatch
# check (test_fused_auto_dispatch below)


def _two_steps(cfg):
    m = Model(cfg)
    start = cal.Datetime(1982, 1, 1)
    state = m.initialize(start)
    imont1, tmonth, tyear = cal.season_vars(start, cfg.iseasc, 1)
    ds = coupling.make_date_scalars(cfg, m.geom_np, imont1, tmonth, tyear,
                                    year=start.year)
    daily = coupling.daily_update(cfg, m.pp, m.lsp, m.mc.dyn.sc, m.mc.clim,
                                  ds, state.surf)
    one_step = jax.jit(m.raw_fns["one_step"], static_argnums=(3,))
    s1, _ = one_step(m.mc, state, daily, True)    # SW step
    s2, _ = one_step(m.mc, s1, daily, False)      # LW-carry step
    return s1, s2


def test_fused_physics_matches_plain_t30():
    a1, a2 = _two_steps(t30(precision="fp64"))
    b1, b2 = _two_steps(t30(precision="fp64", fuse_physics=True))
    for (sa, sb) in ((a1, b1), (a2, b2)):
        for name in ("vor", "div", "t", "ps", "tr"):
            x = np.asarray(getattr(sa.prog, name))
            y = np.asarray(getattr(sb.prog, name))
            err = np.abs(y - x).max() / max(np.abs(x).max(), 1e-30)
            assert err < 1e-13, (name, err)
        # radiation carry (tau2 computed in-kernel on the SW step)
        x = np.asarray(sa.rad.tau2)
        y = np.asarray(sb.rad.tau2)
        np.testing.assert_allclose(y, x, rtol=1e-13, atol=1e-15)
        # surface state sees the kernel's flux outputs through couple_step
        for name in ("sst_om", "tice_om", "stl_lm"):
            np.testing.assert_allclose(np.asarray(getattr(sb.surf, name)),
                                       np.asarray(getattr(sa.surf, name)),
                                       rtol=1e-13)


def test_fused_physics_tiles_t85():
    """T85 forces latitude tiling (the VMEM budget splits il=128), so the
    tile index maps and the column-locality assumption get exercised."""
    a1, _ = _two_steps(t85(precision="fp64"))
    b1, _ = _two_steps(t85(precision="fp64", fuse_physics=True))
    for name in ("vor", "div", "t", "ps", "tr"):
        x = np.asarray(getattr(a1.prog, name))
        y = np.asarray(getattr(b1.prog, name))
        err = np.abs(y - x).max() / max(np.abs(x).max(), 1e-30)
        assert err < 1e-13, (name, err)


@pytest.mark.smoke
def test_fused_auto_dispatch_cpu_uses_plain_path(monkeypatch):
    """fuse_physics=None means auto: plain XLA on CPU backends. The
    dispatch must NOT call into physics.fused (interpret mode is for
    forced tests only)."""
    import speedy_tpu.models.physics.fused as fused_mod

    called = {}
    def boom(*a, **k):
        called["hit"] = True
        raise AssertionError("fused path must not run on CPU under auto")
    monkeypatch.setattr(fused_mod, "fused_grid_physics", boom)
    cfg = t30(precision="fp64")  # fuse_physics=None (auto)
    assert cfg.fuse_physics is None
    _two_steps(cfg)  # would raise via boom if auto picked the fused path
    assert "hit" not in called
