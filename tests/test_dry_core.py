"""Dry (adiabatic) dynamical-core tests: geopotential, implicit solver,
rest state, and a 2-day stable integration with orography.

Reference has no physics-off switch, so these validate internal consistency
(SURVEY.md section 7 stage 2); full-model comparison happens at the physics
stage.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from speedy_tpu.config import t30
from speedy_tpu.geometry import build_geometry_np, build_geometry
from speedy_tpu.ops import spectral as sp
from speedy_tpu.models import boundaries as bnd
from speedy_tpu.models.geopotential import build_geopotential, get_geopotential
from speedy_tpu.models.hdiffusion import build_diffusion, build_diffusion_np
from speedy_tpu.models.implicit import (build_implicit, build_implicit_np,
                                        implicit_terms)
from speedy_tpu.models.prognostics import rest_state
from speedy_tpu.models.state import zeros_state
from speedy_tpu.models.tendencies import DynConsts
from speedy_tpu.models.time_stepping import (first_step, step,
                                             zero_orographic_correction)
from speedy_tpu.utils.diagnostics import (compute_diagnostics,
                                          check_diagnostics)


@pytest.fixture(scope="module")
def cfg():
    return t30(precision="fp64")


@pytest.fixture(scope="module")
def geom_np(cfg):
    return build_geometry_np(cfg)


@pytest.fixture(scope="module")
def sp_tables(cfg, geom_np):
    return sp.build_spectral_np(cfg, geom_np)


@pytest.fixture(scope="module")
def sc(cfg, geom_np):
    return sp.build_spectral(cfg, geom_np)


@pytest.fixture(scope="module")
def bounds(cfg, sp_tables):
    return bnd.build_boundaries(cfg, sp_tables)


@pytest.fixture(scope="module")
def dyn(cfg, geom_np, sc, bounds):
    return DynConsts(sc=sc, geom=build_geometry(cfg),
                     gc=build_geopotential(cfg, geom_np), phis=bounds.phis)


@pytest.mark.smoke
def test_geopotential_against_oracle(cfg, geom_np, dyn):
    """get_geopotential == literal per-level accumulation
    (geopotential.f90:33-57)."""
    from speedy_tpu.constants import RGAS
    rng = np.random.default_rng(0)
    t = rng.normal(size=(cfg.kx, cfg.mx, cfg.nx, 2))
    phis = rng.normal(size=(cfg.mx, cfg.nx, 2))
    kx = cfg.kx
    hsg, fsg = geom_np["hsg"], geom_np["fsg"]
    xg1 = RGAS * np.log(hsg[1:] / fsg)
    phi_o = np.zeros_like(t)
    phi_o[kx - 1] = phis + xg1[kx - 1] * t[kx - 1]
    for k in range(kx - 2, -1, -1):
        xg2 = RGAS * np.log(fsg[k + 1] / hsg[k + 1])
        phi_o[k] = phi_o[k + 1] + xg2 * t[k + 1] + xg1[k] * t[k]
    for k in range(1, kx - 1):
        corf = xg1[k] * 0.5 * np.log(hsg[k + 1] / fsg[k]) \
            / np.log(fsg[k + 1] / fsg[k - 1])
        phi_o[k, 0] += corf * (t[k + 1, 0] - t[k - 1, 0])

    phi = get_geopotential(dyn.gc, jnp.asarray(t), jnp.asarray(phis))
    np.testing.assert_allclose(np.asarray(phi), phi_o, atol=1e-10)


@pytest.mark.smoke
def test_implicit_matrices_are_inverses(cfg, geom_np):
    diff_np = build_diffusion_np(cfg, geom_np)
    tab = build_implicit_np(cfg, geom_np, diff_np, dt=2 * cfg.delt)
    # reconstruct xf and check xj @ xf = I (away from l=0)
    from speedy_tpu.constants import REARTH
    xi = 2 * cfg.delt * cfg.alph
    core = np.outer(tab["tref1"], geom_np["dhs"]) \
        - tab["xd"] @ (tab["xc"] / xi)
    m0 = np.arange(cfg.mx)[:, None]
    n0 = np.arange(cfg.nx)[None, :]
    ell = m0 + n0
    for (mm, nn) in [(0, 1), (3, 5), (30, 1), (0, 31)]:
        l = mm + nn
        xf = np.eye(cfg.kx) + xi**2 * l * (l + 1) / REARTH**2 * core
        resid = tab["xj"][mm, nn] @ xf - np.eye(cfg.kx)
        assert np.abs(resid).max() < 1e-10


def test_implicit_terms_oracle(cfg, geom_np):
    """implicit_terms == literal loop translation of implicit.f90:168-217."""
    diff_np = build_diffusion_np(cfg, geom_np)
    ic = build_implicit(cfg, geom_np, diff_np, dt=2 * cfg.delt)
    tab = build_implicit_np(cfg, geom_np, diff_np, dt=2 * cfg.delt)
    rng = np.random.default_rng(1)
    kx, mx, nx = cfg.kx, cfg.mx, cfg.nx
    divdt = rng.normal(size=(kx, mx, nx, 2))
    tdt = rng.normal(size=(kx, mx, nx, 2))
    psdt = rng.normal(size=(mx, nx, 2))

    # oracle
    ye = np.einsum("kq,qmnr->kmnr", tab["xd"], tdt) \
        + tab["tref1"][:, None, None, None] * psdt[None]
    yf = divdt + tab["elz"][None, :, :, None] * ye
    div_o = np.einsum("mnkq,qmnr->kmnr", tab["xj"], yf)
    ps_o = psdt - np.einsum("kmnr,k->mnr", div_o, tab["dhsx"])
    t_o = tdt + np.einsum("kq,qmnr->kmnr", tab["xc"], div_o)

    d, t_, p = implicit_terms(ic, jnp.asarray(divdt), jnp.asarray(tdt),
                              jnp.asarray(psdt))
    np.testing.assert_allclose(np.asarray(d), div_o, atol=1e-10)
    np.testing.assert_allclose(np.asarray(t_), t_o, atol=1e-10)
    np.testing.assert_allclose(np.asarray(p), ps_o, atol=1e-10)
    # l=0 divergence correction is zeroed (implicit.f90:200)
    assert np.abs(np.asarray(d)[:, 0, 0]).max() == 0.0


@pytest.mark.smoke
def test_rest_state_reference_values(cfg, geom_np, sp_tables, bounds, sc):
    state = rest_state(cfg, geom_np, sp_tables, bounds)
    diag = compute_diagnostics(sc, state.vor[0], state.div[0], state.t[0])
    tmean = np.asarray(diag.tmean)
    # stratospheric levels at 216 K
    np.testing.assert_allclose(tmean[:2], 216.0, atol=1e-6)
    # tropospheric global means near 288*fsg^rgam (modulated by orography)
    from speedy_tpu.constants import RGAS, GRAV, GAMMA
    rgam = RGAS * GAMMA / (1000.0 * GRAV)
    expect = 288.0 * geom_np["fsg"][2:] ** rgam
    np.testing.assert_allclose(tmean[2:], expect, rtol=0.02)
    # at rest
    assert float(jnp.abs(state.vor).max()) == 0.0
    assert float(jnp.abs(state.div).max()) == 0.0
    check_diagnostics(diag, 0)


def test_dry_two_day_integration(cfg, geom_np, sp_tables, sc, bounds, dyn):
    """Stage-2 milestone: stable 2-day adiabatic leapfrog integration from
    rest with orography; diagnostics stay inside the reference's guard
    ranges (diagnostics.f90:59-69)."""
    diff_np = build_diffusion_np(cfg, geom_np)
    dc = build_diffusion(cfg, geom_np)
    ic_half = build_implicit(cfg, geom_np, diff_np, 0.5 * cfg.delt)
    ic_full = build_implicit(cfg, geom_np, diff_np, cfg.delt)
    ic_2dt = build_implicit(cfg, geom_np, diff_np, 2 * cfg.delt)
    corr = zero_orographic_correction(cfg)

    state = rest_state(cfg, geom_np, sp_tables, bounds)
    state, _ = first_step(cfg, dyn, dc, ic_half, ic_full, state, corr)

    @jax.jit
    def do_step(ic, state):
        new_state, _ = step(cfg, dyn, dc, ic, state, 2, 2, 2 * cfg.delt, corr)
        return new_state

    for istep in range(72):
        state = do_step(ic_2dt, state)
        if istep % 12 == 0 or istep == 71:
            diag = compute_diagnostics(
                sc, state.vor[1], state.div[1], state.t[1])
            check_diagnostics(diag, istep)
    # adjustment from rest should have produced *some* motion but remain
    # far from the instability guard
    diag = compute_diagnostics(sc, state.vor[1], state.div[1], state.t[1])
    assert float(jnp.max(diag.reke + diag.deke)) > 1e-6
    assert float(jnp.max(diag.reke)) < 100.0
    assert float(jnp.max(diag.deke)) < 100.0
