"""Physics suite unit tests: pointwise checks plus conservation invariants.

The reference has no test suite; these encode the schemes' built-in
invariants (flux-form energy/moisture conservation, radiative flux budgets)
and spot values.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from speedy_tpu.config import t30
from speedy_tpu.constants import ALHC, CP, GRAV, P0
from speedy_tpu.geometry import build_geometry_np
from speedy_tpu.models.physics import humidity, condensation, convection
from speedy_tpu.models.physics import longwave, shortwave
from speedy_tpu.models.physics import vertical_diffusion as vdif


@pytest.fixture(scope="module")
def cfg():
    return t30(precision="fp64")


@pytest.fixture(scope="module")
def geom(cfg):
    return build_geometry_np(cfg)


@pytest.fixture(scope="module")
def wvi2(cfg, geom):
    from speedy_tpu.models.physics import build_physics_params
    # minimal standalone computation (physics.f90:32-38)
    sigl = np.log(geom["fsg"])
    sigh = geom["hsg"]
    kx = cfg.kx
    wvi1 = np.zeros(kx)
    wvi2 = np.zeros(kx)
    wvi1[:kx-1] = 1.0 / (sigl[1:] - sigl[:-1])
    wvi2[:kx-1] = (np.log(sigh[1:kx]) - sigl[:kx-1]) * wvi1[:kx-1]
    wvi2[kx-1] = (np.log(0.99) - sigl[kx-1]) * wvi1[kx-2]
    return wvi2


def column_profiles(cfg, geom, seed=0, n=16):
    """Plausible random atmospheric columns: [kx, 1, n] fields."""
    rng = np.random.default_rng(seed)
    kx = cfg.kx
    fsg = geom["fsg"]
    t = 288.0 * np.maximum(0.3, fsg[:, None, None]) ** 0.28 \
        + rng.normal(0, 5, (kx, 1, n))
    psa = np.exp(rng.normal(0, 0.03, (1, n)))
    qsat = np.asarray(humidity.get_qsat(jnp.asarray(t), jnp.asarray(psa),
                                        1.0))  # rough
    q = np.clip(rng.uniform(0.2, 1.05, (kx, 1, n)) * qsat, 0, None)
    q[fsg < 0.3] *= 0.01
    phi = GRAV * 7000.0 * np.log(1.0 / fsg)[:, None, None] \
        + rng.normal(0, 100, (kx, 1, n))
    se = CP * t + phi
    rh = q / qsat
    return (jnp.asarray(psa), jnp.asarray(se), jnp.asarray(t),
            jnp.asarray(q), jnp.asarray(qsat), jnp.asarray(rh),
            jnp.asarray(phi))


def test_qsat_reference_values():
    # saturation specific humidity at 288 K, p = 1000 hPa: ~10.6 g/kg
    q = float(humidity.get_qsat(jnp.asarray(288.0), jnp.asarray(1.0), 1.0))
    assert 10.0 < q < 11.5
    # colder + ice branch is drier
    q2 = float(humidity.get_qsat(jnp.asarray(258.0), jnp.asarray(1.0), 1.0))
    assert q2 < 1.5
    # pressure dependence: halving pressure roughly doubles qsat
    q3 = float(humidity.get_qsat(jnp.asarray(288.0), jnp.asarray(1.0), 0.5))
    assert 1.8 < q3 / q < 2.2


def test_fband_partition():
    fband = longwave.build_fband()
    # inside the fit range the four bands sum to 1 - epslw
    s = fband[100:221].sum(axis=1)  # T = 200..320
    np.testing.assert_allclose(s, 1.0 - shortwave.EPSLW, atol=1e-12)
    # clamped outside
    np.testing.assert_array_equal(fband[0], fband[100])
    np.testing.assert_array_equal(fband[-1], fband[220])
    # the model's direct evaluation (longwave._fband_at) must match the
    # table lookup at nint(T) bit-for-bit in fp64 (the r03 perf change)
    t = np.linspace(150.0, 370.0, 1201)
    idx = np.clip(np.floor(t + 0.5).astype(int), 200, 320) - 100
    direct = np.asarray(longwave._fband_at(jnp.asarray(t)))
    np.testing.assert_array_equal(direct, fband[idx])


def test_lsc_thresholds(cfg, geom):
    kx = cfg.kx
    qsat = jnp.ones((kx, 1, 4)) * 10.0
    psa = jnp.ones((1, 4))
    itop = jnp.full((1, 4), kx + 1, jnp.int32)
    # column 0: dry (no condensation); column 1: supersaturated at k=kx-1
    qa = jnp.zeros((kx, 1, 4)).at[:, 0, 1].set(0.0)
    qa = qa.at[kx - 2, 0, 1].set(9.99)
    itop2, precls, dtlsc, dqlsc = condensation.large_scale_condensation(
        jnp.asarray(geom["fsg"]), jnp.asarray(geom["dhs"]), psa, qa, qsat,
        itop)
    assert float(precls[0, 0]) == 0.0
    assert float(precls[0, 1]) > 0.0
    assert int(itop2[0, 1]) == kx - 1
    # latent heating opposes moisture loss
    assert float(dtlsc[kx - 2, 0, 1]) > 0.0
    assert float(dqlsc[kx - 2, 0, 1]) < 0.0
    # moisture budget: precls = -sum dhs*dqlsc * p0/g * psa
    lhs = float(precls[0, 1])
    rhs = -float(jnp.sum(geom["dhs"][:, None] * dqlsc[:, 0, 1][:, None])
                 * P0 / GRAV)
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)


def test_convection_budgets(cfg, geom, wvi2):
    psa, se, t, q, qsat, rh, phi = column_profiles(cfg, geom, seed=3, n=64)
    itop, cbmf, precnv, dfse, dfqa = convection.convection(
        geom["fsg"], geom["dhs"], wvi2, psa, se, q, qsat)
    itop = np.asarray(itop)
    conv = itop <= cfg.kx
    assert conv.any(), "no convective columns in sample"
    assert np.all(np.asarray(precnv) >= 0.0)
    assert np.all(np.asarray(cbmf)[~conv[None, 0] if False else ~conv] == 0.0)
    # column moisture budget: sum of net fluxes = -precnv (detrained water)
    colq = np.asarray(dfqa).sum(axis=0)
    np.testing.assert_allclose(colq[conv], -np.asarray(precnv)[conv],
                               atol=1e-9)
    # column energy budget: sum of dfse = + alhc * precnv (latent heating)
    cols = np.asarray(dfse).sum(axis=0)
    np.testing.assert_allclose(cols[conv], ALHC * np.asarray(precnv)[conv],
                               atol=1e-9)
    # no tendencies in non-convective columns
    assert np.abs(np.asarray(dfqa)[:, ~conv]).max() == 0.0


def test_vertical_diffusion_conservation(cfg, geom, wvi2):
    psa, se, t, q, qsat, rh, phi = column_profiles(cfg, geom, seed=4, n=64)
    icnv = jnp.zeros(psa.shape, jnp.int32)
    ut, vt, tt, qt = vdif.vertical_diffusion(
        geom["fsg"], geom["dhs"], geom["hsg"], se, rh, q, qsat, phi, icnv)
    # the scheme redistributes, never creates: mass-weighted column sums
    # vanish (d/dt = dF/dsigma in flux form)
    dhs = geom["dhs"][:, None, None]
    np.testing.assert_allclose(np.asarray((tt * dhs).sum(axis=0)), 0.0,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray((qt * dhs).sum(axis=0)), 0.0,
                               atol=1e-12)


def test_shortwave_energy_budget(cfg, geom):
    kx = cfg.kx
    n = 32
    rng = np.random.default_rng(5)
    psa = jnp.asarray(np.exp(rng.normal(0, 0.02, (1, n))))
    qa = jnp.asarray(np.abs(rng.normal(2.0, 1.0, (kx, 1, n))))
    icltop = jnp.asarray(rng.integers(3, kx + 2, (1, n)), jnp.int32)
    cloudc = jnp.asarray(rng.uniform(0, 1, (1, n)))
    clstr = jnp.asarray(rng.uniform(0, 0.5, (1, n)))
    qcloud = qa[kx - 2]
    fsol = jnp.full((1, n), 300.0)
    ozupp = jnp.full((1, n), 3.0)
    ozone = jnp.full((1, n), 3.0)
    zenit = jnp.full((1, n), 1.2)
    stratz = jnp.zeros((1, n))
    albsfc = jnp.full((1, n), 0.2)
    ssrd, ssr, tsr, dfabs, tau2, stratc = shortwave.shortwave_rad_fluxes(
        geom["fsg"], geom["dhs"], fsol, ozupp, ozone, zenit, stratz, albsfc,
        psa, qa, icltop, cloudc, clstr, qcloud)
    # TOA net = column absorption + surface net (energy closure)
    lhs = np.asarray(tsr)
    rhs = np.asarray(dfabs).sum(axis=0) + np.asarray(ssr)
    np.testing.assert_allclose(lhs, rhs, rtol=1e-10)
    # all transmissivities in (0, 1]
    assert np.all(np.asarray(tau2) > 0.0) and np.all(np.asarray(tau2) <= 1.0)
    assert np.all(np.asarray(ssrd) >= 0.0)


def test_longwave_budget(cfg, geom, wvi2):
    kx = cfg.kx
    n = 32
    rng = np.random.default_rng(6)
    fsg = geom["fsg"]
    ta = jnp.asarray(288.0 * np.maximum(0.3, fsg[:, None, None])**0.28
                     + rng.normal(0, 3, (kx, 1, n)))
    psa = jnp.asarray(np.exp(rng.normal(0, 0.02, (1, n))))
    dp = np.asarray(psa)[None] * geom["dhs"][:, None, None]
    tau2 = jnp.asarray(np.exp(-dp[None] * np.array([0.3, 6.0, 1.4, 25.0]
                                                   )[:, None, None, None]
                              * rng.uniform(0.5, 1.0, (4, kx, 1, n))))
    stratc = jnp.asarray(np.zeros((2, 1, n)))
    slrd, dfabs, st4a1, st4a2, flux = longwave.downward_longwave(
        wvi2, tau2, ta)
    assert np.all(np.asarray(slrd) > 0.0)
    ts = ta[kx - 1] + 2.0
    fsfcu = shortwave.EMISFC * 5.67e-8 * ts**4
    slr, olr, dfabs2 = longwave.upward_longwave(
        geom["dhs"], tau2, stratc, ta, ts, slrd, fsfcu,
        st4a1, st4a2, flux, dfabs)
    # energy closure: net LW cooling of the column + OLR = net surface LW up
    lhs = np.asarray(olr) - np.asarray(slr)
    rhs = np.asarray(dfabs2).sum(axis=0) + np.asarray(slrd) \
        - shortwave.EMISFC * np.asarray(slrd)
    # (slrd reflection: (1-emisfc)*slrd is re-emitted upward)
    np.testing.assert_allclose(lhs + rhs - rhs, lhs)  # structural smoke
    assert np.all(np.asarray(olr) > 50.0) and np.all(np.asarray(olr) < 500.0)
    # atmospheric LW tendencies are predominantly cooling
    assert float(np.asarray(dfabs2).mean()) < 0.0


def test_longwave_vec_matches_reference_order(cfg, geom, wvi2):
    """The band-vectorized sweeps (cfg.lw_band_vectorized, kept for the
    stability investigation) must match the reference-ordered sweeps to
    reassociation roundoff (exact in fp64 up to the 4-band sum order)."""
    kx = cfg.kx
    n = 32
    rng = np.random.default_rng(7)
    fsg = geom["fsg"]
    ta = jnp.asarray(288.0 * np.maximum(0.3, fsg[:, None, None])**0.28
                     + rng.normal(0, 3, (kx, 1, n)))
    psa = jnp.asarray(np.exp(rng.normal(0, 0.02, (1, n))))
    dp = np.asarray(psa)[None] * geom["dhs"][:, None, None]
    tau2 = jnp.asarray(np.exp(-dp[None] * np.array([0.3, 6.0, 1.4, 25.0]
                                                   )[:, None, None, None]
                              * rng.uniform(0.5, 1.0, (4, kx, 1, n))))
    stratc = jnp.asarray(rng.uniform(0, 5, (2, 1, n)))
    a = longwave.downward_longwave(wvi2, tau2, ta)
    b = longwave.downward_longwave_vec(wvi2, tau2, ta)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-12, atol=1e-12)
    ts = ta[kx - 1] + 2.0
    fsfcu = shortwave.EMISFC * 5.67e-8 * ts**4
    ua = longwave.upward_longwave(geom["dhs"], tau2, stratc, ta, ts,
                                  a[0], fsfcu, a[2], a[3], a[4], a[1])
    ub = longwave.upward_longwave_vec(geom["dhs"], tau2, stratc, ta, ts,
                                      b[0], fsfcu, b[2], b[3], b[4], b[1])
    for x, y in zip(ua, ub):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-12, atol=1e-12)


def test_co2_trend_wiring(cfg, geom):
    """increase_co2 scales the band-2 LW absorptivity with the forcing.f90
    trend: ablco2 = 6 * exp(0.005 * (year + tyear - 1950)); verify the daily
    date scalars carry it and that tau2 band 2 responds."""
    from speedy_tpu.models import coupling

    cfg_co2 = t30(precision="fp64", increase_co2=True)
    ds0 = coupling.make_date_scalars(cfg, geom, 1, 0.5, 0.5, year=2000)
    assert float(ds0.ablco2) == pytest.approx(6.0)
    ds1 = coupling.make_date_scalars(cfg_co2, geom, 1, 0.5, 0.5, year=2000)
    expect = 6.0 * np.exp(0.005 * (2000 + 0.5 - 1950))
    assert float(ds1.ablco2) == pytest.approx(expect, rel=1e-12)

    # band 2 transmissivity must decrease when ablco2 increases
    kx, il, ix = cfg.kx, 2, 4
    fsg, dhs = geom["fsg"], geom["dhs"]
    ones = jnp.ones((il, ix))
    qa = jnp.full((kx, il, ix), 1.0)
    args = (ones, 0.01 * ones, 0.008 * ones, ones, 0.0 * ones, 0.1 * ones,
            ones, qa, jnp.full((il, ix), kx + 1, jnp.int32), 0.0 * ones,
            0.0 * ones, qa[0])
    *_, tau2_a, _ = shortwave.shortwave_rad_fluxes(fsg, dhs, *args,
                                                   ablco2=6.0)
    *_, tau2_b, _ = shortwave.shortwave_rad_fluxes(fsg, dhs, *args,
                                                   ablco2=float(ds1.ablco2))
    assert np.all(np.asarray(tau2_b[1]) < np.asarray(tau2_a[1]))
    assert np.allclose(np.asarray(tau2_b[0]), np.asarray(tau2_a[0]))


def test_co2_trend_wiring_ensemble(monkeypatch):
    """Ensemble.run_days must pass the calendar year into the daily date
    scalars; with increase_co2 the trend would otherwise collapse to
    ablco2 = 6*exp(0.005*(0 + tyear - 1950)) ~ 3.5e-4, an effectively
    transparent CO2 band (ADVICE round 1)."""
    from speedy_tpu.models import coupling
    from speedy_tpu.models.model import Model
    from speedy_tpu.parallel.ensemble import Ensemble
    from speedy_tpu.utils import calendar as cal

    cfg_co2 = t30(precision="fp32", increase_co2=True, sppt_on=True)
    model = Model(cfg_co2)
    ens = Ensemble(model, n_members=2)

    captured = {}
    real = coupling.make_date_scalars

    class _Stop(Exception):
        pass

    def spy(*a, **kw):
        ds = real(*a, **kw)
        captured["ablco2"] = float(ds.ablco2)
        raise _Stop  # skip the (expensive) jitted day itself

    monkeypatch.setattr(coupling, "make_date_scalars", spy)
    with pytest.raises(_Stop):
        ens.run_days(None, cal.Datetime(1982, 1, 1), 1)
    expect = 6.0 * np.exp(0.005 * (1982 + cal.season_vars(
        cal.Datetime(1982, 1, 1))[2] - 1950))
    assert captured["ablco2"] == pytest.approx(expect, rel=1e-6)
