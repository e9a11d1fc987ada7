"""Point-value tests transcribed directly from the Fortran SOURCE TEXT.

Purpose (VERDICT r03, missing item 1): the 2-day parity test diffs the
model against tests/oracle/, but model and oracle share one author, so a
shared misreading of the Fortran would be invisible. Each test here
contains an INDEPENDENT, self-contained transcription of the reference
expressions — constants and formulas copied from the cited
/root/reference/source file:line, evaluated loop-literally in fp64 at
hand-checkable inputs — plus hand-computed literal numbers where the
arithmetic is simple enough to verify on paper. No oracle code and no
model helper is used to produce the expected values; the model's fp64
output must match the transcription to roundoff.

Covered routines (VERDICT item 6 named the first five; the rest guard
later rewrites):
  - solar declination/insolation   shortwave_radiation.f90:287-329
  - implicit xf assembly chain     implicit.f90:62-158
  - surface-flux stability branches + skin solve  surface_fluxes.f90:95-296
  - LW downward band sweep + fband table  longwave_radiation.f90:16-117,197-220
  - convection entrainment/mass flux      convection.f90:27-245
  - LW upward sweep                longwave_radiation.f90:120-194
  - vertical diffusion (all three processes)  vertical_diffusion.f90:30-143
  - geopotential + zonal-mean lapse correction  geopotential.f90:18-57
"""
import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.smoke

# ---------------------------------------------------------------------------
# Constants transcribed from the reference source text (NOT imported from
# speedy_tpu — that is the point).
# physical_constants.f90:16-30
REARTH = 6.371e6
GRAV = 9.81
P0 = 1.0e5
CP = 1004.0
AKAP = 2.0 / 7.0
RGAS = AKAP * CP
ALHC = 2501.0
SBC = 5.67e-8
# dynamical_constants.f90:12
GAMMA = 6.0
# mod_radcon.f90:24-27
EPSLW = 0.05
EMISFC = 0.98
KX = 8


def vertical_geometry():
    """geometry.f90:47 (kx=8 half levels) + :51-55 + physics.f90:19-38."""
    hsg = np.array([0.0, 0.05, 0.14, 0.26, 0.42, 0.60, 0.77, 0.90, 1.00])
    dhs = hsg[1:] - hsg[:-1]
    fsg = 0.5 * (hsg[1:] + hsg[:-1])
    sigl = np.log(fsg)
    # wvi weights (physics.f90:33-38); sigh(k) = hsg(k) (physics.f90:19-23)
    wvi1 = np.zeros(KX)
    wvi2 = np.zeros(KX)
    for k in range(KX - 1):                       # 1-based k = 1..kx-1
        wvi1[k] = 1.0 / (sigl[k + 1] - sigl[k])
        wvi2[k] = (np.log(hsg[k + 1]) - sigl[k]) * wvi1[k]
    wvi2[KX - 1] = (np.log(0.99) - sigl[KX - 1]) * wvi1[KX - 2]
    return hsg, dhs, fsg, sigl, wvi2


def ref_qsat(ta, ps, sig):
    """humidity.f90:44-78, loop-literal (scalar/array, g/kg)."""
    ta = np.asarray(ta, np.float64)
    e0, c1, c2, t0, t1, t2 = 6.108e-3, 17.269, 21.875, 273.16, 35.86, 7.66
    qsat = np.where(ta >= t0, e0 * np.exp(c1 * (ta - t0) / (ta - t1)),
                    e0 * np.exp(c2 * (ta - t0) / (ta - t2)))
    return 622.0 * qsat / (sig * np.asarray(ps) - 0.378 * qsat)


# ---------------------------------------------------------------------------
def test_solar_insolation_point_values():
    """shortwave_radiation.f90:287-329 (subroutine solar).

    At tyear = 0 the Fourier series collapses to pure decimal sums
    (alpha = 0 so all cos terms are 1, all sin terms 0):
      decl = 0.006918 - 0.399912 - 0.006758 - 0.002697 = -0.402449 rad
      fdis = 1.000110 + 0.034221 + 0.000719        =  1.035050
    and at the equator (sia=0, coa=1): ch0 = 0, h0 = pi/2, so
      topsr = csol/pi * fdis * cos(decl)
    With csol = 4*342 (shortwave_radiation.f90:252 topsr uses 4.*solc):
      topsr_eq = 1368/pi * 1.035050 * cos(0.402449) = 414.7006647017...
    """
    from speedy_tpu.models.physics.shortwave import solar

    lats = np.deg2rad(np.array([0.0, 45.0, -45.0, 80.0, -80.0]))
    sia, coa = np.sin(lats), np.cos(lats)
    csol = 4.0 * 342.0

    got0 = solar(sia, coa, 0.0, csol)
    # hand-computed literals (header of this test)
    assert abs(-0.402449 - (0.006918 - 0.399912 - 0.006758 - 0.002697)) == 0.0
    np.testing.assert_allclose(got0[0], 414.7006647017502, rtol=1e-13)
    np.testing.assert_allclose(got0[1], 124.15416615064993, rtol=1e-13)

    # full transcription at two times of year, all latitudes
    for tyear in (0.0, 0.25, 0.6123):
        pigr = 2.0 * np.arcsin(1.0)
        alpha = 2.0 * pigr * tyear
        ca1, sa1 = np.cos(alpha), np.sin(alpha)
        ca2, sa2 = ca1 * ca1 - sa1 * sa1, 2.0 * sa1 * ca1
        ca3, sa3 = ca1 * ca2 - sa1 * sa2, sa1 * ca2 + sa2 * ca1
        decl = (0.006918 - 0.399912 * ca1 + 0.070257 * sa1 - 0.006758 * ca2
                + 0.000907 * sa2 - 0.002697 * ca3 + 0.001480 * sa3)
        fdis = (1.000110 + 0.034221 * ca1 + 0.001280 * sa1
                + 0.000719 * ca2 + 0.000077 * sa2)
        cdecl, sdecl = np.cos(decl), np.sin(decl)
        tdecl = sdecl / cdecl
        csolp = csol / pigr
        expect = np.empty_like(sia)
        for j in range(len(sia)):
            ch0 = min(1.0, max(-1.0, -tdecl * sia[j] / coa[j]))
            h0 = np.arccos(ch0)
            sh0 = np.sin(h0)
            expect[j] = csolp * fdis * (h0 * sia[j] * sdecl
                                        + sh0 * coa[j] * cdecl)
        np.testing.assert_allclose(solar(sia, coa, tyear, csol), expect,
                                   rtol=1e-14)


# ---------------------------------------------------------------------------
def test_implicit_assembly_point_values():
    """implicit.f90:62-158: tref profile, the xa..xe chain, and the
    per-total-wavenumber xf matrices whose inverses the model stores.

    Literal check: rgam = rgas*gamma/(1000*grav) = 0.17544779379641762 and
    tref(1) = 288*0.2**rgam = 217.14995443460384 (fsg(1)=0.025 < 0.2 so the
    max(0.2, fsg) clamp engages — implicit.f90:63).
    """
    from speedy_tpu.config import t30
    from speedy_tpu.geometry import build_geometry_np
    from speedy_tpu.models.hdiffusion import build_diffusion_np
    from speedy_tpu.models.implicit import build_implicit_np

    cfg = t30(precision="fp64")
    geom = build_geometry_np(cfg)
    diff = build_diffusion_np(cfg, geom)
    dt = 2.0 * cfg.delt          # the steady-state 2*delt matrices
    got = build_implicit_np(cfg, geom, diff, dt)

    hsg, dhs, fsg, sigl, _ = vertical_geometry()
    kx, mx, nx = KX, cfg.mx, cfg.nx
    alph = 0.5                                   # params.f90:37

    # tref (implicit.f90:62-67)
    rgam = RGAS * GAMMA / (1000.0 * GRAV)
    assert rgam == 0.17544779379641762
    tref = 288.0 * np.maximum(0.2, fsg) ** rgam
    assert tref[0] == 217.14995443460384
    np.testing.assert_array_equal(got["tref"], tref)
    np.testing.assert_array_equal(got["tref1"], RGAS * tref)
    np.testing.assert_array_equal(got["tref2"], AKAP * tref)

    xi = dt * alph
    # ya/xa (implicit.f90:83-97); xa column kx never read (k2 loop to kx-1)
    ya = np.zeros((kx, kx))
    for k in range(kx):
        for k1 in range(kx):
            ya[k, k1] = -AKAP * tref[k] * dhs[k1]
    xa = np.zeros((kx, kx))
    for k in range(1, kx):       # 1-based k=2..kx
        xa[k, k - 1] = 0.5 * (AKAP * tref[k] / fsg[k]
                              - (tref[k] - tref[k - 1]) / dhs[k])
    for k in range(kx - 1):      # 1-based k=1..kx-1
        xa[k, k] = 0.5 * (AKAP * tref[k] / fsg[k]
                          - (tref[k + 1] - tref[k]) / dhs[k])
    # xb (implicit.f90:99-110)
    dsum = np.cumsum(dhs)
    xb = np.zeros((kx, kx))
    for k in range(kx - 1):
        for k1 in range(kx):
            xb[k, k1] = dhs[k1] * dsum[k]
            if k1 <= k:
                xb[k, k1] -= dhs[k1]
    # xc (implicit.f90:112-120): k2 sum runs 1..kx-1 only
    xc = np.zeros((kx, kx))
    for k in range(kx):
        for k1 in range(kx):
            xc[k, k1] = ya[k, k1]
            for k2 in range(kx - 1):
                xc[k, k1] += xa[k, k2] * xb[k2, k1]
    # xd (implicit.f90:122-132)
    xd = np.zeros((kx, kx))
    for k in range(kx):
        for k1 in range(k + 1, kx):
            xd[k, k1] = RGAS * np.log(hsg[k1 + 1] / hsg[k1])
        xd[k, k] = RGAS * np.log(hsg[k + 1] / fsg[k])
    # xe (implicit.f90:134-142)
    xe = xd @ xc

    np.testing.assert_allclose(got["xd"], xd, rtol=1e-14)
    # the model computes xc via matmul (different summation order than the
    # Fortran triple loop), so analytically-zero entries carry ~1e-12
    # roundoff on O(1e5) terms: compare with a norm-scaled atol
    np.testing.assert_allclose(got["xc"], xc * xi, rtol=1e-13,
                               atol=1e-13 * np.abs(xc * xi).max())
    np.testing.assert_allclose(got["dhsx"], xi * dhs, rtol=1e-15)

    # elz(m,n) = (m+n-2)(m+n-1) * xi/a^2  (implicit.f90:75-79)
    for (m, n) in ((1, 1), (2, 5), (31, 32)):    # 1-based corners
        ell = m + n - 2
        np.testing.assert_allclose(
            got["elz"][m - 1, n - 1],
            ell * (ell + 1) * xi / REARTH**2, rtol=1e-15)

    # xf (implicit.f90:144-158): model stores xj = inv(xf) at [m-1, n-1]
    # keyed by l = m+n-2; verify xj @ xf_transcribed == I.
    for (m, n) in ((1, 2), (2, 1), (5, 7), (31, 32), (1, 32), (31, 1)):
        ell = m + n - 2
        xxx = float(ell) * float(ell + 1) / (REARTH * REARTH)
        xf = np.empty((kx, kx))
        for k in range(kx):
            for k1 in range(kx):
                xf[k, k1] = xi * xi * xxx * (RGAS * tref[k] * dhs[k1]
                                             - xe[k, k1])
            xf[k, k] += 1.0
        resid = got["xj"][m - 1, n - 1] @ xf - np.eye(kx)
        assert np.abs(resid).max() < 1e-12, (m, n, np.abs(resid).max())
    # l = 0 (the global mean) is zeroed, not inverted (implicit.f90:200)
    np.testing.assert_array_equal(got["xj"][0, 0], 0.0)


# ---------------------------------------------------------------------------
def test_surface_flux_point_values():
    """surface_fluxes.f90:95-296 at 4 hand-built columns covering both
    temperature-extrapolation branches (:127-137: lowest-level inversion ->
    use ta(kx); lapse -> blend with ftemp0=1 so the actual-lapse t1 wins)
    and both stability branches of the potential-temperature correction
    (:158-164: unstable capped at +dtheta, stable scaled by astab=0.5 and
    capped at -dtheta), plus the land skin-temperature energy-balance
    update (:196-231) and the sea pass (:237-278) with its literal
    '+ shf + alhc*evap' sign (:278)."""
    from speedy_tpu.models.physics import surface as sfc_mod

    hsg, dhs, fsg, sigl, wvi2 = vertical_geometry()
    kx, nl1 = KX, KX - 1
    n = 4
    # constants from surface_fluxes.f90:21-36
    fwind0, ftemp0 = 0.95, 1.0
    cdl, cds, chl, chs = 2.4e-3, 1.0e-3, 1.2e-3, 0.9e-3
    vgust, ctday, dtheta, fstab = 5.0, 1.0e-2, 3.0, 0.67
    clambda, clambsn = 7.0, 7.0

    # hand-built inputs [il=1, ix=n] (Fortran (ix,il) -> model [il,ix])
    ta = np.zeros((kx, 1, n))
    ta[:, 0, :] = 288.0 * np.maximum(0.3, fsg)[:, None] ** 0.28
    # col 0: inversion at the bottom (ta(kx) < ta(nl1)) -> t1 = ta(kx)
    ta[kx - 1, 0, 0] = ta[nl1 - 1, 0, 0] - 2.0
    # cols 1-3: lapse (ta(kx) > ta(nl1)) -> extrapolated branch
    ta[kx - 1, 0, 1:] = ta[nl1 - 1, 0, 1:] + 4.0
    ua = np.zeros((kx, 1, n)); ua[kx - 1, 0] = [3.0, -5.0, 8.0, 1.0]
    va = np.zeros((kx, 1, n)); va[kx - 1, 0] = [-2.0, 4.0, 0.5, -7.0]
    qa = np.zeros((kx, 1, n)); qa[kx - 1, 0] = [6.0, 8.0, 2.0, 9.0]
    psa = np.array([[1.0, 0.97, 1.02, 0.99]])
    phi = np.zeros((kx, 1, n))
    phi[kx - 1, 0] = GRAV * 420.0          # lowest full-level geopotential
    phi0 = np.array([[0.0, GRAV * 800.0, 0.0, GRAV * 300.0]])
    fmask = np.array([[0.0, 1.0, 0.5, 1.0]])
    stl_am = np.array([[285.0, 305.0, 284.0, 260.0]])  # col1 unstable cap,
    tsea = np.array([[284.0, 283.0, 302.0, 270.0]])    # col3 stable cap
    soilw = np.array([[0.4, 0.9, 0.6, 0.2]])
    alb_l = np.array([[0.1, 0.3, 0.2, 0.7]])
    alb_s = np.array([[0.07, 0.07, 0.07, 0.5]])
    snowc = np.array([[0.0, 0.0, 0.3, 1.0]])
    ssrd = np.array([[300.0, 150.0, 250.0, 20.0]])
    slrd = np.array([[350.0, 320.0, 380.0, 180.0]])
    coa = np.array([0.8])
    forog = np.array([[1.0, 1.2, 1.05, 1.1]])

    # ---- transcription (loop-literal over the n columns) ----
    u0 = fwind0 * ua[kx - 1]
    v0 = fwind0 * va[kx - 1]
    gtemp0 = 1.0 - ftemp0
    rcp = 1.0 / CP
    t1 = np.zeros((2, 1, n)); t2 = np.zeros((2, 1, n))
    for i in range(n):
        dt1 = wvi2[kx - 1] * (ta[kx - 1, 0, i] - ta[nl1 - 1, 0, i])
        t1[0, 0, i] = ta[kx - 1, 0, i] + dt1                       # land
        t1[1, 0, i] = t1[0, 0, i] - phi0[0, i] * dt1 / (
            RGAS * 288.0 * sigl[kx - 1])                           # sea
        t2[1, 0, i] = ta[kx - 1, 0, i] + rcp * phi[kx - 1, 0, i]
        t2[0, 0, i] = t2[1, 0, i] - rcp * phi0[0, i]
    for i in range(n):
        if ta[kx - 1, 0, i] > ta[nl1 - 1, 0, i]:
            t1[0, 0, i] = ftemp0 * t1[0, 0, i] + gtemp0 * t2[0, 0, i]
            t1[1, 0, i] = ftemp0 * t1[1, 0, i] + gtemp0 * t2[1, 0, i]
        else:
            t1[0, 0, i] = ta[kx - 1, 0, i]
            t1[1, 0, i] = ta[kx - 1, 0, i]
    t0 = t1[1] + fmask * (t1[0] - t1[1])
    denvvs0 = (P0 * psa / (RGAS * t0)) * np.sqrt(u0**2 + v0**2 + vgust**2)

    # land pass (:146-231)
    tskin = stl_am + ctday * np.sqrt(coa[0]) * ssrd * (1.0 - alb_l) * psa
    rdth = fstab / dtheta
    astab = 0.5                                  # lscasym = .true.
    dthl = np.where(tskin > t2[0],
                    np.minimum(dtheta, tskin - t2[0]),
                    np.maximum(-dtheta, astab * (tskin - t2[0])))
    denvvs1 = denvvs0 * (1.0 + dthl * rdth)
    cdldv = cdl * denvvs0 * forog
    ustr_l, vstr_l = -cdldv * ua[kx - 1], -cdldv * va[kx - 1]
    chlcp = chl * CP
    shf_l = chlcp * denvvs1 * (tskin - t1[0])
    q1 = qa[kx - 1]                              # fhum0 = 0 branch (:187)
    qsat0 = ref_qsat(tskin, psa, 1.0)
    evap_l = chl * denvvs1 * np.maximum(0.0, soilw * qsat0 - q1)
    esbc = EMISFC * SBC
    tsk3 = tskin**3
    dslr = 4.0 * esbc * tsk3
    slru_l = esbc * tsk3 * tskin
    hflux_l = ssrd * (1.0 - alb_l) + slrd - (slru_l + shf_l + ALHC * evap_l)
    clamb = clambda + snowc * (clambsn - clambda)
    hflux_l = hflux_l - clamb * (tskin - stl_am)
    qsat1 = ref_qsat(tskin + 1.0, psa, 1.0)
    dqs = np.where(evap_l > 0.0, soilw * (qsat1 - qsat0), 0.0)
    dtskin = hflux_l / (clamb + dslr + chl * denvvs1 * (CP + ALHC * dqs))
    tskin = tskin + dtskin
    shf_l = shf_l + chlcp * denvvs1 * dtskin
    evap_l = evap_l + chl * denvvs1 * dqs * dtskin
    slru_l = slru_l + dslr * dtskin
    hflux_l = clamb * (tskin - stl_am)

    # sea pass (:237-278)
    dths = np.where(tsea > t2[1],
                    np.minimum(dtheta, tsea - t2[1]),
                    np.maximum(-dtheta, astab * (tsea - t2[1])))
    denvvs2 = denvvs0 * (1.0 + dths * rdth)
    cdsdv = cds * denvvs2
    ustr_s, vstr_s = -cdsdv * ua[kx - 1], -cdsdv * va[kx - 1]
    shf_s = chs * CP * denvvs2 * (tsea - t1[1])
    qsat_s = ref_qsat(tsea, psa, 1.0)
    evap_s = chs * denvvs2 * (qsat_s - q1)
    slru_s = esbc * tsea**4
    hflux_s = (ssrd * (1.0 - alb_s) + slrd - slru_s + shf_s
               + ALHC * evap_s)                  # literal sign, :278

    # sanity: the intended branches actually triggered
    assert t0[0, 0] == ta[kx - 1, 0, 0]          # inversion branch
    assert dthl[0, 1] == dtheta                  # unstable cap (land)
    assert dths[0, 3] == -dtheta                 # stable cap (sea)

    # ---- model ----
    j = jnp.asarray
    fl, saved = sfc_mod.surface_fluxes(
        float(wvi2[kx - 1]), float(sigl[kx - 1]), j(forog), j(coa),
        j(stl_am), j(soilw), j(alb_l), j(alb_s), j(snowc), j(psa),
        j(ua), j(va), j(ta), j(qa), None, j(phi), j(phi0), j(fmask),
        j(tsea), j(ssrd), j(slrd))

    def close(a, b, name):
        np.testing.assert_allclose(np.asarray(a), b, rtol=1e-13, atol=1e-13,
                                   err_msg=name)
    close(fl.u0, u0, "u0"); close(fl.v0, v0, "v0"); close(fl.t0, t0, "t0")
    close(fl.ustr[0], ustr_l, "ustr_l"); close(fl.ustr[1], ustr_s, "ustr_s")
    close(fl.vstr[0], vstr_l, "vstr_l"); close(fl.vstr[1], vstr_s, "vstr_s")
    close(fl.shf[0], shf_l, "shf_l"); close(fl.shf[1], shf_s, "shf_s")
    close(fl.evap[0], evap_l, "evap_l"); close(fl.evap[1], evap_s, "evap_s")
    close(fl.slru[0], slru_l, "slru_l"); close(fl.slru[1], slru_s, "slru_s")
    close(fl.hfluxn[0], hflux_l, "hfluxn_l")
    close(fl.hfluxn[1], hflux_s, "hfluxn_s")
    close(fl.tskin, tsea + fmask * (tskin - tsea), "tskin blend")
    close(fl.tsfc, tsea + fmask * (stl_am - tsea), "tsfc blend")
    close(fl.shf[2], shf_s + fmask * (shf_l - shf_s), "shf blend")
    close(saved.denvvs_sea, denvvs2, "saved denvvs")
    close(saved.t1_sea, t1[1], "saved t1 sea")


# ---------------------------------------------------------------------------
def test_longwave_downward_point_values():
    """longwave_radiation.f90:16-117 (downward sweep) + the fband table
    (:197-220), both transcribed loop-literally for one 4-column band of
    temperatures spanning the table clamp (T < 200 K aloft)."""
    from speedy_tpu.models.physics import longwave as lw_mod

    hsg, dhs, fsg, sigl, wvi2 = vertical_geometry()
    kx, nl1 = KX, KX - 1
    n = 4

    # fband table (longwave_radiation.f90:197-220)
    fband = np.zeros((401, 4))                   # index by T directly
    eps1 = 1.0 - EPSLW
    for jtemp in range(200, 321):
        fband[jtemp, 1] = (0.148 - 3.0e-6 * (jtemp - 247)**2) * eps1
        fband[jtemp, 2] = (0.356 - 5.2e-6 * (jtemp - 282)**2) * eps1
        fband[jtemp, 3] = (0.314 + 1.0e-5 * (jtemp - 315)**2) * eps1
        fband[jtemp, 0] = eps1 - (fband[jtemp, 1] + fband[jtemp, 2]
                                  + fband[jtemp, 3])
    for jb in range(4):
        fband[100:200, jb] = fband[200, jb]
        fband[321:, jb] = fband[320, jb]

    rng = np.random.default_rng(11)
    ta = np.zeros((kx, 1, n))
    ta[:, 0, :] = (288.0 * np.maximum(0.3, fsg)[:, None]**0.28
                   + rng.normal(0.0, 2.0, (kx, n)))
    ta[0] = 195.0                                # exercises the clamp
    tau2 = rng.uniform(0.3, 0.999, (4, kx, 1, n))

    # ---- transcription (loop-literal; 3-d work arrays [k]) ----
    st4a = np.zeros((kx, 1, n, 2))
    # half-level temperatures (:37-40)
    for k in range(kx - 1):                      # 1-based 1..kx-1
        st4a[k, :, :, 0] = ta[k] + wvi2[k] * (ta[k + 1] - ta[k])
    # stratospheric temps / tropospheric gradients (:42-53)
    st4a[0, :, :, 1] = 0.75 * ta[0] + 0.25 * st4a[0, :, :, 0]
    st4a[1, :, :, 1] = 0.50 * ta[1] + 0.25 * (st4a[0, :, :, 0]
                                              + st4a[1, :, :, 0])
    for k in range(2, nl1):                      # 1-based 3..kx-1
        st4a[k, :, :, 1] = 0.5 * np.maximum(
            st4a[k, :, :, 0] - st4a[k - 1, :, :, 0], 0.0)
    st4a[kx - 1, :, :, 1] = np.maximum(
        ta[kx - 1] - st4a[nl1 - 1, :, :, 0], 0.0)
    # blackbody emission (:55-66)
    for k in range(2):
        st4a[k, :, :, 0] = SBC * st4a[k, :, :, 1]**4
        st4a[k, :, :, 1] = 0.0
    for k in range(2, kx):
        st3a = SBC * ta[k]**3
        st4a[k, :, :, 0] = st3a * ta[k]
        st4a[k, :, :, 1] = 4.0 * st3a * st4a[k, :, :, 1]

    def nint(x):                                 # Fortran nint, positive T
        return int(np.floor(x + 0.5))

    fsfcd = np.zeros((1, n))
    dfabs = np.zeros((kx, 1, n))
    flux = np.zeros((4, 1, n))
    # 3.1 stratosphere k=1, bands 1-2 (:78-89)
    for jb in range(2):
        for i in range(n):
            emis = 1.0 - tau2[jb, 0, 0, i]
            brad = fband[nint(ta[0, 0, i]), jb] * (
                st4a[0, 0, i, 0] + emis * st4a[0, 0, i, 1])
            flux[jb, 0, i] = emis * brad
            dfabs[0, 0, i] -= flux[jb, 0, i]
    # 3.2 troposphere (:93-105)
    for jb in range(4):
        for k in range(1, kx):
            for i in range(n):
                emis = 1.0 - tau2[jb, k, 0, i]
                brad = fband[nint(ta[k, 0, i]), jb] * (
                    st4a[k, 0, i, 0] + emis * st4a[k, 0, i, 1])
                dfabs[k, 0, i] += flux[jb, 0, i]
                flux[jb, 0, i] = tau2[jb, k, 0, i] * flux[jb, 0, i] \
                    + emis * brad
                dfabs[k, 0, i] -= flux[jb, 0, i]
    # 3.3 + 3.4 (:108-116)
    for jb in range(4):
        fsfcd += EMISFC * flux[jb]
    corlw = EPSLW * EMISFC * st4a[kx - 1, :, :, 0]
    dfabs[kx - 1] -= corlw
    fsfcd += corlw

    # ---- model ----
    slrd_m, dfabs_m, st4a1_m, st4a2_m, flux_m = lw_mod.downward_longwave(
        jnp.asarray(wvi2), jnp.asarray(tau2), jnp.asarray(ta))
    np.testing.assert_allclose(np.asarray(slrd_m), fsfcd, rtol=1e-13)
    np.testing.assert_allclose(np.asarray(dfabs_m), dfabs, rtol=1e-12,
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(flux_m), flux, rtol=1e-13)
    np.testing.assert_allclose(np.asarray(st4a1_m), st4a[:, :, :, 0],
                               rtol=1e-13)


# ---------------------------------------------------------------------------
def test_convection_point_values():
    """convection.f90:27-245: diagnosis (checks 1-3), entrainment profile,
    cloud-base mass flux, and the full downward flux sweep, transcribed
    loop-literally for 3 columns (deep convective / non-convective /
    RH-threshold shallow case)."""
    from speedy_tpu.models.physics import convection as cnv_mod

    hsg, dhs, fsg, sigl, wvi2 = vertical_geometry()
    kx, nl1, nlp = KX, KX - 1, KX + 1
    n = 3
    psmin, trcnv, rhbl, rhil = 0.8, 6.0, 0.9, 0.7
    entmax, smf = 0.5, 0.8
    fqmax = 5.0
    fm0 = P0 * dhs[kx - 1] / (GRAV * trcnv * 3600.0)
    rdps = 2.0 / (1.0 - psmin)

    # hand-built columns [kx, 1, n]
    psa = np.array([[1.0, 1.0, 0.95]])
    t_prof = 288.0 * np.maximum(0.3, fsg)**0.28
    se = CP * t_prof[:, None, None] + GRAV * np.linspace(
        14000.0, 300.0, kx)[:, None, None]
    se = np.broadcast_to(se, (kx, 1, n)).copy()
    qsat = ref_qsat(t_prof[:, None, None] * np.ones((kx, 1, n)), psa,
                    fsg[:, None, None])
    qa = np.zeros((kx, 1, n))
    # col 0: deep convection — very moist PBL, moist next level
    qa[:, 0, 0] = 0.2 * qsat[:, 0, 0]
    qa[kx - 1, 0, 0] = 0.98 * qsat[kx - 1, 0, 0]
    qa[nl1 - 1, 0, 0] = 0.95 * qsat[nl1 - 1, 0, 0]
    # make the column conditionally unstable: inflate PBL static energy
    se[kx - 1, 0, 0] += 9000.0
    se[nl1 - 1, 0, 0] += 5000.0
    # col 1: dry stable column — no convection
    qa[:, 0, 1] = 0.1 * qsat[:, 0, 1]
    # col 2: conditional instability + RH threshold (check 3) case
    qa[:, 0, 2] = 0.3 * qsat[:, 0, 2]
    qa[kx - 1, 0, 2] = 0.93 * qsat[kx - 1, 0, 2]
    qa[nl1 - 1, 0, 2] = 0.92 * qsat[nl1 - 1, 0, 2]
    se[kx - 1, 0, 2] += 6000.0

    # ---- transcription ----
    # entrainment profile (convection.f90:62-70)
    entr = np.zeros(kx)                          # 1-based k=2..kx-1
    sentr = 0.0
    for k in range(1, nl1):
        entr[k] = max(0.0, fsg[k] - 0.5)**2
        sentr += entr[k]
    sentr = entmax / sentr
    entr[1:nl1] *= sentr

    # diagnose_convection (:170-245)
    mss = se + ALHC * qsat
    itop_e = np.full((1, n), nlp, int)
    qdif_e = np.zeros((1, n))
    rlhc = 1.0 / ALHC
    for i in range(n):
        if psa[0, i] > psmin:
            mse0 = se[kx - 1, 0, i] + ALHC * qa[kx - 1, 0, i]
            mse1 = min(mse0, se[nl1 - 1, 0, i] + ALHC * qa[nl1 - 1, 0, i])
            mss0 = max(mse0, mss[kx - 1, 0, i])
            ktop1 = kx
            ktop2 = kx
            msthr = 0.0
            for k in range(kx - 3, 2, -1):       # 1-based kx-3 .. 3
                k0 = k - 1                       # 0-based
                mss2 = mss[k0, 0, i] + wvi2[k0] * (mss[k0 + 1, 0, i]
                                                   - mss[k0, 0, i])
                if mss0 > mss2:
                    ktop1 = k
                if mse1 > mss2:
                    ktop2 = k
                    msthr = mss2
            if ktop1 < kx:
                qthr0 = rhbl * qsat[kx - 1, 0, i]
                qthr1 = rhbl * qsat[nl1 - 1, 0, i]
                lqthr = (qa[kx - 1, 0, i] > qthr0
                         and qa[nl1 - 1, 0, i] > qthr1)
                if ktop2 < kx:
                    itop_e[0, i] = ktop1
                    qdif_e[0, i] = max(qa[kx - 1, 0, i] - qthr0,
                                       (mse0 - msthr) * rlhc)
                elif lqthr:
                    itop_e[0, i] = ktop1
                    qdif_e[0, i] = qa[kx - 1, 0, i] - qthr0

    # tendencies (:27-158)
    cbmf_e = np.zeros((1, n)); precnv_e = np.zeros((1, n))
    dfse_e = np.zeros((kx, 1, n)); dfqa_e = np.zeros((kx, 1, n))
    for i in range(n):
        if itop_e[0, i] == nlp:
            continue
        k = kx; k1 = k - 1                       # 1-based
        qmax = max(1.01 * qa[k - 1, 0, i], qsat[k - 1, 0, i])
        sb = se[k1 - 1, 0, i] + wvi2[k1 - 1] * (se[k - 1, 0, i]
                                                - se[k1 - 1, 0, i])
        qb = qa[k1 - 1, 0, i] + wvi2[k1 - 1] * (qa[k - 1, 0, i]
                                                - qa[k1 - 1, 0, i])
        qb = min(qb, qa[k - 1, 0, i])
        fpsa = psa[0, i] * min(1.0, (psa[0, i] - psmin) * rdps)
        fmass = fm0 * fpsa * min(fqmax, qdif_e[0, i] / (qmax - qb))
        cbmf_e[0, i] = fmass
        fus, fuq = fmass * se[k - 1, 0, i], fmass * qmax
        fds, fdq = fmass * sb, fmass * qb
        dfse_e[k - 1, 0, i] = fds - fus
        dfqa_e[k - 1, 0, i] = fdq - fuq
        for k in range(kx - 1, itop_e[0, i], -1):   # 1-based
            k1 = k - 1
            dfse_e[k - 1, 0, i] = fus - fds
            dfqa_e[k - 1, 0, i] = fuq - fdq
            enmass = entr[k - 1] * psa[0, i] * cbmf_e[0, i]
            fmass += enmass
            fus += enmass * se[k - 1, 0, i]
            fuq += enmass * qa[k - 1, 0, i]
            sb = se[k1 - 1, 0, i] + wvi2[k1 - 1] * (se[k - 1, 0, i]
                                                    - se[k1 - 1, 0, i])
            qb = qa[k1 - 1, 0, i] + wvi2[k1 - 1] * (qa[k - 1, 0, i]
                                                    - qa[k1 - 1, 0, i])
            fds, fdq = fmass * sb, fmass * qb
            dfse_e[k - 1, 0, i] += fds - fus
            dfqa_e[k - 1, 0, i] += fdq - fuq
            delq = rhil * qsat[k - 1, 0, i] - qa[k - 1, 0, i]
            if delq > 0.0:
                fsq = smf * cbmf_e[0, i] * delq
                dfqa_e[k - 1, 0, i] += fsq
                dfqa_e[kx - 1, 0, i] -= fsq
        k = itop_e[0, i]
        qsatb = qsat[k - 1, 0, i] + wvi2[k - 1] * (qsat[k, 0, i]
                                                   - qsat[k - 1, 0, i])
        precnv_e[0, i] = max(fuq - fmass * qsatb, 0.0)
        dfse_e[k - 1, 0, i] = fus - fds + ALHC * precnv_e[0, i]
        dfqa_e[k - 1, 0, i] = fuq - fdq - precnv_e[0, i]

    # the three columns exercise the intended branches
    assert itop_e[0, 0] < kx and itop_e[0, 1] == nlp
    assert itop_e[0, 2] < kx

    # ---- model ----
    itop_m, cbmf_m, precnv_m, dfse_m, dfqa_m = cnv_mod.convection(
        jnp.asarray(fsg), jnp.asarray(dhs), jnp.asarray(wvi2),
        jnp.asarray(psa), jnp.asarray(se), jnp.asarray(qa),
        jnp.asarray(qsat))
    np.testing.assert_array_equal(np.asarray(itop_m), itop_e)
    np.testing.assert_allclose(np.asarray(cbmf_m), cbmf_e, rtol=1e-13)
    np.testing.assert_allclose(np.asarray(precnv_m), precnv_e, rtol=1e-13,
                               atol=1e-13)
    np.testing.assert_allclose(np.asarray(dfse_m), dfse_e, rtol=1e-12,
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(dfqa_m), dfqa_e, rtol=1e-12,
                               atol=1e-12)


# ---------------------------------------------------------------------------
def test_longwave_upward_point_values():
    """longwave_radiation.f90:120-194 (upward sweep), transcribed
    loop-literally — guards the band-vectorized rewrite of
    upward_longwave against the source text (added r04 when the band loop
    became a vector axis)."""
    from speedy_tpu.models.physics import longwave as lw_mod

    hsg, dhs, fsg, sigl, wvi2 = vertical_geometry()
    kx, nl1 = KX, KX - 1
    n = 4

    fband = np.zeros((401, 4))
    eps1 = 1.0 - EPSLW
    for jtemp in range(200, 321):
        fband[jtemp, 1] = (0.148 - 3.0e-6 * (jtemp - 247)**2) * eps1
        fband[jtemp, 2] = (0.356 - 5.2e-6 * (jtemp - 282)**2) * eps1
        fband[jtemp, 3] = (0.314 + 1.0e-5 * (jtemp - 315)**2) * eps1
        fband[jtemp, 0] = eps1 - (fband[jtemp, 1] + fband[jtemp, 2]
                                  + fband[jtemp, 3])
    for jb in range(4):
        fband[100:200, jb] = fband[200, jb]
        fband[321:, jb] = fband[320, jb]

    def nint(x):
        return int(np.floor(x + 0.5))

    rng = np.random.default_rng(17)
    ta = np.zeros((kx, 1, n))
    ta[:, 0, :] = (288.0 * np.maximum(0.3, fsg)[:, None]**0.28
                   + rng.normal(0.0, 2.0, (kx, n)))
    ta[0] = 197.0
    ts = ta[kx - 1] + rng.normal(2.0, 1.0, (1, n))
    tau2 = rng.uniform(0.3, 0.999, (4, kx, 1, n))
    # st4a work arrays and incoming band fluxes as the downward pass
    # would leave them (values arbitrary but physical)
    st4a1 = 5.67e-8 * ta**4
    st4a2 = np.zeros_like(ta)
    st4a2[2:] = rng.uniform(0.0, 5.0, (kx - 2, 1, n))
    flux_in = rng.uniform(10.0, 90.0, (4, 1, n))
    stratc = np.stack([rng.uniform(0.0, 5.0, (1, n)),
                       rng.uniform(0.0, 1e-9, (1, n))], axis=0)
    dfabs0 = rng.normal(0.0, 10.0, (kx, 1, n))
    fsfcu = EMISFC * 5.67e-8 * ts**4
    fsfcd = rng.uniform(250.0, 400.0, (1, n))

    # ---- transcription ----
    refsfc = 1.0 - EMISFC
    fsfc_e = fsfcu - fsfcd
    flux = flux_in.copy()
    dfabs = dfabs0.copy()
    for jb in range(4):
        for i in range(n):
            flux[jb, 0, i] = fband[nint(ts[0, i]), jb] * fsfcu[0, i] \
                + refsfc * flux[jb, 0, i]
    dfabs[kx - 1] += EPSLW * fsfcu
    for jb in range(4):
        for k in range(kx, 1, -1):           # 1-based kx .. 2
            for i in range(n):
                emis = 1.0 - tau2[jb, k - 1, 0, i]
                brad = fband[nint(ta[k - 1, 0, i]), jb] * (
                    st4a1[k - 1, 0, i] - emis * st4a2[k - 1, 0, i])
                dfabs[k - 1, 0, i] += flux[jb, 0, i]
                flux[jb, 0, i] = tau2[jb, k - 1, 0, i] * flux[jb, 0, i] \
                    + emis * brad
                dfabs[k - 1, 0, i] -= flux[jb, 0, i]
    for jb in range(2):                      # stratosphere k=1
        for i in range(n):
            emis = 1.0 - tau2[jb, 0, 0, i]
            brad = fband[nint(ta[0, 0, i]), jb] * (
                st4a1[0, 0, i] - emis * st4a2[0, 0, i])
            dfabs[0, 0, i] += flux[jb, 0, i]
            flux[jb, 0, i] = tau2[jb, 0, 0, i] * flux[jb, 0, i] + emis * brad
            dfabs[0, 0, i] -= flux[jb, 0, i]
    corlw1 = dhs[0] * stratc[1] * st4a1[0] + stratc[0]
    corlw2 = dhs[1] * stratc[1] * st4a1[1]
    dfabs[0] -= corlw1
    dfabs[1] -= corlw2
    ftop_e = corlw1 + corlw2 + flux.sum(axis=0)

    # ---- model ----
    j = jnp.asarray
    slr_m, olr_m, dfabs_m = lw_mod.upward_longwave(
        j(dhs), j(tau2), j(stratc), j(ta), j(ts), j(fsfcd), j(fsfcu),
        j(st4a1), j(st4a2), j(flux_in), j(dfabs0))
    np.testing.assert_allclose(np.asarray(slr_m), fsfc_e, rtol=1e-13)
    np.testing.assert_allclose(np.asarray(olr_m), ftop_e, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(dfabs_m), dfabs, rtol=1e-11,
                               atol=1e-9)


# ---------------------------------------------------------------------------
def test_vertical_diffusion_point_values():
    """vertical_diffusion.f90:30-143 transcribed loop-literally: shallow
    convection (both dmse branches + the icnv reduction factor), moisture
    diffusion above the PBL, and the super-adiabatic redistribution whose
    inner k1 loop the model reimplements as a suffix sum — 4 columns
    exercising every branch."""
    from speedy_tpu.models.physics import vertical_diffusion as vd_mod

    hsg, dhs, fsg, sigl, wvi2 = vertical_geometry()
    kx, nl1 = KX, KX - 1
    n = 4
    trshc, trvdi, trvds = 6.0, 24.0, 6.0        # :19-21
    redshc, rhgrad, segrad = 0.5, 0.5, 0.1      # :22-25
    sigh = hsg[1:]                              # sigh(k) 1-based = hsg[k]

    rng = np.random.default_rng(23)
    t_prof = 288.0 * np.maximum(0.3, fsg)**0.28
    phi = GRAV * 7000.0 * np.log(1.0 / fsg)[:, None, None] \
        * np.ones((kx, 1, n))
    se = CP * t_prof[:, None, None] + phi
    se = se + rng.normal(0.0, 300.0, (kx, 1, n))
    qsat = ref_qsat(t_prof[:, None, None] * np.ones((kx, 1, n)),
                    np.ones((1, n)), fsg[:, None, None])
    rh = rng.uniform(0.1, 0.95, (kx, 1, n))
    qa = rh * qsat
    icnv = np.array([[0, 3, 0, 2]])
    # col 0: moist-unstable PBL (dmse>=0, drh>=0); col 1: same but deep
    # convection active (fcnv=redshc); col 2: dmse<0 with drh>drh0;
    # col 3: super-adiabatic interior
    se[kx - 1, 0, 0] = se[nl1 - 1, 0, 0] + 2000.0
    qa[kx - 1, 0, 0] = qsat[kx - 1, 0, 0]
    rh[kx - 1, 0, 0] = 0.95; rh[nl1 - 1, 0, 0] = 0.5
    se[kx - 1, 0, 1] = se[nl1 - 1, 0, 1] + 1500.0
    qa[kx - 1, 0, 1] = qsat[kx - 1, 0, 1]
    se[kx - 1, 0, 2] = se[nl1 - 1, 0, 2] - 5000.0
    qa[kx - 1, 0, 2] = 0.2 * qsat[kx - 1, 0, 2]
    rh[kx - 1, 0, 2] = 0.9; rh[nl1 - 1, 0, 2] = 0.2
    se[3, 0, 3] = se[4, 0, 3] - 4000.0          # se(k) < se0 at k=4 (1b)

    # ---- transcription ----
    cshc = dhs[kx - 1] / 3600.0
    cvdi = (sigh[nl1 - 1] - sigh[0]) / ((nl1 - 1) * 3600.0)
    fshcq = cshc / trshc
    fshcse = cshc / (trshc * CP)
    fvdiq = cvdi / trvdi
    fvdise = cvdi / (trvds * CP)
    rsig = 1.0 / dhs
    rsig1 = np.zeros(kx)
    rsig1[:nl1] = 1.0 / (1.0 - sigh[:nl1])
    tt = np.zeros((kx, 1, n)); qt = np.zeros((kx, 1, n))
    drh0 = rhgrad * (fsg[kx - 1] - fsg[nl1 - 1])
    fvdiq2 = fvdiq * sigh[nl1 - 1]
    for i in range(n):
        dmse = se[kx - 1, 0, i] - se[nl1 - 1, 0, i] \
            + ALHC * (qa[kx - 1, 0, i] - qsat[nl1 - 1, 0, i])
        drh = rh[kx - 1, 0, i] - rh[nl1 - 1, 0, i]
        fcnv = 1.0
        if dmse >= 0.0:
            if icnv[0, i] > 0:
                fcnv = redshc
            fluxse = fcnv * fshcse * dmse
            tt[nl1 - 1, 0, i] = fluxse * rsig[nl1 - 1]
            tt[kx - 1, 0, i] = -fluxse * rsig[kx - 1]
            if drh >= 0.0:
                fluxq = fcnv * fshcq * qsat[kx - 1, 0, i] * drh
                qt[nl1 - 1, 0, i] = fluxq * rsig[nl1 - 1]
                qt[kx - 1, 0, i] = -fluxq * rsig[kx - 1]
        elif drh > drh0:
            fluxq = fvdiq2 * qsat[nl1 - 1, 0, i] * drh
            qt[nl1 - 1, 0, i] = fluxq * rsig[nl1 - 1]
            qt[kx - 1, 0, i] = -fluxq * rsig[kx - 1]
    for k in range(3, kx - 1):                  # 1-based 3..kx-2
        if sigh[k - 1] > 0.5:
            drh0 = rhgrad * (fsg[k] - fsg[k - 1])
            fvdiq2 = fvdiq * sigh[k - 1]
            for i in range(n):
                drh = rh[k, 0, i] - rh[k - 1, 0, i]
                if drh >= drh0:
                    fluxq = fvdiq2 * qsat[k - 1, 0, i] * drh
                    qt[k - 1, 0, i] += fluxq * rsig[k - 1]
                    qt[k, 0, i] -= fluxq * rsig[k]
    for k in range(1, kx):                      # 1-based 1..kx-1
        for i in range(n):
            se0 = se[k, 0, i] + segrad * (phi[k - 1, 0, i] - phi[k, 0, i])
            if se[k - 1, 0, i] < se0:
                fluxse = fvdise * (se0 - se[k - 1, 0, i])
                tt[k - 1, 0, i] += fluxse * rsig[k - 1]
                for k1 in range(k, kx):         # 1-based k+1..kx
                    tt[k1, 0, i] -= fluxse * rsig1[k - 1]

    # branch coverage sanity
    assert tt[nl1 - 1, 0, 0] > 0 and qt[nl1 - 1, 0, 0] > 0
    assert qt[nl1 - 1, 0, 2] > 0 and tt[nl1 - 1, 0, 2] <= tt[nl1 - 1, 0, 0]

    # ---- model ----
    j = jnp.asarray
    ut_m, vt_m, tt_m, qt_m = vd_mod.vertical_diffusion(
        j(fsg), j(dhs), j(hsg), j(se), j(rh), j(qa), j(qsat), j(phi),
        j(icnv, jnp.int32))
    np.testing.assert_array_equal(np.asarray(ut_m), 0.0)
    np.testing.assert_array_equal(np.asarray(vt_m), 0.0)
    np.testing.assert_allclose(np.asarray(tt_m), tt, rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(np.asarray(qt_m), qt, rtol=1e-12, atol=1e-15)


# ---------------------------------------------------------------------------
def test_geopotential_point_values():
    """geopotential.f90:18-57: hydrostatic bottom-up integration and the
    zonal-mean-only (Fortran m=1 row) lapse-rate correction, transcribed
    with its xgeop coefficient tables."""
    from speedy_tpu.config import t30
    from speedy_tpu.geometry import build_geometry_np
    from speedy_tpu.models.geopotential import (build_geopotential,
                                                get_geopotential)

    cfg = t30(precision="fp64")
    geom = build_geometry_np(cfg)
    gc = build_geopotential(cfg, geom)
    hsg, dhs, fsg, sigl, _ = vertical_geometry()
    kx, mx, nx = KX, cfg.mx, cfg.nx

    xgeop1 = np.zeros(kx); xgeop2 = np.zeros(kx + 1)
    for k in range(1, kx + 1):                  # 1-based
        xgeop1[k - 1] = RGAS * np.log(hsg[k] / fsg[k - 1])
        if k != kx:
            xgeop2[k] = RGAS * np.log(fsg[k] / hsg[k])

    rng = np.random.default_rng(29)
    t_spec = rng.normal(0.0, 1.0, (kx, mx, nx, 2))
    t_spec[:, 0, :, 1] = 0.0
    phis = rng.normal(0.0, 100.0, (mx, nx, 2))
    phis[0, :, 1] = 0.0

    phi_e = np.zeros((kx, mx, nx, 2))
    phi_e[kx - 1] = phis + xgeop1[kx - 1] * t_spec[kx - 1]
    for k in range(kx - 1, 0, -1):              # 1-based kx-1..1
        phi_e[k - 1] = phi_e[k] + xgeop2[k] * t_spec[k] \
            + xgeop1[k - 1] * t_spec[k - 1]
    for k in range(2, kx):                      # 1-based 2..kx-1
        corf = xgeop1[k - 1] * 0.5 * np.log(hsg[k] / fsg[k - 1]) \
            / np.log(fsg[k] / fsg[k - 2])
        phi_e[k - 1, 0] = phi_e[k - 1, 0] + corf * (
            t_spec[k, 0] - t_spec[k - 2, 0])

    phi_m = np.asarray(get_geopotential(gc, jnp.asarray(t_spec),
                                        jnp.asarray(phis)))
    np.testing.assert_allclose(phi_m, phi_e, rtol=1e-13, atol=1e-12)


# ---------------------------------------------------------------------------
def test_cloud_diagnosis_point_values():
    """shortwave_radiation.f90:332-410 (subroutine clouds).

    Independent loop-literal transcription with the module constants from
    shortwave_radiation.f90:15-27 (rhcl1=0.30, rhcl2=1.00, qacl=0.20,
    wpcl=0.2, pmaxcl=10.0, clsmax=0.60, clsminl=0.15, gse_s0=0.25,
    gse_s1=0.40), exercising every branch: the nl1 seed level, the
    k=3..kx-2 max-RH scan with the qa>qacl gate, the precipitation
    square-root term with its pmaxcl clamp, the iptop min, and the
    sea/land stratiform split (clfact=1.2). Plus one hand-computed column.
    """
    from speedy_tpu.models.physics.shortwave import clouds

    kx, il, ix = KX, 4, 8
    rng = np.random.default_rng(31)
    qa = rng.uniform(0.0, 10.0, (kx, il, ix))
    rh = rng.uniform(0.0, 1.1, (kx, il, ix))
    precnv = rng.uniform(0.0, 2.0e-4, (il, ix)) * (rng.random((il, ix)) < 0.7)
    precls = rng.uniform(0.0, 1.0e-4, (il, ix))
    gse = rng.uniform(0.1, 0.6, (il, ix))
    fmask = rng.uniform(0.0, 1.0, (il, ix))
    iptop = rng.integers(2, kx + 2, (il, ix)).astype(np.float64)

    # hand-checkable column at (j=0, i=0): RHmax at nl1 = 0.65, dry column
    # above, no precip, stable PBL, pure land
    rh[:, 0, 0] = 0.10
    rh[kx - 2, 0, 0] = 0.65
    rh[kx - 1, 0, 0] = 1.00
    qa[:, 0, 0] = 0.05          # below qacl: the k-scan never takes over
    precnv[0, 0] = precls[0, 0] = 0.0
    gse[0, 0] = 0.40            # fstab = 1
    fmask[0, 0] = 1.0
    iptop[0, 0] = kx + 1.0

    # ---- transcription (Fortran rh(i,j,k) = our rh[k-1, j, i]) ----
    nl1, nlp = kx - 1, kx + 1
    rhcl1, rhcl2, qacl, wpcl, pmaxcl = 0.30, 1.00, 0.20, 0.2, 10.0
    clsmax, clsminl, gse_s0, gse_s1 = 0.60, 0.15, 0.25, 0.40
    rrcl = 1.0 / (rhcl2 - rhcl1)
    cloudc_e = np.zeros((il, ix))
    icltop_e = np.zeros((il, ix))
    clstr_e = np.zeros((il, ix))
    for j in range(il):
        for i in range(ix):
            if rh[nl1 - 1, j, i] > rhcl1:
                cloudc_e[j, i] = rh[nl1 - 1, j, i] - rhcl1
                icltop_e[j, i] = nl1
            else:
                cloudc_e[j, i] = 0.0
                icltop_e[j, i] = nlp
    for k in range(3, kx - 1):                 # 1-based k = 3..kx-2
        for j in range(il):
            for i in range(ix):
                drh = rh[k - 1, j, i] - rhcl1
                if drh > cloudc_e[j, i] and qa[k - 1, j, i] > qacl:
                    cloudc_e[j, i] = drh
                    icltop_e[j, i] = k
    for j in range(il):
        for i in range(ix):
            pr1 = min(pmaxcl, 86.4 * (precnv[j, i] + precls[j, i]))
            cloudc_e[j, i] = min(
                1.0, wpcl * np.sqrt(pr1)
                + min(1.0, cloudc_e[j, i] * rrcl) ** 2.0)
            icltop_e[j, i] = min(iptop[j, i], icltop_e[j, i])
    qcloud_e = qa[nl1 - 1]
    clfact = 1.2
    rgse = 1.0 / (gse_s1 - gse_s0)
    for j in range(il):
        for i in range(ix):
            fstab = max(0.0, min(1.0, rgse * (gse[j, i] - gse_s0)))
            clstr_e[j, i] = fstab * max(clsmax - clfact * cloudc_e[j, i],
                                        0.0)
            clstrl = max(clstr_e[j, i], clsminl) * rh[kx - 1, j, i]
            clstr_e[j, i] = clstr_e[j, i] + fmask[j, i] * (clstrl
                                                           - clstr_e[j, i])

    # hand literals at (0,0): cloudc raw = 0.65-0.30 = 0.35;
    # min(1, 0.35/0.7)^2 = 0.25; no precip -> cloudc = 0.25;
    # clstr_sea = 1 * max(0.60 - 1.2*0.25, 0) = 0.30;
    # land (fmask=1, rh_kx=1): clstr = max(0.30, 0.15) * 1.0 = 0.30
    assert abs(cloudc_e[0, 0] - 0.25) < 1e-12
    assert abs(clstr_e[0, 0] - 0.30) < 1e-12
    assert icltop_e[0, 0] == nl1

    icltop_m, cloudc_m, clstr_m, qcloud_m = clouds(
        jnp.asarray(qa), jnp.asarray(rh), jnp.asarray(precnv),
        jnp.asarray(precls), jnp.asarray(iptop), jnp.asarray(gse),
        jnp.asarray(fmask))
    np.testing.assert_allclose(np.asarray(cloudc_m), cloudc_e, rtol=1e-13)
    np.testing.assert_array_equal(np.asarray(icltop_m, np.float64),
                                  icltop_e)
    np.testing.assert_allclose(np.asarray(clstr_m), clstr_e, rtol=1e-13)
    np.testing.assert_allclose(np.asarray(qcloud_m), qcloud_e, rtol=1e-13)


# ---------------------------------------------------------------------------
def test_sea_ice_slab_point_values():
    """sea_model.f90:387-444 (run_sea_model): slab-ocean anomaly damping,
    ice/sea heat-flux difference, and the NONLINEAR ice damping
    cdis = cdice * anom0/(anom0 + |tanom|), anom0 = 20 (lines 431-434).

    hfseacl = 0 in every reachable configuration (sea_model.f90:186; the
    flux-corrected modes stop at build, sea_model.f90:188-190). Points
    cover tanom_i = 0 (cdis = cdice), +20 (exactly cdice/2), +60
    (cdice/4) and -20.
    """
    from speedy_tpu.models.coupling import LandSeaParams, couple_step
    from speedy_tpu.models.physics import (DailyForcing, SurfaceState,
                                           Fluxes)
    from speedy_tpu.models.physics.surface import SurfaceFluxes
    from speedy_tpu.config import t30

    il, ix = 1, 4
    cfg = t30(precision="fp64")
    arr = lambda *vals: np.array(vals, np.float64).reshape(il, ix)

    # slab parameters (sea_model.f90:84-117 roles; values arbitrary)
    rhcapl = arr(0.02, 0.02, 0.02, 0.02)
    cdland = arr(0.97, 0.97, 0.97, 0.97)
    rhcaps = arr(0.01, 0.012, 0.008, 0.01)
    rhcapi = arr(0.015, 0.02, 0.01, 0.015)
    cdsea = arr(0.95, 0.9, 0.99, 0.95)
    cdice = arr(0.8, 0.6, 0.9, 0.8)
    zeros = np.zeros((il, ix))
    lsp = LandSeaParams(fmask_l=zeros, bmask_l=zeros, fmask_s=zeros,
                        bmask_s=zeros, rhcapl=rhcapl, cdland=cdland,
                        rhcaps=rhcaps, rhcapi=rhcapi, cdsea=cdsea,
                        cdice=cdice, alb0=zeros, beta=1.0)

    stlcl = arr(285.0, 290.0, 280.0, 295.0)
    sstcl = arr(290.0, 288.0, 275.0, 300.0)
    sicecl = arr(0.0, 0.3, 0.9, 0.1)
    ticecl = arr(271.4, 265.0, 250.0, 270.0)
    stl_lm = stlcl + arr(1.0, -2.0, 0.5, 0.0)
    sst_om = sstcl + arr(0.5, -1.0, 2.0, 0.0)
    # ice anomalies chosen for the cdis literals: 0, +20, +60, -20
    tice_om = ticecl + arr(0.0, 20.0, 60.0, -20.0)
    sice_am = arr(0.0, 0.4, 0.95, 0.2)
    tice_am = arr(271.4, 264.0, 252.0, 268.0)

    hfluxn_l = arr(30.0, -20.0, 5.0, 0.0)
    hfluxn_s = arr(50.0, -40.0, 10.0, 25.0)
    shf_s = arr(12.0, 8.0, -3.0, 20.0)
    evap_s = arr(4.0e-3, 2.0e-3, 0.0, 6.0e-3)
    ssrd = arr(250.0, 180.0, 40.0, 310.0)

    # ---- transcription of run_sea_model (sea_model.f90:387-444) ----
    albsea, albice, emisfc, sbc, alhc = 0.07, 0.60, 0.98, 5.67e-8, 2501.0
    sstfr = 273.2 - 1.8
    difice = ((albsea - albice) * ssrd
              + emisfc * sbc * (sstfr ** 4.0 - tice_am ** 4.0)
              + shf_s + evap_s * alhc)
    hflux_i = hfluxn_s + difice * (1.0 - sice_am)
    hflux = hfluxn_s - sicecl * (hflux_i + 1.0 * (sstfr - tice_om))
    tanom = sst_om - sstcl
    tanom = cdsea * (tanom + rhcaps * hflux)
    sst_om_e = tanom + sstcl

    hflux = hflux_i + 1.0 * (sstfr - tice_om)
    tanom = tice_om - ticecl
    anom0 = 20.0
    cdis = cdice * (anom0 / (anom0 + np.abs(tanom)))
    # literals: |tanom| = 0, 20, 60, 20 -> cdis/cdice = 1, 1/2, 1/4, 1/2
    np.testing.assert_allclose(cdis / cdice,
                               [[1.0, 0.5, 0.25, 0.5]], rtol=1e-15)
    tanom = cdis * (tanom + rhcapi * hflux)
    tice_om_e = tanom + ticecl
    sice_om_e = sicecl

    # land (land_model.f90:224-239)
    tanom = stl_lm - stlcl
    stl_lm_e = cdland * (tanom + rhcapl * hfluxn_l) + stlcl

    # ---- drive the model's couple_step ----
    j = jnp.asarray
    daily = DailyForcing(
        fsol=None, ozupp=None, ozone=None, zenit=None, stratz=None,
        ablco2=None, alb_l=None, alb_s=None, albsfc=None, snowc=None,
        tcorh=None, qcorh=None, stlcl_ob=j(stlcl), snowd_am=None,
        soilw_am=None, sstcl_ob=j(sstcl), sicecl_ob=j(sicecl),
        ticecl_ob=j(ticecl), sstan_ob=j(zeros), stlcl_nx=None,
        sstcl_nx=None, sicecl_nx=None, ticecl_nx=None, sstan_nx=None)
    surf = SurfaceState(stl_lm=j(stl_lm), stl_am=j(stl_lm),
                        sst_om=j(sst_om), tice_om=j(tice_om),
                        sice_om=j(sicecl), sst_am=j(sstcl),
                        sice_am=j(sice_am), tice_am=j(tice_am),
                        ssti_om=j(sst_om))
    stack3 = lambda a: jnp.stack([jnp.zeros_like(a), a, a], axis=0)
    sfc = SurfaceFluxes(ustr=None, vstr=None, shf=stack3(j(shf_s)),
                        evap=stack3(j(evap_s)),
                        slru=None,
                        hfluxn=jnp.stack([j(hfluxn_l), j(hfluxn_s)], axis=0),
                        tsfc=None, tskin=None, u0=None, v0=None, t0=None)
    fl = Fluxes(precnv=None, precls=None, cbmf=None, tsr=None,
                ssrd=j(ssrd), ssr=None, slrd=None, slr=None, olr=None,
                sfc=sfc)
    out = couple_step(cfg, lsp, daily, surf, fl)

    np.testing.assert_allclose(np.asarray(out.sst_om), sst_om_e, rtol=1e-14)
    np.testing.assert_allclose(np.asarray(out.tice_om), tice_om_e,
                               rtol=1e-14)
    np.testing.assert_allclose(np.asarray(out.sice_om), sice_om_e,
                               rtol=1e-15)
    np.testing.assert_allclose(np.asarray(out.stl_lm), stl_lm_e, rtol=1e-14)
    # atmosphere-seen SST blend (sea_model.f90:327-362):
    # sst_am = sstcl + sice*(tice - sstcl) with the UPDATED ice fields
    sst_am_e = sstcl + sice_om_e * (tice_om_e - sstcl)
    np.testing.assert_allclose(np.asarray(out.sst_am), sst_am_e, rtol=1e-14)
