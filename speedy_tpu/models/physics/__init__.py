"""Physics suite orchestrator.

Reference: source/physics.f90. One function computes all parametrization
tendencies on the grid: convection -> large-scale condensation -> shortwave
radiation (every nstrad steps) -> longwave down -> surface fluxes ->
longwave up -> vertical diffusion (+ surface-flux injection) -> SPPT.

Vertical-profile constants and other small tables live as *numpy* arrays in
PhysicsParams and are closed over (embedded as XLA constants); everything
time-varying flows through explicit pytrees (DailyForcing, SurfaceState,
RadiationState, SpptState).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from ...config import ModelConfig
from ...constants import CP, GRAV, P0
from ...ops import spectral as sp
from ..state import PrognosticState
from . import condensation, convection, longwave, rowops, shortwave, \
    sppt as sppt_mod
from . import surface as surface_mod
from . import vertical_diffusion as vdif_mod
from .humidity import spec_hum_to_rel_hum
from .shortwave import RadiationState, init_radiation_state
from .sppt import SpptState


@dataclasses.dataclass(frozen=True)
class PhysicsParams:
    """Host-side (numpy) physics constants, closed over in jit.

    Vertical tables follow physics.f90:12-39; forog
    surface_fluxes.f90:300-309. The LW band fractions (longwave_radiation
    .f90:197-220) are evaluated directly in longwave._fband_at, so no
    table is carried here.
    """
    fsg: np.ndarray       # [kx]
    dhs: np.ndarray       # [kx]
    sigh: np.ndarray      # [kx+1] half-level sigma (= hsg)
    sigl: np.ndarray      # [kx] log(fsg)
    wvi2: np.ndarray      # [kx] half-level interpolation weights wvi(:,2)
    grdsig: np.ndarray    # [kx] g/(dsigma p0)
    grdscp: np.ndarray    # [kx] g/(dsigma p0 cp)
    forog: np.ndarray     # [il, ix] orographic drag factor
    coa: np.ndarray       # [il] cos(lat)
    fmask_l: np.ndarray   # [il, ix]
    fmask_s: np.ndarray   # [il, ix]
    phis0: np.ndarray     # [il, ix] filtered surface geopotential
    sppt_sigma: np.ndarray  # [mx, nx]
    sppt_mu: np.ndarray   # [kx] SPPT vertical taper (sppt.f90:20)


def build_physics_params(cfg: ModelConfig, geom_np: dict, sp_np: dict,
                         fmask_l: np.ndarray, fmask_s: np.ndarray,
                         phi0: np.ndarray, phis0: np.ndarray) -> PhysicsParams:
    hsg, dhs, fsg = geom_np["hsg"], geom_np["dhs"], geom_np["fsg"]
    kx = cfg.kx
    sigl = np.log(fsg)
    sigh = hsg.copy()  # sigh(0:kx) == hsg (physics.f90:19-23)
    wvi1 = np.zeros(kx)
    wvi2 = np.zeros(kx)
    wvi1[: kx - 1] = 1.0 / (sigl[1:] - sigl[:-1])
    wvi2[: kx - 1] = (np.log(sigh[1:kx]) - sigl[: kx - 1]) * wvi1[: kx - 1]
    wvi2[kx - 1] = (np.log(0.99) - sigl[kx - 1]) * wvi1[kx - 2]
    grdsig = GRAV / (dhs * P0)
    grdscp = grdsig / CP

    t = np.float64 if cfg.precision == "fp64" else np.float32
    cast = lambda a: np.asarray(a, dtype=t)
    return PhysicsParams(
        fsg=cast(fsg), dhs=cast(dhs), sigh=cast(sigh), sigl=cast(sigl),
        wvi2=cast(wvi2), grdsig=cast(grdsig), grdscp=cast(grdscp),
        # the reference passes the spectrally FILTERED surface geopotential
        # here (forcing.f90:43 calls set_orog_land_sfc_drag(phis0))
        forog=cast(surface_mod.orographic_drag_factor(phis0)),
        coa=cast(geom_np["coa"]),
        fmask_l=cast(fmask_l), fmask_s=cast(fmask_s), phis0=cast(phis0),
        sppt_sigma=cast(sppt_mod.sppt_sigma(cfg, sp_np["el2"])),
        sppt_mu=cast(np.ones(kx)),
    )


class DailyForcing(NamedTuple):
    """Daily-updated forcing fields (forcing.f90:15-100 + climatology
    interpolation from the land/sea models)."""
    fsol: jnp.ndarray    # [il, 1] TOA insolation
    ozupp: jnp.ndarray   # [il, 1]
    ozone: jnp.ndarray   # [il, 1]
    zenit: jnp.ndarray   # [il, 1]
    stratz: jnp.ndarray  # [il, 1]
    ablco2: jnp.ndarray  # [] CO2 LW absorptivity (daily trend, forcing.f90:64-71)
    alb_l: jnp.ndarray   # [il, ix]
    alb_s: jnp.ndarray   # [il, ix]
    albsfc: jnp.ndarray  # [il, ix]
    snowc: jnp.ndarray   # [il, ix]
    tcorh: jnp.ndarray   # [mx, nx, 2]
    qcorh: jnp.ndarray   # [mx, nx, 2]
    stlcl_ob: jnp.ndarray    # [il, ix] climatological land temperature
    snowd_am: jnp.ndarray    # [il, ix]
    soilw_am: jnp.ndarray    # [il, ix]
    sstcl_ob: jnp.ndarray    # [il, ix] (after sea-ice adjustment)
    sicecl_ob: jnp.ndarray   # [il, ix]
    ticecl_ob: jnp.ndarray   # [il, ix]
    sstan_ob: jnp.ndarray    # [il, ix] observed SST anomaly
    # next-day interpolations, used only by the day's LAST coupling step
    # (the reference couples after newdate, speedy.f90:47-53)
    stlcl_nx: jnp.ndarray    # [il, ix]
    sstcl_nx: jnp.ndarray    # [il, ix]
    sicecl_nx: jnp.ndarray   # [il, ix]
    ticecl_nx: jnp.ndarray   # [il, ix]
    sstan_nx: jnp.ndarray    # [il, ix]


class SurfaceState(NamedTuple):
    """Prognostic + derived surface fields (land_model.f90:26-31,
    sea_model.f90:45-55)."""
    stl_lm: jnp.ndarray
    stl_am: jnp.ndarray
    sst_om: jnp.ndarray
    tice_om: jnp.ndarray
    sice_om: jnp.ndarray
    sst_am: jnp.ndarray
    sice_am: jnp.ndarray
    tice_am: jnp.ndarray
    ssti_om: jnp.ndarray


class Fluxes(NamedTuple):
    """Per-step physics flux diagnostics (auxiliaries.f90:15-33)."""
    precnv: jnp.ndarray
    precls: jnp.ndarray
    cbmf: jnp.ndarray
    tsr: jnp.ndarray
    ssrd: jnp.ndarray
    ssr: jnp.ndarray
    slrd: jnp.ndarray
    slr: jnp.ndarray
    olr: jnp.ndarray
    sfc: surface_mod.SurfaceFluxes


class PhysicsAux(NamedTuple):
    """Everything physics returns besides the tendencies."""
    fluxes: Fluxes
    rad: RadiationState
    sppt: Optional[SpptState]


def grid_physics_core(cfg: ModelConfig, pp: PhysicsParams,
                      compute_sw: bool,
                      ug, vg, tg, qg, phig, pslg,
                      fsol, ozupp, ozone, zenit, stratz, albsfc, ablco2,
                      alb_l, alb_s, snowc, soilw_am, stl_am, sst_am,
                      forog, coa, phis0, fmask_l,
                      tau2_in=None, stratc_in=None, tt_rsw_in=None,
                      ssrd_in=None):
    """The column-local grid-point physics chain (physics.f90:43-205):
    humidity -> convection -> LSC -> [SW clouds+fluxes] -> LW down ->
    surface fluxes -> LW up -> vertical diffusion + flux injection.

    Shape-agnostic over the latitude extent: every input is [kx, L, ix],
    [L, ix], [L, 1], or [L] for ANY latitude tile L, so the same code runs
    (a) on the full grid under plain XLA and (b) inside the fused Pallas
    VPU kernel on latitude tiles (physics/fused.py) — one source of truth
    for the physics arithmetic. On non-SW steps pass the carried
    RadiationState fields (tau2_in..ssrd_in); on SW steps they are
    computed and returned.

    Returns (utend, vtend, ttend, qtend, precnv, precls, cbmf, slrd, slr,
    olr, sfc[, tau2, stratc, tt_rsw, ssrd, ssr, tsr if compute_sw]).
    """
    kx = cfg.kx
    fsg, dhs, sigh = pp.fsg, pp.dhs, pp.sigh
    grdsig = pp.grdsig[:, None, None]
    grdscp = pp.grdscp[:, None, None]

    psg = jnp.exp(pslg)
    rps = 1.0 / psg
    qg = jnp.maximum(qg, 0.0)
    se = CP * tg + phig
    # per-level qsat with pressure sig*psa (sig broadcast as [kx,1,1])
    rh, qsat = spec_hum_to_rel_hum(tg, psg[None], fsg[:, None, None], qg)

    # --- precipitation (physics.f90:124-138) ---
    itop, cbmf, precnv, dfse, dfqa = convection.convection(
        fsg, dhs, pp.wvi2, psg, se, qg, qsat)
    tt_cnv = dfse * rps[None] * grdscp
    qt_cnv = dfqa * rps[None] * grdsig
    # level 1 never scaled/used (loops start at k=2; dfse[0] == 0)
    icnv = kx - itop

    itop, precls, tt_lsc, qt_lsc = condensation.large_scale_condensation(
        fsg, dhs, psg, qg, qsat, itop)  # np tables: slices fold at trace

    ttend = tt_cnv + tt_lsc
    qtend = qt_cnv + qt_lsc
    utend = jnp.zeros_like(ttend)
    vtend = jnp.zeros_like(ttend)

    # --- radiation (physics.f90:144-186) ---
    if compute_sw:
        gse = (se[kx - 2] - se[kx - 1]) / (phig[kx - 2] - phig[kx - 1])
        icltop, cloudc, clstr, qcloud = shortwave.clouds(
            qg, rh, precnv, precls, itop, gse, fmask_l)
        (ssrd, ssr, tsr, dfabs_sw, tau2,
         stratc) = shortwave.shortwave_rad_fluxes(
            fsg, dhs, fsol, ozupp, ozone, zenit, stratz, albsfc, psg, qg,
            icltop, cloudc, clstr, qcloud, ablco2=ablco2)
        tt_rsw = dfabs_sw * rps[None] * grdscp
    else:
        tau2, stratc, tt_rsw, ssrd = (tau2_in, stratc_in, tt_rsw_in,
                                      ssrd_in)

    dlw = longwave.downward_longwave_vec if cfg.lw_band_vectorized \
        else longwave.downward_longwave
    ulw = longwave.upward_longwave_vec if cfg.lw_band_vectorized \
        else longwave.upward_longwave
    slrd, dfabs_lw, st4a1, st4a2, lwflux = dlw(pp.wvi2, tau2, tg)

    # --- surface fluxes + land skin temperature (physics.f90:168-176) ---
    sfc, _saved = surface_mod.surface_fluxes(
        float(pp.wvi2[kx - 1]), float(pp.sigl[kx - 1]), forog, coa,
        stl_am, soilw_am, alb_l, alb_s, snowc,
        psg, ug, vg, tg, qg, rh, phig, phis0, fmask_l, sst_am, ssrd, slrd)
    # anomaly-coupled second sea pass (sea_coupling_flag > 0) is gated at
    # model build: the reference stops for flags >= 1 (sea_model.f90:188-190)

    slr, olr, dfabs_lw = ulw(
        dhs, tau2, stratc, tg, sfc.tsfc,
        slrd, sfc.slru[2], st4a1, st4a2, lwflux, dfabs_lw)
    tt_rlw = dfabs_lw * rps[None] * grdscp
    ttend = ttend + tt_rsw + tt_rlw

    # --- PBL: vertical diffusion + surface-flux injection
    # (physics.f90:192-205) ---
    ut_pbl, vt_pbl, tt_pbl, qt_pbl = vdif_mod.vertical_diffusion(
        fsg, dhs, sigh, se, rh, qg, qsat, phig, icnv)
    ut_pbl = rowops.row_add(ut_pbl, kx - 1, sfc.ustr[2] * rps * pp.grdsig[kx - 1])
    vt_pbl = rowops.row_add(vt_pbl, kx - 1, sfc.vstr[2] * rps * pp.grdsig[kx - 1])
    tt_pbl = rowops.row_add(tt_pbl, kx - 1, sfc.shf[2] * rps * pp.grdscp[kx - 1])
    qt_pbl = rowops.row_add(qt_pbl, kx - 1, sfc.evap[2] * rps * pp.grdsig[kx - 1])
    utend = utend + ut_pbl
    vtend = vtend + vt_pbl
    ttend = ttend + tt_pbl
    qtend = qtend + qt_pbl

    base = (utend, vtend, ttend, qtend, precnv, precls, cbmf, slrd, slr,
            olr, sfc)
    if compute_sw:
        return base + (tau2, stratc, tt_rsw, ssrd, ssr, tsr)
    return base


def get_physical_tendencies(cfg: ModelConfig, pp: PhysicsParams,
                            sc: sp.SpectralConsts, daily: DailyForcing,
                            surf: SurfaceState, rad: RadiationState,
                            sppt_state: Optional[SpptState],
                            compute_sw: bool, pg
                            ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                                       jnp.ndarray, PhysicsAux]:
    """Physics tendencies at time level 0 (physics.f90:43-223).

    ``pg`` is a tendencies.PhysicsGridState: the level-0 grid synthesis,
    computed inside the dynamics transform batches (the reference runs a
    second transform sweep here, physics.f90:95-104; merging the sweeps
    halves the per-step einsum-chain count). Returns grid-point tendency
    increments (utend, vtend, ttend, qtend) to be added to the dynamics
    tendencies, plus PhysicsAux. ``compute_sw`` is a static Python bool
    (shortwave cadence, speedy.f90:35).
    """
    use_fused = cfg.fuse_physics
    if use_fused is None:  # auto: fused on accelerators, plain on CPU
        import jax
        use_fused = jax.default_backend() != "cpu"
    if use_fused:
        from . import fused
        outs = fused.fused_grid_physics(cfg, pp, compute_sw, daily, surf,
                                        rad, pg)
    else:
        outs = grid_physics_core(
            cfg, pp, compute_sw,
            pg.ug, pg.vg, pg.tg, pg.qg, pg.phig, pg.pslg,
            daily.fsol, daily.ozupp, daily.ozone, daily.zenit,
            daily.stratz, daily.albsfc, daily.ablco2, daily.alb_l,
            daily.alb_s, daily.snowc, daily.soilw_am, surf.stl_am,
            surf.sst_am, jnp.asarray(pp.forog), jnp.asarray(pp.coa),
            jnp.asarray(pp.phis0), jnp.asarray(pp.fmask_l),
            None if compute_sw else rad.tau2,
            None if compute_sw else rad.stratc,
            None if compute_sw else rad.tt_rsw,
            None if compute_sw else rad.ssrd)
    (utend, vtend, ttend, qtend, precnv, precls, cbmf, slrd, slr, olr,
     sfc) = outs[:11]
    if compute_sw:
        tau2, stratc, tt_rsw, ssrd, ssr, tsr = outs[11:]
        rad = RadiationState(tau2=tau2, stratc=stratc, tt_rsw=tt_rsw,
                             ssrd=ssrd, ssr=ssr, tsr=tsr)

    # --- SPPT multiplicative noise on the physics increments
    # (physics.f90:207-222) ---
    if cfg.sppt_on:
        if pg.sppt is not None:
            # pattern synthesized inside the main dynamics transform batch
            # (one_step pre-computes the AR(1) update; sppt.sppt_ar1)
            pattern = jnp.clip(pg.sppt, -1.0, 1.0)
        else:
            pattern, sppt_state = sppt_mod.gen_sppt(cfg, sc, pp.sppt_sigma,
                                                    sppt_state)
        fac = 1.0 + pattern * pp.sppt_mu[:, None, None]
        utend, vtend = fac * utend, fac * vtend
        ttend, qtend = fac * ttend, fac * qtend

    fluxes = Fluxes(precnv=precnv, precls=precls, cbmf=cbmf, tsr=rad.tsr,
                    ssrd=rad.ssrd, ssr=rad.ssr, slrd=slrd, slr=slr, olr=olr,
                    sfc=sfc)
    return utend, vtend, ttend, qtend, PhysicsAux(fluxes=fluxes, rad=rad,
                                                  sppt=sppt_state)
