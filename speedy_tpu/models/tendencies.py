"""Dynamical-core tendency assembly.

Reference: source/tendencies.f90. All per-level Fortran loops become batched
array ops over the leading level axis; all ~20 per-step spectral transforms
of each direction are batched into a handful of einsum-based transform calls
(grouped by scaling variant), which is the single biggest TPU win over the
reference's one-field-at-a-time transforms (tendencies.f90:89-107, 212-234).

Grid-point fields use [kx, il, ix]; spectral fields [kx, mx, nx, 2].
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple
import os


import jax.numpy as jnp

from ..config import ModelConfig
from ..constants import AKAP, RGAS
from ..geometry import Geometry
from ..ops import spectral as sp
from .geopotential import GeopotentialConsts, get_geopotential
from .implicit import ImplicitConsts, implicit_terms
from .state import PrognosticState


class DynConsts(NamedTuple):
    """Time-invariant constants needed by the dynamics hot path."""
    sc: sp.SpectralConsts
    geom: Geometry
    gc: GeopotentialConsts
    phis: jnp.ndarray  # [mx, nx, 2] spectral surface geopotential


class GridState(NamedTuple):
    """Grid-point synthesis of one time level (inputs to physics too)."""
    vorg: jnp.ndarray  # [kx, il, ix] absolute vorticity (Coriolis added)
    divg: jnp.ndarray
    tg: jnp.ndarray
    trg: jnp.ndarray   # [ntr, kx, il, ix]
    ug: jnp.ndarray    # true zonal wind u
    vg: jnp.ndarray    # true meridional wind v


class PhysicsGridState(NamedTuple):
    """Level-0 (physics time level) grid-point synthesis. The transforms are
    merged into the dynamics synthesis batches (one einsum chain synthesizes
    both time levels), so physics receives ready grid fields instead of
    spectral state — vs the reference's second transform sweep
    (physics.f90:95-104)."""
    ug: jnp.ndarray    # [kx, il, ix] true zonal wind
    vg: jnp.ndarray
    tg: jnp.ndarray
    qg: jnp.ndarray    # specific humidity (unclamped; physics clamps >= 0)
    phig: jnp.ndarray  # geopotential
    pslg: jnp.ndarray  # [il, ix] log surface pressure
    sppt: Optional[jnp.ndarray] = None  # [kx, il, ix] unclipped SPPT pattern


# Type of the physics hook: takes a PhysicsGridState at the physics time
# level and returns grid-point tendency increments (utend, vtend, ttend,
# trtend) plus an updated auxiliary pytree. Wired in by the physics package;
# None = adiabatic core.
PhysicsFn = Callable[[PhysicsGridState], Tuple]


def _half_level_advection(shd: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """tmp[i] = sigdt_half[i] * (f[i] - f[i-1]) on interior half levels,
    padded with zeros at top/bottom -> [kx+1, il, ix]."""
    interior = shd[1:-1] * (f[1:] - f[:-1])
    zero = jnp.zeros_like(interior[:1])
    return jnp.concatenate([zero, interior, zero], axis=0)


def grid_dynamics_tendencies(cfg: ModelConfig, dyn: DynConsts, ic: ImplicitConsts,
                             state: PrognosticState, j2: int,
                             phi0_spec: Optional[jnp.ndarray] = None,
                             sppt_spec: Optional[jnp.ndarray] = None
                             ) -> Tuple[jnp.ndarray, ...]:
    """Nonlinear grid-point dynamics tendencies (tendencies.f90:49-197).

    Returns (gs, pg, psdt_g, utend, vtend, ttend, trtend, tgg) where gs is
    the GridState at level j2, pg is the PhysicsGridState at level 0 (or
    None when ``phi0_spec`` is None, i.e. the adiabatic core), psdt_g the
    grid-point log-ps tendency (transformed to spectral later, batched with
    the other forward transforms), and the *tend arrays are grid-point
    tendencies that physics increments before the spectral conversion.

    The level-0 physics synthesis rides in the same two einsum chains as the
    dynamics synthesis — batching over time levels as well as fields/levels.
    """
    sc, geom = dyn.sc, dyn.geom
    dhs = geom.dhs[:, None, None]
    dhsr = geom.dhsr[:, None, None]
    fsgr = geom.fsgr[:, None, None]
    tref = ic.tref[:, None, None]
    kx, ntr = cfg.kx, cfg.ntr
    with_phys = phi0_spec is not None

    # --- spectral -> grid, batched over every field, level AND time level
    # at once (tendencies.f90:89-107 + physics.f90:95-104 merged).
    # cfg.synthesis_split=True instead synthesizes consumer-sized groups:
    # the merged 65-channel stack needs a full-stack layout copy before
    # the per-field slices (measured ~2 x 1.6 ms per triple on the
    # 64-member span, scripts/profile_timeline.py r04); per-group outputs
    # materialize directly in their consumers' layouts. ---
    vor_s, div_s = state.vor[j2], state.div[j2]
    plain_fields = [vor_s, div_s, state.t[j2],
                    state.tr[j2].reshape((-1,) + vor_s.shape[1:])]
    if with_phys:
        plain_fields += [state.t[0], state.tr[0, 0], phi0_spec,
                         state.ps[0][None]]
    if sppt_spec is not None:
        # SPPT pattern synthesis rides the same einsum chain (sppt.f90:93-95
        # analog) instead of a separate small transform dispatch
        plain_fields.append(sppt_spec)
    if cfg.synthesis_split:
        plain_parts = [sp.spec_to_grid(sc, f) for f in plain_fields]
        def plain_slice(a, b):
            # channel range [a:b) of the virtual concatenated stack
            out, off = [], 0
            for f, g in zip(plain_fields, plain_parts):
                n = f.shape[0]
                lo, hi = max(a - off, 0), min(b - off, n)
                if lo < hi:
                    out.append(g[lo:hi])
                off += n
            return out[0] if len(out) == 1 else jnp.concatenate(out, axis=0)
    else:
        stack = jnp.concatenate(plain_fields, axis=0)
        # Pad the channel batch to a multiple of 8: XLA's layout for the
        # odd-sized merged stack is pathological (B=65 measured 9.8
        # us/direction vs 2.1 at B=72 — r05 B-sweep, BASELINE.md). The
        # zero channels are dead outputs; every real channel's transform
        # is an independent contraction, so its values are unchanged.
        pad = (-stack.shape[0]) % 8
        if os.environ.get("SPEEDY_TPU_NO_CHANNEL_PAD"):  # A/B escape
            pad = 0
        if cfg.ix > 128:
            # measured at T85/T170: no B=65 layout pathology there, and
            # the +10% dead-channel FLOPs COST ~2.5-3% warm throughput
            # (BASELINE.md r05 padding A/B) — pad only the small grids
            pad = 0
        if pad and stack.shape[0] > 40:
            stack = jnp.concatenate(
                [stack, jnp.zeros((pad,) + stack.shape[1:], stack.dtype)],
                axis=0)
        plain_g = sp.spec_to_grid(sc, stack)
        plain_slice = lambda a, b: plain_g[a:b]
    vorg = plain_slice(0, kx)
    divg = plain_slice(kx, 2 * kx)
    tg = plain_slice(2 * kx, 3 * kx)
    base = (3 + ntr) * kx
    trg = plain_slice(3 * kx, base).reshape((ntr, kx) + vorg.shape[1:])

    if with_phys:
        vor_uv = jnp.concatenate([vor_s, state.vor[0]], axis=0)
        div_uv = jnp.concatenate([div_s, state.div[0]], axis=0)
    else:
        vor_uv, div_uv = vor_s, div_s
    ucos, vcos = sp.uvspec(sc, vor_uv, div_uv)
    px_s, py_s = sp.grad(sc, state.ps[j2])
    nuv = ucos.shape[0]
    if cfg.synthesis_split:
        u_g = sp.spec_to_grid(sc, ucos, scale_by_inv_cos=True)
        v_g = sp.spec_to_grid(sc, vcos, scale_by_inv_cos=True)
        p_g = sp.spec_to_grid(sc, jnp.stack([px_s, py_s], axis=0),
                              scale_by_inv_cos=True)
        ug, vg = u_g[:kx], v_g[:kx]
        px, py = p_g[0], p_g[1]
        ug0, vg0 = u_g[kx:], v_g[kx:]
    else:
        wind = jnp.concatenate([ucos, vcos, px_s[None], py_s[None]], axis=0)
        wind_g = sp.spec_to_grid(sc, wind, scale_by_inv_cos=True)
        ug, vg = wind_g[:kx], wind_g[nuv:nuv + kx]
        px, py = wind_g[2 * nuv], wind_g[2 * nuv + 1]
        ug0, vg0 = wind_g[kx:nuv], wind_g[nuv + kx:2 * nuv]

    pg = None
    if with_phys:
        pg = PhysicsGridState(
            ug=ug0, vg=vg0,
            tg=plain_slice(base, base + kx),
            qg=plain_slice(base + kx, base + 2 * kx),
            phig=plain_slice(base + 2 * kx, base + 3 * kx),
            pslg=plain_slice(base + 3 * kx, base + 3 * kx + 1)[0],
            sppt=(plain_slice(base + 3 * kx + 1, base + 3 * kx + 1 + kx)
                  if sppt_spec is not None else None))

    vorg = vorg + geom.coriol[None, :, None]

    # --- vertical-mean winds and log-ps tendency (tendencies.f90:109-126) ---
    umean = jnp.sum(ug * dhs, axis=0)
    vmean = jnp.sum(vg * dhs, axis=0)
    dmean = jnp.sum(divg * dhs, axis=0)
    psdt_g = -umean * px - vmean * py

    # --- sigma-dot vertical velocity (tendencies.f90:128-143) ---
    puv = (ug - umean) * px + (vg - vmean) * py
    zero2 = jnp.zeros_like(puv[:1])
    shd = jnp.concatenate(
        [zero2, -jnp.cumsum(dhs * (puv + divg - dmean), axis=0)], axis=0)
    shm = jnp.concatenate([zero2, -jnp.cumsum(dhs * puv, axis=0)], axis=0)

    tgg = tg - tref

    # --- wind tendencies (tendencies.f90:151-172) ---
    tmp_u = _half_level_advection(shd, ug)
    utend = vg * vorg - tgg * RGAS * px - (tmp_u[1:] + tmp_u[:-1]) * dhsr
    tmp_v = _half_level_advection(shd, vg)
    vtend = -ug * vorg - tgg * RGAS * py - (tmp_v[1:] + tmp_v[:-1]) * dhsr

    # --- temperature tendency (tendencies.f90:174-184) ---
    dtref = (ic.tref[1:] - ic.tref[:-1])[:, None, None]
    tmp_t = _half_level_advection(shd, tgg) \
        + jnp.concatenate([zero2, shm[1:-1] * dtref, zero2], axis=0)
    ttend = (tgg * divg - (tmp_t[1:] + tmp_t[:-1]) * dhsr
             + fsgr * tgg * (shd[1:] + shd[:-1])
             + ic.tref3[:, None, None] * (shm[1:] + shm[:-1])
             + AKAP * (tg * puv - tgg * dmean))

    # --- tracer tendency (tendencies.f90:186-197) ---
    def tracer_tend(q):
        tmp_q = _half_level_advection(shd, q)
        # reference quirk: vertical advection zeroed on half levels 2-3
        # (1-based temp(:,:,2:3)=0, tendencies.f90:192)
        tmp_q = tmp_q.at[1:3].set(0.0)
        return q * divg - (tmp_q[1:] + tmp_q[:-1]) * dhsr
    trtend = jnp.stack([tracer_tend(trg[i]) for i in range(ntr)], axis=0)

    gs = GridState(vorg=vorg, divg=divg, tg=tg, trg=trg, ug=ug, vg=vg)
    return gs, pg, psdt_g, utend, vtend, ttend, trtend, tgg


def grid_to_spectral_tendencies(cfg: ModelConfig, dyn: DynConsts,
                                gs: GridState, tgg: jnp.ndarray,
                                psdt_g: jnp.ndarray,
                                utend, vtend, ttend, trtend
                                ) -> Tuple[jnp.ndarray, ...]:
    """Convert grid-point tendencies to spectral (tendencies.f90:208-234).

    All forward transforms are batched: the u/v-type pairs go through one
    vdspec call ([1 + kx*(1+ntr)] levels per component) and the scalar fields
    (KE, ttend, trtend, plus the log-ps tendency from the synthesis phase)
    through one grid_to_spec call.
    """
    sc = dyn.sc
    kx, ntr = cfg.kx, cfg.ntr
    # u-type / v-type stacks: wind tendencies, then -u*T', -v*T', then tracers
    u_stack = jnp.concatenate(
        [utend, -gs.ug * tgg]
        + [-gs.ug * gs.trg[i] for i in range(ntr)], axis=0)
    v_stack = jnp.concatenate(
        [vtend, -gs.vg * tgg]
        + [-gs.vg * gs.trg[i] for i in range(ntr)], axis=0)
    vor_out, div_out = sp.vdspec(sc, u_stack, v_stack, half_cos_scaling=True)
    vordt = vor_out[:kx]
    tdt_adv = div_out[kx:2 * kx]
    trdt_adv = div_out[2 * kx:].reshape((ntr, kx) + div_out.shape[1:])

    # scalar forward transforms: KE (for -lapl), ttend, trtend, psdt
    ke = 0.5 * (gs.ug**2 + gs.vg**2)
    scal = jnp.concatenate(
        [ke, ttend, trtend.reshape((-1,) + ttend.shape[1:]),
         psdt_g[None]], axis=0)
    scal_s = sp.grid_to_spec(sc, scal)
    divdt = div_out[:kx] - sp.laplacian(sc, scal_s[:kx])
    tdt = tdt_adv + scal_s[kx:2 * kx]
    trdt = trdt_adv + scal_s[2 * kx:-1].reshape(trdt_adv.shape)
    psdt = scal_s[-1].at[0, 0].set(0.0)
    return vordt, divdt, tdt, trdt, psdt


def spectral_tendencies(cfg: ModelConfig, dyn: DynConsts, ic: ImplicitConsts,
                        state: PrognosticState, j: int,
                        divdt, tdt, psdt) -> Tuple[jnp.ndarray, ...]:
    """Linear spectral-space tendencies (tendencies.f90:242-293) evaluated at
    time level ``j`` (level 0 when the implicit correction follows,
    tendencies.f90:32)."""
    sc = dyn.sc
    geom = dyn.geom
    dhs = geom.dhs[:, None, None, None]
    dhsr = geom.dhsr[:, None, None, None]
    div_s = state.div[j]

    dmeanc = jnp.sum(div_s * dhs, axis=0)
    psdt = psdt - dmeanc
    psdt = psdt.at[0, 0].set(0.0)

    # sigma-dot on half levels: note the loop bound k=1..kx-1 keeps the
    # bottom half level exactly zero, unlike the grid-space version
    # (tendencies.f90:270-272).
    zero = jnp.zeros_like(div_s[:1])
    sigdtc = jnp.concatenate(
        [zero, -jnp.cumsum(dhs[:-1] * (div_s[:-1] - dmeanc), axis=0), zero],
        axis=0)
    dtref = (ic.tref[1:] - ic.tref[:-1])[:, None, None, None]
    dumk = jnp.concatenate([zero, sigdtc[1:-1] * dtref, zero], axis=0)

    tdt = (tdt - (dumk[1:] + dumk[:-1]) * dhsr
           + ic.tref3[:, None, None, None] * (sigdtc[1:] + sigdtc[:-1])
           - ic.tref2[:, None, None, None] * dmeanc)

    phi = get_geopotential(dyn.gc, state.t[j], dyn.phis)
    divdt = divdt - sp.laplacian(
        sc, phi + RGAS * ic.tref[:, None, None, None] * state.ps[j][None])
    return divdt, tdt, psdt


def get_tendencies(cfg: ModelConfig, dyn: DynConsts, ic: ImplicitConsts,
                   state: PrognosticState, j2: int,
                   physics_fn: Optional[PhysicsFn] = None,
                   sppt_spec: Optional[jnp.ndarray] = None) -> Tuple:
    """Full tendency computation (tendencies.f90:11-37): grid-point dynamics
    (+ physics at level 0) -> spectral conversion -> spectral tendencies ->
    semi-implicit correction (alph >= 0.5).

    Returns (vordt, divdt, tdt, psdt, trdt, physics_aux).
    """
    phi0 = get_geopotential(dyn.gc, state.t[0], dyn.phis) \
        if physics_fn is not None else None
    gs, pg, psdt_g, utend, vtend, ttend, trtend, tgg = \
        grid_dynamics_tendencies(cfg, dyn, ic, state, j2, phi0, sppt_spec)

    aux = None
    if physics_fn is not None:
        du, dv, dt_, dq, aux = physics_fn(pg)
        utend = utend + du
        vtend = vtend + dv
        ttend = ttend + dt_
        trtend = trtend.at[0].add(dq)

    vordt, divdt, tdt, trdt, psdt = grid_to_spectral_tendencies(
        cfg, dyn, gs, tgg, psdt_g, utend, vtend, ttend, trtend)

    if cfg.alph < 0.5:
        divdt, tdt, psdt = spectral_tendencies(
            cfg, dyn, ic, state, j2, divdt, tdt, psdt)
    else:
        divdt, tdt, psdt = spectral_tendencies(
            cfg, dyn, ic, state, 0, divdt, tdt, psdt)
        divdt, tdt, psdt = implicit_terms(ic, divdt, tdt, psdt)
    return vordt, divdt, tdt, psdt, trdt, aux
