"""Fused column physics: the whole grid-point physics chain as ONE Pallas
VPU kernel over latitude tiles.

Why: the r04 timeline profile (scripts/profile_timeline.py; BASELINE.md)
shows the step is kernel-efficiency bound — ~1,000 kernels/step with the
device 100% busy, ~700 of them tiny VPU-only column-physics kernels, at
57 GB/s achieved against an 819 GB/s chip. The physics chain
(physics.f90:43-205) is column-local — every operation is elementwise
over (lat, lon) with short unrolled level sweeps — so the entire chain
maps onto one Pallas kernel whose grid tiles latitude: each tile's
inputs are read from HBM exactly once, the whole chain runs in
VMEM/registers, and the outputs are written exactly once.

The kernel body is NOT a reimplementation: it calls
``grid_physics_core`` (physics/__init__.py) — the same source of truth
the plain-XLA path uses — on the loaded blocks. The core is
shape-agnostic over the latitude extent, so parity between the two
paths is structural (same jnp ops traced on [kx, L, ix] blocks instead
of [kx, il, ix] arrays); tests/test_fused_physics.py asserts equality.
The small level-table constants the core bakes in (fsg/dhs/wvi2
reshapes, 1-based level iotas, level masks) are hoisted into explicit
kernel inputs with jax.closure_convert — Pallas forbids captured
constants.

Enabled with ModelConfig.fuse_physics=True. Like every change to the
compiled numerics, it is subject to the 90-day stability gate
(scripts/stability_gate.py) before becoming a default.
"""
from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _pick_tile(il: int, nbytes_full: int, budget: int = 5 << 20) -> int:
    """Largest power-of-two latitude split keeping a tile under budget.

    ``nbytes_full`` must already include lane padding; the budget leaves
    room for Mosaic's double-buffered pipelining (x2) plus constants and
    semaphores inside the 16 MB scoped-VMEM limit (a t63 tile measured
    ~2.0x its padded single-buffer estimate before failing at 22.8 MB
    scoped when the estimate ignored padding)."""
    tile = il
    while tile > 8 and nbytes_full * tile // il > budget:
        if tile % 2:
            break
        tile //= 2
    return tile


# Hardware-validated (il, ix) -> (ti, tx) tile choices where the
# heuristic's pick fails Mosaic's 16 MB scoped-VMEM accounting (which
# includes live kernel intermediates and is not predictable from block
# byte sums: a t85 5.2 MB/block config compiles while a t170 5.16 MB one
# does not). Presets not listed use the heuristic, whose picks are
# themselves validated by the 90-day stability gate.
_KNOWN_TILES = {
    (256, 512): (8, 256),    # t170 (gate + tile sweep, r05)
    (128, 256): (16, 256),   # t85: the heuristic's (32, 256) compiles
    #                          single-model but the vmapped 64-member
    #                          ensemble kernel then exceeds scoped VMEM
    #                          by 0.6 MB — halve the lat tile
    (96, 192): (16, 192),    # t63: same precaution (heuristic was 24;
    #                          lat tiles must be multiples of 8 — the
    #                          Pallas block sublane constraint)
}


def _kernel(n_in, n_out, const_shapes, body, *refs):
    # ref order: inputs, hoisted constants, then outputs; constants ride
    # at their original shapes (in-kernel reshapes are Mosaic layout
    # casts, unsupported for the small level-table shapes)
    n_c = len(const_shapes)
    ins = [r[...] for r in refs[:n_in]]
    consts = [r[...] for r in refs[n_in:n_in + n_c]]
    outs = refs[n_in + n_c:]
    flat = body(*ins, *consts)
    for o, v in zip(outs, flat):
        o[...] = v.astype(o.dtype)


def fused_grid_physics(cfg, pp, compute_sw, daily, surf, rad, pg):
    """Drop-in replacement for the grid_physics_core call in
    get_physical_tendencies: same return structure, one Pallas kernel."""
    from speedy_tpu.models.physics import grid_physics_core
    from speedy_tpu.models.physics.surface import SurfaceFluxes

    kx, il, ix = cfg.kx, cfg.il, cfg.ix
    rt = cfg.rdtype
    cast = lambda a: jnp.asarray(a, rt)

    ins = [pg.ug, pg.vg, pg.tg, pg.qg, pg.phig,            # [kx, il, ix]
           pg.pslg, daily.albsfc, daily.alb_l, daily.alb_s,
           daily.snowc, daily.soilw_am, surf.stl_am, surf.sst_am,
           cast(pp.forog), cast(pp.phis0), cast(pp.fmask_l),  # [il, ix]
           daily.fsol, daily.ozupp, daily.ozone, daily.zenit,
           daily.stratz,                                    # [il, 1]
           cast(np.asarray(pp.coa).reshape(il, 1)),         # [il, 1]
           jnp.reshape(cast(daily.ablco2), (1, 1))]         # [1, 1]
    if not compute_sw:
        ins += [rad.tau2, rad.stratc, rad.tt_rsw, rad.ssrd]
    ins = [jnp.asarray(x, rt) for x in ins]
    n_in = len(ins)

    def body(*arrs):
        (ug, vg, tg, qg, phig, pslg,
         albsfc, alb_l, alb_s, snowc, soilw_am, stl_am, sst_am,
         forog, phis0, fmask_l,
         fsol, ozupp, ozone, zenit, stratz, coa2, ablco2) = arrs[:23]
        if compute_sw:
            tau2 = stratc = tt_rsw = ssrd_in = None
        else:
            tau2, stratc, tt_rsw, ssrd_in = arrs[23:]
        vals = grid_physics_core(
            cfg, pp, compute_sw, ug, vg, tg, qg, phig, pslg,
            fsol, ozupp, ozone, zenit, stratz, albsfc, ablco2[0, 0],
            alb_l, alb_s, snowc, soilw_am, stl_am, sst_am,
            forog, coa2[:, 0], phis0, fmask_l,
            tau2_in=tau2, stratc_in=stratc, tt_rsw_in=tt_rsw,
            ssrd_in=ssrd_in)
        sfc = vals[10]
        flat = list(vals[:10]) + [sfc.ustr, sfc.vstr, sfc.shf, sfc.evap,
                                  sfc.slru, sfc.hfluxn, sfc.tsfc,
                                  sfc.tskin, sfc.u0, sfc.v0, sfc.t0]
        if compute_sw:
            flat += list(vals[11:])
        return flat

    out_shapes = ([(kx, il, ix)] * 4                       # utend..qtend
                  + [(il, ix)] * 6       # precnv precls cbmf slrd slr olr
                  + [(3, il, ix)] * 5    # ustr vstr shf evap slru
                  + [(2, il, ix)]        # hfluxn
                  + [(il, ix)] * 5)      # tsfc tskin u0 v0 t0
    if compute_sw:
        out_shapes += [(4, kx, il, ix), (2, il, ix), (kx, il, ix),
                       (il, ix), (il, ix), (il, ix)]
    n_out = len(out_shapes)

    def padded(shape):
        """Element count after TPU (8, 128) tile padding of the last
        two dims — what VMEM actually holds for a block."""
        s = list(shape) if len(shape) >= 2 else [1] + list(shape)
        s[-1] = -(-s[-1] // 128) * 128
        s[-2] = -(-s[-2] // 8) * 8
        return int(np.prod(s))

    nbytes = sum(padded(s) for s in
                 [tuple(x.shape) for x in ins] + out_shapes) \
        * jnp.dtype(rt).itemsize
    # 2-D (lat, lon) tiling: physics is column-local, so both grid axes
    # split freely. Tile sizes are empirical (Mosaic's scoped-VMEM
    # accounting includes live kernel intermediates, which defeats
    # byte-sum models); SPEEDY_TPU_FUSED_TILE="ti,tx" overrides.
    override = os.environ.get("SPEEDY_TPU_FUSED_TILE")
    if override:
        ti, tx = (int(v) for v in override.split(","))
    elif (il, ix) in _KNOWN_TILES:
        ti, tx = _KNOWN_TILES[(il, ix)]
    else:
        ti = _pick_tile(il, nbytes)
        tx = ix
        # lanes stay >=128 and aligned; shrink lon only when lat tiling
        # alone cannot get under budget (big presets)
        while (ti == 8 and tx % 256 == 0 and tx > 128
               and nbytes * ti * tx // (il * ix) > (2 << 20)):
            tx //= 2
    assert il % ti == 0 and ix % tx == 0, (ti, tx, il, ix)
    # Pallas block constraint: sublane dim multiple of 8, lane dim
    # multiple of 128 (or the full extent) — caught at trace time so a
    # bad pin/override fails fast, not as an opaque Mosaic error
    assert ti % 8 == 0 or ti == il, f"lat tile {ti} not a multiple of 8"
    assert tx % 128 == 0 or tx == ix, f"lon tile {tx} not 128-aligned"

    def axes(shape):
        """(lat_axis, lon_axis) of a shape; lon only if last dim == ix."""
        lat = [d for d, s in enumerate(shape) if s == il]
        lon = len(shape) - 1 if shape and shape[-1] == ix else None
        return (lat[-1] if lat else None), lon

    def blk_shape(shape):
        la, lo = axes(shape)
        return tuple(ti if d == la else (tx if d == lo else s)
                     for d, s in enumerate(shape))

    # hoist the core's baked-in level-table constants into explicit
    # inputs (traced at TILE shapes so any extent-dependent constant is
    # consistent with the blocks the kernel sees)
    ex = [jax.ShapeDtypeStruct(blk_shape(tuple(x.shape)), x.dtype)
          for x in ins]
    closed = jax.make_jaxpr(body)(*ex)
    consts = closed.consts
    assert all(np.prod(np.shape(c)) <= 4096 for c in consts), \
        [np.shape(c) for c in consts]  # only small level tables expected

    def converted(*args):
        return jax.core.eval_jaxpr(closed.jaxpr, args[n_in:], *args[:n_in])

    const_shapes = [tuple(np.shape(c)) for c in consts]
    consts2d = [jnp.asarray(c) for c in consts]

    def spec_for(shape, full=False):
        la, lo = axes(shape)
        if full or (la is None and lo is None):
            nd = len(shape)
            return pl.BlockSpec(shape, lambda i, j, nd=nd: (0,) * nd)

        def imap(i, j, la=la, lo=lo, nd=len(shape)):
            return tuple(i if d == la else (j if d == lo else 0)
                         for d in range(nd))
        return pl.BlockSpec(blk_shape(shape), imap)

    out_sds = [jax.ShapeDtypeStruct(s, rt) for s in out_shapes]
    interpret = jax.default_backend() == "cpu"
    fn = pl.pallas_call(
        functools.partial(_kernel, n_in, n_out, const_shapes, converted),
        grid=(il // ti, ix // tx),
        in_specs=[spec_for(tuple(x.shape)) for x in ins]
        + [spec_for(tuple(c.shape), full=True) for c in consts2d],
        out_specs=[spec_for(s) for s in out_shapes],
        out_shape=out_sds,
        interpret=interpret,
    )
    outs = fn(*ins, *consts2d)

    sfc = SurfaceFluxes(ustr=outs[10], vstr=outs[11], shf=outs[12],
                        evap=outs[13], slru=outs[14], hfluxn=outs[15],
                        tsfc=outs[16], tskin=outs[17], u0=outs[18],
                        v0=outs[19], t0=outs[20])
    base = tuple(outs[:10]) + (sfc,)
    if compute_sw:
        return base + tuple(outs[21:])
    return base
