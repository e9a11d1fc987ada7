"""Pallas TPU kernels: fused spectral<->grid transforms (EXPERIMENT).

Status: documented negative result — the production transform path stays
the two-einsum XLA chain in ops/spectral.py. Keep reading for why; the
kernels here remain correct (validated in interpret mode by
tests/test_spectral.py) and scripts/bench_pallas_transform.py reproduces
the measurement.

Hypothesis tested: the XLA path lowers each transform to two einsums
(Legendre, then zonal DFT); a single Pallas kernel holding the intermediate
Fourier coefficients in VMEM could remove the intermediate HBM round-trip
and one kernel boundary. Kernel strategy:

1. The per-m Legendre contraction ``fm[b,j,m,r] = sum_n spec[b,m,n,r] *
   cpol[m,n,j]`` restructured as ONE dense matmul against a block-diagonal
   table ``T[(m,n,r), (j,m',r')] = cpol[m,n,j] delta(m,m') delta(r,r')``.
2. The zonal DFT as one dense matmul [b*il, mx*2] x [mx*2, ix].
3. Both in one pallas_call with the intermediate in VMEM scratch.

Findings (v5e, 2026-08, see scripts/bench_pallas_transform.py):

* **Mosaic cannot lower the inter-stage relayout**: between the two dots
  the batch/contraction dims swap ([b, (j,m,r)] -> [(b,j), (m,r)]), a
  lane-dimension reshape ("infer-vector-layout: unsupported shape cast",
  vector<25x2976> -> vector<1200x62>). The relayout is intrinsic to the
  fusion, not an implementation detail: any one-kernel version needs it
  (or a delta-expanded stage-2 table over latitude, which is ~27 MB and
  VMEM-infeasible).
* **The fully fused single matmul loses on bandwidth**: collapsing both
  stages into one table K[(m,n,r),(j,i)] = cpol*dft is 36.6 MB at T30
  (~45 us of HBM traffic per call at 819 GB/s), vs ~200 KB of tables for
  the two-einsum path. The two-stage factorization IS the bandwidth-
  optimal schedule; XLA already executes it back-to-back inside one
  program with no launch gap.

Conclusion: at SPEEDY sizes (T30-T85, batch ~25-60) the hand-written
kernel has no headroom over XLA's schedule — the right TPU design is the
batched-einsum path plus merging transform *call sites* (one synthesis
chain for both time levels, models/tendencies.py), which is where the real
per-step win was.

Reference semantics: source/legendre.f90:74-155, source/fourier.f90:23-82
(same tables as ops/spectral.py — this module only re-schedules the math).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .spectral import SpectralConsts


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class FusedTables(NamedTuple):
    """Dense block-diagonal transform tables for the fused kernels."""
    syn_leg: jnp.ndarray   # [mx*nx*2, il*mx*2] block-diag Legendre synthesis
    syn_dft: jnp.ndarray   # [mx*2, ix] zonal DFT synthesis
    ana_dft: jnp.ndarray   # [ix, mx*2] zonal DFT analysis
    ana_leg: jnp.ndarray   # [il*mx*2, mx*nx*2] block-diag Legendre analysis


def build_fused_tables(sc: SpectralConsts) -> FusedTables:
    """Expand the per-m Legendre tables into dense block-diagonal matrices.

    The re/im axis rides along as an extra block index so each kernel is a
    plain 2-D matmul: synthesis maps (m, n, r) -> (j, m, r), analysis the
    transpose direction with the quadrature weights already folded into
    cpol_dir (ops/spectral.build_spectral_np).
    """
    cpol_inv = np.asarray(sc.cpol_inv)   # [mx, nx, il]
    cpol_dir = np.asarray(sc.cpol_dir)   # [mx, nx, il]
    dft_syn = np.asarray(sc.dft_syn)     # [mx, 2, ix]
    dft_ana = np.asarray(sc.dft_ana)     # [mx, 2, ix]
    mx, nx, il = cpol_inv.shape
    ix = dft_syn.shape[-1]
    dt = cpol_inv.dtype

    # syn_leg[(m,n,r), (j,m',r')] = cpol_inv[m,n,j] delta(m,m') delta(r,r')
    syn = np.zeros((mx, nx, 2, il, mx, 2), dtype=dt)
    ana = np.zeros((il, mx, 2, mx, nx, 2), dtype=dt)
    for m in range(mx):
        for r in range(2):
            syn[m, :, r, :, m, r] = cpol_inv[m]            # [nx, il]
            ana[:, m, r, m, :, r] = cpol_dir[m].T          # [il, nx]
    return FusedTables(
        syn_leg=jnp.asarray(syn.reshape(mx * nx * 2, il * mx * 2)),
        syn_dft=jnp.asarray(dft_syn.reshape(mx * 2, ix)),
        ana_dft=jnp.asarray(dft_ana.reshape(mx * 2, ix).T.copy()),
        ana_leg=jnp.asarray(ana.reshape(il * mx * 2, mx * nx * 2)),
    )


def vmem_bytes(b: int, mx: int, nx: int, il: int, ix: int,
               itemsize: int = 4) -> int:
    """Rough VMEM footprint of one fused synthesis call (operands + scratch),
    for choosing whether the single-program kernel fits (~16 MB/core)."""
    spec = b * mx * nx * 2
    table = mx * nx * 2 * il * mx * 2
    dft = mx * 2 * ix
    fm = b * il * mx * 2
    grid = b * il * ix
    return (spec + table + dft + fm + grid) * itemsize


def _syn_kernel(spec_ref, leg_ref, dft_ref, out_ref, fm_ref):
    # stage 1: Legendre synthesis, one dense dot (block-diagonal table)
    fm_ref[:] = jnp.dot(spec_ref[:], leg_ref[:],
                        preferred_element_type=jnp.float32)
    # stage 2: zonal DFT — reshape [B, il*mx*2] -> [B*il, mx*2] and contract
    b = spec_ref.shape[0]
    il_mx2 = fm_ref.shape[1]
    mx2 = dft_ref.shape[0]
    fm = fm_ref[:].reshape(b * (il_mx2 // mx2), mx2)
    grid = jnp.dot(fm, dft_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = grid.reshape(out_ref.shape)


def _ana_kernel(grid_ref, dft_ref, leg_ref, out_ref, fm_ref):
    # stage 1: zonal analysis DFT: [B*il, ix] x [ix, mx*2]
    b, il, ix = grid_ref.shape
    g = grid_ref[:].reshape(b * il, ix)
    fm = jnp.dot(g, dft_ref[:], preferred_element_type=jnp.float32)
    fm_ref[:] = fm.reshape(b, il * dft_ref.shape[1])
    # stage 2: Legendre analysis (weights folded into the table)
    out_ref[:] = jnp.dot(fm_ref[:], leg_ref[:],
                         preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("il", "ix"))
def fused_spec_to_grid(ft: FusedTables, spec: jnp.ndarray,
                       il: int, ix: int) -> jnp.ndarray:
    """[B, mx, nx, 2] -> [B, il, ix] in one Pallas kernel."""
    b, mx, nx, _ = spec.shape
    spec2 = spec.reshape(b, mx * nx * 2)
    out = pl.pallas_call(
        _syn_kernel,
        out_shape=jax.ShapeDtypeStruct((b, il, ix), spec.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((b, il * mx * 2), jnp.float32)],
    )(spec2, ft.syn_leg, ft.syn_dft)
    return out


@functools.partial(jax.jit, static_argnames=("mx", "nx"))
def fused_grid_to_spec(ft: FusedTables, grid: jnp.ndarray,
                       mx: int, nx: int) -> jnp.ndarray:
    """[B, il, ix] -> [B, mx, nx, 2] in one Pallas kernel."""
    b, il, ix = grid.shape
    out = pl.pallas_call(
        _ana_kernel,
        out_shape=jax.ShapeDtypeStruct((b, mx * nx * 2), grid.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((b, il * mx * 2), jnp.float32)],
    )(grid, ft.ana_dft, ft.ana_leg)
    return out.reshape(b, mx, nx, 2)
