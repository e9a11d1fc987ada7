"""Spectral-transform roofline benchmark (SURVEY section 6 targets).

Measures the sustained FLOP rate of the MXU kernels that dominate the
model's per-step cost (SURVEY section 3.2: ~105 transforms/step in the
reference, fused here into a handful of batched einsums):

* Legendre synthesis/analysis: [B, mx, nx, 2] x [mx, nx, il] einsums
* Zonal DFT matmuls:           [B, il, mx, 2] x [mx, 2, ix] einsums

Methodology
-----------
The tunneled TPU runtime has a ~25-30 ms fixed dispatch+sync latency and
may elide repeated identical executions, so naive timing loops measure
dispatch, not compute. Instead, K spec->grid->spec roundtrips are chained
*inside one jitted fori_loop* (data-dependent, cannot be elided) and the
per-roundtrip cost is the marginal slope between a short and a long chain —
pure device throughput, no dispatch artifacts.

Roofline accounting
-------------------
* ``frac_peak``       — achieved useful FLOPs / chip peak matmul FLOPs
  (JAX's default fp32 einsum on TPU runs single-pass bf16 multiplies, so
  the bf16 peak applies: ~197 TF/s on v5e).
* ``frac_attainable`` — achieved / the *shape-attainable* rate: the MXU
  processes 128-wide tiles, so a contraction of length K and output width N
  can reach at most (K/ceil128(K))*(N/ceil128(N)) of peak no matter how it
  is scheduled (scaling-book roofline methodology). This is the honest
  utilization number for the small, odd-sized operands of a spectral model.
  FLOP-halving variants (hemispheric parity split, longitude-symmetry DFT
  split) were measured slower in wall time — tile padding eats the
  theoretical 2x (docs/ARCHITECTURE.md).
* ``frac_bandwidth``  — minimum HBM traffic (in+out, tables resident) /
  HBM bandwidth. At T30 sizes the transforms are bandwidth/latency-bound,
  not FLOP-bound; this line is the relevant roofline there. A value > 1
  means XLA kept the chained loop's intermediates VMEM-resident (no HBM
  roundtrip at all) — the fusion working as designed.

Usage: python scripts/bench_transforms.py [--batch B] [--preset t30|t85]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/speedy_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from speedy_tpu.config import from_preset, PRESETS
from speedy_tpu.geometry import build_geometry_np
from speedy_tpu.ops import spectral as sp

PEAK_GFLOPS = float(os.environ.get("SPEEDY_TPU_PEAK_GFLOPS", 197_000.0))
HBM_GBPS = float(os.environ.get("SPEEDY_TPU_HBM_GBPS", 819.0))


def pad128(k: int) -> int:
    return ((k + 127) // 128) * 128


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="t30", choices=sorted(PRESETS))
    ap.add_argument("--batch", type=int, default=0,
                    help="0 = use the model's own per-step batch (3kx+ntr*kx)")
    ap.add_argument("--k-short", type=int, default=32)
    ap.add_argument("--k-long", type=int, default=512)
    ap.add_argument("--trials", type=int, default=5)
    args = ap.parse_args()

    cfg = from_preset(args.preset, precision="fp32")
    B = args.batch or (3 * cfg.kx + cfg.ntr * cfg.kx + 2)  # step's main batch
    geom = build_geometry_np(cfg)
    sc = sp.build_spectral(cfg, geom)

    rng = np.random.default_rng(0)
    spec = jnp.asarray(rng.normal(size=(B, cfg.mx, cfg.nx, 2)), jnp.float32)

    # FLOP counts (multiply+add = 2 flops per MAC); one roundtrip = s2g + g2s
    leg_flops = 2.0 * B * cfg.mx * cfg.nx * 2 * cfg.il
    dft_flops = 2.0 * B * cfg.il * cfg.mx * 2 * cfg.ix
    pair_flops = 2.0 * (leg_flops + dft_flops)

    # shape-attainable bound from 128-lane tile padding of contraction (K)
    # and output (N) extents of each einsum stage
    def util(k, n):
        return (k / pad128(k)) * (n / pad128(n))
    leg_util = util(cfg.nx, cfg.il)          # per-m GEMM: K=nx, N=il
    dft_util = util(2 * cfg.mx, cfg.ix)      # K=2mx, N=ix
    pair_util = (leg_flops * leg_util + dft_flops * dft_util) / (
        leg_flops + dft_flops)

    # minimum HBM traffic per roundtrip: spec in + grid out + grid in +
    # spec out (tables VMEM-resident)
    bpe = 4
    spec_b = B * cfg.mx * cfg.nx * 2 * bpe
    grid_b = B * cfg.il * cfg.ix * bpe
    pair_bytes = 2 * (spec_b + grid_b)

    def make(k):
        @jax.jit
        def f(sc, s):
            def body(i, s):
                g = sp.spec_to_grid(sc, s)
                # i-dependent scale prevents any cross-iteration elision
                return sp.grid_to_spec(sc, g) * (1.0 + 1e-12 * i)
            return jax.lax.fori_loop(0, k, body, s)
        return f

    f_short, f_long = make(args.k_short), make(args.k_long)
    _ = float(jnp.sum(f_short(sc, spec)))   # compile + warm (forced readback)
    _ = float(jnp.sum(f_long(sc, spec)))

    dts = []
    for _ in range(args.trials):
        t0 = time.time()
        _ = float(jnp.sum(f_short(sc, spec)))
        t_short = time.time() - t0
        t0 = time.time()
        _ = float(jnp.sum(f_long(sc, spec)))
        t_long = time.time() - t0
        dts.append((t_long - t_short) / (args.k_long - args.k_short))
    dt = float(np.median(dts))

    gflops = pair_flops / dt / 1e9
    print(json.dumps({
        "metric": f"transform_roundtrip_{args.preset}",
        "value": round(gflops, 1), "unit": "GFLOP/s",
        "batch": B, "us_per_roundtrip": round(dt * 1e6, 1),
        "us_per_direction": round(dt * 1e6 / 2, 1),
        "frac_peak": round(gflops / PEAK_GFLOPS, 4),
        "frac_attainable": round(gflops / (PEAK_GFLOPS * pair_util), 4),
        "frac_bandwidth": round(pair_bytes / dt / 1e9 / HBM_GBPS, 4)}))


if __name__ == "__main__":
    main()
