"""Spectral-transform roofline benchmark (SURVEY section 6 targets).

Measures the achieved FLOP rate of the two MXU kernels that dominate the
model's per-step cost (SURVEY section 3.2: ~105 transforms/step in the
reference, fused here into a handful of batched einsums):

* Legendre synthesis/analysis: [B, mx, nx, 2] x [mx, nx, il] einsums
* Zonal DFT matmuls:           [B, il, mx, 2] x [mx, 2, ix] einsums

Run on the TPU (default platform) or CPU. Prints one JSON line per case.

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

from speedy_tpu.config import from_preset
from speedy_tpu.geometry import build_geometry_np
from speedy_tpu.ops import spectral as sp

# Peak fp32 matmul throughput per chip used for the roofline fraction.
# Override with SPEEDY_TPU_PEAK_GFLOPS for a different chip.
PEAK_GFLOPS = float(os.environ.get("SPEEDY_TPU_PEAK_GFLOPS", 45_000.0))


def time_fn(f, *args, iters=100):
    out = jax.block_until_ready(f(*args))  # compile
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="t30", choices=["t30", "t85"])
    ap.add_argument("--batch", type=int, default=0,
                    help="0 = use the model's own per-step batch (3kx+ntr*kx)")
    ap.add_argument("--iters", type=int, default=100)
    args = ap.parse_args()

    cfg = from_preset(args.preset, precision="fp32")
    B = args.batch or (3 * cfg.kx + cfg.ntr * cfg.kx + 2)  # step's main batch
    geom = build_geometry_np(cfg)
    sc = sp.build_spectral(cfg, geom)

    rng = np.random.default_rng(0)
    spec = jnp.asarray(rng.normal(size=(B, cfg.mx, cfg.nx, 2)), jnp.float32)
    grid = jnp.asarray(rng.normal(size=(B, cfg.il, cfg.ix)), jnp.float32)

    # FLOP counts (multiply+add = 2 flops per MAC)
    leg_flops = 2.0 * B * cfg.mx * cfg.nx * 2 * cfg.il
    dft_flops = 2.0 * B * cfg.il * cfg.mx * 2 * cfg.ix
    full_inv = leg_flops + dft_flops

    cases = {
        "legendre_inv": (jax.jit(sp.legendre_inv), (sc, spec), leg_flops),
        "legendre_dir": (
            jax.jit(sp.legendre_dir),
            (sc, jnp.asarray(rng.normal(size=(B, cfg.il, cfg.mx, 2)),
                             jnp.float32)), leg_flops),
        "spec_to_grid": (jax.jit(sp.spec_to_grid), (sc, spec), full_inv),
        "grid_to_spec": (jax.jit(sp.grid_to_spec), (sc, grid), full_inv),
    }
    for name, (f, a, flops) in cases.items():
        dt = time_fn(f, *a, iters=args.iters)
        gflops = flops / dt / 1e9
        print(json.dumps({
            "metric": f"transform_{name}_{args.preset}",
            "value": round(gflops, 1), "unit": "GFLOP/s",
            "batch": B, "us_per_call": round(dt * 1e6, 1),
            "roofline_frac": round(gflops / PEAK_GFLOPS, 4)}))


if __name__ == "__main__":
    main()
