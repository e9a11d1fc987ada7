"""Measure the fused Pallas transform kernels against the XLA einsum chain
at model batch sizes (the batches the step actually issues: ~57/34 synthesis,
~48/25 analysis at T30 with merged physics transforms).

Run on the real TPU:  python scripts/bench_pallas_transform.py
Prints one JSON line per (direction, batch) with both timings.

Recorded finding (v5e, 2026-08): the Pallas kernels do not compile on real
TPUs — Mosaic cannot lower the intrinsic inter-stage relayout ("unsupported
shape cast"); see the analysis in speedy_tpu/ops/pallas_transforms.py for
why the two-einsum XLA chain is also the bandwidth-optimal schedule. The
XLA timings this script prints are eager-dispatch-dominated (~250-320 us);
inside the jitted day scan the same einsums cost microseconds.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, *args, reps=200):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e6  # us


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="t30", choices=["t30", "t85"])
    ap.add_argument("--batches", default="25,34,48,57,256")
    ap.add_argument("--reps", type=int, default=200)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from speedy_tpu.config import from_preset
    from speedy_tpu.geometry import build_geometry_np
    from speedy_tpu.ops import spectral as sp
    from speedy_tpu.ops import pallas_transforms as pt

    cfg = from_preset(args.preset, precision="fp32")
    sc = sp.build_spectral(cfg, build_geometry_np(cfg))
    ft = pt.build_fused_tables(sc)
    rng = np.random.default_rng(0)

    syn_x = jax.jit(lambda s: sp.spec_to_grid(sc, s))
    ana_x = jax.jit(lambda g: sp.grid_to_spec(sc, g))

    for b in [int(x) for x in args.batches.split(",")]:
        spec = jnp.asarray(rng.standard_normal((b, cfg.mx, cfg.nx, 2)),
                           jnp.float32)
        grid = jnp.asarray(rng.standard_normal((b, cfg.il, cfg.ix)),
                           jnp.float32)
        rec = {"batch": b, "preset": args.preset,
               "vmem_mb": round(pt.vmem_bytes(b, cfg.mx, cfg.nx, cfg.il,
                                              cfg.ix) / 1e6, 1)}
        rec["syn_xla_us"] = round(timeit(syn_x, spec, reps=args.reps), 2)
        rec["ana_xla_us"] = round(timeit(ana_x, grid, reps=args.reps), 2)
        try:
            rec["syn_pallas_us"] = round(timeit(
                lambda s: pt.fused_spec_to_grid(ft, s, cfg.il, cfg.ix),
                spec, reps=args.reps), 2)
            rec["ana_pallas_us"] = round(timeit(
                lambda g: pt.fused_grid_to_spec(ft, g, cfg.mx, cfg.nx),
                grid, reps=args.reps), 2)
        except Exception as e:  # e.g. VMEM overflow at large batch/preset
            rec["pallas_error"] = f"{type(e).__name__}: {e}"[:120]
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
