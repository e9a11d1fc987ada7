"""Multi-device scaling-efficiency harness (SURVEY section 6 target:
>=80% grid-points/s scaling efficiency to N devices).

Runs one full coupled model day, jitted over an (dp x sp) mesh:
* dp shards ensemble members (data parallel),
* sp shards the spectral n axis / grid latitude axis (spatial parallel;
  the spectral<->grid transforms turn the resharding into XLA-inserted
  collectives, SURVEY section 5.8).

With no real multi-chip hardware, run on virtual CPU devices:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/bench_scaling.py --platform cpu --mode dp
(CPU scaling reflects host-core throughput, not ICI bandwidth — it
validates the SPMD program and gives a lower bound on efficiency for the
compute-dominated dp mode.)

Prints one JSON line per device count with throughput and efficiency.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="t30",
                    choices=["t30", "t42", "t63", "t85"])
    ap.add_argument("--mode", default="dp", choices=["dp", "sp"])
    ap.add_argument("--members", type=int, default=8,
                    help="ensemble members (dp mode shards these)")
    ap.add_argument("--platform", default=None,
                    help="cpu to force the virtual-device host platform")
    ap.add_argument("--counts", default="1,2,4,8")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    if args.platform == "cpu":
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count="
                + args.counts.split(",")[-1]).strip()

    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/speedy_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np
    import jax.numpy as jnp

    from speedy_tpu.config import from_preset
    from speedy_tpu.models.model import Model
    from speedy_tpu.models import coupling
    from speedy_tpu.parallel.mesh import (make_mesh, ensemble_state_sharding,
                                          replicated)
    from speedy_tpu.utils import calendar as cal

    cfg = from_preset(args.preset, precision="fp32", sppt_on=True,
                      diag_every=3)
    model = Model(cfg)
    start = cal.Datetime(1982, 1, 1)
    state = model.initialize(start)
    imont1, tmonth, tyear = cal.season_vars(start, cfg.iseasc, start.month)
    ds = coupling.make_date_scalars(cfg, model.geom_np, imont1, tmonth,
                                    tyear, year=start.year)
    E = args.members
    estate = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (E,) + x.shape), state)

    run_day = model.raw_fns["run_day"]
    vrun = jax.vmap(run_day, in_axes=(None, 0, None, None))
    points = cfg.ix * cfg.il * cfg.kx * cfg.nsteps * E  # point-steps per day

    base = None
    base_n = None
    for n in [int(c) for c in args.counts.split(",")]:
        if n > len(jax.devices()):
            break
        if args.mode == "dp":
            n_dp, n_sp = n, 1
        else:
            n_dp, n_sp = 1, n
        if E % n_dp:
            print(json.dumps({"skipped_devices": n,
                              "reason": f"members {E} % dp {n_dp} != 0"}))
            continue
        mesh = make_mesh(n_dp, n_sp, jax.devices()[:n])
        sh = ensemble_state_sharding(mesh, estate)
        est = jax.device_put(estate, sh)
        jrun = jax.jit(vrun, static_argnums=(3,),
                       in_shardings=(replicated(mesh, model.mc), sh,
                                     replicated(mesh, ds)),
                       out_shardings=(sh, None))
        with mesh:
            out, _ = jrun(model.mc, est, ds, False)
            jax.block_until_ready(out.prog.vor)  # compile
            t0 = time.time()
            for _ in range(args.reps):
                out, _ = jrun(model.mc, est, ds, False)
            jax.block_until_ready(out.prog.vor)
        dt = (time.time() - t0) / args.reps
        thr = points / dt
        if base is None:
            base, base_n = thr, n
        # efficiency relative to the first measured count (per-device
        # throughput ratio); only equals "vs 1 device" when counts starts at 1
        eff = (thr / n) / (base / base_n)
        print(json.dumps({
            "metric": f"scaling_{args.mode}_{args.preset}",
            "devices": n, "members": E,
            "point_steps_per_s": round(thr, 0),
            "day_seconds": round(dt, 3),
            "base_devices": base_n,
            "efficiency_vs_first": round(eff, 3)}))


if __name__ == "__main__":
    main()
