"""Command-line driver.

Replaces the reference's `speedy` executable + run.sh + namelist.nml. The
reference namelist file is accepted directly (--namelist), or dates/knobs
can be given as flags.
"""
from __future__ import annotations

import argparse
import os
import re
import sys
import time

from .config import from_preset, PRESETS
from .utils.calendar import Datetime


def parse_namelist(path: str) -> dict:
    """Parse the reference's namelist.nml (&params and &date groups;
    params.f90:54-68, date.f90:57-71)."""
    out = {}
    text = open(path).read()
    for m in re.finditer(r"^\s*([\w%]+)\s*=\s*(\S+)", text, re.M):
        key, val = m.group(1).lower(), m.group(2).rstrip(",")
        try:
            out[key] = int(val)
        except ValueError:
            pass
    return out


def _dt(s: str) -> Datetime:
    m = re.match(r"(\d{4})-(\d{2})-(\d{2})(?:[T ](\d{2}):(\d{2}))?", s)
    if not m:
        raise argparse.ArgumentTypeError(f"bad datetime {s!r}")
    g = [int(x) if x else 0 for x in m.groups()]
    return Datetime(*g)


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="speedy-tpu",
        description="TPU-native SPEEDY atmospheric model")
    sub = p.add_subparsers(dest="command", required=True)

    r = sub.add_parser("run", help="run a forecast")
    r.add_argument("--preset", default="t30", choices=sorted(PRESETS))
    r.add_argument("--start", type=_dt, default=Datetime(1982, 1, 1))
    r.add_argument("--end", type=_dt, default=Datetime(1982, 1, 2))
    r.add_argument("--namelist", help="reference-format namelist.nml")
    r.add_argument("--output-dir", default="rundir")
    r.add_argument("--nsteps-out", type=int, default=1)
    r.add_argument("--nstdia", type=int, default=180)
    r.add_argument("--precision", default="fp32", choices=["fp32", "fp64"])
    r.add_argument("--matmul-precision", default=None,
                   choices=["bfloat16", "tensorfloat32", "float32", "highest"],
                   help="XLA matmul precision for fp32 runs (default: "
                        "backend default, bf16 multiplies on TPU)")
    r.add_argument("--sppt", action="store_true", help="enable SPPT")
    r.add_argument("--sppt-seed", type=int, default=0)
    r.add_argument("--no-output", action="store_true")
    r.add_argument("--bc-path", help="boundary-condition directory")
    r.add_argument("--profile", help="dump a jax profiler trace to this dir")
    r.add_argument("--debug-nans", action="store_true",
                   help="enable jax_debug_nans: raise at the first NaN-"
                        "producing op instead of tripping the stability "
                        "guard later (slower; debugging aid)")
    r.add_argument("--checkpoint-every", type=int, default=0, metavar="DAYS",
                   help="write a restart checkpoint every DAYS days")
    r.add_argument("--checkpoint-dir", default="checkpoints")
    r.add_argument("--restart-from", metavar="CKPT.npz",
                   help="resume a run from a checkpoint file")
    r.add_argument("--auto-resume", action="store_true",
                   help="elastic recovery: resume from the newest checkpoint "
                        "in --checkpoint-dir if one exists (use with "
                        "--checkpoint-every so a crashed/preempted run "
                        "re-launched with the same command line continues)")

    e = sub.add_parser("ensemble", help="run an SPPT ensemble forecast")
    e.add_argument("--preset", default="t30", choices=sorted(PRESETS))
    e.add_argument("--members", type=int, default=8)
    e.add_argument("--days", type=int, default=2)
    e.add_argument("--start", type=_dt, default=Datetime(1982, 1, 1))
    e.add_argument("--seed", type=int, default=0)
    e.add_argument("--precision", default="fp32", choices=["fp32", "fp64"])
    e.add_argument("--bc-path", help="boundary-condition directory")
    e.add_argument("--output-dir", default="rundir_ens",
                   help="per-member final-state NetCDF output directory")
    e.add_argument("--no-output", action="store_true")
    e.add_argument("--output-every-step", action="store_true",
                   help="write every member's grid fields every step "
                        "(memberNNN/yyyymmddhhmm.nc, the reference's one-"
                        "file-per-step schema per member)")

    args = p.parse_args(argv)

    if args.command == "ensemble":
        import jax
        if args.precision == "fp64":
            jax.config.update("jax_enable_x64", True)
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.expanduser("~/.cache/speedy_tpu_xla"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        import numpy as np
        from .models.model import Model
        from .parallel.ensemble import Ensemble
        from .parallel.mesh import make_mesh

        cfg = from_preset(args.preset, precision=args.precision, sppt_on=True)
        search = [args.bc_path] if args.bc_path else None
        model = Model(cfg, bc_search=search)
        n_dev = len(jax.devices())
        mesh = make_mesh(n_dev, 1) if n_dev > 1 and \
            args.members % n_dev == 0 else None
        ens = Ensemble(model, args.members, base_seed=args.seed, mesh=mesh)
        print(f"speedy_tpu ensemble: {args.members} members, "
              f"{args.days} days, {args.preset.upper()}"
              + (f", {n_dev}-device dp mesh" if mesh else ""))
        writers = None
        if args.output_every_step and not args.no_output:
            def make_writer(i):
                d = os.path.join(args.output_dir, f"member{i:03d}")
                try:
                    from .utils.native_output import AsyncNetCDFWriter
                    return AsyncNetCDFWriter(cfg, d)
                except Exception:
                    from .utils.output import NetCDFWriter
                    return NetCDFWriter(cfg, d)
            writers = [make_writer(i) for i in range(args.members)]
        t0 = time.time()
        estate = ens.initialize(args.start)
        estate, end_date = ens.run_days(estate, args.start, args.days,
                                        output_writers=writers)
        jax.block_until_ready(estate.prog.vor)
        if writers is not None:
            for w in writers:
                if hasattr(w, "drain"):
                    w.drain()
        print(f"done at {end_date} in {time.time() - t0:.1f}s")
        if writers is not None:
            print(f"wrote per-step member files to {args.output_dir}/"
                  f"memberNNN/")
        if not args.no_output and writers is None:
            from .utils.output import NetCDFWriter
            for i in range(args.members):
                w = NetCDFWriter(cfg, os.path.join(args.output_dir,
                                                   f"member{i:03d}"))
                fields = {k: np.asarray(v) for k, v in
                          ens.member_fields(estate, i).items()}
                w(args.days * cfg.nsteps, end_date, args.start, fields)
            print(f"wrote member states to {args.output_dir}/")
        return 0

    if args.command == "run":
        kw = dict(nsteps_out=args.nsteps_out, nstdia=args.nstdia,
                  precision=args.precision, sppt_on=args.sppt)
        start, end = args.start, args.end
        if args.namelist:
            nl = parse_namelist(args.namelist)
            kw["nsteps_out"] = nl.get("nsteps_out", kw["nsteps_out"])
            kw["nstdia"] = nl.get("nstdia", kw["nstdia"])
            start = Datetime(nl.get("start_datetime%year", start.year),
                             nl.get("start_datetime%month", start.month),
                             nl.get("start_datetime%day", start.day),
                             nl.get("start_datetime%hour", 0),
                             nl.get("start_datetime%minute", 0))
            end = Datetime(nl.get("end_datetime%year", end.year),
                           nl.get("end_datetime%month", end.month),
                           nl.get("end_datetime%day", end.day),
                           nl.get("end_datetime%hour", 0),
                           nl.get("end_datetime%minute", 0))
        import jax
        if args.precision == "fp64":
            jax.config.update("jax_enable_x64", True)
        if args.debug_nans:
            jax.config.update("jax_debug_nans", True)
        if args.matmul_precision:
            jax.config.update("jax_default_matmul_precision",
                              args.matmul_precision)
        # persistent compilation cache: repeat runs skip the TPU compile
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.expanduser("~/.cache/speedy_tpu_xla"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

        cfg = from_preset(args.preset, **kw)
        from .models.model import Model
        from .utils.output import NetCDFWriter

        search = [args.bc_path] if args.bc_path else None
        print(f"speedy_tpu: {args.preset.upper()} "
              f"{cfg.ix}x{cfg.il}x{cfg.kx}, dt={cfg.delt:.0f}s, "
              f"{args.precision}")
        print(f"start {start} -> end {end}")
        model = Model(cfg, bc_search=search, sppt_seed=args.sppt_seed)
        writer = None
        if not args.no_output:
            # prefer the native async writer (background-thread encoding +
            # disk I/O); fall back to the scipy writer
            try:
                from .utils.native_output import AsyncNetCDFWriter
                writer = AsyncNetCDFWriter(cfg, args.output_dir)
            except Exception:
                writer = NetCDFWriter(cfg, args.output_dir)
        if args.profile:
            import jax
            jax.profiler.start_trace(args.profile)
        run_kw = dict(checkpoint_every=args.checkpoint_every,
                      checkpoint_dir=args.checkpoint_dir)
        if args.auto_resume and not args.restart_from:
            import glob
            cks = sorted(glob.glob(os.path.join(args.checkpoint_dir,
                                                "ckpt_*.npz")))
            if cks:
                args.restart_from = cks[-1]  # names sort chronologically
            else:
                print(f"auto-resume: no checkpoints in "
                      f"{args.checkpoint_dir}, starting fresh")
        if args.restart_from:
            from .utils.checkpoint import load_checkpoint
            template = model.initialize(start)
            state, ck_date, model_step, extras = load_checkpoint(
                args.restart_from, template, cfg=cfg)
            if "start" in extras and extras["start"] != start:
                # season_vars / anomaly-window phase must use the run's
                # original start date, not the resume invocation's --start
                print(f"note: using original run start {extras['start']} "
                      "from checkpoint")
                start = extras["start"]
            if "sstan3" in extras:
                # restore the host-side SST-anomaly window (it lives in
                # ModelConsts, outside the checkpointed ModelState)
                import jax.numpy as jnp
                model.mc = model.mc._replace(clim=model.mc.clim._replace(
                    sstan3=jnp.asarray(extras["sstan3"], cfg.rdtype)))
            print(f"resuming from {args.restart_from} at {ck_date} "
                  f"(step {model_step})")
            run_kw.update(state=state, resume_date=ck_date,
                          model_step=model_step)
        t0 = time.time()
        model.run(start, end, output_writer=writer, **run_kw)
        if writer is not None and hasattr(writer, "drain"):
            writer.drain()
        wall = time.time() - t0
        if args.profile:
            import jax
            jax.profiler.stop_trace()
        print(f"wall time: {wall:.1f}s")
        return 0


if __name__ == "__main__":
    sys.exit(main())
