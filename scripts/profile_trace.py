"""Capture a jax.profiler device trace of the ensemble day-span and print
the top ops by total device time (xplane parse via tensorboard's profile
plugin protos). Answers where the latency-bound per-step time actually
goes on the real chip.

Usage: python scripts/profile_trace.py [--members 64] [--days 1]
"""
import argparse
import glob
import gzip
import os
import sys
import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/speedy_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from speedy_tpu.config import t30
from speedy_tpu.models.model import Model
from speedy_tpu.parallel.ensemble import Ensemble
from speedy_tpu.utils import calendar as cal
from scripts.profile_ensemble import build_ds_days


def parse_xplanes(logdir):
    """Aggregate device-op durations from the captured .xplane.pb files."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    files = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    assert files, f"no xplane files under {logdir}"
    per_op = defaultdict(float)
    total = 0.0
    for path in files:
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "Device" not in plane.name:
                continue
            ev_names = {k: v.name for k, v in plane.event_metadata.items()}
            for line in plane.lines:
                if "XLA Ops" not in line.name and "Ops" != line.name:
                    continue
                for ev in line.events:
                    name = ev_names.get(ev.metadata_id, "?")
                    dur = ev.duration_ps / 1e12
                    per_op[name] += dur
                    total += dur
    return per_op, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--members", type=int, default=64)
    ap.add_argument("--days", type=int, default=1)
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    cfg = t30(precision="fp32", sppt_on=True)
    model = Model(cfg)
    start = cal.Datetime(1982, 1, 1)
    ens = Ensemble(model, args.members, base_seed=7)
    estate = ens.initialize(start)
    ds_days = build_ds_days(cfg, model, start, args.days)
    run_span = model.raw_fns["run_span"]
    vspan = jax.jit(jax.vmap(run_span, in_axes=(None, 0, None)))

    warm, _ = vspan(model.mc, estate, ds_days)
    assert bool(jnp.all(jnp.isfinite(warm.prog.vor)))

    logdir = "/tmp/speedy_trace"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        out, _ = vspan(model.mc, warm, ds_days)
        ok = bool(jnp.all(jnp.isfinite(out.prog.vor)))
    assert ok

    per_op, total = parse_xplanes(logdir)
    msteps = args.members * args.days * cfg.nsteps
    print(f"total device op time: {total:.3f}s "
          f"({total / msteps * 1e3:.4f} ms/member-step)")
    ranked = sorted(per_op.items(), key=lambda kv: -kv[1])
    for name, dur in ranked[:args.top]:
        print(f"{dur/total*100:5.1f}%  {dur*1e3:8.2f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
