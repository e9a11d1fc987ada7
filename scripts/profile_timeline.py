"""Timeline-accurate device-trace analysis (fixes profile_trace.py's
double counting of nested ops: a while op's duration contains its body's
ops, so naive per-op sums exceed wall time and overstate the envelope).

Computes, from the same xplane capture:
  * device busy time = union of op intervals  (vs span = last end - first
    start): the gap fraction is the latency/scheduling floor
  * top ops by EXCLUSIVE time (own duration minus contained children) —
    the honest ranking of where device time goes
  * kernel count per member-step — the chain-length number that sets the
    latency floor for this latency-bound model

Usage: python scripts/profile_timeline.py [--members 64] [--days 1]
"""
import argparse
import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def analyze(logdir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    files = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    assert files, f"no xplane files under {logdir}"
    events = []  # (start_ps, end_ps, name)
    for path in files:
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "Device" not in plane.name:
                continue
            ev_names = {k: v.name for k, v in plane.event_metadata.items()}
            for line in plane.lines:
                if "XLA Ops" not in line.name and line.name != "Ops":
                    continue
                base = line.timestamp_ns * 1000
                for ev in line.events:
                    s = base + ev.offset_ps
                    events.append((s, s + ev.duration_ps,
                                   ev_names.get(ev.metadata_id, "?")))
    events.sort()
    # union busy time + exclusive durations via a containment stack.
    # Approximation: an event starting before the previous one ends is
    # treated as a child (true for while/fusion nesting; async copy-starts
    # that merely OVERLAP later ops get their overlap attributed to them,
    # so exclusive times are a ranking heuristic, clamped at >= 0).
    busy = 0
    cur_s, cur_e = None, None
    excl = defaultdict(float)
    count = defaultdict(int)
    stack = []  # [end, name, dur, child_accum]

    def pop_one():
        fin = stack.pop()
        excl[fin[1]] += max(0.0, fin[2] - fin[3])
        if stack:
            stack[-1][3] += fin[2]

    for s, e, name in events:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                busy += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
        while stack and stack[-1][0] <= s:
            pop_one()
        stack.append([e, name, e - s, 0.0])
        count[name] += 1
    if cur_e is not None:
        busy += cur_e - cur_s
    while stack:
        pop_one()
    span = events[-1][1] - events[0][0] if events else 0
    return events, busy, span, excl, count


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--members", type=int, default=64)
    ap.add_argument("--days", type=int, default=1)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--diag-every", type=int, default=3,
                    help="3 = the bench cadence; 1 = reference cadence")
    ap.add_argument("--no-fuse", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/speedy_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from speedy_tpu.config import t30
    from speedy_tpu.models.model import Model
    from speedy_tpu.parallel.ensemble import Ensemble
    from speedy_tpu.utils import calendar as cal
    from scripts.profile_ensemble import build_ds_days

    cfg = t30(precision="fp32", sppt_on=True, diag_every=args.diag_every,
              fuse_physics=(False if args.no_fuse else None))
    model = Model(cfg)
    start = cal.Datetime(1982, 1, 1)
    ens = Ensemble(model, args.members, base_seed=7)
    estate = ens.initialize(start)
    ds_days = build_ds_days(cfg, model, start, args.days)
    run_span = model.raw_fns["run_span"]
    vspan = jax.jit(jax.vmap(run_span, in_axes=(None, 0, None)))
    warm, _ = vspan(model.mc, estate, ds_days)
    assert bool(jnp.all(jnp.isfinite(warm.prog.vor)))

    logdir = "/tmp/speedy_timeline"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        out, _ = vspan(model.mc, warm, ds_days)
        assert bool(jnp.all(jnp.isfinite(out.prog.vor)))

    events, busy, span, excl, count = analyze(logdir)
    msteps = args.members * args.days * cfg.nsteps
    steps = args.days * cfg.nsteps
    total_excl = sum(excl.values())
    print(f"events: {len(events)}  (~{len(events)/steps:.0f} kernels/step)")
    print(f"span  : {span/1e12*1e3:.2f} ms   busy: {busy/1e12*1e3:.2f} ms   "
          f"gap: {(span-busy)/span*100:.1f}%")
    print(f"busy/member-step: {busy/1e12/msteps*1e6:.1f} us   "
          f"span/member-step: {span/1e12/msteps*1e6:.1f} us")
    print(f"\ntop ops by EXCLUSIVE device time "
          f"(total exclusive {total_excl/1e12*1e3:.2f} ms):")
    for name, d in sorted(excl.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"{d/total_excl*100:5.1f}%  {d/1e12*1e3:8.2f} ms  "
              f"x{count[name]:<5d} {name[:95]}")


if __name__ == "__main__":
    main()
