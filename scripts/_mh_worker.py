"""Worker process for the 2-process jax.distributed test
(tests/test_multihost.py). Each process owns ONE local CPU device; the two
processes form a global sp=2 mesh (the DCN-analog path: Gloo cross-process
collectives). One full coupled model step runs sharded across the
processes and per-field norms are compared against a locally-computed
single-device reference.

Usage: python scripts/_mh_worker.py <port> <process_id> <num_processes>
       <outdir>
"""
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

port, pid, nprocs, outdir = (sys.argv[1], int(sys.argv[2]),
                             int(sys.argv[3]), sys.argv[4])

from speedy_tpu.parallel.mesh import (initialize_distributed, make_mesh,
                                      ensemble_state_sharding, replicated)

assert initialize_distributed(f"localhost:{port}", nprocs, pid) == pid
assert jax.device_count() == nprocs, jax.devices()
assert jax.local_device_count() == 1

import numpy as np
import jax.numpy as jnp

from speedy_tpu.config import t30
from speedy_tpu.models.model import Model
from speedy_tpu.models import coupling
from speedy_tpu.utils import calendar as cal

cfg = t30(precision="fp64")
m = Model(cfg)
start = cal.Datetime(1982, 1, 1)
state = m.initialize(start)
imont1, tmonth, tyear = cal.season_vars(start, cfg.iseasc, 1)
ds = coupling.make_date_scalars(cfg, m.geom_np, imont1, tmonth, tyear,
                                year=start.year)
daily = coupling.daily_update(cfg, m.pp, m.lsp, m.mc.dyn.sc, m.mc.clim, ds,
                              state.surf)
one_step = m.raw_fns["one_step"]

FIELDS = ("vor", "div", "t", "ps", "tr")


def norms(prog):
    return {k: jnp.sum(jnp.abs(getattr(prog, k))) for k in FIELDS}


# single-device reference, computed independently by each process on its
# own local device
local = jax.local_devices()[0]
ref, _ = jax.jit(one_step, static_argnums=(3,), device=local)(
    m.mc, state, daily, True)
ref_norms = {k: float(v) for k, v in norms(ref.prog).items()}

# global 2-process mesh: 'sp' spans the processes; collectives cross the
# process boundary (Gloo — the in-container stand-in for DCN)
mesh = make_mesh(1, nprocs)
estate = jax.tree.map(lambda x: jnp.broadcast_to(x, (1,) + x.shape), state)
sh = ensemble_state_sharding(mesh, estate)
estate = jax.device_put(estate, sh)
mc_g = jax.device_put(m.mc, replicated(mesh, m.mc))
daily_g = jax.device_put(daily, replicated(mesh, daily))


def sharded_step_norms(mc, est, dly):
    out, _ = jax.vmap(one_step, in_axes=(None, 0, None, None))(
        mc, est, dly, True)
    one = jax.tree.map(lambda x: x[0], out.prog)
    return norms(one)


with mesh:
    got = jax.jit(sharded_step_norms, static_argnums=())(
        mc_g, estate, daily_g)
    got = {k: float(v) for k, v in got.items()}

lines = []
ok = True
for k in FIELDS:
    rel = abs(got[k] - ref_norms[k]) / max(abs(ref_norms[k]), 1e-30)
    lines.append(f"{k} ref={ref_norms[k]:.17e} sharded={got[k]:.17e} "
                 f"rel={rel:.3e}")
    ok = ok and rel < 1e-12

with open(os.path.join(outdir, f"proc{pid}.txt"), "w") as f:
    f.write(("OK" if ok else "FAIL") + "\n" + "\n".join(lines) + "\n")
print(f"pid={pid} {'OK' if ok else 'FAIL'}", flush=True)
sys.exit(0 if ok else 1)
