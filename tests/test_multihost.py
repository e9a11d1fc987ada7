"""Multi-host (multi-process) distributed backend test (SURVEY section 5.8).

The reference is fully serial; this framework's multi-host story is
jax.distributed over DCN. Real DCN needs multi-host hardware, but the code
path — `initialize_distributed` -> global mesh spanning processes ->
cross-process collectives inside a sharded model step — executes
in-container with two CPU processes (Gloo collectives as the DCN
stand-in). Each worker also computes a local single-device reference and
checks per-field norms of the sharded step against it at fp64 roundoff.
"""
import os
import socket
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "scripts", "_mh_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_model_step(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(pid), "2",
             str(tmp_path)],
            env=env, cwd=ROOT, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]

    reports = []
    for pid in range(2):
        path = tmp_path / f"proc{pid}.txt"
        assert path.exists(), outs[pid][-3000:]
        text = path.read_text()
        assert text.startswith("OK"), text
        reports.append(text)
    # both processes (same SPMD program) observed identical norms
    assert reports[0] == reports[1]
