"""Multi-host (DCN) bring-up: 2-process jax.distributed over localhost.

Executes init_distributed (parallel/mesh.py) for real — SURVEY.md 5.8
"across hosts (DCN)" — by launching experiments/multihost_smoke.py as
two coordinated subprocesses, each with 2 virtual CPU devices, and
asserting one data-parallel SGNS step ran with psum-merged deltas over
the 4-device global mesh.
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_dp_step(tmp_path):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = os.path.join(root, "experiments", "multihost_smoke.py")
    coord = f"localhost:{_free_port()}"

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # runner sets its own device count
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, script, "--coord", coord,
             "--nprocs", "2", "--pid", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=root,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=280)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"pid {i} failed:\n{out[-4000:]}"
        assert "MULTIHOST_OK" in out, out[-4000:]
        assert "global_devices=4" in out, out[-2000:]
