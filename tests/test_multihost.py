"""Two-process multi-host test (VERDICT round-1 item #8).

Spawns two real OS processes, each a "host" with 2 virtual CPU devices,
rendezvousing through `initialize_multihost` (jax.distributed over a
localhost coordinator).  Exercises: the bootstrap itself, per-host audio
ingest, global DP batch assembly via make_array_from_process_local_data,
a jitted encoder forward over the global mesh, a cross-host reduction, and
numerical agreement with the single-process reference.  This is the CPU
stand-in for BASELINE config #5 (multi-host data-parallel transcription).
"""

import os
import pathlib
import socket
import subprocess
import sys

WORKER = pathlib.Path(__file__).parent / "multihost_worker.py"
REPO_ROOT = WORKER.parent.parent


def _env():
    env = dict(os.environ)
    env["PYTHONPATH"] = (
        str(REPO_ROOT) + os.pathsep + env.get("PYTHONPATH", "")
    ).rstrip(os.pathsep)
    return env


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_dp_encoder():
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    n = 2
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), coordinator, str(n), str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            cwd=str(REPO_ROOT),
            env=_env(),
        )
        for pid in range(n)
    ]
    outs = []
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"OK {pid}" in out, f"process {pid} missing OK:\n{out}"
