"""2-process jax.distributed smoke test (VERDICT r1 #5).

Launches tests/multihost_worker.py twice with a real TCP coordinator:
each process owns 2 virtual CPU devices and only its own scanline block;
one sharded pass must match the single-device pass bit-exactly.
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_parity(tmp_path):
    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "multihost_worker.py")
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = os.path.dirname(here)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port),
             str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, \
            f"worker {pid} failed:\n{out[-4000:]}"
        assert os.path.exists(tmp_path / f"ok_{pid}"), out[-2000:]
