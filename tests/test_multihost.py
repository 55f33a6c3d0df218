"""Multi-host bring-up (VERDICT round-1 #9): two coordinated processes, each
with 4 virtual CPU devices, run launch(--multihost) -> jax.distributed ->
one global 8-device mesh -> a real tensor-parallel train step. This is the
coverage for engine/launch.py's multihost path (reference equivalent:
vidgen/engine/launch.py:25-96 world bring-up)."""

import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow  # spawns 2 fresh interpreters, each recompiles the step
def test_two_process_distributed_train_step(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # the worker sets its own device count
    # shared checkpoint dir: exercises the every-rank-collective Orbax save
    # + sharded restore inside the 2-process world (VERDICT r4 #3c)
    env["LVT_MH_CKPT_DIR"] = str(tmp_path)

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"multihost proc {pid}/2" in out, out[-2000:]
        assert "OK" in out
        assert "ckpt save/restore OK" in out, out[-2000:]

    # both processes computed the same global loss
    l0 = outs[0].split("loss=")[1].split(" ")[0]
    l1 = outs[1].split("loss=")[1].split(" ")[0]
    assert l0 == l1, (l0, l1)
