"""2-process `jax.distributed` CPU test (SURVEY.md §4 item 5, round-2
verdict item 3): two ranks x 4 virtual devices run the FULL train step as
one 8-device SPMD program; identical param digests prove the cross-process
gradient all-reduce."""

import os
import re
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_spmd_train_step():
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # fresh processes must not inherit the conftest's 8-virtual-device flag
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = []
    for rank in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "active_tracking_rl_tpu.parallel.mp_check",
             "--coordinator", f"127.0.0.1:{port}",
             "--num-processes", "2", "--process-id", str(rank),
             "--local-devices", "4", "--steps", "3"],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=1500)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost check timed out")
        outs.append(out)
        assert p.returncode == 0, out[-3000:]
    digests = []
    for out in outs:
        m = re.search(r"MPCHECK rank=(\d) loss=([-\d.]+) digest=([-\d.]+) "
                      r"devices=(\d+)", out)
        assert m, out[-3000:]
        assert m.group(4) == "8"
        digests.append((m.group(2), m.group(3)))
    # both ranks saw the same replicated params and loss -> the update was
    # one SPMD program with a cross-process psum, not two local runs
    assert digests[0] == digests[1], digests
