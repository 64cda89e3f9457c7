"""The ACTUAL trainer CLI as 2 `jax.distributed` processes (round-3 verdict
next-step 1b): run/train.py end-to-end — per-rank log dirs, every-rank eval +
watermark tracking, lead-only checkpoint writes — for real iterations with a
checkpoint and an exact resume, asserting both ranks make identical
replicated decisions. Reference analog: the whole process-orchestration
layer main.py:102-119."""

import json
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


def _launch(tmp, run_name, total_iters, resume=None, env_args=None):
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)   # no inherited 8-virtual-device flag
    env["JAX_PLATFORMS"] = "cpu"
    procs = []
    env_args = env_args or [
        "--env", "Track2D-EmptyPartialRam-v0",
        "--env-base", "Track2D-EmptyPartialRam-v0",
        "--network", "maze-lstm", "--aux", "none", "--train-mode", "0"]
    for rank in range(2):
        cmd = [sys.executable, "-m", "active_tracking_rl_tpu.run.train",
               *env_args,
               "--num-envs", "8", "--reset-pool", "4", "--num-steps", "4",
               "--test-eps", "8", "--total-iters", str(total_iters),
               "--checkpoint-every", "10", "--log-dir", str(tmp),
               "--run-name", run_name, "--seed", "1",
               "--coordinator", f"127.0.0.1:{port}",
               "--num-processes", "2", "--process-id", str(rank),
               "--local-devices", "2"]
        if resume:
            cmd += ["--resume", resume]
        procs.append(subprocess.Popen(cmd, cwd=REPO, env=env,
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=1500)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("2-process trainer CLI timed out")
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-4000:]
    return outs


def _logger_lines(run_dir, pattern):
    with open(os.path.join(run_dir, "logger")) as f:
        # strip the timestamp prefix: "YYYY-mm-dd HH:MM:SS,mmm : <msg>"
        return [l.split(" : ", 1)[1].strip() for l in f
                if re.search(pattern, l)]


@pytest.mark.slow
def test_trainer_cli_two_process_end_to_end(tmp_path):
    _launch(tmp_path, "run", total_iters=30)
    base = os.path.join(tmp_path, "Track2D-EmptyPartialRam-v0")
    lead, r1 = os.path.join(base, "run"), os.path.join(base, "run-r1")

    # lead-only disk writes (test.py:111-127 checkpoint role)
    lead_files = set(os.listdir(lead))
    assert {"all-best.msgpack", "tracker-best.msgpack",
            "train_state.msgpack", "ckpt_meta.json"} <= lead_files
    r1_files = set(os.listdir(r1))
    assert not any(f.endswith(".msgpack") or f == "ckpt_meta.json"
                   for f in r1_files), r1_files

    # every rank ran the eval program and reached the SAME replicated
    # metrics AND the same best-watermark decisions ([best] markers)
    ev_lead = _logger_lines(lead, r"eval iter")
    ev_r1 = _logger_lines(r1, r"eval iter")
    assert len(ev_lead) == 3 and ev_lead == ev_r1, (ev_lead, ev_r1)

    # training metrics identical on both ranks (replicated scalars)
    for fname in ("metrics.jsonl",):
        with open(os.path.join(lead, fname)) as f:
            a = [json.loads(l) for l in f]
        with open(os.path.join(r1, fname)) as f:
            b = [json.loads(l) for l in f]
        ka = [(r["step"], round(r.get("train/policy_loss_0", 0), 5))
              for r in a if "train/policy_loss_0" in r]
        kb = [(r["step"], round(r.get("train/policy_loss_0", 0), 5))
              for r in b if "train/policy_loss_0" in r]
        assert ka and ka == kb

    # exact resume: both ranks restore step/carry/watermark and agree again
    _launch(tmp_path, "run2", total_iters=40, resume=lead)
    lead2 = os.path.join(base, "run2")
    r12 = os.path.join(base, "run2-r1")
    res_lead = _logger_lines(lead2, r"resumed from")
    res_r1 = _logger_lines(r12, r"resumed from")
    assert res_lead and "at iter 30 (with env carry)" in res_lead[0]
    assert res_r1 == res_lead
    ev2_lead = _logger_lines(lead2, r"eval iter")
    ev2_r1 = _logger_lines(r12, r"eval iter")
    assert len(ev2_lead) == 1 and ev2_lead == ev2_r1
    assert "eval iter 40" in ev2_lead[0]


@pytest.mark.slow
def test_trainer_cli_two_process_full_advat_config(tmp_path):
    """BASELINE config 5 shape: the FULL AD-VAT recipe (PZR env,
    tat-maze-lstm, joint mode with curriculum warmup, reward aux) sharded
    over 2 jax.distributed processes — both ranks must agree on the
    replicated eval."""
    _launch(tmp_path, "pzr", total_iters=20, env_args=[
        "--env", "Track2D-BlockPartialPZR-v0",
        "--env-base", "Track2D-BlockPartialNav-v0",
        "--network", "tat-maze-lstm", "--train-mode", "-1",
        "--init-step", "10"])
    base = os.path.join(tmp_path, "Track2D-BlockPartialPZR-v0")
    ev_lead = _logger_lines(os.path.join(base, "pzr"), r"eval iter")
    ev_r1 = _logger_lines(os.path.join(base, "pzr-r1"), r"eval iter")
    assert ev_lead and ev_lead == ev_r1
    lead_files = set(os.listdir(os.path.join(base, "pzr")))
    assert {"tracker-best.msgpack", "target-best.msgpack"} <= lead_files
    assert not any(f.endswith(".msgpack")
                   for f in os.listdir(os.path.join(base, "pzr-r1")))
