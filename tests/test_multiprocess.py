"""Launch a REAL 2-process jax.distributed run (CPU backend) and check
one sharded train step spans both processes — the proof that
parallel/multihost.py's initialize/pod_mesh are live code (the
reference's mpirun-on-one-host test pattern, SURVEY.md §4.7)."""

import os
import re
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_train_step(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = os.path.join(repo, "tools", "multiprocess_smoke.py")
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    # offline partitioner step: write the per-PE shard files the two
    # processes will each load their own subset of (parallel/shard_io)
    prefix = str(tmp_path / "mp")
    w = subprocess.run(
        [sys.executable, script, "--write-shards", prefix, "4"],
        capture_output=True, text=True, env=env, cwd=repo, timeout=240)
    assert w.returncode == 0, w.stdout + w.stderr
    procs = [
        subprocess.Popen(
            [sys.executable, script, str(pid), "2", str(port), prefix],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=repo)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"pid {pid} failed:\n{out}"
    losses, accs = [], []
    for out in outs:
        m = re.search(r"MPSMOKE pid=\d+ procs=2 devices=4 loss=([0-9.]+) "
                      r"fileloss=([0-9.]+) acc=([0-9.]+) tploss=([0-9.]+)",
                      out)
        assert m, out
        losses.append(float(m.group(1)))
        accs.append(float(m.group(3)))
        # the shard-file-loaded trainer reproduced the in-memory loss
        assert abs(float(m.group(2)) - float(m.group(1))) < 1e-6, out
    # loss and in-mesh accuracy are psum-replicated: both processes
    # must report the same values
    assert abs(losses[0] - losses[1]) < 1e-6, losses
    assert abs(accs[0] - accs[1]) < 1e-9, accs
