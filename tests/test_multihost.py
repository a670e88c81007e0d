"""Two-PROCESS multi-host data parallelism, for real (not a virtual mesh).

Spawns two python processes that each call parallel.initialize_multihost
(the same entry point cli/train.py wires to --coordinator_address/
--num_processes/--process_id, ft_dkt.py:119-125 analogue), build a global
('data',) mesh spanning both processes' CPU devices, contribute per-process
shards of a global batch, and run a jitted cross-process reduction (gloo
collectives). Both processes must compute the same, correct global value.
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_data_parallel(tmp_path):
    port = _free_port()
    nproc = 2
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join("tests", "_multihost_worker.py"),
             str(pid), str(nproc), str(port), "--train-step",
             f"--ckdir={tmp_path / 'ck'}"],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(nproc)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"RESULT {pid} " in out, f"process {pid} missing result:\n{out}"
    # both processes computed the same global value
    vals = [
        line.split()[-1]
        for out in outs
        for line in out.splitlines()
        if line.startswith("RESULT")
    ]
    assert len(vals) == nproc and len(set(vals)) == 1, vals
    # the DKT train step ran across both processes (per-host batch shards,
    # XLA gradient all-reduce) and produced the same global loss on each
    losses = [
        line.split()[-1]
        for out in outs
        for line in out.splitlines()
        if line.startswith("TRAIN")
    ]
    assert len(losses) == nproc and len(set(losses)) == 1, losses
    # the multi-process Orbax save completed on BOTH processes (the save is
    # a cross-process sync point — cli/train.py calls it on every host) and
    # each pulled identical process-local validation params
    saved = [
        line.split()[2:]
        for out in outs
        for line in out.splitlines()
        if line.startswith("SAVED")
    ]
    assert len(saved) == nproc, saved
    assert len({tuple(s) for s in saved}) == 1, saved
    assert (tmp_path / "ck" / "step_1").is_dir()
