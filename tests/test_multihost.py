"""Multi-process (simulated multi-host) DDP test — SURVEY §2.6 DDP row.

Spawns two fresh Python processes that form a 2-process x 4-device
jax.distributed cluster over loopback (Gloo collectives on the CPU
backend) and run the data-parallel gradient pattern with per-host batch
loading through parallel/multihost.py. This exercises the actual
cross-process init + global-mesh + collective path, not just a
single-process virtual mesh.
"""
import os
import socket
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_ddp_grad():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            # the two workers compile the full Engine + DP×SP attention +
            # ragged eval from scratch (~8 min alone); leave headroom for a
            # loaded host so the suite doesn't flake under contention
            out, _ = p.communicate(timeout=1500)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    losses, ragged = [], []
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid}: ok" in out, out
        losses.append(out.split("engine losses=")[1].split()[0])
        ragged.append(out.split("ragged rmse=")[1].split()[0])
    # replicated state + global batch ⇒ both hosts observe identical losses
    assert losses[0] == losses[1], losses
    # ragged (drop_last=False) eval: identical metrics on both hosts — the
    # padded+masked tail is read identically everywhere (each worker also
    # checked the values against a mesh-free reference evaluation)
    assert ragged[0] == ragged[1], ragged
