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
QUAD_WORKER = os.path.join(HERE, "multihost_quad_worker.py")


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


def test_four_process_dpxsp_preempt_holdout(tmp_path):
    """4 single-chip processes (VERDICT r3 Next #5): a (2,2) 'data'×'model'
    mesh with BOTH axes crossing process boundaries (global-batch
    convention), plus a pure-DP fit with ragged masked validation, a
    holdout loader, a mid-run SIGTERM preemption checkpoint written
    collectively by all four hosts, and a fresh-manager restore + resume.
    Every per-host printed metric must be identical across the cluster."""
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, QUAD_WORKER, str(p), "4", str(port),
             str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for p in range(4)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=1800)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    markers = []
    for p, (proc, out) in enumerate(zip(procs, outs)):
        assert proc.returncode == 0, f"proc {p} failed:\n{out[-4000:]}"
        assert f"proc {p}: ok" in out, out[-2000:]
        markers.append(out.split(f"proc {p}: ok ")[1].strip())
    assert len(set(markers)) == 1, markers
