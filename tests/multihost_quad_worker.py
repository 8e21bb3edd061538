"""Subprocess worker for the 4-process cluster test (one single-chip host).

Run as: python tests/multihost_quad_worker.py <pid> <nproc> <port> <ckpt_dir>

Four processes × 1 virtual CPU device form the global cluster. Covers
(VERDICT r3 Next #5):
  * a (2,2) 'data'×'model' mesh where BOTH axes cross process boundaries
    — binaural DP×SP train step under the GLOBAL-batch convention
    (mesh.shard_global_batch);
  * pure-DP fit() with a ragged masked validation split AND a holdout
    loader, preempted by SIGTERM mid-run: every host checkpoints the last
    completed epoch collectively (orbax over jax.distributed), then a
    fresh manager restores and training resumes to completion.
"""
import os
import signal
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]
ckpt_dir = sys.argv[4]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from audiodepth_tpu.parallel.multihost import (  # noqa: E402
    initialize_multihost, local_batch_slice, local_shard, make_global_mesh)

initialize_multihost(coordinator_address=f"127.0.0.1:{port}",
                     num_processes=nproc, process_id=pid)

import numpy as np  # noqa: E402

assert jax.process_count() == nproc and jax.local_device_count() == 1

from audiodepth_tpu.ckpt import CheckpointManager  # noqa: E402
from audiodepth_tpu.configs import load_config  # noqa: E402
from audiodepth_tpu.data.bins import add_bins_to_batch  # noqa: E402
from audiodepth_tpu.data.synthetic import SyntheticEchoDataset  # noqa: E402
from audiodepth_tpu.models import make_task  # noqa: E402
from audiodepth_tpu.parallel.mesh import model_axes_cross_processes  # noqa: E402
from audiodepth_tpu.train import Engine  # noqa: E402

# ---- part 1: (2,2) DP×SP, both axes across process boundaries -------------
import dataclasses as _dc  # noqa: E402

from audiodepth_tpu.train.tasks_extra import BinauralAttentionTask  # noqa: E402

mesh22 = make_global_mesh(("data", "model"), shape=(2, 2))
assert model_axes_cross_processes(mesh22), "expected model axis across procs"
cfg_sp = load_config(
    "batvisionv2", "train", "mh4_sp", "binaural_attention",
    overrides={
        "model.base_channels": 8, "dataset.images_size": 32,
        "mode.batch_size": 2, "mode.compute_dtype": "float32",
    },
)
task_sp = BinauralAttentionTask(cfg_sp)
task_sp.model = _dc.replace(task_sp.model, sp_axis="model")
ds_sp = SyntheticEchoDataset(cfg_sp, num_samples=2, seed=0)
gb_sp = next(ds_sp.batches(2, shuffle=False))  # IDENTICAL on every host
eng_sp = Engine(cfg_sp, task_sp, mesh=mesh22)
state_sp = eng_sp.init_state(jax.random.PRNGKey(0), gb_sp)
state_sp, m_sp = eng_sp.train_step(state_sp, gb_sp)  # global-batch convention
loss_sp = float(m_sp["loss"])
assert np.isfinite(loss_sp), loss_sp

# ---- part 2: pure-DP fit with ragged val + holdout + SIGTERM preempt ------
mesh4 = make_global_mesh()  # (4,) pure DP — contiguous local-slice convention
GB = 8
cfg = load_config(
    "batvisionv2", "train", "mh4_dp", "coarse_depth",
    overrides={
        "model.model_type": "lite", "model.n_bins": 8,
        "model.base_channels": 8, "dataset.images_size": 32,
        "mode.batch_size": GB, "mode.compute_dtype": "float32",
        "mode.validation_iter": 1, "mode.saving_checkpoints": 10,
    },
)
task = make_task(cfg)
eng = Engine(cfg, task, mesh=mesh4)

ds = SyntheticEchoDataset(cfg, num_samples=2 * GB, seed=0)
val_ds = SyntheticEchoDataset(cfg, num_samples=GB - 2, seed=1)   # ragged
hold_ds = SyntheticEchoDataset(cfg, num_samples=GB, seed=2)      # holdout
sl = local_batch_slice(GB)


def _with_bins(b):
    return add_bins_to_batch(b, task.bin_edges, cfg.dataset.max_depth,
                             cfg.dataset.depth_norm)


calls = {"n": 0}


def train_batches():
    calls["n"] += 1
    if calls["n"] == 2:
        # deterministic preemption: SIGTERM lands synchronously INSIDE the
        # epoch-2 iterator construction, before any step of epoch 2 is
        # dispatched on ANY host (collective-safe)
        os.kill(os.getpid(), signal.SIGTERM)
    for gb in ds.batches(GB, shuffle=False, drop_last=True):
        yield {k: np.asarray(v)[sl] for k, v in _with_bins(gb).items()}


def val_batches():
    for gb in val_ds.batches(GB, shuffle=False, drop_last=False):
        yield local_shard(_with_bins(gb), axis_size=mesh4.shape["data"])


def holdout_batches():
    for gb in hold_ds.batches(GB, shuffle=False, drop_last=True):
        yield local_shard(_with_bins(gb), axis_size=mesh4.shape["data"])


full = _with_bins(next(ds.batches(GB, shuffle=False)))
state = eng.init_state(jax.random.PRNGKey(0), {k: np.asarray(v)[sl]
                                               for k, v in full.items()})
mgr = CheckpointManager(ckpt_dir, "quad")
state = eng.fit(state, train_batches, val_batches=val_batches,
                holdout_batches={"h": holdout_batches}, epochs=3,
                ckpt_manager=mgr)
assert eng.preempted, "expected the SIGTERM preemption path"
mgr.wait()
assert mgr.latest_epoch() == 1, mgr.latest_epoch()
mgr.close()

# fresh-manager restore + resume to completion (no preemption this time)
calls["n"] = 10  # disarm the trigger
mgr2 = CheckpointManager(ckpt_dir, "quad")
tmpl = eng.init_state(jax.random.PRNGKey(7), {k: np.asarray(v)[sl]
                                              for k, v in full.items()})
restored, aux, ep = mgr2.restore(tmpl)
assert ep == 1, ep
state = eng.fit(restored, train_batches, val_batches=val_batches,
                holdout_batches={"h": holdout_batches}, epochs=3,
                start_epoch=2, ckpt_manager=mgr2)
assert not eng.preempted
mgr2.wait()
assert mgr2.latest_epoch() == 3, mgr2.latest_epoch()
mgr2.close()
val = eng.evaluate(state, val_batches())
hold = eng.evaluate(state, holdout_batches())

print(f"proc {pid}: ok sp22 loss={loss_sp:.6f} "
      f"resumed val rmse={val['rmse']:.6f} holdout rmse={hold['rmse']:.6f}",
      flush=True)
