"""Subprocess worker for test_multihost.py — one simulated host.

Run as: python tests/multihost_worker.py <process_id> <num_processes> <port>

Each process gets 4 virtual CPU devices; together they form one global
mesh (SURVEY §2.6 DDP/multi-process row: multi-host training is the same
SPMD program over a bigger mesh, with per-host batch loading).
"""
import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from audiodepth_tpu.parallel.multihost import (  # noqa: E402
    initialize_multihost, local_batch_slice, make_global_mesh)

initialize_multihost(coordinator_address=f"127.0.0.1:{port}",
                     num_processes=nproc, process_id=pid)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

assert jax.process_count() == nproc, jax.process_count()
assert jax.local_device_count() == 4, jax.local_device_count()
assert jax.device_count() == 4 * nproc, jax.device_count()

mesh = make_global_mesh()
B = 16
sl = local_batch_slice(B)
per = B // nproc
assert sl == slice(pid * per, (pid + 1) * per), sl

# per-host data loading: each host materializes only its slice of the
# global batch, then the DP train-step pattern (replicated params,
# batch-sharded inputs, implicit cross-host grad all-reduce) runs jitted
global_x = np.arange(B * 3, dtype=np.float32).reshape(B, 3) / 10.0
global_y = np.linspace(0.0, 1.0, B, dtype=np.float32).reshape(B, 1)
x_shard = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data", None)), global_x[sl], (B, 3))
y_shard = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data", None)), global_y[sl], (B, 1))
w = jnp.zeros((3, 1), jnp.float32)  # replicated


@jax.jit
def grad_step(w, x, y):
    def loss(w):
        return jnp.mean((x @ w - y) ** 2)

    return jax.grad(loss)(w)


g = grad_step(w, x_shard, y_shard)
g_ref = (2.0 / B) * global_x.T @ (global_x @ np.zeros((3, 1)) - global_y)
np.testing.assert_allclose(np.asarray(jax.device_get(g)), g_ref,
                           rtol=1e-5, atol=1e-6)

# -- the real Engine over the multi-process mesh --------------------------
# per-host data loading: every host builds the same synthetic split and
# feeds ONLY its local_batch_slice rows; put_batch assembles the global
# sharded batch, the jitted step runs SPMD across both processes.
from audiodepth_tpu.configs import load_config  # noqa: E402
from audiodepth_tpu.data.synthetic import SyntheticEchoDataset  # noqa: E402
from audiodepth_tpu.models import make_task  # noqa: E402
from audiodepth_tpu.train import Engine  # noqa: E402

GB = 8  # global batch
cfg = load_config(
    "batvisionv2", "train", "mh", "coarse_depth",
    overrides={
        "model.model_type": "lite", "model.n_bins": 8,
        "model.base_channels": 8, "dataset.images_size": 64,
        "mode.batch_size": GB, "mode.compute_dtype": "float32",
    },
)
ds = SyntheticEchoDataset(cfg, num_samples=GB, seed=0)
full = next(ds.batches(GB, shuffle=False))
from audiodepth_tpu.data.bins import add_bins_to_batch  # noqa: E402

task = make_task(cfg)
full = add_bins_to_batch(full, task.bin_edges, cfg.dataset.max_depth,
                         cfg.dataset.depth_norm)
eng = Engine(cfg, task, mesh=mesh)
state = eng.init_state(jax.random.PRNGKey(0), full)
hsl = local_batch_slice(GB)
local_batch = {k: np.asarray(v)[hsl] for k, v in full.items()}
losses = []
for _ in range(2):
    state, metrics = eng.train_step(state, local_batch)
    losses.append(float(metrics["loss"]))
assert all(np.isfinite(l) for l in losses), losses

# -- ragged multi-process eval (drop_last=False) ---------------------------
# a 6-row val split under global batch 8 is one ragged batch that does
# NOT divide the 8-way data axis: every host pads it identically via
# local_shard (+_valid mask) and the masked evaluate() must equal a plain
# single-engine evaluation of the same split.
from audiodepth_tpu.parallel.multihost import local_shard  # noqa: E402

NV = 6  # one global batch of 6 under GB=8: ragged, pads to 8
dsv = SyntheticEchoDataset(cfg, num_samples=NV, seed=1)


def _global_eval_batches():
    for gb in dsv.batches(GB, shuffle=False, drop_last=False):
        yield add_bins_to_batch(gb, task.bin_edges, cfg.dataset.max_depth,
                                cfg.dataset.depth_norm)


def _local_eval_batches():
    for gb in _global_eval_batches():
        yield local_shard(gb, axis_size=mesh.shape["data"])


val = eng.evaluate(state, _local_eval_batches())
# both hosts print val['rmse']; test_multihost asserts they are IDENTICAL
# across the process boundary. (Pad-mask == unpadded single-engine metric
# equality is pinned separately in test_sharding.py on the virtual mesh —
# repeating that comparison here would double the eval compiles.)
assert val and all(np.isfinite(v) for v in val.values()), val

# -- DP x SP attention across processes -----------------------------------
# 2-D ('data','model') mesh spanning both hosts: the binaural family's
# O(N²) cross-attention is sequence-parallel over 'model' while the batch
# is data-parallel over 'data' — the same layout as dryrun_multichip's
# layout 2, but with the mesh axes crossing a real process boundary.
import dataclasses as _dc  # noqa: E402

from audiodepth_tpu.train.tasks_extra import BinauralAttentionTask  # noqa: E402

dp = (4 * nproc) // 2
cfg2 = load_config(
    "batvisionv2", "train", "mh_sp", "binaural_attention",
    overrides={
        "model.base_channels": 8, "dataset.images_size": 64,
        "mode.batch_size": dp, "mode.compute_dtype": "float32",
    },
)
mesh2 = make_global_mesh(("data", "model"), shape=(dp, 2))
task2 = BinauralAttentionTask(cfg2)
task2.model = _dc.replace(task2.model, sp_axis="model")
ds2 = SyntheticEchoDataset(cfg2, num_samples=dp, seed=0)
full2 = next(ds2.batches(dp, shuffle=False))
eng2 = Engine(cfg2, task2, mesh=mesh2)
state2 = eng2.init_state(jax.random.PRNGKey(0), full2)
sl2 = local_batch_slice(dp)
local2 = {k: np.asarray(v)[sl2] for k, v in full2.items()}
state2, m2 = eng2.train_step(state2, local2)
loss_sp = float(m2["loss"])
assert np.isfinite(loss_sp), loss_sp

print(f"proc {pid}: ok grad[0,0]={float(g[0, 0]):.6f} "
      f"engine losses={losses[0]:.5f},{losses[1]:.5f} "
      f"ragged rmse={val['rmse']:.6f} "
      f"sp loss={loss_sp:.5f}", flush=True)
