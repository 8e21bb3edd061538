"""The single training engine: jitted train/eval steps + epoch driver.

Replaces the reference's seven copy-pasted driver loops (SURVEY §1) with one
engine parameterized by a Task. TPU-first properties:
  * the whole step — device front end, forward, loss, backward, clip, update,
    BatchNorm stat update — is ONE jitted XLA graph with donated state;
  * the epoch index enters as a traced scalar so curriculum schedules
    (adaptive loss weights, detach phases) never retrace;
  * with a data mesh, batches are sharded on dim 0 and parameters are
    replicated; XLA inserts the grad all-reduce over ICI.
"""

from __future__ import annotations

import functools
import time
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..configs import Config
from ..parallel.mesh import batch_sharding, make_mesh, replicate, shard_batch
from .optim import make_optimizer
from .tasks import Task


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


class Engine:
    def __init__(
        self,
        cfg: Config,
        task: Task,
        mesh=None,
        steps_per_epoch: int = 1,
    ):
        self.cfg = cfg
        self.task = task
        self.mesh = mesh
        self.tx = make_optimizer(cfg.mode, steps_per_epoch)

        def train_step(state: TrainState, batch, epoch):
            rng = jax.random.fold_in(jax.random.PRNGKey(cfg.mode.seed), state.step)
            grad_fn = jax.value_and_grad(task.loss_fn, has_aux=True)
            (loss, (new_stats, aux)), grads = grad_fn(
                state.params, state.batch_stats, batch, rng, epoch
            )
            updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
            new_params = jax.tree_util.tree_map(
                lambda p, u: p + u, state.params, updates
            )
            metrics = dict(aux)
            metrics["grad_norm"] = jnp.sqrt(
                sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in jax.tree_util.tree_leaves(grads))
            )
            return (
                TrainState(
                    step=state.step + 1,
                    params=new_params,
                    batch_stats=new_stats if new_stats is not None else state.batch_stats,
                    opt_state=new_opt,
                ),
                metrics,
            )

        def eval_step(state: TrainState, batch):
            return task.eval_metrics(state.params, state.batch_stats, batch)

        self._train_step = jax.jit(train_step, donate_argnums=(0,))
        self._eval_step = jax.jit(eval_step)

    # ------------------------------------------------------------------
    def init_state(self, rng: jax.Array, sample_batch) -> TrainState:
        variables = self.task.init(rng, sample_batch)
        params = variables["params"]
        batch_stats = variables.get("batch_stats")
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=self.tx.init(params),
        )
        if self.mesh is not None:
            state = replicate(state, self.mesh)
        return state

    def put_batch(self, batch):
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        if self.mesh is not None:
            batch = shard_batch(batch, self.mesh, self.cfg.mode.data_axis)
        return batch

    def train_step(self, state, batch, epoch: float = 0.0):
        return self._train_step(state, self.put_batch(batch), jnp.float32(epoch))

    def eval_step(self, state, batch):
        return self._eval_step(state, self.put_batch(batch))

    # ------------------------------------------------------------------
    def evaluate(self, state, batches: Iterable) -> Dict[str, float]:
        """Mean per-sample metrics over an eval split."""
        sums: Dict[str, float] = {}
        count = 0
        for batch in batches:
            out = self.eval_step(state, batch)
            b = int(next(iter(out.values())).shape[0])
            for k, v in out.items():
                sums[k] = sums.get(k, 0.0) + float(jnp.sum(v))
            count += b
        if count == 0:
            return {}
        return {k: v / count for k, v in sums.items()}
