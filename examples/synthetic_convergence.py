"""Convergence sanity run: UNet-256 on synthetic BV2 semantics (TPU).

The dataset-free analogue of the reference's toy_train_eval notebooks
(overfit/convergence sanity — SURVEY §4.3). Reproduces RESULTS.md's
trajectory table.
"""

import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")

from audiodepth_tpu.configs import load_config
from audiodepth_tpu.data.codec import encode_batch
from audiodepth_tpu.data.prefetch import device_prefetch
from audiodepth_tpu.data.synthetic import SyntheticEchoDataset
from audiodepth_tpu.models import make_task
from audiodepth_tpu.train import Engine


def main(epochs: int = 30, bs: int = 64):
    cfg = load_config("batvisionv2", "train", "conv", "unet_baseline",
                      overrides={"mode.batch_size": bs})
    train_ds = SyntheticEchoDataset(cfg, num_samples=512, seed=0)
    val_ds = SyntheticEchoDataset(cfg, num_samples=64, seed=99)
    task = make_task(cfg)
    eng = Engine(cfg, task, steps_per_epoch=len(train_ds) // bs)

    units = 1.0 if cfg.dataset.depth_norm else cfg.dataset.max_depth
    train_batches = [encode_batch(b, units)
                     for b in train_ds.batches(bs, shuffle=True, seed=7)]
    val_batches = [encode_batch(b, units)
                   for b in val_ds.batches(bs, shuffle=False)]

    state = eng.init_state(jax.random.PRNGKey(0), train_batches[0])
    t0 = time.time()
    for epoch in range(1, epochs + 1):
        for b in device_prefetch(iter(train_batches), size=4):
            state, m = eng.train_step(state, b, epoch=float(epoch - 1))
        if epoch % 5 == 0 or epoch == 1:
            val = eng.evaluate(state, iter(val_batches))
            print(f"epoch {epoch:3d} loss={float(m['loss']):.3f} "
                  f"rmse={val['rmse']:.3f} abs_rel={val['abs_rel']:.3f} "
                  f"d1={val['delta1']:.3f} d3={val['delta3']:.3f} "
                  f"[{time.time() - t0:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
