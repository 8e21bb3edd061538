"""Family sweep: short training run of every model family on the TPU.

Exercises each family's full jitted train/eval loop on synthetic BV2
semantics and prints a per-family metric table (extends RESULTS.md).
"""

import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")

from audiodepth_tpu.configs import load_config
from audiodepth_tpu.data.bins import add_bins_to_batch
from audiodepth_tpu.data.codec import encode_batch
from audiodepth_tpu.data.prefetch import device_prefetch
from audiodepth_tpu.data.synthetic import SyntheticEchoDataset
from audiodepth_tpu.models import make_task
from audiodepth_tpu.train import Engine

FAMILIES = [
    ("unet_baseline", {}),
    ("unet_cvae", {}),
    ("base_residual", {"model.base_channels": 32}),
    ("binaural_attention", {"model.base_channels": 32}),
    ("rgb_depth", {"model.base_channels": 32}),
    ("adabins_distillation", {"model.base_channels": 32, "model.n_bins": 64}),
    ("coarse_depth", {"model.base_channels": 32, "model.n_bins": 32,
                      "model.model_type": "hybrid"}),
]


def run_family(name, over, epochs=10, bs=32, n_train=256, n_val=32):
    overrides = {"mode.batch_size": bs}
    overrides.update(over)
    cfg = load_config("batvisionv2", "train", f"sweep_{name}", name,
                      overrides=overrides)
    with_image = name in ("rgb_depth", "adabins_distillation")
    train_ds = SyntheticEchoDataset(cfg, num_samples=n_train, seed=0,
                                    with_image=with_image)
    val_ds = SyntheticEchoDataset(cfg, num_samples=n_val, seed=99,
                                  with_image=with_image)
    task = make_task(cfg)
    eng = Engine(cfg, task, steps_per_epoch=n_train // bs)

    units = 1.0 if cfg.dataset.depth_norm else cfg.dataset.max_depth

    def prep(b):
        if name == "coarse_depth":
            b = add_bins_to_batch(b, task.bin_edges, cfg.dataset.max_depth,
                                  cfg.dataset.depth_norm)
        return encode_batch(b, units)

    train_batches = [prep(b) for b in train_ds.batches(bs, shuffle=True, seed=7)]
    val_batches = [prep(b) for b in val_ds.batches(bs, shuffle=False)]

    state = eng.init_state(jax.random.PRNGKey(0), train_batches[0])
    t0 = time.time()
    first_val = last_val = None
    for epoch in range(1, epochs + 1):
        for b in device_prefetch(iter(train_batches), size=4):
            state, m = eng.train_step(state, b, epoch=float(epoch - 1))
        if epoch in (1, epochs):
            val = eng.evaluate(state, iter(val_batches))
            if epoch == 1:
                first_val = val
            last_val = val
    dt = time.time() - t0
    print(
        f"{name:24s} rmse {first_val['rmse']:6.2f} -> {last_val['rmse']:6.2f}  "
        f"abs_rel {first_val['abs_rel']:5.2f} -> {last_val['abs_rel']:5.2f}  "
        f"d3 {first_val['delta3']:4.2f} -> {last_val['delta3']:4.2f}  "
        f"[{dt:.0f}s]",
        flush=True,
    )
    return last_val


def main():
    for name, over in FAMILIES:
        try:
            run_family(name, over)
        except Exception as e:
            print(f"{name:24s} FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
