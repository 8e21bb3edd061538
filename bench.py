"""Throughput benchmark: UNet-256 baseline training on BatvisionV2 semantics.

Measures spectrogram-pairs/sec/chip for the fused train step (device mel
front end + UNet-256 forward/backward + AdamW/clip update in ONE jitted XLA
graph) on the available accelerator, and prints one JSON line.

vs_baseline compares against the reference's runnable path in this
container: the PyTorch-CPU UNet-256 train step measured at 1.254 pairs/sec
(5 steps, bs=8, torch 2.13 CPU, this machine — see BASELINE.md: the
reference repo never published throughput, and its GPU path is unavailable
here; the CPU measurement even *excludes* the reference's per-sample
torchaudio front-end cost, so it is generous to the baseline).
"""

import json
import time

import jax
import numpy as np

from audiodepth_tpu.configs import load_config
from audiodepth_tpu.data.synthetic import SyntheticEchoDataset
from audiodepth_tpu.models import make_task
from audiodepth_tpu.train import Engine

TORCH_CPU_BASELINE_PAIRS_PER_SEC = 1.254


def main():
    batch_size = 256
    cfg = load_config(
        "batvisionv2",
        "train",
        "bench",
        "unet_baseline",
        overrides={"mode.batch_size": batch_size},
    )
    ds = SyntheticEchoDataset(cfg, num_samples=batch_size, seed=0)
    batch = next(ds.batches(batch_size, shuffle=False))

    task = make_task(cfg)
    eng = Engine(cfg, task)
    state = eng.init_state(jax.random.PRNGKey(0), batch)

    # warmup (compile + first steps)
    for _ in range(3):
        state, m = eng.train_step(state, batch)
    jax.block_until_ready(m["loss"])

    n_steps = 20
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, m = eng.train_step(state, batch)
    jax.block_until_ready(m["loss"])
    dt = time.perf_counter() - t0

    n_chips = jax.device_count()
    pairs_per_sec_chip = n_steps * batch_size / dt / n_chips
    print(
        json.dumps(
            {
                "metric": "spectrogram-pairs/sec/chip (UNet-256 BV2 train, fused frontend)",
                "value": round(pairs_per_sec_chip, 2),
                "unit": "pairs/sec/chip",
                "vs_baseline": round(
                    pairs_per_sec_chip / TORCH_CPU_BASELINE_PAIRS_PER_SEC, 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
