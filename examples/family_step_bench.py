"""Per-family train-step throughput: the RESULTS.md table, reproducibly.

Times each family's fully-jitted production train step at a fixed
comparable batch size with a device-resident batch (measures the compute
path; real training overlaps transfers via prefetch / the device cache).
Timing uses a host readback of the loss for the sync — block_until_ready
does not wait on this remote platform.

Usage: python examples/family_step_bench.py [bs]
"""

import sys
import time

import jax

sys.path.insert(0, ".")

from audiodepth_tpu.compilation_cache import enable as _enable_compile_cache

_enable_compile_cache()

from audiodepth_tpu.configs import load_config
from audiodepth_tpu.data.bins import add_bins_to_batch
from audiodepth_tpu.data.codec import encode_batch
from audiodepth_tpu.data.synthetic import SyntheticEchoDataset
from audiodepth_tpu.models import make_task
from audiodepth_tpu.train import Engine

# full-width configs (the RESULTS.md "per-family throughput" table)
FAMILIES = [
    ("unet_baseline", {}),
    ("unet_cvae", {}),
    ("base_residual", {}),
    ("binaural_attention", {}),
    ("rgb_depth", {}),
    ("adabins_distillation", {}),
    ("coarse_depth", {"model.model_type": "hybrid", "model.n_bins": 32}),
]


def time_family(name, over, bs=32, n_steps=20, warmup=3):
    overrides = {"mode.batch_size": bs}
    overrides.update(over)
    cfg = load_config("batvisionv2", "train", f"stepbench_{name}", name,
                      overrides=overrides)
    with_image = name in ("rgb_depth", "adabins_distillation")
    ds = SyntheticEchoDataset(cfg, num_samples=bs, seed=0,
                              with_image=with_image)
    task = make_task(cfg)
    eng = Engine(cfg, task)
    units = 1.0 if cfg.dataset.depth_norm else cfg.dataset.max_depth
    batch = next(ds.batches(bs, shuffle=False))
    if name == "coarse_depth":
        batch = add_bins_to_batch(batch, task.bin_edges,
                                  cfg.dataset.max_depth,
                                  cfg.dataset.depth_norm)
    state = eng.init_state(jax.random.PRNGKey(0), batch)
    dev_batch = eng.put_batch(encode_batch(batch, units))
    for _ in range(warmup):
        state, m = eng.train_step(state, dev_batch)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, m = eng.train_step(state, dev_batch)
    _ = float(m["loss"])
    dt = (time.perf_counter() - t0) / n_steps
    return dt


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    rows = []
    for name, over in FAMILIES:
        try:
            dt = time_family(name, over, bs=bs)
            rows.append((name, dt))
            print(f"{name:28s} {dt * 1e3:7.1f} ms/step  "
                  f"{bs / dt:7.1f} pairs/s/chip", flush=True)
        except Exception as e:  # pragma: no cover - bench resilience
            print(f"{name:28s} FAILED: {type(e).__name__}: {str(e)[:140]}",
                  flush=True)
    print("\n| family | ms/step | pairs/s/chip |")
    print("|---|---|---|")
    for name, dt in sorted(rows, key=lambda r: r[1]):
        print(f"| {name} | {dt * 1e3:.1f} | {bs / dt:.1f} |")


if __name__ == "__main__":
    main()
