"""Multi-chip scaling characterization on the virtual CPU mesh.

Correctness of the sharded programs is proven numerically by
__graft_entry__.dryrun_multichip; this tool gives the PERF claims a
quantitative basis (VERDICT r4 next #7):

  1. per-step collective traffic, extracted from the COMPILED HLO of the
     jitted train step — op counts and exact byte volumes per collective
     kind (all-reduce / all-gather / reduce-scatter / collective-permute)
     for the DP-8 UNet-256 flagship and the DP×SP binaural layout;
  2. a weak-scaling wall-time sweep (1/2/4/8 devices, fixed per-device
     batch) on the virtual mesh. All virtual devices timeshare this
     host's ONE physical core, so ideal weak scaling appears as wall
     time ∝ n_devices; the table reports wall/(n·t1), which isolates the
     partition+collective overhead GSPMD adds on top of the pure compute;
  3. the numbers RESULTS.md's "multi-chip scaling" section combines with
     public v5e ICI bandwidth for the real-hardware projection.

Run (CPU, no TPU contention):
    python -m audiodepth_tpu.tools.multichip_scaling [--fast]

The module self-provisions the 8-device virtual CPU platform exactly like
__graft_entry__ (must be a fresh process — the flag only acts before the
first backend use).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import time

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2,
    "s64": 8, "s32": 4, "s16": 2, "s8": 1,
    "u64": 8, "u32": 4, "u16": 2, "u8": 1,
    "pred": 1, "c64": 8, "c128": 16,
}

# one tensor shape, e.g. f32[256,128]{1,0} — layout suffix optional
_SHAPE = re.compile(r"(" + "|".join(_DTYPE_BYTES) + r")\[([0-9,]*)\]")
_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
                "collective-permute", "all-to-all")


def _shape_bytes(shapes: str) -> int:
    """Total bytes of every tensor shape in an HLO result-type string
    (handles tuples: '(f32[8,4]{...}, f32[16]{...})')."""
    total = 0
    for dtype, dims in _SHAPE.findall(shapes):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def collective_stats(hlo_text: str) -> dict:
    """Per-collective-kind {count, bytes} from compiled HLO text.

    Bytes are the op RESULT sizes — for all-reduce that equals the wire
    payload per 2(n-1)/n ring pass; for all-gather it is the gathered
    (post) size; for reduce-scatter the scattered (post) size."""
    out = {k: {"count": 0, "bytes": 0} for k in _COLLECTIVES}
    for line in hlo_text.splitlines():
        line = line.strip()
        # '%name = <result-shapes> <op>(' — fused loop bodies included
        m = re.match(r"%?[\w.\-]+ = (.+?) ([\w\-]+)\(", line)
        if not m:
            continue
        shapes, op = m.groups()
        # 'all-reduce-start'/'-done' pairs: count the start only (the done
        # repeats the same buffer)
        for kind in _COLLECTIVES:
            if op == kind or op == kind + "-start":
                out[kind]["count"] += 1
                out[kind]["bytes"] += _shape_bytes(shapes)
    return {k: v for k, v in out.items() if v["count"]}


def _provision(n: int) -> None:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    if len(jax.devices()) < n:
        raise SystemExit("virtual CPU mesh unavailable: set XLA_FLAGS before "
                         "any backend use (fresh process)")


def _mk(cfg_overrides, model, n_dev, axis_shape=None):
    """Engine + device-resident sharded batch + state for a mesh size."""
    import jax
    import jax.numpy as jnp

    from ..configs import load_config
    from ..data.synthetic import SyntheticEchoDataset
    from ..models import make_task
    from ..parallel.mesh import make_mesh
    from ..train import Engine

    cfg = load_config("batvisionv2", "train", "scaling", model,
                      overrides=cfg_overrides)
    if axis_shape is None:
        mesh = make_mesh(n_dev) if n_dev > 1 else None
    else:
        mesh = make_mesh(n_dev, axis_names=("data", "model"),
                         shape=axis_shape)
    task = make_task(cfg)
    eng = Engine(cfg, task, mesh=mesh)
    bs = cfg.mode.batch_size
    ds = SyntheticEchoDataset(cfg, num_samples=bs, seed=0)
    batch = next(ds.batches(bs, shuffle=False))
    state = eng.init_state(jax.random.PRNGKey(0), batch)
    dev_batch = eng.put_batch(batch)
    return eng, state, dev_batch, jnp.float32(0.0)


def hlo_for(model: str, n_dev: int, bs_per_dev: int, size: int,
            axis_shape=None, extra=None) -> str:
    overrides = {"mode.batch_size": bs_per_dev * n_dev,
                 "dataset.images_size": size,
                 "mode.compute_dtype": "float32"}
    if extra:
        overrides.update(extra)
    eng, state, batch, ep = _mk(overrides, model, n_dev, axis_shape)
    lowered = eng._train_step.lower(state, batch, ep)
    return lowered.compile().as_text()


def weak_scaling(model: str, bs_per_dev: int, size: int, steps: int) -> list:
    import jax

    rows = []
    for n in (1, 2, 4, 8):
        overrides = {"mode.batch_size": bs_per_dev * n,
                     "dataset.images_size": size,
                     "mode.compute_dtype": "float32"}
        eng, state, batch, _ = _mk(overrides, model, n)
        state, m = eng.train_step(state, batch)  # compile + warm
        _ = float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(steps):
            state, m = eng.train_step(state, batch)
        _ = float(m["loss"])
        dt = (time.perf_counter() - t0) / steps
        rows.append({"devices": n, "global_batch": bs_per_dev * n,
                     "step_s": round(dt, 4)})
        del eng, state, batch
    t1 = rows[0]["step_s"]
    for r in rows:
        # one physical core timeshares all virtual devices → ideal weak
        # scaling is step_s == n·t1; overhead is the GSPMD partition tax
        r["vs_timeshared_ideal"] = round(r["step_s"] / (r["devices"] * t1), 3)
    return rows


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--fast", action="store_true",
                   help="small images for the weak-scaling sweep")
    p.add_argument("--out", default="scaling_analysis.json")
    args = p.parse_args(argv)
    _provision(8)

    report = {}

    # 1. flagship DP-8: full UNet-256 (54.4M params) at the real geometry;
    #    bs/device kept small — collective bytes depend on params + BN
    #    stats, not batch
    hlo = hlo_for("unet_baseline", 8, 2, 256)
    report["dp8_unet256"] = collective_stats(hlo)

    # 2. DP×SP binaural layout ((4,2) mesh, sequence axis sharded 2-way,
    #    like dryrun_multichip's second check)
    hlo = hlo_for("binaural_attention", 8, 2, 128,
                  axis_shape=(4, 2),
                  extra={"model.extra": {"remat": False}})
    report["dp4xsp2_binaural"] = collective_stats(hlo)

    # 3. weak scaling sweep (smaller net keeps the CPU sweep tractable)
    sz = 64 if args.fast else 128
    report["weak_scaling_unet"] = weak_scaling(
        "unet_baseline", bs_per_dev=2, size=sz, steps=3)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
