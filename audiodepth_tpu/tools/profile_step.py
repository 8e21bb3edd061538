"""On-chip train-step profiler: capture a jax.profiler trace and print a
per-HLO-category time breakdown.

This is how the step-profile tables in RESULTS.md are produced (the
reference has no profiling at all — SURVEY §5 "Tracing/profiling"). The
capture half drives the production Engine train step on a device-cached
batch; the analysis half parses the raw ``.xplane.pb`` directly (the
tensorboard-plugin-profile converters are version-broken against the
installed TF), aggregates XLA-op self time per step, and buckets ops into
the categories used in RESULTS.md.

Usage:
    python -m audiodepth_tpu.tools.profile_step --model unet_baseline \
        --batch_size 256 [--steps 8] [--trace_dir DIR] [--keep_trace]
    python -m audiodepth_tpu.tools.profile_step --parse_only DIR/....xplane.pb
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import tempfile
from collections import defaultdict


# (regex on the HLO op expression) -> category. Order matters.
_CATEGORIES = (
    (r"%convert_reduce_fusion", "conv+BN-stat multi-output fusions"),
    (r"%compare_select_fusion", "conv+leaky/maxpool select fusions"),
    # (f32[] grad-norm partial, bf16[kh,kw,ci,co] filter grad) fusions
    (r"%fusion(\.\d+)? = \(f32\[\]\{[^}]*\}, bf16\[\d,\d,",
     "filter-gradient conv fusions"),
    # all-scalar outputs: loss terms / grad-norm reductions
    (r"%fusion(\.\d+)? = \(?(f32|bf16)\[\]",
     "loss/grad-norm scalar reductions"),
    (r"%reverse", "reverse (convT-grad data movement)"),
    (r"%(copy|slice)", "copies/transposes"),
    (r"%convolution", "standalone convolutions"),
    (r"%custom-call.*(flash|pallas|tpu_custom_call)",
     "Pallas custom calls"),
    (r".*fusion", "other conv/elementwise fusions"),
)


def categorize(name: str) -> str:
    for pat, cat in _CATEGORIES:
        if re.match(pat, name):
            return cat
    return "misc"


def parse_xplane(path: str, steps: int):
    """Aggregate device-op self time per category from an xplane.pb."""
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    plane = next(
        (p for p in xs.planes if p.name.startswith("/device:TPU")), None
    )
    if plane is None:  # CPU fallback (interpret/virtual-mesh runs)
        plane = next(p for p in xs.planes if p.name.startswith("/device:"))
    emeta = plane.event_metadata

    per_module = defaultdict(int)
    for line in plane.lines:
        if line.name == "XLA Modules":
            for e in line.events:
                per_module[emeta[e.metadata_id].name.split("(")[0]] \
                    += e.duration_ps

    cats = defaultdict(int)
    ops = defaultdict(int)
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        for e in line.events:
            name = emeta[e.metadata_id].name
            cats[categorize(name)] += e.duration_ps
            ops[name[:130]] += e.duration_ps
    return per_module, cats, ops


def report(per_module, cats, ops, steps: int, top: int = 12) -> str:
    lines = []
    for mod, t in sorted(per_module.items(), key=lambda kv: -kv[1]):
        lines.append(f"module {mod}: {t / 1e9 / steps:.2f} ms/step")
    total = sum(cats.values())
    lines.append("")
    lines.append(f"{'category':42s} {'ms/step':>8s}  share")
    for c, t in sorted(cats.items(), key=lambda kv: -kv[1]):
        lines.append(
            f"{c:42s} {t / 1e9 / steps:8.2f}  {100 * t / total:4.1f}%"
        )
    lines.append(f"{'TOTAL (device-op sum)':42s} {total / 1e9 / steps:8.2f}")
    lines.append("")
    lines.append(f"top {top} ops:")
    for name, t in sorted(ops.items(), key=lambda kv: -kv[1])[:top]:
        lines.append(f"  {t / 1e9 / steps:7.2f} ms/step  {name}")
    return "\n".join(lines)


def capture(args) -> str:
    import jax

    from ..compilation_cache import enable
    from ..configs import load_config
    from ..data.device_cache import DeviceDatasetCache
    from ..data.synthetic import SyntheticEchoDataset
    from ..models import make_task
    from ..train import Engine

    enable()
    from ..cli.train import _parse_override

    overrides = {"mode.batch_size": args.batch_size}
    for kv in args.override or []:
        # full bool/int/float/null coercion — model.extra.* keys get no
        # field-type coercion downstream, so raw strings would stay strings
        k, v = _parse_override(kv)
        overrides[k] = v
    cfg = load_config(args.dataset, "train", "profile", args.model,
                      overrides=overrides)
    bs = args.batch_size
    with_image = args.model in ("rgb_depth", "adabins_distillation")
    ds = SyntheticEchoDataset(cfg, num_samples=bs * 2, seed=0,
                              with_image=with_image)
    batch = next(ds.batches(bs, shuffle=False))
    task = make_task(cfg)
    eng = Engine(cfg, task)
    from ..data.codec import depth_storage_units

    du = depth_storage_units(cfg)
    if args.model == "coarse_depth":
        # bin targets are attached host-side (cli/train.py does the same);
        # profile a fixed device-resident batch instead of the cache
        from ..data.bins import add_bins_to_batch
        from ..data.codec import encode_batch

        batch = add_bins_to_batch(batch, task.bin_edges,
                                  cfg.dataset.max_depth,
                                  cfg.dataset.depth_norm)
        state = eng.init_state(jax.random.PRNGKey(0), batch)
        bts = [eng.put_batch(encode_batch(batch, du))] * max(args.steps, 3)
    else:
        state = eng.init_state(jax.random.PRNGKey(0), batch)
        cache = DeviceDatasetCache(ds, max_depth_units=du)
        bts = (list(cache.batches(bs, shuffle=True, seed=2)) * args.steps)[
            : max(args.steps, 3)
        ]
    for b in bts[:3]:  # warm/compile outside the trace
        state, m = eng.train_step(state, b)
    _ = float(m["loss"])
    jax.profiler.start_trace(args.trace_dir)
    for b in bts[: args.steps]:
        state, m = eng.train_step(state, b)
    _ = float(m["loss"])
    jax.profiler.stop_trace()
    paths = glob.glob(
        os.path.join(args.trace_dir, "plugins/profile/*/*.xplane.pb")
    )
    return max(paths, key=os.path.getmtime)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--model", default="unet_baseline")
    p.add_argument("--dataset", default="batvisionv2")
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--override", action="append",
                   help="config override, e.g. model.base_channels=64")
    p.add_argument("--trace_dir", default=None)
    p.add_argument("--keep_trace", action="store_true")
    p.add_argument("--parse_only", default=None,
                   help="skip capture; parse this .xplane.pb")
    p.add_argument("--top", type=int, default=12)
    args = p.parse_args(argv)

    if args.parse_only:
        path = args.parse_only
    else:
        if args.trace_dir is None:
            args.trace_dir = tempfile.mkdtemp(prefix="adepth_prof_")
        path = capture(args)
    per_module, cats, ops = parse_xplane(path, args.steps)
    print(report(per_module, cats, ops, args.steps, args.top))
    if args.parse_only is None and not args.keep_trace:
        import shutil

        shutil.rmtree(args.trace_dir, ignore_errors=True)
    else:
        print(f"\ntrace: {path}")
    return per_module, cats


if __name__ == "__main__":
    main()
