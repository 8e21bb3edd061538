"""Inference serving CLI: waveform in, depth map out, over HTTP.

The deployment surface the reference never had (its closest analogue is
re-running test.py per batch, test.py:231-320). TPU-native serving shape:

  * ONE fused XLA graph per batch size — TOF-fix → STFT/Mel front end →
    model forward → meters + clip, ahead-of-time compiled at startup for a
    ladder of batch sizes (static shapes; no first-request compile stall).
  * Micro-batching: concurrent requests are collected for up to
    --batch_wait_ms, padded to the smallest compiled ladder size, and run
    as one device program (the TPU answer to request-level parallelism —
    batch the MXU, never queue per-request kernels).
  * Checkpoints: native orbax (template-free restore_eval, incl. --use_best)
    or a reference torch .pth transplanted directly (--torch_checkpoint) —
    the migration path from a reference training run to a TPU serving
    process with no retraining.

Protocol (kept dependency-free on both ends):
  POST /predict   body = raw little-endian float32 waveform, C-order
                  [2, L] (any L: server pads/cuts to the TOF window like
                  the datasets do, data/batvision.py::_fix_length).
                  → 200, body = raw float32 depth meters [S, S],
                  header X-Shape: "S,S".
  GET  /healthz   → 200 "ok" once the ladder is compiled.
  GET  /stats     → JSON: served count, latency percentiles, queue depth.

`--loadtest N` starts the server in-process, drives N concurrent requests
through real HTTP, and prints a latency/throughput JSON line. bench.py
runs this loadtest on the real chip each round ("serve" stage) and folds
the numbers into bench_details.json; the measured p50/p99/req-throughput
live in RESULTS.md's serving section.
"""

from __future__ import annotations

import argparse
import json
import os
import queue
import threading
import time
from typing import Dict, List, Optional, Sequence

import numpy as np


# ---------------------------------------------------------------------------
# Inference runner: checkpoint → device params → AOT-warmed jitted graphs
# ---------------------------------------------------------------------------
class InferenceRunner:
    """Owns the device state and the per-batch-size compiled programs."""

    def __init__(self, cfg, task, params, batch_stats,
                 ladder: Sequence[int] = (1, 4, 16)):
        import jax
        import jax.numpy as jnp

        self.cfg = cfg
        self.task = task
        self.ladder = sorted(set(int(b) for b in ladder))
        from ..data.frontend import tof_cut_samples

        self.wave_len = tof_cut_samples(cfg.dataset.max_depth,
                                        cfg.dataset.sample_rate)
        self.out_size = int(cfg.dataset.images_size)
        self.params = jax.device_put(params)
        self.batch_stats = (jax.device_put(batch_stats)
                            if batch_stats is not None else None)

        def infer(params, batch_stats, waveform):
            pred = task.predict_meters(params, batch_stats,
                                       {"waveform": waveform})
            return jnp.clip(pred, 0.0, cfg.dataset.max_depth)

        self._infer = jax.jit(infer)
        self._jnp = jnp

    def warmup(self) -> Dict[int, float]:
        """Compile every ladder size up front; returns per-size seconds."""
        times = {}
        for b in self.ladder:
            z = np.zeros((b, 2, self.wave_len), np.float32)
            t0 = time.perf_counter()
            out = self._infer(self.params, self.batch_stats, z)
            _ = float(np.asarray(out[0, 0, 0, 0]))  # host sync
            times[b] = time.perf_counter() - t0
        return times

    def fix_length(self, wave: np.ndarray) -> np.ndarray:
        """[2, L] any L → [2, wave_len] (cut / zero-pad, dataset semantics)."""
        c, l = wave.shape
        if l >= self.wave_len:
            return wave[:, : self.wave_len]
        out = np.zeros((c, self.wave_len), np.float32)
        out[:, :l] = wave
        return out

    def run(self, waves: np.ndarray) -> np.ndarray:
        """[B, 2, wave_len] float32 → [B, S, S, 1] float32 meters.

        B must be a ladder size (the batcher pads); anything else would
        trigger a fresh XLA compile mid-serving.
        """
        if waves.shape[0] not in self.ladder:
            raise ValueError(
                f"batch {waves.shape[0]} not in compiled ladder {self.ladder}")
        out = self._infer(self.params, self.batch_stats, waves)
        return np.asarray(out)


# ---------------------------------------------------------------------------
# Micro-batcher: request queue → padded ladder batches → per-request futures
# ---------------------------------------------------------------------------
class _Request:
    __slots__ = ("wave", "event", "result", "error", "t_enqueue")

    def __init__(self, wave: np.ndarray):
        self.wave = wave
        self.event = threading.Event()
        self.result: Optional[np.ndarray] = None
        self.error: Optional[Exception] = None
        self.t_enqueue = time.perf_counter()


class MicroBatcher:
    """Collects concurrent requests into one padded device call.

    The collector blocks on the first request, then drains whatever else
    arrives within wait_ms (bounded by the largest ladder size), pads to
    the smallest compiled size ≥ n, runs ONE program, and fans results
    back out. Pad rows are zeros; their outputs are dropped.
    """

    def __init__(self, runner: InferenceRunner, wait_ms: float = 2.0):
        self.runner = runner
        self.wait_s = wait_ms / 1e3
        self.q: "queue.Queue[_Request]" = queue.Queue()
        self.latencies: List[float] = []
        self.batch_fill: List[int] = []
        self.served = 0
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, wave: np.ndarray) -> _Request:
        req = _Request(wave)
        self.q.put(req)
        return req

    def stop(self):
        self._stop.set()
        # unblock the collector
        self.q.put(None)  # type: ignore[arg-type]
        self._thread.join(timeout=5)

    def _loop(self):
        max_b = max(self.runner.ladder)
        while not self._stop.is_set():
            first = self.q.get()
            if first is None:
                continue
            batch = [first]
            deadline = time.perf_counter() + self.wait_s
            while len(batch) < max_b:
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    break
                try:
                    nxt = self.q.get(timeout=remaining)
                except queue.Empty:
                    break
                if nxt is None:
                    break
                batch.append(nxt)
            self._run_batch(batch)

    def _run_batch(self, batch: List[_Request]):
        n = len(batch)
        padded = min(b for b in self.runner.ladder if b >= n) \
            if n <= max(self.runner.ladder) else max(self.runner.ladder)
        try:
            waves = np.zeros((padded, 2, self.runner.wave_len), np.float32)
            for i, req in enumerate(batch[:padded]):
                waves[i] = req.wave
            out = self.runner.run(waves)
            now = time.perf_counter()
            with self._lock:
                self.served += n
                self.batch_fill.append(n)
                for i, req in enumerate(batch[:padded]):
                    req.result = out[i]
                    self.latencies.append(now - req.t_enqueue)
                if len(self.latencies) > 65536:  # bounded stats windows
                    del self.latencies[:32768]
                    del self.batch_fill[:16384]
            for req in batch[:padded]:
                req.event.set()
            # overflow beyond the largest ladder size: requeue the tail
            for req in batch[padded:]:
                self.q.put(req)
        except Exception as e:  # propagate to every waiter
            for req in batch:
                req.error = e
                req.event.set()

    def stats(self) -> Dict[str, object]:
        with self._lock:
            lats = np.asarray(self.latencies[-4096:], np.float64)
            fills = self.batch_fill[-4096:]
            served = self.served
        out: Dict[str, object] = {
            "served": served,
            "queue_depth": self.q.qsize(),
            "ladder": self.runner.ladder,
        }
        if lats.size:
            out.update(
                p50_ms=round(float(np.percentile(lats, 50)) * 1e3, 3),
                p95_ms=round(float(np.percentile(lats, 95)) * 1e3, 3),
                p99_ms=round(float(np.percentile(lats, 99)) * 1e3, 3),
                mean_batch_fill=round(float(np.mean(fills)), 2),
            )
        return out


# ---------------------------------------------------------------------------
# HTTP server (stdlib; one collector thread owns the device)
# ---------------------------------------------------------------------------
def make_server(batcher: MicroBatcher, host: str, port: int):
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    runner = batcher.runner

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet; /stats is the observability
            pass

        def _send(self, code: int, body: bytes,
                  ctype: str = "application/octet-stream",
                  extra: Optional[Dict[str, str]] = None):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            for k, v in (extra or {}).items():
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, b"ok", "text/plain")
            elif self.path == "/stats":
                self._send(200, json.dumps(batcher.stats()).encode(),
                           "application/json")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            if self.path != "/predict":
                self._send(404, b"not found", "text/plain")
                return
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n)
            if n == 0 or n % 8 != 0:  # 2 channels x float32
                self._send(400, b"body must be float32 [2, L] bytes",
                           "text/plain")
                return
            wave = np.frombuffer(body, np.float32).reshape(2, -1)
            req = batcher.submit(runner.fix_length(wave.astype(np.float32)))
            req.event.wait()
            if req.error is not None:
                self._send(500, str(req.error).encode(), "text/plain")
                return
            depth = np.ascontiguousarray(req.result[..., 0], np.float32)
            self._send(200, depth.tobytes(),
                       extra={"X-Shape": f"{depth.shape[0]},{depth.shape[1]}"})

    return ThreadingHTTPServer((host, port), Handler)


# ---------------------------------------------------------------------------
# checkpoint → (cfg, task, params, batch_stats)
# ---------------------------------------------------------------------------
def load_serving_state(args):
    from ..configs import experiment_name, load_config
    from ..models import make_task

    from .common import model_shape_overrides

    overrides = model_shape_overrides(args)
    if args.compute_dtype:
        overrides["mode.compute_dtype"] = args.compute_dtype
    cfg = load_config(args.dataset, "test", args.experiment_name, args.model,
                      overrides=overrides)
    if cfg.model.input_nc != 2:
        raise SystemExit("serving is waveform→depth; image-input models "
                         "(rgb_depth / --eval_img baselines) are not servable")
    task = make_task(cfg)

    if args.torch_checkpoint:
        from ..tools import import_torch as itorch

        sd = itorch.load_torch_state_dict(args.torch_checkpoint)
        variables = itorch.import_for_config(cfg, sd)
        task.restore_aux(itorch.load_torch_aux(args.torch_checkpoint))
        return (cfg, task, variables["params"], variables.get("batch_stats"),
                f"torch:{args.torch_checkpoint}")

    if args.random_init:
        import jax

        from ..data.frontend import tof_cut_samples

        length = tof_cut_samples(cfg.dataset.max_depth, cfg.dataset.sample_rate)
        sz = cfg.dataset.images_size
        batch = {
            "waveform": np.zeros((1, 2, length), np.float32),
            "depth": np.zeros((1, sz, sz, 1), np.float32),
            "image": np.zeros((1, sz, sz, 3), np.float32),
        }
        variables = task.init(jax.random.PRNGKey(args.seed), batch)
        return (cfg, task, variables["params"], variables.get("batch_stats"),
                "random-init")

    from ..ckpt import CheckpointManager

    epoch_req = args.checkpoints
    ckpt_dir = args.ckpt_dir
    if args.checkpoint_path:
        path = os.path.abspath(args.checkpoint_path).rstrip("/")
        base = os.path.basename(path)
        if base.isdigit():
            epoch_req = int(base)
            path = os.path.dirname(path)
        ckpt_dir, exp = os.path.dirname(path), os.path.basename(path)
    else:
        exp = (experiment_name(cfg) if args.experiment_name == "default"
               else args.experiment_name)
    if args.use_best and epoch_req is None:
        epoch_req = "best"
    mgr = CheckpointManager(ckpt_dir, exp)
    try:
        params, batch_stats, aux, epoch = mgr.restore_eval(epoch=epoch_req)
    except FileNotFoundError:
        avail = sorted(mgr._mgr.all_steps() or [])
        raise SystemExit(f"checkpoint not found under {mgr.directory}; "
                         f"available epochs: {avail}")
    task.restore_aux(aux)
    return cfg, task, params, batch_stats, f"{exp}@{epoch}"


# ---------------------------------------------------------------------------
# load test: real HTTP round trips against the in-process server
# ---------------------------------------------------------------------------
def run_loadtest(port: int, runner: InferenceRunner, n_requests: int,
                 concurrency: int) -> Dict[str, object]:
    import urllib.request

    rng = np.random.default_rng(0)
    wave = (rng.standard_normal((2, runner.wave_len)) * 0.05).astype(np.float32)
    body = wave.tobytes()
    url = f"http://127.0.0.1:{port}/predict"
    lats: List[float] = []
    lock = threading.Lock()
    it = iter(range(n_requests))

    def worker():
        while True:
            with lock:
                try:
                    next(it)
                except StopIteration:
                    return
            t0 = time.perf_counter()
            req = urllib.request.Request(url, data=body, method="POST")
            with urllib.request.urlopen(req) as resp:
                _ = resp.read()
            dt = time.perf_counter() - t0
            with lock:
                lats.append(dt)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=worker) for _ in range(concurrency)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    arr = np.asarray(lats) * 1e3
    return {
        "requests": n_requests,
        "concurrency": concurrency,
        "throughput_rps": round(n_requests / wall, 2),
        "p50_ms": round(float(np.percentile(arr, 50)), 2),
        "p95_ms": round(float(np.percentile(arr, 95)), 2),
        "p99_ms": round(float(np.percentile(arr, 99)), 2),
    }


def main(argv=None):
    p = argparse.ArgumentParser(description="TPU audio-depth serving")
    p.add_argument("--dataset", default="batvisionv2",
                   choices=["batvisionv1", "batvisionv2", "synthetic"])
    p.add_argument("--model", default="unet_baseline")
    p.add_argument("--experiment_name", default="default")
    p.add_argument("--ckpt_dir", default="./checkpoints")
    p.add_argument("--checkpoint_path", default=None)
    p.add_argument("--checkpoints", type=int, default=None, help="epoch")
    p.add_argument("--use_best", action="store_true")
    p.add_argument("--torch_checkpoint", default=None,
                   help="serve a reference .pth directly (no retraining)")
    p.add_argument("--random_init", action="store_true",
                   help="serve an untrained model (smoke tests / latency "
                        "benchmarks without a checkpoint)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--compute_dtype", default=None,
                   choices=[None, "bfloat16", "float32"])
    from .common import add_model_shape_args

    add_model_shape_args(p)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8474)
    p.add_argument("--batch_ladder", default="1,4,16",
                   help="comma-separated batch sizes compiled at startup; "
                        "requests are micro-batched and padded to the "
                        "smallest fitting size")
    p.add_argument("--batch_wait_ms", type=float, default=2.0,
                   help="max time the collector waits to fill a batch")
    p.add_argument("--loadtest", type=int, default=0, metavar="N",
                   help="serve in-process, drive N HTTP requests, print a "
                        "latency/throughput JSON line, and exit")
    p.add_argument("--loadtest_concurrency", type=int, default=16)
    args = p.parse_args(argv)

    from ..compilation_cache import enable as _enable_compile_cache

    _enable_compile_cache()

    cfg, task, params, batch_stats, source = load_serving_state(args)
    ladder = [int(b) for b in str(args.batch_ladder).split(",") if b]
    runner = InferenceRunner(cfg, task, params, batch_stats, ladder=ladder)
    print(f"serving {cfg.model.name} ({source}); "
          f"wave_len={runner.wave_len}, out={runner.out_size}²; "
          f"compiling ladder {runner.ladder} ...")
    times = runner.warmup()
    print("compiled: " + ", ".join(f"bs={b} {t:.1f}s" for b, t in times.items()))

    batcher = MicroBatcher(runner, wait_ms=args.batch_wait_ms)
    server = make_server(batcher, args.host, args.port)
    port = server.server_address[1]

    if args.loadtest:
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        result = run_loadtest(port, runner, args.loadtest,
                              args.loadtest_concurrency)
        result["server_stats"] = batcher.stats()
        print(json.dumps(result))
        server.shutdown()
        batcher.stop()
        return result

    print(f"listening on http://{args.host}:{port}  "
          f"(POST /predict, GET /healthz, GET /stats)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        batcher.stop()


if __name__ == "__main__":
    main()
