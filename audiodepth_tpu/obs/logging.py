"""Metrics sink: stdout + JSONL + optional wandb, plus throughput counters.

Covers the reference's observability surface (SURVEY §5): per-epoch
train/loss, val/{loss,rmse,abs_rel,log10,delta1-3,mae}, epoch wall time
(train.py:716-721), wandb project logging (train.py:484-569) — degraded
gracefully to stdout+JSONL when wandb is absent — and adds what the
reference lacked: steps/sec and spectrogram-pairs/sec/chip counters and a
jax.profiler trace hook.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

import jax


class MetricLogger:
    def __init__(
        self,
        log_dir: Optional[str] = None,
        experiment_name: str = "default",
        use_wandb: bool = False,
        wandb_project: str = "batvision-depth-estimation",
        config: Optional[Dict[str, Any]] = None,
        wandb_entity: Optional[str] = None,
        wandb_mode: Optional[str] = None,
    ):
        self.experiment_name = experiment_name
        self._jsonl = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._jsonl = open(os.path.join(log_dir, f"{experiment_name}.jsonl"), "a")
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                if getattr(wandb, "run", None) is not None:
                    # a run already exists (cli/train.py's sweep-style early
                    # init): adopt it — a second wandb.init is ignored by an
                    # active run, which would drop the experiment name/config
                    wandb.run.name = experiment_name
                    if config:
                        wandb.config.update(config, allow_val_change=True)
                    self._wandb = wandb.run
                else:
                    init_kwargs: Dict[str, Any] = {
                        "project": wandb_project, "name": experiment_name,
                        "config": config or {},
                    }
                    if wandb_entity:
                        init_kwargs["entity"] = wandb_entity
                    if wandb_mode:
                        init_kwargs["mode"] = wandb_mode
                    self._wandb = wandb.init(**init_kwargs)
            except Exception as e:  # wandb absent or offline: degrade
                print(f"[obs] wandb unavailable ({e}); logging to stdout/jsonl only")

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None) -> None:
        record = {"step": step, **{k: _to_py(v) for k, v in metrics.items()}}
        parts = " ".join(
            f"{k}={v:.4f}" if isinstance(v, float) else f"{k}={v}"
            for k, v in record.items() if v is not None
        )
        print(f"[{self.experiment_name}] {parts}", flush=True)
        if self._jsonl:
            self._jsonl.write(json.dumps(record) + "\n")
            self._jsonl.flush()
        if self._wandb:
            self._wandb.log({k: v for k, v in record.items() if k != "step"}, step=step)

    def log_image(self, tag: str, image_path: str,
                  step: Optional[int] = None) -> None:
        """wandb.Image logging of a saved visualization PNG
        (train.py:861-871 parity). JSONL records the file path so offline
        runs keep a pointer to the artifact."""
        if self._jsonl:
            self._jsonl.write(json.dumps({"step": step, tag: image_path}) + "\n")
            self._jsonl.flush()
        if self._wandb:
            import wandb

            self._wandb.log({tag: wandb.Image(image_path)}, step=step)

    def close(self):
        if self._jsonl:
            self._jsonl.close()
        if self._wandb:
            self._wandb.finish()


def _to_py(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return v


class Timer:
    """Epoch/step timing + pairs/sec/chip throughput counters."""

    def __init__(self):
        self._t0 = None
        self.elapsed = 0.0

    def start(self):
        self._t0 = time.perf_counter()
        return self

    def stop(self) -> float:
        self.elapsed = time.perf_counter() - self._t0
        return self.elapsed

    @staticmethod
    def throughput(samples: int, seconds: float) -> Dict[str, float]:
        chips = max(jax.device_count(), 1)
        return {
            "samples_per_sec": samples / max(seconds, 1e-9),
            "pairs_per_sec_per_chip": samples / max(seconds, 1e-9) / chips,
        }


class ProfilerHook:
    """jax.profiler trace around a window of steps."""

    def __init__(self, log_dir: str = "/tmp/adepth_profile"):
        self.log_dir = log_dir
        self._active = False

    def start(self):
        jax.profiler.start_trace(self.log_dir)
        self._active = True

    def stop(self):
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
