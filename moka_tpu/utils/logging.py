"""Metrics logging + introspection.

Replaces the reference's HF-Trainer logging (``logging_steps 1``), rank-0
print/txt dumps (``utils/util.py:21-29``, ``finetune.py:163-179``), and
tensorboard/wandb reporting (``--report_to``) with: stdout lines, a JSONL
metrics stream, and optional TensorBoard events (via the baked-in
tensorflow, gated)."""

from __future__ import annotations

import json
import os

import jax
import numpy as np


def param_count(tree) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def param_report(tree) -> str:
    """Name/shape/count dump a la ``model_trainable_params.txt``."""
    lines = []
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    total = 0
    for path, leaf in flat:
        n = int(np.prod(leaf.shape)) if hasattr(leaf, "shape") else 0
        total += n
        lines.append(f"{jax.tree_util.keystr(path)}  "
                     f"{tuple(getattr(leaf, 'shape', ()))}  {n}")
    lines.append(f"TOTAL trainable params: {total}")
    return "\n".join(lines)


class MetricsLogger:
    def __init__(self, out_dir: str, enabled: bool = True,
                 tensorboard: bool = False):
        self.enabled = enabled
        self._jsonl = None
        self._tb = None
        if enabled:
            os.makedirs(out_dir, exist_ok=True)
            self._jsonl = open(os.path.join(out_dir, "metrics.jsonl"), "a")
            if tensorboard:
                try:
                    import tensorflow as tf
                    self._tb = tf.summary.create_file_writer(
                        os.path.join(out_dir, "tb"))
                except Exception:
                    self._tb = None

    def log(self, step: int, metrics: dict) -> None:
        if not self.enabled:
            return
        clean = {k: (float(v) if not isinstance(v, (str, int)) else v)
                 for k, v in metrics.items()}
        line = " ".join(f"{k}={v:.5g}" if isinstance(v, float) else
                        f"{k}={v}" for k, v in clean.items())
        print(f"[step {step}] {line}", flush=True)
        self._jsonl.write(json.dumps({"step": step, **clean}) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            import tensorflow as tf
            with self._tb.as_default():
                for k, v in clean.items():
                    if isinstance(v, float):
                        tf.summary.scalar(k, v, step=step)

    def close(self) -> None:
        if self._jsonl:
            self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
