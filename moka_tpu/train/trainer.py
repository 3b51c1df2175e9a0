"""Training loop: the ~200-line replacement for HF Trainer + DeepSpeed engine
+ UnifiedTrainer (``AudioVisualText/trainer.py``).

Covers the reference behaviors that matter (SURVEY.md §2.12, §5):
per-step metrics logging (``logging_steps 1``), periodic adapter-only
checkpoints with auto-resume, final split torch export, config snapshot,
rank-0 gating, introspection dumps (trainable param names/counts a la
``model_trainable_params.txt``), optional modality-grouped batching
(``trainer.py:91-160``), and ``jax.profiler`` tracing in place of
``wall_clock_breakdown``."""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Callable, Iterable

import jax
import numpy as np

from moka_tpu.core.config import TrainConfig, dump_config
from moka_tpu.train import checkpoint as ckpt
from moka_tpu.train.optim import make_optimizer
from moka_tpu.train.step import TrainState, init_train_state, make_train_step
from moka_tpu.utils.logging import MetricsLogger, param_report


def grouped_indices(lengths: list[int], group_key: list,
                    batch_size: int, seed: int,
                    drop_remainder: bool = False) -> list[int]:
    """Modality/length-grouped shuffle (UnifiedTrainer sampler,
    ``trainer.py:91-160``): shuffle within modality groups, emit batches of
    same-group samples in random batch order.

    drop_remainder=True drops each group's ragged tail so every consecutive
    ``batch_size`` chunk of the flattened order is single-group (required
    when the caller re-chunks the flat list)."""
    rng = np.random.default_rng(seed)
    groups: dict = {}
    for i, key in enumerate(group_key):
        groups.setdefault(key, []).append(i)
    batches = []
    for idxs in groups.values():
        idxs = list(rng.permutation(idxs))
        # length-sorted megabatches for padding efficiency
        idxs.sort(key=lambda i: lengths[i])
        group_batches = [idxs[i:i + batch_size]
                         for i in range(0, len(idxs), batch_size)]
        if drop_remainder and group_batches and                 len(group_batches[-1]) < batch_size:
            group_batches.pop()
        batches.extend(group_batches)
    rng.shuffle(batches)
    return [i for b in batches for i in b]


def host_sharded_order(lengths: list[int], group_key: list,
                       global_batch: int, rank: int, world: int,
                       seed: int) -> list[int]:
    """Multi-host data sharding without a sampler service: every host draws
    the SAME global grouped order (same seed), then keeps only its stride of
    each global batch.  The union of all hosts' slices is exactly the global
    order and the slices are disjoint (tested in test_trainer.py)."""
    per_host = global_batch // world
    order = grouped_indices(lengths, group_key, global_batch, seed=seed,
                            drop_remainder=True)
    return [int(j) for i in
            range(0, len(order) - global_batch + 1, global_batch)
            for j in order[i + rank * per_host: i + (rank + 1) * per_host]]


class Trainer:
    def __init__(self, loss_fn: Callable, trainable, frozen,
                 cfg: TrainConfig, total_steps: int,
                 full_config=None):
        try:  # persistent compile cache: restarts resume without recompiling
            jax.config.update("jax_compilation_cache_dir",
                              os.path.expanduser("~/.cache/moka_jax"))
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              10)
        except Exception:
            pass
        self.cfg = cfg
        self.frozen = frozen
        self.tx = make_optimizer(cfg, total_steps)
        taps = None
        if cfg.adalora_budget > 0:
            from moka_tpu.adapters.peft import adalora_grad_taps
            taps = adalora_grad_taps
        self.step_fn = make_train_step(loss_fn, self.tx, grad_taps=taps)
        key = jax.random.key(cfg.seed) if cfg.rng_impl is None else \
            jax.random.key(cfg.seed, impl=cfg.rng_impl)
        self.state = init_train_state(trainable, self.tx, key)
        self.total_steps = total_steps
        # fractional save_steps = fraction of total steps (the reference
        # recipe uses --save_steps 0.1, ft_musicavqa.sh)
        self.save_every = cfg.save_every_steps
        if 0 < self.save_every < 1:
            self.save_every = max(int(total_steps * self.save_every), 1)
        self.save_every = int(self.save_every)
        self.out_dir = cfg.output_dir
        self.is_main = jax.process_index() == 0
        if self.is_main:
            os.makedirs(self.out_dir, exist_ok=True)
            dump_config(full_config if full_config is not None else cfg,
                        os.path.join(self.out_dir, "saved_config.json"))
            # introspection dump (finetune.py:163-179 equivalent)
            with open(os.path.join(self.out_dir,
                                   "model_trainable_params.txt"), "w") as f:
                f.write(param_report(trainable))
        self.logger = MetricsLogger(self.out_dir, enabled=self.is_main)
        self._maybe_resume()

    def _maybe_resume(self) -> None:
        ckpt_dir = os.path.join(self.out_dir, "checkpoints")
        last = ckpt.latest_step(ckpt_dir)
        if last is not None:
            self.state = ckpt.restore(ckpt_dir, self.state)
            if self.is_main:
                print(f"[trainer] resumed from step {last}")

    def train(self, batches: Iterable[dict],
              profile_steps: tuple[int, int] | None = None,
              eval_fn: Callable | None = None,
              eval_every_steps: int = 0) -> TrainState:
        """eval_fn(state) -> metrics dict, run every ``eval_every_steps``
        (the reference relies on HF Trainer's evaluation loop; most of its
        recipes never enable it, but the hook exists here for parity)."""
        t0 = time.perf_counter()
        for batch in batches:
            step = int(self.state.step)
            if step >= self.total_steps:
                break
            if profile_steps and step == profile_steps[0] and self.is_main:
                jax.profiler.start_trace(os.path.join(self.out_dir, "trace"))
            self.state, metrics = self.step_fn(self.state, self.frozen,
                                               batch)
            step += 1
            taps = metrics.pop("grad_taps", None)
            if taps is not None and \
                    step % self.cfg.adalora_update_every == 0:
                # AdaLoRA schedule step: re-allocate the global rank budget
                # from this step's sensitivity scores (RankAllocator
                # equivalent, reference tuners/adalora)
                from moka_tpu.adapters.peft import adalora_update_masks
                self.state = dataclasses.replace(
                    self.state, params=adalora_update_masks(
                        self.state.params, jax.device_get(taps),
                        self.cfg.adalora_budget))
            if profile_steps and step == profile_steps[1] and self.is_main:
                jax.block_until_ready(metrics["loss"])
                jax.profiler.stop_trace()
            if step % self.cfg.log_every == 0:
                metrics = {k: float(v) for k, v in metrics.items()}
                dt = time.perf_counter() - t0
                t0 = time.perf_counter()
                metrics["step_time_s"] = dt / self.cfg.log_every
                self.logger.log(step, metrics)
            if eval_fn is not None and eval_every_steps and \
                    step % eval_every_steps == 0:
                em = {f"eval_{k}": float(v)
                      for k, v in eval_fn(self.state).items()}
                self.logger.log(step, em)
            if self.save_every and step % self.save_every == 0 and \
                    self.is_main:
                ckpt.save(os.path.join(self.out_dir, "checkpoints"),
                          self.state)
        return self.state

    def finalize(self, stage1: bool = False) -> None:
        """Final split save (adapter_model.bin + non_lora_trainables.bin
        equivalents) + last orbax checkpoint.  ``stage1`` selects the
        reference's stage-1 (unwrapped ``model.``) key prefixes."""
        if not self.is_main:
            return
        ckpt.save(os.path.join(self.out_dir, "checkpoints"), self.state)
        ckpt.export_torch_artifacts(self.out_dir, self.state.params,
                                    stage1=stage1)
        self.logger.close()
