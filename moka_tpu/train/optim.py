"""Optimizer: AdamW (fp32 state) + cosine schedule with warmup + global-norm
clipping.

Replaces the reference's DeepSpeed CPU-offloaded Adam
(``AudioVisualText/deepspeed/stage2-offload.json:37-48``) — on TPU the
trainable set is only adapters + projectors (a few hundred MB at most), so
the optimizer state lives comfortably in HBM and the offload machinery
disappears.  Recipe parity: lr 1e-4 cosine, warmup ratio, grad clip 1.0
(``ft_musicavqa.sh:24-75``, HF TrainingArguments defaults).
"""

from __future__ import annotations

import optax

from moka_tpu.core.config import TrainConfig


def make_schedule(cfg: TrainConfig, total_steps: int):
    warmup = max(int(total_steps * cfg.warmup_ratio), 0)
    if cfg.lr_schedule == "cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=cfg.learning_rate,
            warmup_steps=max(warmup, 1), decay_steps=max(total_steps, 2),
            end_value=0.0)
    if cfg.lr_schedule == "linear":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, cfg.learning_rate, max(warmup, 1)),
             optax.linear_schedule(cfg.learning_rate, 0.0,
                                   max(total_steps - warmup, 1))],
            [warmup])
    if cfg.lr_schedule == "constant":
        return optax.constant_schedule(cfg.learning_rate)
    raise ValueError(cfg.lr_schedule)


def make_optimizer(cfg: TrainConfig, total_steps: int) -> optax.GradientTransformation:
    sched = make_schedule(cfg, total_steps)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(sched, b1=cfg.adam_b1, b2=cfg.adam_b2, eps=cfg.adam_eps,
                    weight_decay=cfg.weight_decay),
    )
    if cfg.grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum)
    return tx
