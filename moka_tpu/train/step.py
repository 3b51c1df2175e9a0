"""Generic adapter-training step.

The split of parameters into (trainable, frozen) pytrees IS the ZeRO design
here: the loss differentiates only the trainable tree, so XLA never
materializes base-weight gradients (reference freezes via requires_grad,
``lora.py:333``, ``finetune.py:151-160``); frozen params stay sharded over
the ``fsdp`` axis and are all-gathered per layer by XLA; the few-MB adapter
grads all-reduce over ICI automatically.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: Array
    params: Any           # trainable pytree (fp32 master)
    opt_state: Any
    rng: Array


def init_train_state(params, tx: optax.GradientTransformation,
                     rng: Array) -> TrainState:
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params), rng=rng)


def make_train_step(loss_fn: Callable, tx: optax.GradientTransformation,
                    donate: bool = True, grad_taps: Callable | None = None):
    """loss_fn(trainable, frozen, batch, rng) -> (loss, metrics_dict).

    grad_taps(grads) -> small pytree surfaced as metrics["grad_taps"]
    (e.g. AdaLoRA lam cotangents for the rank allocator).
    Returns jitted step(state, frozen, batch) -> (state, metrics)."""

    def step(state: TrainState, frozen, batch):
        rng, sub = jax.random.split(state.rng)
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, frozen, batch, sub)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        if grad_taps is not None:
            metrics["grad_taps"] = grad_taps(grads)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state, rng=rng)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())
