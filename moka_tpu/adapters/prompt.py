"""Prompt tuning and prefix tuning (the remaining vendored-PEFT tuner
families the reference carries: ``peft_hyper/tuners/{prompt_tuning,
prefix_tuning, p_tuning}`` and the stock 0.11.1 equivalents).

Both compose with the existing decoder without modifying it:
  * prompt tuning — learnable soft-prompt embeddings prepended to
    ``inputs_embeds`` (+ mask/label extension helpers);
  * prefix tuning — learnable per-layer key/value prefixes materialized as a
    pre-filled KV cache (``llama.init_kv_cache`` layout), so the decoder's
    cached-attention path serves as the prefix injection point; the prefix
    arrays are inputs to the jitted step and gradients flow through the
    cache naturally.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from moka_tpu.core.config import LlamaConfig

Array = jax.Array
IGNORE = -100


# -------------------------------------------------------- prompt tuning --

def init_soft_prompt(rng: Array, cfg: LlamaConfig, n_tokens: int,
                     embed_table: Array | None = None) -> Array:
    """(n_tokens, dim); sampled from the vocab embedding when provided
    (PEFT's TEXT init) else normal(0.02)."""
    if embed_table is not None:
        idx = jax.random.randint(rng, (n_tokens,), 0, embed_table.shape[0])
        return jnp.take(embed_table, idx, axis=0).astype(jnp.float32)
    return jax.random.normal(rng, (n_tokens, cfg.dim)) * 0.02


def apply_soft_prompt(prompt: Array, inputs_embeds: Array,
                      attn_mask: Array | None = None,
                      labels: Array | None = None,
                      positions: Array | None = None):
    """Prepend the soft prompt; returns (embeds, attn_mask, labels,
    positions) with every aux array extended consistently."""
    b, L, d = inputs_embeds.shape
    n = prompt.shape[0]
    pre = jnp.broadcast_to(prompt[None].astype(inputs_embeds.dtype),
                           (b, n, d))
    embeds = jnp.concatenate([pre, inputs_embeds], axis=1)
    if attn_mask is not None:
        attn_mask = jnp.concatenate(
            [jnp.ones((b, n), attn_mask.dtype), attn_mask], axis=1)
    if labels is not None:
        labels = jnp.concatenate(
            [jnp.full((b, n), IGNORE, labels.dtype), labels], axis=1)
    if positions is not None:
        positions = jnp.concatenate(
            [jnp.broadcast_to(jnp.arange(n), (b, n)), positions + n], axis=1)
    return embeds, attn_mask, labels, positions


# -------------------------------------------------------- prefix tuning --

def init_prefix(rng: Array, cfg: LlamaConfig, n_prefix: int) -> dict:
    """Per-layer learnable k/v prefixes: (n_layers, n_prefix, kv_heads, hd)."""
    shape = (cfg.n_layers, n_prefix, cfg.n_kv_heads, cfg.head_dim)
    k1, k2 = jax.random.split(rng)
    return {"k": jax.random.normal(k1, shape) * 0.02,
            "v": jax.random.normal(k2, shape) * 0.02}


def prefix_cache(prefix: dict, cfg: LlamaConfig, batch: int, max_len: int,
                 dtype=jnp.float32) -> tuple[dict, Array]:
    """KV cache of size (n_prefix + max_len) pre-filled with the prefix.

    Returns (cache, base_attn_mask) where the mask covers the prefix slots;
    callers concatenate their token mask after it."""
    n = prefix["k"].shape[1]
    total = n + max_len
    shape = (cfg.n_layers, batch, total, cfg.n_kv_heads, cfg.head_dim)
    k = jnp.zeros(shape, dtype).at[:, :, :n].set(
        jnp.broadcast_to(prefix["k"][:, None].astype(dtype),
                         (cfg.n_layers, batch, n, cfg.n_kv_heads,
                          cfg.head_dim)))
    v = jnp.zeros(shape, dtype).at[:, :, :n].set(
        jnp.broadcast_to(prefix["v"][:, None].astype(dtype),
                         (cfg.n_layers, batch, n, cfg.n_kv_heads,
                          cfg.head_dim)))
    cache = {"k": k, "v": v, "length": jnp.asarray(n, jnp.int32)}
    prefix_mask = jnp.ones((batch, n), jnp.int32)
    return cache, prefix_mask


# ----------------------------------------------------------- p-tuning ----

def init_ptuning_encoder(rng: Array, cfg: LlamaConfig, n_tokens: int,
                         hidden: int = 128) -> dict:
    """P-tuning: virtual-token embeddings reparametrized through a 2-layer
    MLP prompt encoder (reference tuners/p_tuning)."""
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "virtual": jax.random.normal(k1, (n_tokens, hidden)) * 0.02,
        "w1": jax.random.normal(k2, (hidden, hidden)) * 0.02,
        "b1": jnp.zeros((hidden,)),
        "w2": jax.random.normal(k3, (hidden, cfg.dim)) * 0.02,
        "b2": jnp.zeros((cfg.dim,)),
    }


def ptuning_prompt(p: dict) -> Array:
    """-> (n_tokens, dim) soft prompt (use with ``apply_soft_prompt``)."""
    h = jnp.tanh(p["virtual"] @ p["w1"] + p["b1"])
    return h @ p["w2"] + p["b2"]


# ---------------------------------------------------------- ln-tuning ----

def ln_tuning_split(base: dict) -> tuple[dict, dict]:
    """LN tuning (reference tuners/ln_tuning): make ONLY the norm scales
    trainable.  Returns (trainable_norms, frozen_rest); recombine with
    ``ln_tuning_merge`` inside the loss."""
    trainable = {
        "attn_norm": base["layers"]["attn_norm"],
        "mlp_norm": base["layers"]["mlp_norm"],
        "final_norm": base["final_norm"],
    }
    return trainable, base


def ln_tuning_merge(trainable_norms: dict, frozen_base: dict) -> dict:
    layers = dict(frozen_base["layers"])
    layers["attn_norm"] = trainable_norms["attn_norm"]
    layers["mlp_norm"] = trainable_norms["mlp_norm"]
    out = dict(frozen_base)
    out["layers"] = layers
    out["final_norm"] = trainable_norms["final_norm"]
    return out
