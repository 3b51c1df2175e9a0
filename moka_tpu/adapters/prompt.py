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

import math

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


# -------------------------------------------- multitask prompt tuning ----

def init_multitask_prompt(rng: Array, cfg: LlamaConfig, n_tokens: int,
                          n_tasks: int,
                          embed_table: Array | None = None) -> dict:
    """Shared soft prompt + per-task rank-1 hadamard factors
    (``modified_peft/tuners/multitask_prompt_tuning``): the task prompt is
    ``shared * (task_col @ task_row)``.  Factors init at 1 (identity
    modulation), matching upstream's RANDOM init path."""
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "prompt": init_soft_prompt(k1, cfg, n_tokens, embed_table),
        "task_cols": jnp.ones((n_tasks, n_tokens, 1), jnp.float32),
        "task_rows": jnp.ones((n_tasks, 1, cfg.dim), jnp.float32),
    }


def multitask_prompt(p: dict, task_ids: Array) -> Array:
    """(b, n_tokens, dim) per-sample prompts —
    ``MultitaskPromptEmbedding.forward``."""
    cols = p["task_cols"][task_ids]          # (b, n, 1)
    rows = p["task_rows"][task_ids]          # (b, 1, d)
    return p["prompt"][None] * jnp.matmul(cols, rows)


def apply_multitask_prompt(p: dict, task_ids: Array, inputs_embeds: Array,
                           attn_mask: Array | None = None,
                           labels: Array | None = None,
                           positions: Array | None = None):
    """Per-sample (batched) variant of ``apply_soft_prompt``."""
    b, L, d = inputs_embeds.shape
    pre = multitask_prompt(p, task_ids).astype(inputs_embeds.dtype)
    n = pre.shape[1]
    embeds = jnp.concatenate([pre, inputs_embeds], axis=1)
    if attn_mask is not None:
        attn_mask = jnp.concatenate(
            [jnp.ones((b, n), attn_mask.dtype), attn_mask], axis=1)
    if labels is not None:
        labels = jnp.concatenate(
            [jnp.full((b, n), IGNORE, labels.dtype), labels], axis=1)
    if positions is not None:
        positions = jnp.concatenate(
            [jnp.broadcast_to(jnp.arange(n), (b, n)), positions + n],
            axis=1)
    return embeds, attn_mask, labels, positions


# ------------------------------------------------- adaption prompt -------

def init_adaption_prompt(rng: Array, cfg: LlamaConfig, adapter_len: int,
                         adapter_layers: int) -> dict:
    """LLaMA-Adapter (``modified_peft/tuners/adaption_prompt``, also in the
    AVT ``peft_hyper/tuners/adaption_prompt.py``): per adapted layer, a
    learnable prompt of ``adapter_len`` tokens (standard-normal init) and a
    zero-init gate.  Applied to the TOP ``adapter_layers`` layers."""
    return {
        "prompt": jax.random.normal(
            rng, (adapter_layers, adapter_len, cfg.dim)),
        "gate": jnp.zeros((adapter_layers,), jnp.float32),
    }


def adaption_prompt_delta(q: Array, prompt: Array, gate: Array,
                          k_w: Array, v_w: Array, o_w: Array) -> Array:
    """The additive attention output of one adapted layer
    (``adaption_prompt/layer.py`` AdaptedAttention.forward):

      k_a = k_proj(prompt); v_a = v_proj(prompt)     (NO RoPE — the prompt
                                                      is position-free)
      out += o_proj( gate * softmax(q k_a^T / sqrt(hd)) v_a )

    q: (b, L, H, hd) ROTATED query states (upstream recomputes them with
    positions applied); k_w/v_w: (dim, K*hd); o_w: (H*hd, dim);
    prompt: (adapter_len, dim); gate: scalar.  Returns (b, L, dim)."""
    b, L, H, hd = q.shape
    al = prompt.shape[0]
    k_a = (prompt @ k_w).reshape(al, -1, hd)        # (al, K, hd)
    v_a = (prompt @ v_w).reshape(al, -1, hd)
    K = k_a.shape[1]
    G = H // K
    k_a = jnp.repeat(k_a, G, axis=1)                # GQA -> (al, H, hd)
    v_a = jnp.repeat(v_a, G, axis=1)
    s = jnp.einsum("blhd,ahd->bhla", q, k_a,
                   preferred_element_type=jnp.float32) / math.sqrt(hd)
    probs = gate * jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhla,ahd->blhd", probs.astype(q.dtype), v_a)
    return out.reshape(b, L, H * hd) @ o_w
