"""Multi-head attention with GQA, fp32 softmax, additive bias.

Reference: eager attention in ``AudioVisualText/models/modeling_llama.py:
294-400`` (fp32 softmax at :367, ``repeat_kv`` GQA at :229-238).  Written as
one einsum-pair so XLA tiles it onto the MXU; sequence lengths here are
~1k (10 frames x 32 + 10 audio segments x 32 + text), where a hand-rolled
flash kernel buys nothing — the whole score matrix fits in VMEM.  A Pallas
flash path can slot in behind the same signature for long-context work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

NEG_INF = -1e30  # large-but-finite: keeps fully-masked rows NaN-free


def causal_bias(attn_mask: Array, q_len: int, kv_len: int,
                q_offset: Array | int = 0) -> Array:
    """Additive (b, 1, q_len, kv_len) bias: causal + padding.

    attn_mask: (b, kv_len) 0/1 valid-key mask.
    q_offset: position of the first query within the kv axis (decode steps
    pass the current cache length).
    """
    q_pos = jnp.arange(q_len)[:, None] + q_offset
    k_pos = jnp.arange(kv_len)[None, :]
    causal = q_pos >= k_pos  # (q, kv)
    ok = causal[None, :, :] & (attn_mask[:, None, :] > 0)
    return jnp.where(ok, 0.0, NEG_INF)[:, None, :, :].astype(jnp.float32)


def mha(q: Array, k: Array, v: Array, bias: Array) -> Array:
    """q: (b, L, H, hd); k/v: (b, S, K, hd) with H = K * G; bias (b,1,L,S).

    Returns (b, L, H, hd).  Softmax in fp32 (modeling_llama.py:367).
    """
    b, L, H, hd = q.shape
    S, K = k.shape[1], k.shape[2]
    G = H // K
    qg = q.reshape(b, L, K, G, hd)
    scale = 1.0 / jnp.sqrt(jnp.float32(hd))
    scores = jnp.einsum("blkgh,bskh->bkgls", qg, k,
                        preferred_element_type=jnp.float32) * scale
    scores = scores + bias[:, :, None, :, :]  # (b,K,G,L,S), bias (b,1,1,L,S)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bkgls,bskh->blkgh", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.reshape(b, L, H, hd).astype(q.dtype)
