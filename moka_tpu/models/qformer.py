"""BLIP-2 Q-Former (BERT with learnable queries + cross-attention).

Reference: ``AudioVisualText/models/Qformer.py`` (1,218 LoC vendored BLIP-2).
Only the pieces the projectors exercise are rebuilt (``BertLMHeadModel.bert``
called with ``query_embeds`` [+ optional question text], cross-attention every
layer — ``multimodal_encoder.py:102-160``):

  * embeddings: word+position embeds for text tokens, queries prepended raw,
    then LayerNorm (+dropout) over the concatenation (``Qformer.py:79-110``);
  * per layer: bidirectional self-attention over [queries; text], then
    cross-attention of the *query slice only* onto encoder features
    (``Qformer.py:431-446``), then a *separate* FFN for the query slice vs
    the text slice (``Qformer.py:451-464``);
  * post-LN residuals (BertSelfOutput/BertOutput: dense -> dropout ->
    LN(x + residual)).

Trainable (it is the projector backbone), so written with stacked-layer
params + ``lax.scan`` for fast compiles and cheap remat.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class QFormerConfig:
    hidden: int = 768
    n_layers: int = 2
    n_heads: int = 12
    intermediate: int = 3072
    encoder_width: int = 1408        # cross-attention key/value input dim
    vocab_size: int = 30522
    max_positions: int = 512
    ln_eps: float = 1e-12
    num_query_tokens: int = 32
    initializer_range: float = 0.02


def _linear(rng, d_in, d_out, std):
    return {"w": jax.random.normal(rng, (d_in, d_out), jnp.float32) * std,
            "b": jnp.zeros((d_out,), jnp.float32)}


def init_qformer_params(rng: Array, cfg: QFormerConfig) -> dict:
    std = cfg.initializer_range
    n, h, i, ew = cfg.n_layers, cfg.hidden, cfg.intermediate, cfg.encoder_width
    ks = list(jax.random.split(rng, 20))

    def stack(maker):
        outs = [maker(k) for k in jax.random.split(ks.pop(), n)]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *outs)

    layers = {
        "attn_q": stack(lambda k: _linear(k, h, h, std)),
        "attn_k": stack(lambda k: _linear(k, h, h, std)),
        "attn_v": stack(lambda k: _linear(k, h, h, std)),
        "attn_out": stack(lambda k: _linear(k, h, h, std)),
        "attn_ln": stack(lambda k: {"g": jnp.ones((h,)), "b": jnp.zeros((h,))}),
        "cross_q": stack(lambda k: _linear(k, h, h, std)),
        "cross_k": stack(lambda k: _linear(k, ew, h, std)),
        "cross_v": stack(lambda k: _linear(k, ew, h, std)),
        "cross_out": stack(lambda k: _linear(k, h, h, std)),
        "cross_ln": stack(lambda k: {"g": jnp.ones((h,)), "b": jnp.zeros((h,))}),
        "ffn_q_in": stack(lambda k: _linear(k, h, i, std)),
        "ffn_q_out": stack(lambda k: _linear(k, i, h, std)),
        "ffn_q_ln": stack(lambda k: {"g": jnp.ones((h,)), "b": jnp.zeros((h,))}),
        "ffn_t_in": stack(lambda k: _linear(k, h, i, std)),
        "ffn_t_out": stack(lambda k: _linear(k, i, h, std)),
        "ffn_t_ln": stack(lambda k: {"g": jnp.ones((h,)), "b": jnp.zeros((h,))}),
    }
    return {
        "word_embed": jax.random.normal(ks.pop(), (cfg.vocab_size, h)) * std,
        "pos_embed": jax.random.normal(ks.pop(), (cfg.max_positions, h)) * std,
        "embed_ln": {"g": jnp.ones((h,)), "b": jnp.zeros((h,))},
        "query_tokens": jax.random.normal(ks.pop(),
                                          (cfg.num_query_tokens, h)) * std,
        "layers": layers,
    }


def _ln(x, p, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.var(xf, -1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]).astype(x.dtype)


def _dense(x, p):
    return jnp.einsum("...d,df->...f", x, p["w"]) + p["b"]


def _bert_attention(x_q, x_kv, mask_bias, p_q, p_k, p_v, p_out, p_ln,
                    n_heads, eps):
    """Post-LN BERT attention block. mask_bias: (b, 1, Lq, Lk) additive."""
    b, Lq, h = x_q.shape
    hd = h // n_heads
    q = _dense(x_q, p_q).reshape(b, Lq, n_heads, hd)
    k = _dense(x_kv, p_k).reshape(b, -1, n_heads, hd)
    v = _dense(x_kv, p_v).reshape(b, -1, n_heads, hd)
    scores = jnp.einsum("bqnh,bknh->bnqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores / jnp.sqrt(jnp.float32(hd))
    if mask_bias is not None:
        scores = scores + mask_bias
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    ctx = jnp.einsum("bnqk,bknh->bqnh", probs.astype(v.dtype), v)
    ctx = ctx.reshape(b, Lq, h)
    return _ln(_dense(ctx, p_out) + x_q, p_ln, eps)


def qformer_encode(params: dict, cfg: QFormerConfig, encoder_states: Array,
                   encoder_mask: Array | None = None,
                   text_ids: Array | None = None,
                   text_mask: Array | None = None) -> Array:
    """Run queries (+ optional question text) through the Q-Former.

    encoder_states: (b, S, encoder_width) visual/audio features.
    Returns (b, num_query_tokens, hidden) — the query slice of the last
    hidden state (callers take ``[:, :num_query]``, multimodal_encoder.py:163).
    """
    b, S, _ = encoder_states.shape
    nq = cfg.num_query_tokens
    queries = jnp.broadcast_to(params["query_tokens"][None],
                               (b, nq, cfg.hidden))
    if text_ids is not None:
        Lt = text_ids.shape[1]
        text = jnp.take(params["word_embed"], text_ids, axis=0)
        text = text + params["pos_embed"][:Lt][None]
        x = jnp.concatenate([queries, text], axis=1)
        if text_mask is None:
            text_mask = jnp.ones((b, Lt), jnp.int32)
        self_mask = jnp.concatenate(
            [jnp.ones((b, nq), jnp.int32), text_mask.astype(jnp.int32)], axis=1)
    else:
        x = queries
        self_mask = jnp.ones((b, nq), jnp.int32)
    x = _ln(x, params["embed_ln"], cfg.ln_eps)

    self_bias = jnp.where(self_mask[:, None, None, :] > 0, 0.0, -1e30)
    if encoder_mask is None:
        cross_bias = None
    else:
        cross_bias = jnp.where(encoder_mask[:, None, None, :] > 0, 0.0, -1e30)

    def layer(x, p):
        x = _bert_attention(x, x, self_bias, p["attn_q"], p["attn_k"],
                            p["attn_v"], p["attn_out"], p["attn_ln"],
                            cfg.n_heads, cfg.ln_eps)
        xq, xt = x[:, :nq], x[:, nq:]
        xq = _bert_attention(xq, encoder_states, cross_bias, p["cross_q"],
                             p["cross_k"], p["cross_v"], p["cross_out"],
                             p["cross_ln"], cfg.n_heads, cfg.ln_eps)
        # separate FFNs for query vs text slices (Qformer.py:451-464)
        hq = jax.nn.gelu(_dense(xq, p["ffn_q_in"]), approximate=False)
        xq = _ln(_dense(hq, p["ffn_q_out"]) + xq, p["ffn_q_ln"], cfg.ln_eps)
        if xt.shape[1]:
            ht = jax.nn.gelu(_dense(xt, p["ffn_t_in"]), approximate=False)
            xt = _ln(_dense(ht, p["ffn_t_out"]) + xt, p["ffn_t_ln"],
                     cfg.ln_eps)
        x = jnp.concatenate([xq, xt], axis=1)
        return x, None

    x, _ = jax.lax.scan(layer, x, params["layers"])
    return x[:, :nq]
