"""Length-aware decode attention (flash-decoding style block loop).

The decode hot loop attends one new token against the KV cache.  The plain
path reads the ENTIRE static cache every layer every step; here the KV
block loop runs with a dynamic trip count ``cdiv(length, block)`` — a
``lax.fori_loop`` whose body ``dynamic_slice``s one KV block from HBM and
folds it into an online softmax — so HBM traffic scales with the *valid*
cache prefix, not the allocated maximum, and blocks beyond the current
position are never read at all.

Why plain XLA and not a Pallas kernel: three structural variants of a
manual-DMA Pallas kernel (single-buffered, double-buffered with dynamic
slots, statically unrolled with predicated fetches — see git history)
all measured a length-INDEPENDENT ~1.7 ms per grid program on the v5e,
dominated by a fixed per-program cost in the remote-compiled manual-DMA
path rather than by traffic or compute; a DMA-only probe kernel showed the
same.  The XLA loop below hits the same traffic goal (skip invalid blocks)
with none of that overhead: ``dynamic_slice`` inside the loop reads only
the addressed block, and XLA pipelines the loads against the per-block
einsums.

The cache stays in its layer-stacked (N, B, S, K, hd) layout — the layer
index is a traced scalar (``dynamic_slice`` on the leading axis reads only
that layer's block), so one compiled body serves every layer of the decode
fori_loop.  S must be a multiple of ``block_k`` (the caller rounds the
allocation up; tail slots are masked by ``attn_mask``/``length``).

Forward-only (decode never differentiates).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

NEG_INF = -1e30


def paged_decode_attention(q, cache_k, cache_v, attn_mask, layer_idx,
                           length, *, block_k: int = 256,
                           interpret: bool = False):
    """q: (B, 1, H, hd) single-token queries; cache_k/v: (N, B, S, K, hd)
    layer-stacked HBM cache — either plain arrays or int8 dicts
    ``{"q": int8 (N,B,S,K,hd), "s": fp32 (N,B,S,K,1)}`` (``init_kv_cache``
    quantized layout; the block loop then reads HALF the cache bytes and
    folds the per-(token, head) scales into the score/value accumulators);
    attn_mask: (B, S) validity; layer_idx, length: scalars (current layer,
    valid slots incl. the token just written).

    ``interpret`` is accepted for API compatibility (this path is pure XLA
    and runs anywhere).  Returns (B, 1, H, hd)."""
    del interpret
    kv_quant = isinstance(cache_k, dict)
    k_arr = cache_k["q"] if kv_quant else cache_k
    v_arr = cache_v["q"] if kv_quant else cache_v
    B, _, H, hd = q.shape
    N, _, S, KH, _ = k_arr.shape
    G = H // KH
    bk = min(block_k, S)
    if S % bk:
        raise ValueError(
            f"cache length {S} must be a multiple of block_k {bk} "
            "(round the allocation up; tail slots are masked)")
    scale = 1.0 / (hd ** 0.5)

    layer = jnp.asarray(layer_idx, jnp.int32)
    length = jnp.asarray(length, jnp.int32)
    nb = (length + bk - 1) // bk

    qf = q[:, 0].reshape(B, KH, G, hd).astype(jnp.float32)

    def body(i, carry):
        m, l, acc = carry
        k_blk = lax.dynamic_slice(
            k_arr, (layer, 0, i * bk, 0, 0), (1, B, bk, KH, hd))[0]
        v_blk = lax.dynamic_slice(
            v_arr, (layer, 0, i * bk, 0, 0), (1, B, bk, KH, hd))[0]
        if kv_quant:
            # (B, bk, KH) scales -> (B, KH, 1, bk) to ride the accumulators
            ks = lax.dynamic_slice(
                cache_k["s"], (layer, 0, i * bk, 0, 0),
                (1, B, bk, KH, 1))[0, ..., 0].transpose(0, 2, 1)[:, :, None]
            vs = lax.dynamic_slice(
                cache_v["s"], (layer, 0, i * bk, 0, 0),
                (1, B, bk, KH, 1))[0, ..., 0].transpose(0, 2, 1)[:, :, None]
        k_ids = i * bk + jnp.arange(bk)
        mask_blk = lax.dynamic_slice(attn_mask, (0, i * bk), (B, bk))
        ok = (k_ids[None, :] < length) & (mask_blk > 0)        # (B, bk)

        s = jnp.einsum("bkgd,bskd->bkgs", qf,
                       k_blk.astype(jnp.float32)) * scale      # (B,KH,G,bk)
        if kv_quant:
            s = s * ks
        s = jnp.where(ok[:, None, None, :], s, NEG_INF)
        m_cur = jnp.maximum(m, jnp.max(s, axis=-1))
        alpha = jnp.exp(m - m_cur)
        p = jnp.exp(s - m_cur[..., None])                      # (B,KH,G,bk)
        l_cur = l * alpha + jnp.sum(p, axis=-1)
        pv = jnp.einsum("bkgs,bskd->bkgd",
                        p * vs if kv_quant else p,
                        v_blk.astype(jnp.float32))
        acc_cur = acc * alpha[..., None] + pv
        return m_cur, l_cur, acc_cur

    m0 = jnp.full((B, KH, G), NEG_INF, jnp.float32)
    l0 = jnp.zeros((B, KH, G), jnp.float32)
    a0 = jnp.zeros((B, KH, G, hd), jnp.float32)
    m, l, acc = lax.fori_loop(0, nb, body, (m0, l0, a0))
    safe = jnp.where(l == 0.0, 1.0, l)
    out = acc / safe[..., None]
    return out.reshape(B, 1, H, hd).astype(q.dtype)
