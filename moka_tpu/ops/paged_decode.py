"""Length-aware decode attention (paged-attention style, Pallas).

The decode hot loop attends one new token against the KV cache.  The plain
path reads the ENTIRE static cache every layer every step; this kernel
follows the paged-attention recipe — one manual DMA per KV block, skipped
entirely for blocks beyond the current sequence position — so HBM traffic
scales with the *valid* cache prefix, not the allocated maximum.

Differences from full paged attention: the cache is contiguous
(layer-stacked (N, B, S, K, hd)) rather than a page table — the serving
layer here allocates one cache per micro-batch, so page indirection is
unnecessary; what matters on TPU is (a) not loading invalid blocks and
(b) reading the cache straight from HBM without materializing a per-layer
copy.  The layer index and current length arrive as scalar prefetch so one
kernel instance serves every layer of the decode fori_loop.  Each DMA moves
a CONTIGUOUS (block, K, hd) slab (all kv heads at once — Mosaic rejects
head-strided cache slices) and the kernel does the per-head attention as a
batched matmul in VMEM.

Forward-only (decode never differentiates).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(layer_ref, length_ref, q_ref, mask_ref, k_hbm, v_hbm, o_ref,
            m_scr, l_scr, acc_scr, k_buf, v_buf, sem, *, block_k, scale):
    b = pl.program_id(0)
    i = pl.program_id(1)
    layer = layer_ref[0]
    length = length_ref[0]

    @pl.when(i == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)
        o_ref[0] = jnp.zeros_like(o_ref[0])

    @pl.when(i * block_k < length)
    def _():
        # one contiguous DMA per block: (block, K, hd) slab from the stacked
        # HBM cache
        ck = pltpu.make_async_copy(
            k_hbm.at[layer, b, pl.ds(i * block_k, block_k)], k_buf,
            sem.at[0])
        cv = pltpu.make_async_copy(
            v_hbm.at[layer, b, pl.ds(i * block_k, block_k)], v_buf,
            sem.at[1])
        ck.start()
        cv.start()
        ck.wait()

        q = q_ref[0]                                  # (KH, G, hd)
        # (bk, KH, hd) -> (KH, bk, hd): Mosaic batched dots need batch dims
        # in the same operand position
        k = jnp.transpose(k_buf[...], (1, 0, 2))
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        k_ids = i * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (1, block_k), 1)[0]
        ok = (k_ids < length) & (mask_ref[0, 0] > 0)
        s = jnp.where(ok[None, None, :], s, NEG_INF)

        m_prev = m_scr[...]                           # (KH, G)
        l_prev = l_scr[...]
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=2))
        alpha = jnp.exp(m_prev - m_cur)
        p = jnp.exp(s - m_cur[..., None])
        l_cur = l_prev * alpha + jnp.sum(p, axis=2)
        cv.wait()
        v = jnp.transpose(v_buf[...], (1, 0, 2))      # (KH, bk, hd)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)       # (KH, G, hd)
        acc_scr[...] = acc_scr[...] * alpha[..., None] + pv
        m_scr[...] = m_cur
        l_scr[...] = l_cur
        # normalized write every processed block: skipped tail blocks leave
        # the final value in place
        safe = jnp.where(l_cur == 0.0, 1.0, l_cur)
        o_ref[0] = (acc_scr[...] / safe[..., None]).astype(o_ref.dtype)


def paged_decode_attention(q, cache_k, cache_v, attn_mask, layer_idx,
                           length, *, block_k: int = 256,
                           interpret: bool = False):
    """q: (B, 1, H, hd) single-token queries; cache_k/v: (N, B, S, K, hd)
    layer-stacked HBM cache; attn_mask: (B, S) validity; layer_idx, length:
    scalars (current layer, valid slots incl. the token just written).

    Returns (B, 1, H, hd)."""
    B, _, H, hd = q.shape
    N, _, S, KH, _ = cache_k.shape
    G = H // KH
    bk = min(block_k, S)
    nb = pl.cdiv(S, bk)
    scale = 1.0 / (hd ** 0.5)

    qg = q[:, 0].reshape(B, KH, G, hd)
    scalars = (jnp.asarray(layer_idx, jnp.int32).reshape(1),
               jnp.asarray(length, jnp.int32).reshape(1))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, nb),
        in_specs=[
            pl.BlockSpec((1, KH, G, hd), lambda b, i, *_: (b, 0, 0, 0)),
            pl.BlockSpec((1, 1, bk), lambda b, i, *_: (b, 0, i)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        ],
        out_specs=pl.BlockSpec((1, KH, G, hd), lambda b, i, *_: (b, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((KH, G), jnp.float32),
            pltpu.VMEM((KH, G), jnp.float32),
            pltpu.VMEM((KH, G, hd), jnp.float32),
            pltpu.VMEM((bk, KH, hd), cache_k.dtype),
            pltpu.VMEM((bk, KH, hd), cache_v.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, block_k=bk, scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KH, G, hd), q.dtype),
        interpret=interpret,
    )(*scalars, qg, attn_mask.astype(jnp.int32)[:, None, :], cache_k,
      cache_v)
    return out.reshape(B, 1, H, hd)
